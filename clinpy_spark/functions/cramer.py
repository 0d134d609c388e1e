"""Driver-side Cramer's-rule solvers whose ARITHMETIC ORDER matches the
DuckDB oracle CTEs token-for-token.

The multi-covariate Newton fitters (``logistic_newton_multi`` /
``poisson_newton_multi`` / ``cox_newton_multi`` / ``multinomial_newton``)
factor each step as ONE distributed moment aggregate collected to a
single bounded row plus a tiny driver-side dense solve.  r12's driver
artifact showed why the solve must NOT be ``np.linalg.solve``: LAPACK's
pivoted elimination and the oracle's Cramer expansion agree only to
~1e-13, and the per-time moment sums are partition-order-dependent
doubles, so an emitted statistic landing within ~1e-13 of a rounding
boundary flips a digit (r12 verdict #1, the one red row).  These
helpers evaluate the SAME cofactor expressions in the SAME left-to-
right IEEE-754 order as the SQL, so the only residual drift is the
irreducible distributed-sum-order term in the moments themselves —
which the family's round-5 emission contract absorbs (drift ~1e-13 vs
boundary width 1e-5 → flip probability ~1e-8 per statistic).

For n = 4 (the multinomial k=3 system) both the Python evaluation and
the SQL text are generated from ONE Leibniz term enumeration
(:func:`det_terms`), so the two sides cannot diverge in term order.
"""

from __future__ import annotations

from itertools import permutations


def solve2(u1: float, u2: float,
           i11: float, i12: float, i22: float):
    """2x2 symmetric Cramer solve: returns (det, d1, d2) with d = A^-1 u,
    evaluating exactly the oracle's expressions
    ``i11*i22 - i12*i12``, ``(i22*u1 - i12*u2)/det``,
    ``(i11*u2 - i12*u1)/det`` (queries.py ``_cox_multi_sql``)."""
    det = i11 * i22 - i12 * i12
    if not det > 0:
        return det, None, None
    d1 = (i22 * u1 - i12 * u2) / det
    d2 = (i11 * u2 - i12 * u1) / det
    return det, d1, d2


def solve3(u0: float, u1: float, u2: float,
           i00: float, i01: float, i02: float,
           i11: float, i12: float, i22: float):
    """3x3 symmetric Cramer solve: returns (det, d0, d1, d2),
    evaluating exactly the oracle's cofactor expansion
    (queries.py ``_logit_multi_irls_sql`` / ``_poisson_multi_irls_sql``
    / ``_cox_multi3_sql``, indices shifted as the caller labels them).
    """
    det = (i00 * (i11 * i22 - i12 * i12)
           - i01 * (i01 * i22 - i12 * i02)
           + i02 * (i01 * i12 - i11 * i02))
    if not det > 0:
        return det, None, None, None
    d0 = (u0 * (i11 * i22 - i12 * i12)
          - i01 * (u1 * i22 - i12 * u2)
          + i02 * (u1 * i12 - i11 * u2)) / det
    d1 = (i00 * (u1 * i22 - i12 * u2)
          - u0 * (i01 * i22 - i12 * i02)
          + i02 * (i01 * u2 - u1 * i02)) / det
    d2 = (i00 * (i11 * u2 - u1 * i12)
          - i01 * (i01 * u2 - u1 * i02)
          + u0 * (i01 * i12 - i11 * i02)) / det
    return det, d0, d1, d2


def var3_diag(i00: float, i01: float, i02: float,
              i11: float, i12: float, i22: float, det: float):
    """Diagonal of the 3x3 inverse scaled by det — the oracle's
    ``(i00*i22 - i02*i02)/det`` (var of index 1) and
    ``(i00*i11 - i01*i01)/det`` (var of index 2) plus the index-0
    entry, in the same operand order."""
    v0 = (i11 * i22 - i12 * i12) / det
    v1 = (i00 * i22 - i02 * i02) / det
    v2 = (i00 * i11 - i01 * i01) / det
    return v0, v1, v2


def det_terms(n: int):
    """Leibniz enumeration of the n x n determinant in lexicographic
    permutation order: yields (sign, ((0, c0), (1, c1), ...)).  BOTH
    the Python evaluator and the SQL generator below iterate this same
    sequence, so term order (and therefore every IEEE rounding step of
    the sum) is identical on the two sides."""
    out = []
    for perm in permutations(range(n)):
        sign = 1
        p = list(perm)
        # count inversions for the parity
        inv = sum(1 for a in range(n) for b in range(a + 1, n)
                  if p[a] > p[b])
        sign = -1 if inv % 2 else 1
        out.append((sign, tuple((r, perm[r]) for r in range(n))))
    return out


def _det_py(a, n: int) -> float:
    """a[(r, c)] -> float.  Sum accumulated in det_terms order with
    left-to-right products — the exact sequence the SQL text encodes."""
    acc = 0.0
    for sign, cells in det_terms(n):
        prod = a[cells[0]]
        for rc in cells[1:]:
            prod = prod * a[rc]
        acc = acc + prod if sign > 0 else acc - prod
    return acc


def _det_sql(name, n: int) -> str:
    """SQL expression string for the same determinant; ``name(r, c)``
    maps a cell to its SQL column/identifier text."""
    parts = []
    for sign, cells in det_terms(n):
        prod = " * ".join(name(r, c) for r, c in cells)
        parts.append(("+ " if sign > 0 else "- ") + prod)
    return "(" + " ".join(parts) + ")"


def solve_n_py(u: list, info: dict, n: int):
    """General n x n Cramer solve in generated-term order: ``info`` maps
    (r, c) with r <= c (symmetric fill-in applied here); returns
    (det, [d0..dn-1]) with None deltas when det <= 0.  The matching
    SQL comes from :func:`solve_n_sql` over the SAME ``det_terms``."""
    full = {}
    for (r, c), v in info.items():
        full[(r, c)] = v
        full[(c, r)] = v

    det = _det_py(full, n)
    if not det > 0:
        return det, None
    deltas = []
    for col in range(n):
        rep = dict(full)
        for r in range(n):
            rep[(r, col)] = u[r]
        deltas.append(_det_py(rep, n) / det)
    return det, deltas


def solve_n_sql(u_name, i_name, n: int):
    """SQL texts mirroring :func:`solve_n_py`: returns
    (det_sql, [delta0_sql_numerators...]) where each delta numerator
    must be divided by the det expression by the caller.  ``u_name(r)``
    and ``i_name(r, c)`` give the SQL identifier for score entry r and
    (symmetric) information cell (r, c)."""
    def base(r, c):
        return i_name(min(r, c), max(r, c))

    det = _det_sql(base, n)
    nums = []
    for col in range(n):
        def rep(r, c, _col=col):
            return u_name(r) if c == _col else base(r, c)
        nums.append(_det_sql(rep, n))
    return det, nums


def inv_diag_py(info: dict, n: int):
    """Diagonal of the inverse of the symmetric n x n matrix, each
    entry as principal-minor-determinant / determinant with BOTH dets
    evaluated in det_terms order — the Python twin of
    :func:`inv_diag_sql`.  ``info`` maps (r, c), r <= c.  Returns
    (det, [v0..vn-1]) with None list when det <= 0."""
    full = {}
    for (r, c), v in info.items():
        full[(r, c)] = v
        full[(c, r)] = v
    det = _det_py(full, n)
    if not det > 0:
        return det, None
    out = []
    for i in range(n):
        idx = [j for j in range(n) if j != i]
        minor = {(r, c): full[(idx[r], idx[c])]
                 for r in range(n - 1) for c in range(n - 1)}
        out.append(_det_py(minor, n - 1) / det)
    return det, out


def inv_diag_sql(i_name, n: int):
    """SQL texts for :func:`inv_diag_py`: (det_sql, [minor_sql...]) —
    divide each minor by the det expression to get the variance."""
    def base(r, c):
        return i_name(min(r, c), max(r, c))

    det = _det_sql(base, n)
    minors = []
    for i in range(n):
        idx = [j for j in range(n) if j != i]

        def m_name(r, c, _idx=idx):
            return base(_idx[r], _idx[c])

        minors.append(_det_sql(m_name, n - 1))
    return det, minors
