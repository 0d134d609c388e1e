"""Interval/overlap column expressions and the binned range join.

The reference computes interval overlap with a driver-side Python loop
(``calc_overlap``, utils.py:7-25: disjoint->0, contained->1, partial->
fraction of *self* length) and runs interval joins as SQLite nested
loops (junction.py:159-164, 196-208, 229-263, 285-287). Here every
predicate is a column expression (JVM-side, codegen), and the join
itself has two physical strategies:

- small annotation side  -> broadcast + non-equi condition (fine);
- both sides large       -> ``binned_interval_join``: replicate each
  interval into fixed-width bins, equi-join on (partition keys..., bin),
  then exact range filter + dedup. Turns an O(n*m) BroadcastNestedLoop
  into a shuffle hash/sort-merge join keyed by bin — the plan that
  survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def overlap_len(s1, e1, s2, e2) -> Column:
    """Length of the intersection of [s1,e1] and [s2,e2], floored at 0."""
    return F.greatest(F.least(_c(e1), _c(e2)) - F.greatest(_c(s1), _c(s2)), F.lit(0))


def overlap_fraction(s1, e1, s2, e2) -> Column:
    """Overlap as a fraction of the *first* interval's length.

    Column-expression port of reference utils.py:7-25 semantics:
    disjoint -> 0, [s1,e1] contained in [s2,e2] -> 1, partial ->
    overlap/(e1-s1). The piecewise cases collapse to the closed form
    greatest(0, least(e1,e2)-greatest(s1,s2))/(e1-s1) (SURVEY.md §7.3).
    """
    return overlap_len(s1, e1, s2, e2) / (_c(e1) - _c(s1))


def interval_overlaps(s1, e1, s2, e2) -> Column:
    """[s1,e1] overlaps [s2,e2] (reference P5, junction.py:94)."""
    return (_c(e1) >= _c(s2)) & (_c(s1) <= _c(e2))


def point_in_interval(p, s, e) -> Column:
    """Point falls inside [s,e] (reference P6 intent, variants.py:91-93)."""
    return _c(p).between(_c(s), _c(e))


def with_bins(df: DataFrame, start: str, end: str, bin_size: int, bin_col: str = "__bin") -> DataFrame:
    """Explode each interval row into one row per covered bin.

    Bin index is FLOOR division (correct for negative coordinates, and
    matches SQL ``//``); a degenerate interval with ``end < start``
    yields zero rows (``F.sequence`` would otherwise generate a
    DESCENDING bin list) — same as SQL ``range(s, e+1)`` being empty.
    """
    sb = F.floor(_c(start) / bin_size).cast("long")
    eb = F.floor(_c(end) / bin_size).cast("long")
    return df.withColumn(
        bin_col,
        F.explode(F.when(_c(end) >= _c(start), F.sequence(sb, eb)).otherwise(F.array())),
    )


def key_count_stats(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key row counts in the ``(key_cols..., __n)`` shape that
    :func:`banded_pair_join` accepts as ``key_stats``. Cache (or persist
    to the catalog) and reuse across calls so the hot-key probe scans
    the table once, not once per plan build."""
    return df.groupBy(*key_cols).agg(F.count("*").alias("__n"))


def banded_pair_join(
    df: DataFrame,
    *,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    tol: int,
    bin_size: int | None = None,
    hot_threshold: int | None = 10_000,
    key_stats: DataFrame | None = None,
) -> DataFrame:
    """All within-key pairs with ``|v_a - v_b| <= tol``, each unordered
    pair once (``a_id < b_id``) — the per-key self-join (reference J12,
    junction.py:285-287 tolerance matching) with a SKEW CAP.

    Two physical routes, picked per key by cardinality:

    - keys with <= ``hot_threshold`` rows take the plain per-key
      self-join — one shuffle on the key, the cheapest plan while
      per-key fan-out is bounded (the normal case: a customer has tens
      of orders no matter the scale factor);
    - hotter keys take the binned point-in-interval join:
      ``|v_a - v_b| <= tol`` is exactly "point v_b falls inside
      [v_a - tol, v_a + tol]", so the equi key becomes (key..., value
      bin) and fan-out is bounded per VALUE BIN — a key with 10^6 rows
      stays near-linear instead of going quadratic. Points land in one
      bin, so pairs emit once (kept where ``a_id < b_id``).

    Cost of the routing: one eager map-side-combined count over the
    keys (linear, run when the plan is BUILT — the hand-rolled analogue
    of an AQE runtime stat). When no key is hot — the normal case — the
    result is the plain single-join plan with zero residual overhead;
    only when hot keys exist does the plan split into the two routes
    (three scans total: linear work that buys the quadratic cap).
    ``hot_threshold=0`` forces the binned route for everything (used by
    the property tests).

    Amortizing / skipping the probe (the per-build scan matters at
    100 TB):

    - ``hot_threshold=None`` — the caller ASSERTS per-key fan-out is
      bounded (e.g. a generator-bounded or schema-bounded key like
      orders-per-customer): the plain self-join is returned with NO
      probe and no action at build time. Correctness is unaffected —
      a wrong assertion costs quadratic time on the hot key, never
      wrong rows.
    - ``key_stats`` — a precomputed ``(key_cols..., __n)`` counts
      DataFrame (e.g. :func:`key_count_stats` cached once and reused
      across calls, or row counts from a table catalog): the probe
      filters it instead of rescanning ``df``.
    """
    def _pairs_self(rows: DataFrame) -> DataFrame:
        a = rows.select(*key_cols, F.col(id_col).alias("a_id"),
                        _c(value_col).alias("__a_v"))
        b = rows.select(*[F.col(k).alias(f"__b_{k}") for k in key_cols],
                        F.col(id_col).alias("b_id"), _c(value_col).alias("__b_v"))
        cond = F.lit(True)
        for k in key_cols:
            cond = cond & (a[k] == b[f"__b_{k}"])
        return (
            a.join(b, cond & (F.col("a_id") < F.col("b_id")))
            .filter(F.abs(F.col("__a_v") - F.col("__b_v")) <= tol)
            .select(*key_cols, "a_id", "b_id")
        )

    def _pairs_binned(rows: DataFrame) -> DataFrame:
        a = rows.select(*key_cols, F.col(id_col).alias("a_id"),
                        (_c(value_col) - tol).alias("__a_lo"),
                        (_c(value_col) + tol).alias("__a_hi"))
        b = rows.select(*key_cols, F.col(id_col).alias("b_id"),
                        F.col(value_col).alias("__b_v"))
        out = binned_interval_join(
            b, a, left_start="__b_v", left_end=None,
            right_start="__a_lo", right_end="__a_hi",
            partition_keys=[(k, k) for k in key_cols],
            bin_size=bin_size or max(int(tol) * 2, 1),
        )
        return (
            out.filter(F.col("a_id") < F.col("b_id"))
            .select(*[b[k] for k in key_cols], "a_id", "b_id")
        )

    if hot_threshold is None:
        # Caller asserts bounded per-key fan-out: no probe, no build-time
        # action — the plain one-shuffle self-join.
        return _pairs_self(df)
    counts = key_stats if key_stats is not None \
        else df.groupBy(*key_cols).agg(F.count("*").alias("__n"))
    hot_keys = counts.filter(F.col("__n") > hot_threshold).select(*key_cols)
    if hot_threshold <= 0:
        return _pairs_binned(df)
    if not hot_keys.take(1):
        # No hot key anywhere: the per-key self-join IS the right plan.
        return _pairs_self(df)
    # Hot keys are few by definition (each holds > hot_threshold rows),
    # so the key set broadcasts.
    cold = df.join(F.broadcast(hot_keys), key_cols, "left_anti")
    hot = df.join(F.broadcast(hot_keys), key_cols, "left_semi")
    return _pairs_self(cold).unionByName(_pairs_binned(hot))


def binned_interval_join(
    points_or_intervals: DataFrame,
    intervals: DataFrame,
    *,
    left_start: str,
    left_end: str | None,
    right_start: str,
    right_end: str,
    partition_keys: list[tuple[str, str]] | None = None,
    bin_size: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Range/containment join scalable to two large sides.

    ``left_end=None`` means the left side is points (point-in-interval,
    reference J14); otherwise interval-overlap (reference J10/J12).
    ``partition_keys`` is a list of (left_col, right_col) equality keys
    (e.g. chrom/strand) prepended to the bin key.

    Points land in exactly one bin; an interval×interval pair meets in
    every shared bin, so the join emits each pair ONCE by keeping only
    the first shared bin (``bin == floor(greatest(l_start, r_start) /
    bin_size)``) — no post-join distinct (a full-row shuffle) and no
    collapsing of genuinely duplicate input rows.

    ``how='left'``/``'right'``/``'full'`` are DE-BINNED: the range
    predicate and the emit-once condition live in the join CONDITION,
    so a naive outer join would null-pad every failing exploded bin-row
    (an unmatched interval spanning k bins would come back k times).
    Instead each outer flavor is built as inner + anti-join padding:
    the inner result, plus each unmatched ORIGINAL row of the outer
    side(s) once, null-padded on the other side. Unmatched rows are
    found by value (null-safe equality on all of that side's columns),
    which is exact because identical rows have identical match status;
    input multiplicity is preserved on every branch. Requires disjoint
    left/right column names (same as the inner path).
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            "binned_interval_join supports how='inner'|'left'|'right'|'full'"
        )
    bin_l, bin_r = "__bin_l", "__bin_r"
    if left_end is None:
        left = points_or_intervals.withColumn(bin_l, F.floor(_c(left_start) / bin_size).cast("long"))
    else:
        left = with_bins(points_or_intervals, left_start, left_end, bin_size, bin_l)
    right = with_bins(intervals, right_start, right_end, bin_size, bin_r)

    cond = left[bin_l] == right[bin_r]
    for lk, rk in partition_keys or []:
        cond = cond & (left[lk] == right[rk])
    if left_end is None:
        cond = cond & point_in_interval(left[left_start], right[right_start], right[right_end])
    else:
        cond = cond & interval_overlaps(left[left_start], left[left_end], right[right_start], right[right_end])
        # Emit-once: of the min(bins_l, bins_r) shared bins the pair
        # meets in, keep only the first — the bin containing the later
        # of the two starts (same floor arithmetic as with_bins).
        first_shared = F.floor(
            F.greatest(left[left_start], right[right_start]) / bin_size
        ).cast("long")
        cond = cond & (left[bin_l] == first_shared)

    inner = left.join(right, cond, "inner").drop(bin_l, bin_r)
    if how == "inner":
        return inner

    # Outer flavors: inner result + one null-padded row per unmatched
    # ORIGINAL row of each outer side. The inner result feeds the union
    # and every anti-join probe, so materialize it once (lazy — no
    # eager job).
    overlap = set(points_or_intervals.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"outer join needs disjoint column names; shared: {sorted(overlap)}")
    inner = inner.localCheckpoint(eager=False)

    def _padded_unmatched(src_df: DataFrame, other_df: DataFrame, pad_left: bool) -> DataFrame:
        """Rows of src_df with no inner match, null-padded on the other
        side, in the inner result's (left cols, right cols) order."""
        own_cols = list(src_df.columns)
        matched = inner.select(*own_cols).distinct().alias("__m")
        src = src_df.alias("__s")
        anti_cond = F.lit(True)
        for c in own_cols:
            # Backtick-escape: column names may legally contain dots.
            anti_cond = anti_cond & F.col(f"`__s`.`{c}`").eqNullSafe(F.col(f"`__m`.`{c}`"))
        unmatched = src.join(matched, anti_cond, "left_anti")
        nulls = [F.lit(None).cast(f.dataType).alias(f.name) for f in other_df.schema.fields]
        if pad_left:
            return unmatched.select(*nulls, *own_cols)
        return unmatched.select(*own_cols, *nulls)

    out = inner
    if how in ("left", "full"):
        out = out.unionByName(_padded_unmatched(points_or_intervals, intervals, pad_left=False))
    if how in ("right", "full"):
        out = out.unionByName(_padded_unmatched(intervals, points_or_intervals, pad_left=True))
    return out


def merge_intervals(
    df: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Collapse overlapping/touching [start, end] intervals per group
    into maximal covered blocks: (group, start, end, n_merged) — the
    genomics coverage primitive (exon unions, callable-region BED
    merges; bedtools-merge semantics with closed-interval touching).

    Gaps-and-islands: within each group ordered by start, an interval
    opens a new block iff its start exceeds the running max of all
    previous ends; the block id is the running sum of those flags.
    Tie order on equal starts cannot change the result (an equal-start
    interval never clears the running max). One group-partitioned
    window pass + one groupBy — shuffle keyed by group, window state
    one group's intervals.
    """
    w_ord = Window.partitionBy("__g").orderBy(
        F.col("__s").asc(), F.col("__e").asc())
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    )
    flagged = base.withColumn(
        "__new",
        F.when(F.col("__s") > F.coalesce(
            F.max("__e").over(w_prev), F.col("__s")), 1).otherwise(0),
    ).withColumn(
        "__blk",
        F.sum("__new").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(
            F.col("__g").alias(group_col), F.col("__blk"))
        .agg(
            F.min("__s").alias(start_col),
            F.max("__e").alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__blk")
    )


def subtract_intervals(
    a: DataFrame,
    b: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """bedtools-subtract semantics on CLOSED integer intervals: the
    pieces of each A interval not covered by the union of B, per group
    (chrom) — (id, group, start, end) with one row per surviving piece.
    ``id_col`` must uniquely key A's rows (pieces inherit it). The
    genomics complement primitive closing the interval algebra next to
    merge/overlap/nearest: exon minus repeat-mask, callable minus
    blacklist.

    Plan: B first collapses to disjoint blocks (:func:`merge_intervals`
    — so overlapping B rows can't double-cut), then each A row joins
    its group's overlapping blocks and emits (i) the gap before each
    block (bounded below by the running max of previous block ends —
    the left clip), and (ii) one trailing piece after the last block;
    A rows overlapping nothing pass through via an anti-join. Every
    branch is a window over the per-A joined rows — no driver loops.

    Scale shape: the join is keyed on the GROUP (chrom-style blocking
    by contract, like the reference's per-chrom junction queries);
    merged-B is block-sized. For ungrouped/pathological inputs bin
    first (functions/intervals.py interval-join helpers).
    """
    blocks = merge_intervals(b, group_col, start_col, end_col).select(
        F.col(group_col).alias("__g"),
        F.col(start_col).alias("__bs"),
        F.col(end_col).alias("__be"),
    )
    base = a.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    )
    j = base.join(blocks, "__g").filter(
        (F.col("__bs") <= F.col("__e")) & (F.col("__be") >= F.col("__s")))
    w_ord = Window.partitionBy("__id").orderBy("__bs")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy("__id")
    cut = (
        j.withColumn(
            "__lo",
            F.greatest(
                F.col("__s"),
                F.coalesce(F.max("__be").over(w_prev) + 1, F.col("__s"))),
        )
        .withColumn("__hi", F.least(F.col("__e"), F.col("__bs") - 1))
        .withColumn("__last_be", F.max("__be").over(w_all))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__id").orderBy(F.desc("__bs"))),
        )
    )
    before = cut.filter(F.col("__hi") >= F.col("__lo")).select(
        "__id", "__g", F.col("__lo").alias("__ps"), F.col("__hi").alias("__pe"))
    trailing = (
        cut.filter(F.col("__rn") == 1)
        .filter(F.col("__last_be") + 1 <= F.col("__e"))
        .select(
            "__id", "__g",
            F.greatest(F.col("__s"), F.col("__last_be") + 1).alias("__ps"),
            F.col("__e").alias("__pe"))
    )
    untouched = base.join(
        j.select("__id").distinct(), "__id", "left_anti"
    ).select("__id", "__g", F.col("__s").alias("__ps"),
             F.col("__e").alias("__pe"))
    return (
        before.unionAll(trailing).unionAll(untouched)
        .select(
            F.col("__id").alias(id_col),
            F.col("__g").alias(group_col),
            F.col("__ps").alias(start_col),
            F.col("__pe").alias(end_col),
        )
    )
