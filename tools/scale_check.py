"""Empirical scaling check: run the bench headline set at every
available scale factor and fit the per-query scaling exponent
alpha in  time ∝ (scale factor)^alpha  over the two largest SFs.

alpha <= ~1 means the operator scales linearly (or better, when fixed
per-query overhead dominates) with data size — the local-mode proxy for
"survives a 100x scale-up without a quadratic blowup". Writes
SCALING.md. Usage:

    python tools/scale_check.py [sf_dir ...] [--extra q1,q2,...]

``--extra`` appends named registry queries to the headline sweep (e.g.
the tier2 fuzzy joins) without changing the standing headline table.
"""

from __future__ import annotations

import math
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402
from clinpy_spark import queries as Q  # noqa: E402
from clinpy_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    extra: list[str] = []
    if "--extra" in args:
        i = args.index("--extra")
        extra = [q for q in args[i + 1].split(",") if q]
        args = args[:i] + args[i + 2:]
    dirs = args or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    sfs = [float(re.search(r"sf([0-9.]+)", d).group(1)) for d in dirs]

    spark = get_spark("scale-check")
    spark.range(1).count()
    qs = Q.queries()

    sweep = HEADLINE + [q for q in extra if q in qs and q not in HEADLINE]
    times: dict[str, list[float]] = {name: [] for name in sweep}
    for d in dirs:
        for name in sweep:
            qs[name](spark, d).count()  # warm (codegen/JIT per plan+schema)
            # best-of-3 steady-state: this host is a shared VM and single
            # warm runs have been observed 2-4x slower under neighbor
            # noise (same rationale as bench.py) — a noisy sf1 cell can
            # fake a super-linear alpha on a genuinely linear operator.
            runs = []
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, d).count()
                runs.append(time.time() - t0)
            times[name].append(min(runs))

    lines = [
        "# SCALING — empirical per-query scaling exponents",
        "",
        "`python tools/scale_check.py` — steady-state runtimes of the bench",
        f"headline set at sf={sfs}, and the fitted exponent alpha in",
        "time ∝ sf^alpha over the two largest SFs. alpha <= ~1 = linear or",
        "overhead-dominated; alpha >> 1 would flag a super-linear operator.",
        "",
        "",
        "sf1 is a derived 10x replication of the driver's sf0.1 tables",
        "(tools/make_scale_fixture.py — per-copy key shifts keep joins,",
        "windows, and banded self-joins within a copy, the way TPC-H's",
        "own sf scaling behaves; document text is token-salted per copy",
        "so near-dup structure stays intra-copy). The driver's own",
        "testdata is untouched; the fixture lives in gitignored",
        "_scaledata/.",
        "",
        "| query | " + " | ".join(f"sf{s}" for s in sfs) + " | alpha |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    worst = []
    for name in sweep:
        ts = times[name]
        alpha = math.log(ts[-1] / ts[-2]) / math.log(sfs[-1] / sfs[-2]) if len(ts) >= 2 else float("nan")
        worst.append((alpha, name))
        lines.append(
            f"| {name} | " + " | ".join(f"{t:.3f}s" for t in ts) + f" | {alpha:.2f} |"
        )
    lines.append("")
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines))

    for alpha, name in sorted(worst, reverse=True):
        print(f"alpha={alpha:5.2f}  {name}")
    print("-> SCALING.md")


if __name__ == "__main__":
    main()
