"""Per-query standalone profiler for the optimization rounds.

For each named query (or a named set): run it N times against
$SPARK_GRAFT_SF_DIR in a fresh-ish session, timing the SAME action the
bench uses (df.count()) plus optionally the noop sink (guide §1.4 —
times every column's computation, not just the count's pruned subtree),
and optionally dump .explain("formatted") to a file.

Usage:
    python tools/profile_queries.py [--sf DIR] [--runs N] [--noop]
        [--plans-dir plans/r13 --plans-suffix _before]
        [--out report.json] query [query ...]

    query can also be: @headline, @tier2 (bench sets), @all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinpy_spark import queries as Q  # noqa: E402
from clinpy_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--noop", action="store_true",
                    help="also time df.write.format('noop') per run")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="_before")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    qs = Q.queries()
    names: list[str] = []
    for n in args.names:
        if n == "@headline":
            import bench
            names += bench.HEADLINE
        elif n == "@tier2":
            import bench
            names += bench.TIER2
        elif n == "@all":
            names += list(qs)
        else:
            names.append(n)

    spark = get_spark("clinpy-profile")
    spark.range(1).count()
    report: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc = spark.sparkContext
        counts, noops = [], []
        nrows = None
        for run in range(args.runs):
            sc.setJobDescription(f"{name} count run{run}")
            t0 = time.time()
            df = fn(spark, args.sf)
            nrows = df.count()
            counts.append(round(time.time() - t0, 3))
            if args.noop:
                sc.setJobDescription(f"{name} noop run{run}")
                t0 = time.time()
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                noops.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        if args.plans_dir:
            import io
            from contextlib import redirect_stdout

            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(
                    args.plans_dir, f"{name}{args.plans_suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        entry = {"rows": nrows, "count_runs": counts,
                 "count_warm": min(counts[1:]) if len(counts) > 1 else counts[0]}
        if noops:
            entry["noop_runs"] = noops
            entry["noop_warm"] = min(noops[1:]) if len(noops) > 1 else noops[0]
        report[name] = entry
        print(f"# {name}: warm {entry['count_warm']}s "
              f"(cold {counts[0]}s, rows {nrows}"
              + (f", noop {entry.get('noop_warm')}s" if noops else "") + ")",
              file=sys.stderr, flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["count_warm"] for k, v in report.items()}))


if __name__ == "__main__":
    main()
