"""Bit-level float-stream audit for the driver-side survival fitters.

For the queries whose Newton/score reductions run driver-side in a
PINNED order with ordered-aggregate oracles (r13 verdict #1 /
OPTIMIZATION_r14.md), this compares the UNROUNDED Spark emissions
(digits=None) against the DuckDB oracle with ``round()`` stripped, at
every SF — the proof that the two engines' float streams agree far
inside the rounding contract (cox multi: exactly; finegray: to the
irreducible Spark-sequential vs DuckDB-segment-tree window-sum
association, ~1e-13 relative).

Usage:
    python tools/audit_float_streams.py [sf ...]   # default: all three
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clinpy_spark import queries as Q  # noqa: E402
from clinpy_spark.session import STAR_TABLES, get_spark  # noqa: E402


def _obs_cox(spark, sf_dir, d3):
    o = Q._t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
               16, 10).cast("long")
    followup = h % 1500 + 1
    dd = F.datediff(F.lit("1998-08-02").cast("date"),
                    F.col("o_orderdate")).cast("long")
    cols = [
        F.least(followup, dd).alias("duration"),
        F.when(followup <= dd, 1).otherwise(0).alias("evt"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.0).otherwise(0.0)
        .alias("x1"),
        (F.col("o_custkey") % 2).cast("double").alias("x2"),
    ]
    if d3:
        cols.append((F.col("o_custkey") % 3).cast("double").alias("x3"))
    return o.select(*cols)


def _obs_fg(spark, sf_dir):
    o = Q._t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
               16, 10).cast("long")
    followup = h % 1500 + 1
    dd = F.datediff(F.lit("1998-08-02").cast("date"),
                    F.col("o_orderdate")).cast("long")
    return o.select(
        F.least(followup, dd).alias("t"),
        F.when(followup <= dd,
               F.when(h % 3 == 0, 2).otherwise(1)).otherwise(0).alias("st"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        .alias("x"))


def _duck(sf_dir, sql, digits):
    sql = sql.replace("round(", "(").replace(f", {digits})", ")")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    return dict(zip([d[0] for d in cur.description], cur.fetchone()))


def main() -> int:
    from clinpy_spark.operators.survival import (
        cox_newton_multi, finegray_leavers, finegray_newton_from_leavers,
        finegray_score_from_leavers)
    from clinpy_spark.queries import (
        _cox_multi3_sql, _cox_multi_sql, _finegray_beta_sql)

    sfs = sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]
    spark = get_spark("audit-float-streams")
    worst_all = 0.0
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        leav = finegray_leavers(_obs_fg(spark, sf_dir), "t", "st", "x")
        cases = [
            ("surv_cox_multi",
             cox_newton_multi(_obs_cox(spark, sf_dir, False), "duration",
                              "evt", ["x1", "x2"], 4, digits=None),
             _cox_multi_sql(4), 5, 0.0),
            ("surv_cox_multi3",
             cox_newton_multi(_obs_cox(spark, sf_dir, True), "duration",
                              "evt", ["x1", "x2", "x3"], 4, digits=None),
             _cox_multi3_sql(4), 5, 0.0),
            ("surv_finegray_score",
             finegray_score_from_leavers(leav, digits=None),
             Q._ORACLE["surv_finegray_score"], 6, 1e-11),
            ("surv_finegray_beta",
             finegray_newton_from_leavers(leav, 3, digits=None),
             _finegray_beta_sql(3), 6, 1e-11),
        ]
        for name, sdf, sql, digits, tol in cases:
            s = sdf.collect()[0]
            o = _duck(sf_dir, sql, digits)
            worst, wc = 0.0, "exact"
            for c in o:
                sv, ov = s[c], o[c]
                if sv is None and ov is None:
                    continue
                if (sv is None) != (ov is None):
                    print(f"FAIL {sf} {name} {c}: NULL mismatch {sv} {ov}")
                    bad += 1
                    continue
                rel = abs(float(sv) - float(ov)) / max(abs(float(ov)), 1e-300)
                if rel > worst:
                    worst, wc = rel, c
            status = "ok  " if worst <= tol else "FAIL"
            if worst > tol:
                bad += 1
            worst_all = max(worst_all, worst)
            print(f"{status} {sf} {name}: worst rel {worst:.2e} ({wc}),"
                  f" tol {tol:g}")
    print(f"\nworst overall: {worst_all:.2e}; {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
