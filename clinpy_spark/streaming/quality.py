"""Streaming twin of the Deequ-style constraint suite
(operators/quality.py): per-micro-batch check partials folded by
ADDITION into a persisted table, so data-quality metrics are
continuously maintained at O(batch + checks) per trigger — the shape a
100 TB/day ingest needs (re-scanning history per trigger is not an
option).

Only checks whose sufficient statistics are additive stream:
completeness, range, pattern (each reduces to two counters per batch).
Uniqueness and fk need cross-batch distinct/membership state — run
those in batch over the sink table, or via the KMV sketch
(operators/sketch.py) when an estimate suffices.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_STREAMABLE = {"completeness", "range", "pattern"}


def check_partials(df: DataFrame, checks: list[dict]) -> DataFrame:
    """One fused aggregation -> (check_name, num, den) additive
    partials: completeness/pattern = (hits, rows); range = (violations,
    rows)."""
    bad = [c for c in checks if c["check"] not in _STREAMABLE]
    if bad:
        raise ValueError(f"not streamable (need cross-batch state): "
                         f"{[c['name'] for c in bad]}")
    aggs = []
    for spec in checks:
        kind, col = spec["check"], spec["col"]
        if kind == "completeness":
            num = F.count(col)
        elif kind == "pattern":
            num = F.sum(F.when(F.col(col).rlike(spec["regex"]), 1).otherwise(0))
        else:  # range
            lo, hi = spec["lo"], spec["hi"]
            num = F.sum(F.when(F.col(col).isNotNull()
                               & ((F.col(col) < lo) | (F.col(col) > hi)), 1).otherwise(0))
        aggs.append(F.coalesce(num, F.lit(0)).cast("long").alias(f"__n_{spec['name']}"))
        aggs.append(F.count(F.lit(1)).alias(f"__d_{spec['name']}"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(spec["name"]).alias("check_name"),
            F.col(f"__n_{spec['name']}").alias("num"),
            F.col(f"__d_{spec['name']}").alias("den"),
        )
        for spec in checks
    ])
    return one.select(F.explode(rows).alias("__c")).select("__c.*")


def finalize_checks(partials: DataFrame, checks: list[dict]) -> DataFrame:
    """Summed partials -> the batch suite's (check_name, metric,
    passed) contract."""
    summed = partials.groupBy("check_name").agg(
        F.sum("num").alias("num"), F.sum("den").alias("den"))
    spec_by = {c["name"]: c for c in checks}
    frac = F.col("num").cast("double") / F.col("den")
    out = []
    for name, spec in spec_by.items():
        base = summed.filter(F.col("check_name") == name)
        if spec["check"] == "range":
            out.append(base.select(
                "check_name", F.col("num").cast("double").alias("metric"),
                (F.col("num") == 0).alias("passed")))
        else:
            floor = float(spec.get("min_frac", 1.0))
            out.append(base.select(
                "check_name", F.round(frac, 6).alias("metric"),
                (frac >= floor).alias("passed")))
    res = out[0]
    for p in out[1:]:
        res = res.unionByName(p)
    return res


def stream_check_suite(
    stream: DataFrame,
    catalog,
    name: str,
    checks: list[dict],
    *,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold each micro-batch's check partials into the persisted
    ``name`` table (addition-merge keyed by check_name). Read the
    current verdicts with
    ``finalize_checks(catalog.table(name), checks)``. Same at-least-
    once caveat as ``stream_stats_to_catalog``."""
    def fold(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        part = check_partials(batch, checks)
        if catalog.exists(name):
            merged = (catalog.table(name).unionByName(part).groupBy("check_name")
                      .agg(F.sum("num").alias("num"), F.sum("den").alias("den")))
            catalog.overwrite_staged(merged, name)
        else:
            catalog.write(part, name)

    checkpoint = checkpoint or os.path.join(
        catalog.project_dir, name).rstrip("/") + ".__checks_checkpoint__"
    w = stream.writeStream.foreachBatch(fold).option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def score_label_counts_partial(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """(__s, np, nn) additive partials for one micro-batch — the AUC
    sufficient statistic (per-distinct-score positive/negative
    counts). Quantize/bucket continuous scores upstream when the score
    domain is unbounded (the ks-fold compromise)."""
    lab = F.col(label_col).cast("int")
    return (
        df.filter(F.col(score_col).isNotNull() & lab.isNotNull())
        .select(F.col(score_col).alias("__s"), lab.alias("__y"))
        .groupBy("__s")
        .agg(
            F.sum("__y").alias("np"),
            F.sum(1 - F.col("__y")).alias("nn"),
        )
    )


def stream_score_counts(
    stream: DataFrame,
    catalog,
    name: str,
    score_col: str,
    label_col: str,
    *,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Fold per-score labeled counts into the persisted ``name`` table
    (addition-merge keyed by __s, idempotent batch-id stamp); read the
    live model AUC with :func:`finalize_auc` — continuous scorer
    monitoring without rescanning scored history."""
    import os

    from clinpy_spark.streaming.fold import fold_partials, lineage_token

    checkpoint = checkpoint or os.path.join(
        catalog.project_dir, name).rstrip("/") + ".__auc_checkpoint__"

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        part = score_label_counts_partial(batch, score_col, label_col)
        fold_partials(catalog, name, part, batch_id,
                      keys=["__s"], counters=["np", "nn"],
                      run_id=lineage_token(checkpoint))
    w = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def finalize_auc(counts: DataFrame) -> DataFrame:
    """Exact ROC-AUC over the maintained (__s, np, nn) table —
    identical to the batch ``roc_auc`` over the same scored rows (twin
    test)."""
    from clinpy_spark.operators.classify import auc_from_score_counts

    return auc_from_score_counts(counts.select("__s", "np", "nn"))
