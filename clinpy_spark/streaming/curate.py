"""Streaming twin of the curation pipeline (operators/curate.py).

A training-data firehose (crawl output, log tail) curates with the SAME
gate expressions as the batch pass — ``label_gates`` without ``dedup_on``
is a stateless when-chain, legal in any streaming plan — while the
duplicate gate becomes streaming-native state:
``dropDuplicatesWithinWatermark`` on the fingerprint, so first-seen wins
and per-key state is garbage-collected once the watermark passes (bounded
state; an unbounded exact-dedup state would OOM a 100 TB stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clinpy_spark.operators.curate import GATE_COL, label_gates


def streaming_curate(
    stream: DataFrame,
    gates: list[tuple[str, Column]],
    *,
    dedup_on: Column | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Rows surviving every gate; with ``dedup_on``, only the first
    arrival per fingerprint within the watermark horizon survives.
    Append-mode friendly (stateless filter + watermark dedup)."""
    kept = (
        label_gates(stream, gates)
        .filter(F.col(GATE_COL).isNull())
        .drop(GATE_COL)
    )
    if dedup_on is not None:
        kept = (
            kept.withColumn("__fp", dedup_on)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__fp"])
            .drop("__fp")
        )
    return kept


def streaming_curation_stats(stream: DataFrame, gates: list[tuple[str, Column]]) -> DataFrame:
    """Running per-gate drop counts (update/complete-mode aggregate).
    The duplicate gate is excluded by design: labeling a duplicate
    requires cross-row state that belongs to the dedup operator."""
    return (
        label_gates(stream, gates)
        .groupBy(F.coalesce(F.col(GATE_COL), F.lit("kept")).alias(GATE_COL))
        .agg(F.count("*").alias("n"))
    )
