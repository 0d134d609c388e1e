"""Structured Streaming twins of the batch event-time operators.

The reference is batch-only (SURVEY.md §2.7); these are the engine's
scale extension: the same window expressions as
``clinpy_spark.operators.windows`` over ``readStream`` with watermarks
for late data. At production scale the source would be Kafka/files; the
transformations are source-agnostic DataFrame ops, so tests drive them
with a file source + ``trigger(availableNow=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_event_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """File-based event stream with the canonical schema (streaming
    scans must declare schemas — no inference mid-stream)."""
    return spark.readStream.format(fmt).schema(EVENT_SCHEMA).load(path)


def streaming_tumbling_counts(
    stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time counts with a late-data watermark. Append-mode
    sinks emit a window once the watermark passes its end."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("win"), *(keys or []))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("win.start").alias("ws"), *(keys or []), "n", "sum_value")
    )


def streaming_session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user via the built-in ``session_window`` —
    the streaming analogue of ``operators.windows.sessionize`` (state
    merging, late events, and watermark GC handled by Spark)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id", "n_events",
        )
    )
