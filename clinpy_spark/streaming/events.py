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


# ---------------------------------------------------------------------------
# Custom stateful operators (applyInPandasWithState): semantics the built-in
# windows can't express — running per-key statistics and cross-batch dedup.
# State lives in the state store (checkpointed, partitioned by key); the
# pandas function only ever sees ONE key's rows, so state size per task is
# bounded and the operator scales with the number of executors.
# ---------------------------------------------------------------------------


def streaming_ewma(
    stream: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    value_col: str = "value",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of ``value_col``,
    emitting the updated (key, ewma, n_events) row once per micro-batch.

    The recurrence ewma' = alpha*v + (1-alpha)*ewma is order-dependent
    and unbounded-lookback — not expressible with windowed aggregation;
    this is the canonical applyInPandasWithState shape. Idle keys are
    GC'd via processing-time timeout after ``state_ttl_ms``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, ewma double, n_events long"
    state_schema = "ewma double, n long"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ewma, n = state.get if state.exists else (None, 0)
        # A group's rows arrive split across Arrow record batches with no
        # cross-chunk ordering guarantee (same hazard as streaming_funnel):
        # concatenate the whole group first, then sort ONCE by event time.
        # A per-chunk sort silently breaks the order-dependent recurrence
        # for any key whose batch rows span >1 Arrow chunk.
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = frames[0] if len(frames) == 1 else pd.concat(frames)
            for v in pdf.sort_values("ts")[value_col]:
                v = float(v)
                ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
                n += 1
        if ewma is None:
            return
        state.update((float(ewma), int(n)))
        state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({key_col: [key[0]], "ewma": [float(ewma)], "n_events": [int(n)]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "props",
    id_col: str = "event_id",
    ts_col: str = "ts",
    state_ttl_ms: int = 86_400_000,
) -> DataFrame:
    """Cross-batch exact dedup: emit each key the FIRST time it is ever
    seen, drop every later occurrence — the streaming twin of the batch
    ``operators.dedup.exact_dedup`` for a training-data ingest pipeline.

    Unlike ``dropDuplicates`` on a stream (whose state a watermark can
    only bound by event time), the TTL here bounds state by wall clock:
    a key re-appearing after ``state_ttl_ms`` of silence is treated as
    new again (at 100 TB/day the state store can't hold forever-keys).

    "First" within a micro-batch is the min-(``ts_col``, ``id_col``)
    event across ALL Arrow chunks of the group, so the reported id is
    deterministic regardless of chunk arrival order.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, first_{id_col} long"
    state_schema = "seen boolean"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        first_id = None
        if not already:
            best = None  # (ts, id) of the earliest event seen so far
            for pdf in pdfs:
                if not len(pdf):
                    continue
                idx = pdf.sort_values([ts_col, id_col]).index[0]
                cand = (pdf[ts_col][idx], int(pdf[id_col][idx]))
                if best is None or cand < best:
                    best = cand
            if best is not None:
                first_id = best[1]
        else:
            for _ in pdfs:  # drain the iterator; nothing to emit
                pass
        state.update((True,))
        state.setTimeoutDuration(state_ttl_ms)
        if first_id is not None:
            yield pd.DataFrame({key_col: [key[0]], f"first_{id_col}": [first_id]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


def streaming_correlate(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events
    for the same key that occur within ``[left.ts, left.ts + within]``.

    The time-bound condition + watermarks on BOTH sides are what make
    the join state finite: once the watermark passes a left event's
    upper bound, its buffered state is dropped (unbounded stream-stream
    joins would accumulate state forever). The classic click->view
    attribution shape."""
    l_ = left.withWatermark("ts", watermark).alias("l")
    r_ = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    return l_.join(r_, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def streaming_funnel(
    stream: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    state_ttl_ms: int = 86_400_000,
) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel``: per-user ordered
    step matching as CEP-style keyed state — state is (furthest step,
    its event time); an arriving event advances the state iff it is the
    next step's type and strictly later than the current step time.
    Emits (user, furthest_step, reached_ts) whenever a user advances.

    Matches the batch operator exactly when events are replayed in
    event-time order (the twin test); cross-batch OUT-OF-ORDER events
    cannot rewind an already-advanced state — that's the inherent
    streaming-funnel tradeoff, bound the disorder with a watermark
    upstream. State is two scalars per user, GC'd after
    ``state_ttl_ms`` idle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    user_type = stream.schema[user_col].dataType.simpleString()
    out_schema = f"{user_col} {user_type}, furthest_step integer, reached_ts double"
    state_schema = "step integer, last_ts double"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        step, last = state.get if state.exists else (0, 0.0)
        advanced = False
        # A group's rows arrive split across Arrow record batches with no
        # cross-chunk ordering guarantee: concatenate the whole group first,
        # then sort ONCE by event time (the per-chunk sort the operator
        # originally did silently broke event-time order for large groups).
        frames = [p for p in pdfs if len(p)]
        pdf = (
            pd.concat(frames).sort_values(ts_col)
            if frames
            else pd.DataFrame(columns=[ts_col, type_col])
        )
        for _, row in pdf.iterrows():
            if step >= len(steps):
                break
            ts = pd.Timestamp(row[ts_col]).timestamp()
            if row[type_col] == steps[step] and (step == 0 or ts > last):
                step += 1
                last = ts
                advanced = True
        state.update((int(step), float(last)))
        state.setTimeoutDuration(state_ttl_ms)
        if advanced:
            yield pd.DataFrame({
                user_col: [key[0]],
                "furthest_step": [int(step)],
                "reached_ts": [float(last)],
            })

    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


def streaming_transitions(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    state_ttl_ms: int = 86_400_000,
) -> DataFrame:
    """Streaming twin of the Markov transition matrix
    (queries.e_transition_matrix): per-user state carries the LAST seen
    event type across micro-batches, so the (prev -> next) pair at a
    batch boundary is never lost; each batch emits DELTA pair counts
    (event_type, next_type, n) for the user. Summing the deltas equals
    the batch lead-window pair counts on ordered replay (twin test).
    State is one string per user, TTL-GC'd."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_type string, next_type string, n long"
    state_schema = "last string"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        counts: dict = {}
        # Same cross-chunk ordering fix as streaming_funnel: concat the whole
        # group, sort once by event time, then walk.
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames).sort_values(ts_col)
            for t in pdf[type_col]:
                if last is not None:
                    counts[(last, t)] = counts.get((last, t), 0) + 1
                last = t
        if last is not None:
            state.update((last,))
            state.setTimeoutDuration(state_ttl_ms)
        if counts:
            yield pd.DataFrame({
                "event_type": [k[0] for k in counts],
                "next_type": [k[1] for k in counts],
                "n": list(counts.values()),
            })

    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
        )
    )
