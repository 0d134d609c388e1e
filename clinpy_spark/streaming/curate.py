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
from clinpy_spark.operators.dedup import explode_chunks


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


def streaming_passage_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    state_ttl_ms: int = 86_400_000,
) -> DataFrame:
    """Streaming twin of ``operators.dedup.passage_dedup``: corpus-global
    passage dedup where "first occurrence" means FIRST ARRIVAL across the
    stream's whole lifetime, not min-(id, pos) over a closed corpus.

    Emits one per-chunk decision row (__id, __pos, __chunk, __kept) per
    incoming passage; ``reassemble_passages`` (run inside foreachBatch —
    a document's chunks always share a micro-batch since they explode
    from one input row) turns a batch of decisions into the batch
    operator's (id, n_chunks, n_kept, clean_text) shape.

    State: one boolean per distinct chunk (applyInPandasWithState keyed
    on the chunk), TTL-bounded by processing time — a chunk silent for
    ``state_ttl_ms`` is forgotten and its next arrival counts as first
    again, the same bounded-state stance as ``streaming_first_seen``.
    Within a batch the keeper is the minimal (id, pos), matching the
    batch operator's tie-break."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    exploded = explode_chunks(stream, id_col, text_col, chunk_words)
    out_schema = "__id long, __pos integer, __chunk string, __kept boolean"
    state_schema = "seen boolean"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["__id", "__pos"], kind="mergesort"
        ).reset_index(drop=True)
        kept = np.zeros(len(pdf), dtype=bool)
        if not state.exists:
            kept[0] = True
        pdf["__kept"] = kept
        state.update((True,))
        state.setTimeoutDuration(state_ttl_ms)
        yield pdf[["__id", "__pos", "__chunk", "__kept"]]

    return exploded.groupBy("__chunk").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
    )


def streaming_curation_stats(stream: DataFrame, gates: list[tuple[str, Column]]) -> DataFrame:
    """Running per-gate drop counts (update/complete-mode aggregate).
    The duplicate gate is excluded by design: labeling a duplicate
    requires cross-row state that belongs to the dedup operator."""
    return (
        label_gates(stream, gates)
        .groupBy(F.coalesce(F.col(GATE_COL), F.lit("kept")).alias(GATE_COL))
        .agg(F.count("*").alias("n"))
    )
