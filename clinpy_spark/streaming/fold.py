"""Idempotent addition-merge for foreachBatch counter folds.

foreachBatch is AT-LEAST-ONCE: a batch replayed after a failure (before
its checkpoint offset commits) would double-add its counts into a
read-modify-overwrite state table. The fix (r10 advice) is the standard
one: stamp the state table with the id of the last folded batch —
foreachBatch ids are monotonically increasing per checkpoint and a
replay REUSES the failed id, so ``batch_id <= stamped`` identifies every
replay exactly and the merge becomes effectively-once.

The stamp rides as a constant ``__bid`` column on the state table (the
table is tiny by construction — a bin grid, a time grid, a quantized
value domain — so one long per row is noise); readers that select their
columns by name never see it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state-table column carrying the last-folded foreachBatch id.
BATCH_ID_COL = "__bid"


def fold_partials(
    catalog,
    name: str,
    part: DataFrame,
    batch_id: int,
    keys: list[str],
    counters: list[str],
) -> None:
    """Merge one micro-batch's additive ``part`` (keys + counter
    columns) into the persisted ``name`` table, summing ``counters``
    per ``keys`` — skipping the merge entirely when ``batch_id`` was
    already folded (replay after a pre-commit failure)."""
    if not catalog.exists(name):
        catalog.write(part.withColumn(BATCH_ID_COL, F.lit(batch_id)), name)
        return
    state = catalog.table(name)
    if BATCH_ID_COL in state.columns:
        last = state.agg(F.max(BATCH_ID_COL).alias("b")).collect()[0].b
        if last is not None and batch_id <= last:
            return  # replayed batch: already folded
        state = state.drop(BATCH_ID_COL)
    merged = (
        state.unionByName(part)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in counters])
        .withColumn(BATCH_ID_COL, F.lit(batch_id))
    )
    catalog.overwrite_staged(merged, name)
