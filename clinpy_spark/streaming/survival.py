"""Streaming twin of the survival operators (operators/survival.py):
a Kaplan-Meier curve continuously maintained as subjects' outcomes
stream in.

The KM estimator's sufficient statistic is the per-(group, time) table
of (events, censorings) — ADDITIVE counters, so each micro-batch folds
its own tiny aggregate into a persisted per-time grid at O(batch +
grid) per trigger (the same fold-partials shape as
streaming/quality.py's constraint suite and streaming/drift.py's PSI
monitor). The curve itself is recomputed from the folded grid on read
via :func:`clinpy_spark.operators.survival.km_from_per_time` — windows
over the bounded time grid, never over history.

Replay safety: foreachBatch is at-least-once, so the merge goes
through :func:`clinpy_spark.streaming.fold.fold_partials`, which
stamps the state table with the last folded batch id and skips
replayed batches — the fold is effectively-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from clinpy_spark.operators.survival import _per_time, km_from_per_time
from clinpy_spark.streaming.fold import fold_partials, lineage_token


def km_partials(
    batch: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """One micro-batch -> additive per-(group, time) partials
    (__g, __t, d, c)."""
    return _per_time(batch, time_col, event_col, group_col)


def stream_km_partials(
    stream: DataFrame,
    catalog,
    name: str,
    time_col: str,
    event_col: str,
    group_col: str,
    *,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold each micro-batch's KM partials into the persisted ``name``
    table (addition-merge keyed by (__g, __t)). Read the live curve
    with ``km_read(catalog.table(name), time_col, group_col)``."""
    checkpoint = checkpoint or os.path.join(
        catalog.project_dir, name).rstrip("/") + ".__km_checkpoint__"

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        part = km_partials(batch, time_col, event_col, group_col)
        fold_partials(catalog, name, part, batch_id,
                      keys=["__g", "__t"], counters=["d", "c"],
                      run_id=lineage_token(checkpoint))
    w = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def cox_leaver_partials(
    batch: DataFrame,
    time_col: str,
    event_col: str,
    x_cols: list[str],
) -> DataFrame:
    """One micro-batch -> additive per-(covariate-cell, time) leaver
    partials (__x1..__xd, __t, __r, __d) — the d-covariate Cox MLE's
    sufficient statistic (operators/survival.py
    cox_newton_multi_from_leavers)."""
    xs = [f"__x{i}" for i in range(1, len(x_cols) + 1)]
    keep = (F.col(time_col).isNotNull()
            & F.col(event_col).cast("int").isNotNull())
    for c in x_cols:
        keep = keep & F.col(c).isNotNull()
    return (
        batch.filter(keep)
        .select(
            F.col(time_col).alias("__t"),
            F.col(event_col).cast("int").alias("__e"),
            *[F.col(c).cast("double").alias(x)
              for c, x in zip(x_cols, xs)],
        )
        .groupBy(*xs, "__t")
        .agg(F.count(F.lit(1)).alias("__r"), F.sum("__e").alias("__d"))
    )


def stream_cox_partials(
    stream: DataFrame,
    catalog,
    name: str,
    time_col: str,
    event_col: str,
    x_cols: list[str],
    *,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold each micro-batch's Cox leaver partials into the persisted
    ``name`` table (addition-merge keyed by (cell, time), idempotent
    lineage-scoped stamp). Read the live adjusted hazard ratios with
    :func:`finalize_cox_multi` — continuously-monitored multi-covariate
    Cox without rescanning subject history."""
    from clinpy_spark.streaming.fold import fold_partials, lineage_token

    xs = [f"__x{i}" for i in range(1, len(x_cols) + 1)]
    checkpoint = checkpoint or os.path.join(
        catalog.project_dir, name).rstrip("/") + ".__cox_checkpoint__"

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        part = cox_leaver_partials(batch, time_col, event_col, x_cols)
        fold_partials(catalog, name, part, batch_id,
                      keys=[*xs, "__t"], counters=["__r", "__d"],
                      run_id=lineage_token(checkpoint))

    w = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def finalize_cox_multi(
    partials: DataFrame, d: int, iterations: int = 4
) -> DataFrame:
    """The current d-covariate Cox fit from the folded leaver grid —
    identical to the batch ``cox_newton_multi`` over everything folded
    so far (twin test); at-risk counts rebuild from the leaver totals
    on read."""
    from clinpy_spark.operators.survival import cox_newton_multi_from_leavers

    xs = [f"__x{i}" for i in range(1, d + 1)]
    return cox_newton_multi_from_leavers(
        partials.select(*xs, "__t", "__r", "__d"), d,
        iterations=iterations)


def km_read(
    partials: DataFrame,
    time_col: str,
    group_col: str,
) -> DataFrame:
    """The current KM curve from the folded per-time grid — identical
    to the batch ``km_curve`` over everything folded so far."""
    return km_from_per_time(partials, time_col, group_col)


def stream_finegray_partials(
    stream: DataFrame,
    catalog,
    name: str,
    time_col: str,
    status_col: str,
    group_col: str,
    *,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold each micro-batch's Fine-Gray leaver partials — per-(arm,
    time) counts of leavers / events of interest / competing events /
    censorings, all integer-additive — into the persisted ``name``
    table (addition-merge with the idempotent lineage-ledger stamp).
    Read the live competing-risks statistics with
    :func:`finalize_finegray_score` / :func:`finalize_finegray_beta`:
    the censoring KM and IPCW weights rebuild from the folded counters
    on read, never from subject history."""
    from clinpy_spark.operators.survival import finegray_leavers
    from clinpy_spark.streaming.fold import fold_partials, lineage_token

    checkpoint = checkpoint or os.path.join(
        catalog.project_dir, name).rstrip("/") + ".__fg_checkpoint__"

    def fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        part = finegray_leavers(batch, time_col, status_col, group_col)
        fold_partials(catalog, name, part, batch_id,
                      keys=["__x", "__t"],
                      counters=["__r", "__d1", "__d2", "__c"],
                      run_id=lineage_token(checkpoint))

    w = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def finalize_finegray_score(partials: DataFrame) -> DataFrame:
    """Fine-Gray score test over the maintained leaver table —
    identical to the batch ``finegray_score`` over the same subjects
    (twin test)."""
    from clinpy_spark.operators.survival import finegray_score_from_leavers

    return finegray_score_from_leavers(partials)


def finalize_finegray_beta(
    partials: DataFrame, iterations: int = 3,
) -> DataFrame:
    """Fine-Gray subdistribution-hazard MLE over the maintained leaver
    table — identical to the batch ``finegray_newton`` (twin test)."""
    from clinpy_spark.operators.survival import finegray_newton_from_leavers

    return finegray_newton_from_leavers(partials, iterations=iterations)
