"""MERGE-INTO / slowly-changing-dimension emulation on plain Parquet.

Plain Parquet has no UPDATE/MERGE (SURVEY §4.2 S11); Delta would supply
one. These are the engine-level emulations — pure transforms suitable
for read-transform-overwrite (small dims) or staged rewrite (large
ones): upsert = anti-join + union (one shuffle on the keys), SCD2 =
close current versions + append new ones, with history preserved.
The samples upsert (`assays/project.py::annotate_sample`) is the
point-update special case of the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: source rows replace key-matching target rows,
    unmatched source rows are inserted, unmatched target rows survive.

    Equivalent SQL: ``target WHERE NOT EXISTS (source by key) UNION ALL
    source`` — oracle-checked in the driver registry. Columns must be
    union-compatible by name.
    """
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 SCD: apply a batch of updates (key cols + attribute cols +
    ``ts_col`` = change time) to a versioned dimension.

    Matching keys' current rows are closed at the key's EARLIEST update
    time (``current_col`` = false); the update batch itself is chained
    per key (window by key ordered by ``ts_col``): each update's
    ``end_col`` is the next update's change time, and only the latest
    is the open current version — so a batch with several updates for
    one key yields exactly one ``is_current`` row and a contiguous
    version history. Untouched keys pass through unchanged. One shuffle
    on the keys.
    """
    from pyspark.sql import Window

    upd_times = updates.groupBy(*keys).agg(F.min(ts_col).alias("__new_from"))

    closed = (
        dim.join(upd_times, keys, "left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_col) & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_col,
            F.when(F.col("__new_from").isNotNull(), F.lit(False)).otherwise(F.col(current_col)),
        )
        .drop("__new_from")
    )
    w = Window.partitionBy(*keys).orderBy(ts_col)
    opened = (
        updates.withColumn(
            end_col, F.lead(ts_col).over(w).cast(dim.schema[end_col].dataType)
        )
        .withColumn(current_col, F.col(end_col).isNull())
    )
    return closed.unionByName(opened)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    ef_col: str = "effective_from",
    et_col: str = "effective_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time dimension resolution: each fact row joined to the
    dimension version valid at its timestamp
    (``ef_col <= fact_ts < et_col``; an open current version carries
    et = +inf / null).

    Physical shape: this is an interval join, but per-key version counts
    are small and versions per key partition the timeline — so the right
    plan is the plain EQUI-join on the keys followed by the range
    filter (fan-out bounded by versions-per-key, exactly-one match by
    construction), NOT the binned interval join: binning pays an explode
    for skew that a versioned dimension cannot have. One shuffle on the
    keys, or zero against an fk-bucketed dimension.

    Outer flavors cannot be a post-join filter (a left-join fact whose
    key matches but whose ts precedes every version would be dropped,
    and right/full would never emit dim-only rows) — they are built as
    inner + anti-join null-padding of the unmatched side(s), the same
    construction ``binned_interval_join`` uses.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"scd2_lookup: unsupported how={how!r}")
    ef = F.col(ef_col)
    et = F.coalesce(F.col(et_col), F.lit((1 << 63) - 1))
    cond = (ef <= F.col(fact_ts)) & (F.col(fact_ts) < et)
    inner = facts.join(dim, keys, "inner").filter(cond)
    if how == "inner":
        return inner

    import functools
    import operator

    fcols = [c for c in facts.columns if c not in keys]
    dcols = [c for c in dim.columns if c not in keys]
    # Full join condition (equi keys + validity range) for the anti-joins:
    # a fact row is "matched" iff some version is valid at its timestamp.
    full_cond = functools.reduce(
        operator.and_, [facts[k] == dim[k] for k in keys]
    ) & (dim[ef_col] <= facts[fact_ts]) & (
        facts[fact_ts] < F.coalesce(dim[et_col], F.lit((1 << 63) - 1))
    )
    parts = [inner]
    if how in ("left", "full"):
        pad_d = [F.lit(None).cast(dim.schema[c].dataType).alias(c) for c in dcols]
        parts.append(facts.join(dim, full_cond, "left_anti").select(*keys, *fcols, *pad_d))
    if how in ("right", "full"):
        pad_f = [F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fcols]
        parts.append(dim.join(facts, full_cond, "left_anti").select(*keys, *pad_f, *dcols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Row-level change-data feed between two table snapshots:
    (keys..., change, changed_cols) with change in
    {'insert', 'delete', 'update'} and changed_cols the sorted array of
    non-key columns whose values differ (null-safe comparison) — the
    diff a CDC downstream consumes when the upstream can't emit one.

    One full-outer join on the key (the only shuffle); every column
    comparison is a null-safe equality expression, no row serialization.
    Unchanged rows are dropped. Both snapshots must share a schema."""
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff requires identical schemas")
    val_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in val_cols],
        F.lit(True).alias("__o_present"))
    nw = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in val_cols],
        F.lit(True).alias("__n_present"))
    cond = None
    for k in keys:
        # eqNullSafe so a NULL key component matches itself across snapshots
        # (plain == would emit a spurious delete+insert pair); presence is
        # tracked by literal markers, not key nullability.
        e = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = e if cond is None else cond & e
    j = o.join(nw, cond, "full_outer")
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    diffs = F.array_sort(F.filter(
        F.array(*[
            F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c))
            for c in val_cols
        ]),
        lambda x: x.isNotNull(),
    ))
    change = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(in_new & ~in_old, F.lit("insert"))
        .when(F.size(diffs) > 0, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k) for k in keys],
            "change",
            F.when(F.col("change") == "update", diffs)
            .otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        )
    )
