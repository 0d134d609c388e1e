"""As-of (nearest-preceding) join — an operator Spark has no built-in
for (the reference has no streaming/temporal surface at all; this is
part of the engine's event-time extension, SURVEY §2.7/§2.8).

For every left row, attach the right row with the greatest right-time
<= left-time within the same key (optionally within a tolerance) —
SQL's ``ASOF LEFT JOIN`` (DuckDB/QuestDB) / pandas ``merge_asof``.

Physical shape (the scalable one): tag both sides, union, ONE window
partitioned by key ordered by (time, side-tag) carrying the right
side's values forward with ``last(ignorenulls)``, then keep left rows.
A single shuffle on the key — no range join, no per-key driver loop,
and skew follows the key distribution exactly like any windowed op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_time: str,
    right_time: str | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """ASOF LEFT JOIN: latest right row per left row with
    ``right_time <= left_time`` on matching keys.

    right value columns (everything but key/time) are appended; the
    matched right time is appended as ``{right_time}{suffix}``. Left
    rows with no preceding right row keep NULLs. ``tolerance`` (same
    units as the time columns' numeric/epoch representation — pass
    seconds for timestamps) voids matches older than
    ``left_time - tolerance``.

    Semantics twin of DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND
    l.t >= r.t`` (oracle-checked in the driver registry) and pandas
    ``merge_asof(direction="backward")``. Ties on right_time within a
    key resolve to the LAST row in (right_time) order — make
    (key, right_time) unique upstream for deterministic output, as with
    any asof implementation.
    """
    keys = [key] if isinstance(key, str) else list(key)
    right_time = right_time or left_time
    vals = [c for c in right.columns if c not in set(keys) | {right_time}]
    rt_out = f"{right_time}{suffix}"

    l = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in set(keys) | {left_time}],
        F.col(left_time),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in vals],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(keys) | {left_time}],
        F.lit(None).cast(left.schema[left_time].dataType).alias(left_time),
        *[F.col(c).alias(f"__r_{c}") for c in vals],
        F.col(right_time).alias("__rt"),
    )

    # Right rows sort BEFORE left rows at equal time -> inclusive (<=).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = r.unionByName(l).select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in vals],
        F.last("__rt", ignorenulls=True).over(w).alias("__f_rt"),
    )

    out = filled.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        fresh = (
            F.col("__t").cast("double") - F.col("__f_rt").cast("double")
        ) <= F.lit(tolerance)
        out = out.select(
            "*",
            *[F.when(fresh, F.col(f"__f_{c}")).alias(f"__k_{c}") for c in vals],
            F.when(fresh, F.col("__f_rt")).alias("__k_rt"),
        )
        pick = lambda c: f"__k_{c}"  # noqa: E731
        rt_col = "__k_rt"
    else:
        pick = lambda c: f"__f_{c}"  # noqa: E731
        rt_col = "__f_rt"

    return out.select(
        *keys,
        left_time,
        *[c for c in left.columns if c not in set(keys) | {left_time}],
        *[F.col(pick(c)).alias(c if c not in left.columns else f"{c}{suffix}") for c in vals],
        F.col(rt_col).alias(rt_out),
    )
