"""As-of (temporal nearest) join — an operator Spark has no built-in
for (the reference has no streaming/temporal surface at all; this is
part of the engine's event-time extension, SURVEY §2.7/§2.8).

For every left row, attach the right row nearest in time within the
same key: ``backward`` (greatest right-time <= left-time — SQL's
``ASOF LEFT JOIN`` in DuckDB/QuestDB), ``forward`` (smallest
right-time >= left-time) or ``nearest`` — matching pandas
``merge_asof`` directions.

Physical shape (the scalable one): tag both sides, union, ONE window
per direction partitioned by key ordered by (time, side-tag) carrying
the right side's values across with ``last(ignorenulls)``, then keep
left rows. A single shuffle on the key (both ``nearest`` sorts reuse
the same exchange) — no range join, no per-key driver loop, and skew
follows the key distribution exactly like any windowed op.
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
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """ASOF LEFT JOIN with pandas ``merge_asof`` direction semantics.

    right value columns (everything but key/time) are appended; the
    matched right time is appended as ``{right_time}{suffix}``. Left
    rows with no qualifying right row keep NULLs. ``tolerance`` (same
    units as the time columns' numeric/epoch representation — seconds
    for timestamps) voids matches farther than it. ``nearest`` breaks
    exact-distance ties backward.

    The backward direction is the semantics twin of DuckDB
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`` (oracle-checked
    in the driver registry and property-tested cross-engine). Ties on
    right_time within a key resolve arbitrarily — make
    (key, right_time) unique upstream for deterministic output, as with
    any asof implementation.
    """
    if direction not in {"backward", "forward", "nearest"}:
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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
    unioned = r.unionByName(l)

    # Right rows sort BEFORE left rows at equal time in the traversal
    # direction -> inclusive (<= / >=) match at ties.
    def _window(dir_: str):
        order = F.col("__t").asc() if dir_ == "backward" else F.col("__t").desc()
        return (
            Window.partitionBy(*keys)
            .orderBy(order, F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    def _fill(df: DataFrame, dir_: str, tag: str) -> DataFrame:
        w = _window(dir_)
        return df.select(
            "*",
            *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__{tag}_{c}") for c in vals],
            F.last("__rt", ignorenulls=True).over(w).alias(f"__{tag}_rt"),
        )

    def _age(rt_col: str):
        # signed distance in the direction's sense; always >= 0 when matched
        d = F.col("__t").cast("double") - F.col(rt_col).cast("double")
        return F.abs(d)

    if direction in {"backward", "forward"}:
        filled = _fill(unioned, direction, "f")
        out = filled.filter(F.col("__is_left") == 1)
        ok = F.col("__f_rt").isNotNull()
        if tolerance is not None:
            ok = ok & (_age("__f_rt") <= F.lit(tolerance))
        picked = {c: F.when(ok, F.col(f"__f_{c}")) for c in vals}
        picked_rt = F.when(ok, F.col("__f_rt"))
    else:  # nearest
        filled = _fill(_fill(unioned, "backward", "b"), "forward", "w")
        out = filled.filter(F.col("__is_left") == 1)
        b_ok = F.col("__b_rt").isNotNull()
        w_ok = F.col("__w_rt").isNotNull()
        if tolerance is not None:
            b_ok = b_ok & (_age("__b_rt") <= F.lit(tolerance))
            w_ok = w_ok & (_age("__w_rt") <= F.lit(tolerance))
        # ties (equal distance) resolve backward
        use_b = b_ok & (~w_ok | (_age("__b_rt") <= _age("__w_rt")))
        use_w = w_ok & ~use_b
        picked = {
            c: F.when(use_b, F.col(f"__b_{c}")).when(use_w, F.col(f"__w_{c}"))
            for c in vals
        }
        picked_rt = F.when(use_b, F.col("__b_rt")).when(use_w, F.col("__w_rt"))

    return out.select(
        *keys,
        left_time,
        *[c for c in left.columns if c not in set(keys) | {left_time}],
        *[picked[c].alias(c if c not in left.columns else f"{c}{suffix}") for c in vals],
        picked_rt.alias(rt_out),
    )
