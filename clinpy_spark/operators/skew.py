"""Skew-resilient shuffle operators.

AQE's skew-join splitting (on in ``session.get_spark``) handles most
heavy-hitter cases at runtime; these helpers cover the rest — salting
for when a skewed equi-join can't be broadcast and AQE can't intervene
(streaming joins, deliberate partitioning), and two-phase distinct
aggregation, where a hot group key concentrates the whole distinct-set
build on one reducer.

Both are semantically transparent: results equal the unsalted versions
(oracle-checked in the driver registry via ``skew_salted_join`` /
``a2b_two_phase_distinct``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``num_salts``
    shuffle partitions.

    Left rows get a uniform salt in [0, num_salts); the right side is
    replicated once per salt value (explode of a constant-size array —
    right should be the smaller/less-skewed side). The join key becomes
    (keys..., salt), so a heavy-hitter key's rows land on num_salts
    reducers instead of one. Output columns = left ∪ right minus the
    duplicate keys, exactly like ``left.join(right, on, how)``.
    """
    if how not in {"inner", "left", "left_outer"}:
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_l = F.floor(F.rand(seed) * num_salts).cast("int")
    l = left.withColumn("__salt", salt_l)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>"))
    )
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def two_phase_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT x) per group without concentrating a hot group's
    distinct-set on one reducer.

    Phase 1 shuffles on (keys..., x) — a hot group fans out across
    reducers by x. Phase 2 counts the deduped rows per group, shuffling
    only one row per distinct value. Equivalent to
    ``groupBy(keys).agg(countDistinct(x))`` (nulls excluded, like SQL).
    """
    deduped = df.filter(F.col(distinct_col).isNotNull()).select(*keys, distinct_col).distinct()
    return deduped.groupBy(*keys).agg(F.count("*").alias(out_col))
