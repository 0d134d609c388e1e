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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: "int | str" = "auto",
    how: str = "inner",
    seed: int = 42,
    hot_threshold: int = 100_000,
    key_stats: DataFrame | None = None,
    max_salts: int = 64,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across salted
    shuffle partitions; output equals ``left.join(right, on, how)``.

    ``num_salts="auto"`` (default; r7 verdict #5) probes the left side's
    key counts at plan-build time — the same runtime-stat pattern as
    ``banded_pair_join``'s hot-key probe — and salts ONLY keys hotter
    than ``hot_threshold``, each over ``ceil(count / hot_threshold)``
    salts (capped at ``max_salts``). Cold keys keep salt 0 and the right
    side replicates only for the hot keys, so when nothing is hot the
    result is the PLAIN join: zero replication, zero residual cost —
    unlike a static salt count, which replicates the whole build side
    N-fold whether or not a whale exists, and can still under-split a
    true whale. ``key_stats`` accepts a precomputed ``(on..., __n)``
    counts DataFrame (:func:`clinpy_spark.functions.intervals.key_count_stats`,
    cached or catalog-backed) to amortize the probe across builds.

    An integer ``num_salts`` keeps the legacy static behavior: every
    left row salted uniformly, the right side exploded num_salts times.
    """
    if how not in {"inner", "left", "left_outer"}:
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if isinstance(num_salts, int):
        salt_l = F.floor(F.rand(seed) * num_salts).cast("int")
        l = left.withColumn("__salt", salt_l)
        r = right.withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>")),
        )
        return l.join(r, on + ["__salt"], how).drop("__salt")
    if num_salts != "auto":
        raise ValueError(f"num_salts must be an int or 'auto', got {num_salts!r}")

    stats = key_stats if key_stats is not None else (
        left.groupBy(*on).agg(F.count("*").alias("__n"))
    )
    hot = stats.filter(F.col("__n") > hot_threshold).select(
        *on,
        F.least(
            F.lit(max_salts),
            F.ceil(F.col("__n") / F.lit(hot_threshold)),
        ).cast("int").alias("__nsalt"),
    )
    # Hot keys are few by definition (each holds >hot_threshold rows),
    # so the marker set broadcasts; collecting just its size here is a
    # bounded action — the probe cost banded_pair_join already pays.
    if not hot.limit(1).take(1):
        return left.join(right, on, how)  # nothing hot: the plain plan
    hot = F.broadcast(hot)
    l = (
        left.join(hot, on, "left")
        .withColumn(
            "__salt",
            F.when(F.col("__nsalt").isNull(), F.lit(0)).otherwise(
                F.floor(F.rand(seed) * F.col("__nsalt")).cast("int")),
        )
        .drop("__nsalt")
    )
    r = (
        right.join(hot, on, "left")
        .withColumn(
            "__salt",
            F.explode(F.sequence(
                F.lit(0), F.coalesce(F.col("__nsalt"), F.lit(1)) - 1)),
        )
        .drop("__nsalt")
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


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


def bloom_pruned_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    width: int = 65_536,
    depth: int = 3,
) -> DataFrame:
    """Equi-join with an explicit Bloom semi-join pushdown: build a
    ``depth x width`` bit table from the RIGHT side's (small,
    pre-filtered) join keys, probe the LEFT side's keys against the
    broadcast bits BEFORE the shuffle, then join the survivors. Output
    equals ``left.join(right, on, how)`` for inner/left-semi shapes —
    false positives only pass extra rows into the join, which then
    drops them, so the pushdown is TRANSPARENT (oracled as such).

    Why at 100 TB: a selective dim-side predicate leaves a key set far
    smaller than the fact table; shuffling the whole fact side to
    discover that is the single biggest avoidable cost in a star join.
    The bit table is <= width*depth bits broadcast once (the same
    mergeable structure as sketch.py's decontamination filter); the
    probe is a map-side filter, so the shuffle carries only rows whose
    keys plausibly match. Spark's own runtime row-level bloom needs
    AQE to decide late — this operator makes the decision explicit and
    plan-stable for pipelines that KNOW their dim side is selective.
    """
    if how not in {"inner", "left_semi"}:
        raise ValueError(f"bloom pruning is transparent only for inner/left_semi, got {how!r}")
    from clinpy_spark.operators.sketch import bloom_bits, portable_hash32

    keys = (right.select(F.col(on).cast("string").alias("__k"))
            .filter(F.col("__k").isNotNull()).distinct())
    bits = bloom_bits(keys, col="__k", n_bits=width, k=depth)
    # k broadcast LEFT-SEMI joins, one per hash function: all map-side
    # (no shuffle of the probe side, no groupBy) — a row survives iff
    # every one of its k bit positions is set.
    pruned = left
    key_str = F.col(on).cast("string")
    for j in range(depth):
        bcol = f"__bloom_b{j}"
        pruned = pruned.withColumn(bcol, portable_hash32(key_str, f"#{j}") % width)
        pruned = pruned.join(
            F.broadcast(bits.withColumnRenamed("bit", bcol)), bcol, "left_semi")
    pruned = pruned.drop(*[f"__bloom_b{j}" for j in range(depth)])
    return pruned.join(right, on, how)


def two_phase_topk(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    tie_col: str,
    num_salts: int = 16,
    descending: bool = True,
) -> DataFrame:
    """Top-``k`` rows per group without concentrating a hot group on one
    reducer: phase 1 ranks within (keys..., salt) partitions — a whale
    group's rows spread over ``num_salts`` reducers and each keeps only
    its local top-k — phase 2 ranks the <= num_salts * k survivors per
    group. Output equals the plain single-window top-k (the
    transparency contract the oracle checks); ``tie_col`` must make the
    ordering total or neither form is deterministic.

    This is the missing member of the skew family next to salted_join
    and two_phase_count_distinct: a plain
    ``row_number() OVER (PARTITION BY keys ORDER BY ...)`` sorts the
    ENTIRE hot group in one task at 100 TB; here no task ever sees more
    than its salt-shard of the group."""
    oc = F.desc(order_col) if descending else F.asc(order_col)
    order = [oc, F.asc(tie_col)]
    salt = (F.xxhash64(F.col(tie_col)) % num_salts).cast("int")
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .drop("__salt")
    )
