"""Genome-coordinate operators composed from the engine's join
primitives.

``nearest_feature`` is the pyranges ``.nearest`` analogue the reference
leaves to pyranges objects (junction.py:176-185 returns pyranges for
exactly this kind of downstream use): for each query interval, the
closest feature on the same partition keys (chrom/strand), distance 0
when overlapping. The standard distributed decomposition: overlapping
candidates via the binned interval join, the closest non-overlapping
neighbor on each side via one backward and one forward as-of join on
the sorted boundaries — three shuffle-joins total, no cross join, then
a per-query rank-1 cut. Every stage is an existing audited operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinpy_spark.functions.intervals import binned_interval_join
from clinpy_spark.operators.asof import asof_join


def nearest_feature(
    query: DataFrame,
    features: DataFrame,
    *,
    query_id: str = "id",
    keys: list[str] | None = None,
    q_start: str = "start",
    q_end: str = "end",
    f_start: str = "start",
    f_end: str = "end",
    feature_id: str = "id",
    max_distance: int | None = None,
    bin_size: int = 100_000,
) -> DataFrame:
    """-> (query columns..., f_id, distance): the nearest feature per
    query interval (ties break on feature id). Queries with no feature
    within ``max_distance`` (or none at all on their keys) are absent
    from the output, like pyranges ``nearest(overlap=True)`` semantics.
    """
    keys = keys if keys is not None else ["chrom"]
    q = query.select(F.col(query_id).alias("q_id"), *keys,
                     F.col(q_start).alias("q_start"), F.col(q_end).alias("q_end"))
    feats = features.select(*keys, F.col(feature_id).alias("f_id"),
                            F.col(f_start).alias("f_start"), F.col(f_end).alias("f_end"))

    cand_cols = ["q_id", *keys, "q_start", "q_end", "f_id", "f_start", "f_end"]

    # 1. Overlapping features: distance 0 (binned equi-join, large-large safe).
    ov = binned_interval_join(
        q, feats, left_start="q_start", left_end="q_end",
        right_start="f_start", right_end="f_end",
        partition_keys=[(k, k) for k in keys], bin_size=bin_size,
    ).select(*[q[c] if c in ("q_id", "q_start", "q_end", *keys) else F.col(c)
               for c in cand_cols])

    # 2./3. Closest neighbor strictly left (max f_end <= q_start) and
    # strictly right (min f_start >= q_end) via as-of joins.  The as-of
    # join surfaces ONE right row per (key, time); with two features
    # sharing a boundary it would pick one arbitrarily and the final
    # rank-1 cut could never recover the min-f_id candidate.  Equidistant
    # same-side neighbors necessarily share that boundary (distance is a
    # function of f_end resp. f_start alone), so reducing the feature
    # side to min(f_id) per boundary first makes the documented
    # ties-break-on-f_id contract deterministic.
    left_feats = feats.groupBy(*keys, "f_end").agg(
        F.min("f_id").alias("f_id"), F.min_by("f_start", "f_id").alias("f_start"))
    right_feats = feats.groupBy(*keys, "f_start").agg(
        F.min("f_id").alias("f_id"), F.min_by("f_end", "f_id").alias("f_end"))
    left_n = asof_join(
        q, left_feats.select(*keys, "f_end", "f_id", "f_start"),
        key=keys, left_time="q_start", right_time="f_end", direction="backward",
    ).filter(F.col("f_id").isNotNull()).withColumn("f_end", F.col("f_end_right")).select(*cand_cols)
    right_n = asof_join(
        q, right_feats.select(*keys, "f_start", "f_id", "f_end"),
        key=keys, left_time="q_end", right_time="f_start", direction="forward",
    ).filter(F.col("f_id").isNotNull()).withColumn("f_start", F.col("f_start_right")).select(*cand_cols)

    cands = ov.unionByName(left_n).unionByName(right_n)
    dist = F.greatest(
        F.lit(0).cast("long"),
        (F.col("f_start") - F.col("q_end")).cast("long"),
        (F.col("q_start") - F.col("f_end")).cast("long"),
    )
    out = cands.withColumn("distance", dist)
    if max_distance is not None:
        out = out.filter(F.col("distance") <= max_distance)
    w = Window.partitionBy("q_id").orderBy(F.asc("distance"), F.asc("f_id"))
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col("q_id").alias(query_id), *keys,
                F.col("q_start").alias(q_start), F.col("q_end").alias(q_end),
                "f_id", "distance")
    )


def knearest_features(
    query: DataFrame,
    features: DataFrame,
    *,
    k: int = 3,
    max_distance: int,
    query_id: str = "id",
    keys: list[str] | None = None,
    q_start: str = "start",
    q_end: str = "end",
    f_start: str = "start",
    f_end: str = "end",
    feature_id: str = "id",
    bin_size: int = 100_000,
) -> DataFrame:
    """k nearest features per query interval WITHIN ``max_distance``:
    (query id/keys/start/end, f_id, distance, rank) — the k-ary
    extension of ``nearest_feature`` (annotate a breakpoint with its 3
    closest genes, not just the winner). ``max_distance`` is REQUIRED:
    it is what keeps the candidate set bounded — an unbounded k-NN
    over intervals degenerates to sorting every feature per query.

    Candidates come from ONE binned interval join of the query
    intervals EXPANDED by max_distance against the feature set (any
    feature within the radius overlaps the expanded interval, so the
    equi-join on bins is lossless); distance is the usual gap (0 for
    true overlap), then a per-query rank window keeps the k closest
    (ties break on feature id — deterministic, oracle-replayable).

    Scale shape: the expanded binned join fans out each query to
    ~(len + 2*max_distance)/bin_size bins — the same large-large-safe
    shape as every interval join here; the rank window partitions by
    query id over radius-bounded candidate lists.
    """
    keys = keys if keys is not None else ["chrom"]
    q = query.select(
        F.col(query_id).alias("q_id"), *keys,
        F.col(q_start).alias("q_start"), F.col(q_end).alias("q_end"),
        (F.col(q_start) - F.lit(int(max_distance))).alias("__xs"),
        (F.col(q_end) + F.lit(int(max_distance))).alias("__xe"),
    )
    feats = features.select(
        *keys, F.col(feature_id).alias("f_id"),
        F.col(f_start).alias("f_start"), F.col(f_end).alias("f_end"))
    cands = binned_interval_join(
        q, feats, left_start="__xs", left_end="__xe",
        right_start="f_start", right_end="f_end",
        partition_keys=[(kk, kk) for kk in keys], bin_size=bin_size,
    ).select(
        q["q_id"], *[q[kk] for kk in keys], q["q_start"], q["q_end"],
        "f_id", "f_start", "f_end",
    )
    dist = F.greatest(
        F.lit(0).cast("long"),
        (F.col("f_start") - F.col("q_end")).cast("long"),
        (F.col("q_start") - F.col("f_end")).cast("long"),
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("distance"), F.asc("f_id"))
    return (
        cands.withColumn("distance", dist)
        .filter(F.col("distance") <= F.lit(int(max_distance)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(query_id), *keys,
            F.col("q_start").alias(q_start), F.col("q_end").alias(q_end),
            "f_id", "distance", "rank",
        )
    )
