"""Deterministic sampling and corpus mixing.

Training-data mixtures need REPRODUCIBLE sampling: the same (row, seed)
must make the same keep/drop decision on any cluster size, any
partitioning, any engine — Bernoulli ``sample()`` can't promise that,
and can't be audited by an external oracle. The decision here is a pure
hash: keep a row iff the first 8 hex chars of ``md5(key || ':' || seed)``
fall below the fraction's threshold. Fixed-length lowercase hex compares
lexicographically exactly as the underlying 32-bit integer, md5 is
identical in every engine, and the filter is a stateless column
expression — no shuffle, no RNG state, trivially resumable.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> threshold compared lexicographically against
    8 lowercase hex chars. fraction >= 1 returns "g", which every hex
    string sorts below (a 9-char "100000000" would NOT — '1' < 'f')."""
    v = max(0, min(_HEX_SPACE, round(fraction * _HEX_SPACE)))
    return "g" if v >= _HEX_SPACE else format(v, "08x")


def sample_hash(key: Column | str, seed: int = 42) -> Column:
    """The row's deterministic 8-hex-char sample coordinate."""
    key = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 8)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         seed: int = 42) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by hash — stable
    under repartitioning, restarts, and engine changes."""
    return df.filter(sample_hash(key_col, seed) < F.lit(_hex_threshold(fraction)))


def kfold_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    k: int = 5,
    seed: int = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = (md5 hash coordinate)
    mod k — the cross-validation face of :func:`split_corpus` (same
    auditable md5 coordinate, so the SQL oracle and any external
    auditor recompute identical folds; stable under repartitioning,
    restarts, and engine changes). Pure column expression: no shuffle,
    no state."""
    if k < 2:
        raise ValueError(f"kfold_assign needs k >= 2, got {k}")
    coord = F.conv(sample_hash(key_col, seed), 16, 10).cast("long")
    return df.withColumn(fold_col, (coord % k).cast("int"))


def split_corpus(
    df: DataFrame,
    splits: dict[str, float],
    *,
    key_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test ...)
    by partitioning the hash coordinate into cumulative ranges — the
    same (row, seed) always lands in the same split, splits are disjoint
    by construction, and membership is auditable by recomputing the
    hash. Fractions must sum to ~1 (within rounding)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    coord = sample_hash(key_col, seed)
    # Cumulative boundaries in EXACT arithmetic: float accumulation makes
    # 0.8 + 0.1 = 0.9000000000000001, whose threshold is one hash value
    # above _hex_threshold(0.9) — a doc landing exactly on the boundary
    # would disagree with an auditor (or the SQL oracle) recomputing the
    # threshold from the cumulative fraction directly.
    acc = Fraction(0)
    label = None
    names = list(splits)
    for name in names[:-1]:
        acc += Fraction(splits[name])
        v = max(0, min(_HEX_SPACE, round(acc * _HEX_SPACE)))
        thr = "g" if v >= _HEX_SPACE else format(v, "08x")
        cond = coord < F.lit(thr)
        label = F.when(cond, name) if label is None else label.when(cond, name)
    # Last split absorbs the remainder (no float-edge gap).
    label = F.lit(names[-1]) if label is None else label.otherwise(names[-1])
    return df.withColumn(split_col, label)


def sample_exact_n(
    df: DataFrame,
    n: int,
    *,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n`` rows per group (fewer when the group is smaller):
    rank rows by their hash coordinate within the group and keep the
    first ``n`` — a deterministic uniform without-replacement quota
    (fractions can't hit exact per-group counts). One window shuffle on
    the group key; ties impossible while keys are unique (hash + key
    tiebreak keeps it total anyway)."""
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(key_col, seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def sample_weighted_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    *,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n`` rows per group, drawn WITHOUT replacement with
    probability proportional to ``weight_col`` — Efraimidis & Spirakis
    2006 A-ES (public method): rank rows by ``u^(1/w)`` (equivalently
    ``ln(u)/w``, the monotone form used here) with ``u`` a per-row
    uniform, keep the top ``n``. The uniform is hash-derived
    (``(int(md5[:8]) + 1) / (2^32 + 1)``, never 0), so like every
    sampler in this module the draw is reproducible on any partitioning
    and auditable by an external engine recomputing the key — the
    distributed form of weighted reservoir sampling with ONE window
    shuffle on the group key and no RNG state. Weights must be > 0
    (rows with NULL/non-positive weight are dropped, matching the
    probability-zero limit)."""
    key = F.col(key_col)
    u = (F.conv(sample_hash(key_col, seed), 16, 10).cast("double") + 1.0) \
        / float(_HEX_SPACE + 1)
    score = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.desc("__aes"), key.asc())
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__aes", score)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk", "__aes")
    )


def temperature_quota(
    df: DataFrame,
    total_n: int,
    *,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-balanced mixture (the multilingual-pretraining
    α-sampling move: sample groups ∝ count^α, α<1 up-weights the tail):
    allocate a ``total_n`` budget across groups by weight
    ``floor(count^α)``, then keep each group's quota via the module's
    deterministic hash rank.

    α is restricted to {0.5, 1.0}: ``sqrt`` is correctly rounded in
    IEEE-754 (and ``floor(sqrt(c)) == isqrt(c)`` for any table-sized
    count), so with the otherwise-integer quota arithmetic
    ``min(c, floor((total·w + W−1)/W))`` both engines compute identical
    quotas bit-for-bit — a general ``pow`` is NOT correctly rounded and
    would make the draw engine-dependent. Quota table is tiny and
    broadcast; one window shuffle on the group key, same as
    :func:`sample_exact_n`."""
    if alpha not in (0.5, 1.0):
        raise NotImplementedError(
            "alpha must be 0.5 or 1.0: only sqrt/identity are correctly "
            "rounded, a general pow() is engine-dependent")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    wcol = F.floor(F.sqrt(F.col("__c"))) if alpha == 0.5 else F.col("__c")
    counts = counts.withColumn("__w", wcol.cast("long"))
    # Total weight via a global window over the per-group counts table —
    # |groups| rows by construction, so the single-partition window is
    # free and the plan avoids a scalar cross join (BNLJ) entirely.
    tw = F.sum("__w").over(Window.partitionBy())
    quotas = counts.withColumn("__tw", tw).withColumn(
        "__q",
        F.least(
            F.col("__c"),
            F.floor((F.lit(total_n) * F.col("__w") + F.col("__tw") - 1)
                    / F.col("__tw")).cast("long"),
        ),
    )
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(key_col, seed).asc(), F.col(key_col).asc()
    )
    return (
        df.join(F.broadcast(quotas.select(group_col, "__q")), group_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__q"))
        .drop("__rk", "__q")
    )


def resample_corpus(
    df: DataFrame,
    ratios: dict[str, float],
    *,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    default_ratio: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Up- OR down-sample each group to a target ratio (the full mixture
    move of a pre-training pipeline: wiki x2.5, web x0.3, ...).

    Ratio ``r`` emits ``floor(r)`` full copies of every row plus one
    extra copy kept iff the row's hash coordinate falls below
    ``frac(r)``'s threshold — expectation exactly ``r``, every decision
    a pure per-row hash (same coordinate as :func:`mix_corpus`), so the
    output is reproducible on any partitioning and auditable by
    recomputing the hash. Copies are distinguished by ``copy_col``
    (0-based). One stateless filter + bounded explode, no shuffle.
    """
    import math

    full = F.lit(int(math.floor(default_ratio)))
    thr: Column = F.lit(_hex_threshold(default_ratio - math.floor(default_ratio)))
    for grp, r in ratios.items():
        is_grp = F.col(group_col) == grp
        full = F.when(is_grp, int(math.floor(r))).otherwise(full)
        thr = F.when(is_grp, F.lit(_hex_threshold(r - math.floor(r)))).otherwise(thr)
    n_copies = full + F.when(sample_hash(key_col, seed) < thr, 1).otherwise(0)
    return (
        df.withColumn("__nc", n_copies)
        # Filter BEFORE the explode: sequence(0, -1) would generate a
        # DESCENDING [0, -1] range, not an empty one.
        .filter(F.col("__nc") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)))
        .drop("__nc")
    )


def mix_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Down-sample each group to its mixture fraction (the data-mixture
    step of a pre-training pipeline: e.g. keep all of wiki, 30% of web,
    5% of logs). Groups absent from ``fractions`` get
    ``default_fraction``. One stateless filter, no shuffle."""
    thr = F.lit(_hex_threshold(default_fraction))
    for grp, frac in fractions.items():
        thr = F.when(F.col(group_col) == grp, F.lit(_hex_threshold(frac))).otherwise(thr)
    return df.filter(sample_hash(key_col, seed) < thr)


# ---------------------------------------------------------------------------
# Poisson bootstrap (deterministic): resample-with-replacement replicates
# via per-(row, replicate) Poisson(1) multiplicities drawn from the same
# md5 hash coordinate as the samplers above — reproducible on any
# partitioning and recomputable by an external engine (the oracle
# re-derives every draw).
# ---------------------------------------------------------------------------


def poisson1_hex_thresholds(max_k: int = 7) -> list[str]:
    """Cumulative Poisson(1) CDF mapped onto the 8-hex-char sample
    space: a row's multiplicity in a replicate is the number of
    thresholds its hash coordinate is >= (0..max_k). Shared by the
    Spark expression and the DuckDB oracle so both engines draw
    IDENTICAL multiplicities."""
    import math

    cdf, out = 0.0, []
    for k in range(max_k):
        cdf += math.exp(-1.0) / math.factorial(k)
        out.append(format(min(_HEX_SPACE - 1, round(cdf * _HEX_SPACE)), "08x"))
    return out


def bootstrap_multiplicity(key: Column | str, rep: Column, seed: int = 42) -> Column:
    """Deterministic Poisson(1) draw for (row ``key``, replicate
    ``rep``): count of CDF thresholds at or below the row's md5
    coordinate."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":"), rep.cast("string"),
                       F.lit(f":{seed}"))), 1, 8)
    m = F.lit(0)
    for t in poisson1_hex_thresholds():
        m = m + F.when(h >= F.lit(t), 1).otherwise(0)
    return m


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_col: str = "doc_id",
    n_replicates: int = 200,
    seed: int = 42,
    alpha: float = 0.05,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean of
    ``value_col``: one row (n_replicates, point_mean, ci_lo, ci_hi).

    Each replicate reweights every row by an independent deterministic
    Poisson(1) multiplicity (the standard Poisson bootstrap, exact for
    large n); the replicate means' alpha/2 and 1-alpha/2 exact
    percentiles bound the CI. Scale shape: the R-way explode feeds a
    map-side partial aggregation, so the shuffle is partitions x R
    rows, never corpus x R; R is a constant (hundreds)."""
    reps = df.select(
        F.col(key_col).alias("__k"), F.col(value_col).alias("__v"),
        F.explode(F.sequence(F.lit(1), F.lit(n_replicates))).alias("__r"),
    ).withColumn("__m", bootstrap_multiplicity("__k", F.col("__r"), seed))
    means = reps.groupBy("__r").agg(
        (F.sum(F.col("__m") * F.col("__v")).cast("double") / F.sum("__m")).alias("__mean"))
    point = df.agg((F.sum(value_col).cast("double") / F.count("*")).alias("__pt"))
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    return (
        means.agg(
            F.count("*").cast("int").alias("n_replicates"),
            F.expr(f"percentile(__mean, {lo!r})").alias("__lo"),
            F.expr(f"percentile(__mean, {hi!r})").alias("__hi"),
        )
        .crossJoin(F.broadcast(point))
        .select(
            "n_replicates",
            F.round("__pt", 6).alias("point_mean"),
            F.round("__lo", 6).alias("ci_lo"),
            F.round("__hi", 6).alias("ci_hi"),
        )
    )


def shuffle_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row
    gets a (shard, pos) coordinate from the same engine-portable md5
    hash the samplers use — the reproducible replacement for
    ``orderBy(rand())`` that no two-engine audit can check and no
    resumed job can reproduce.

    shard = hash(key, seed) mod n_shards; pos = rank of the hash within
    the shard (ties by key). Reading shards 0..n-1 in pos order IS the
    permutation, identical on any cluster size, any partitioning, any
    engine. Scale shape: one hash projection + one window PARTITIONED
    BY shard (each shard sorts independently — no global sort, no
    single-partition window); writing with partitionBy(shard) makes the
    export one shuffle total."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"|shuf{seed}"))),
        1, 8), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: per stratum
    (stratum, n_pop, stddev, share, alloc_n) — before drawing a
    ``total_n``-row stratified sample (s13's executor), decide how
    many rows EACH stratum deserves: n_h proportional to N_h * S_h
    (big and volatile strata get more), which minimizes the variance
    of the stratified mean at fixed budget (Neyman 1934). The
    design-time planner sibling of ``lsh_plan``.

    S_h is the exact population stddev from one moment pass
    (sqrt(max(0, ssq/n - (s/n)^2))); integer allocations use floor +
    largest-remainder so they sum EXACTLY to total_n (remainder ties
    break on stratum for determinism). Constant strata (S_h = 0) get
    weight 0 — sampling them adds no variance information.

    Scale shape: one grouped moment aggregate over the corpus, then
    pure column math + one rank window over the |strata|-row table.
    """
    g = df.select(
        F.col(stratum_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__v").isNotNull()).groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    nn = F.col("n_pop").cast("double")
    var = F.greatest(
        F.lit(0.0),
        F.col("__ss") / nn - (F.col("__s") / nn) * (F.col("__s") / nn))
    w_all = Window.partitionBy()
    weighted = (
        g.withColumn("__w", nn * F.sqrt(var))
        .withColumn("__tw", F.sum("__w").over(w_all))
        .withColumn("__tn", F.sum("n_pop").over(w_all))
    )
    # Degenerate corpus (every stratum constant): Neyman weights all
    # vanish — fall back to proportional allocation so the budget is
    # still honored (the property test that found this folds it in).
    share = F.when(
        F.col("__tw") > 0, F.col("__w") / F.col("__tw")
    ).otherwise(
        F.col("n_pop").cast("double") / F.col("__tn"))
    raw = F.lit(int(total_n)) * share
    base = F.floor(raw)
    w_rem = Window.orderBy(
        (raw - base).desc(), F.col("__g").asc())
    out = (
        weighted
        .withColumn("__base", base)
        .withColumn("__short",
                    F.lit(int(total_n)) - F.sum(base).over(w_all))
        .withColumn("__rk", F.row_number().over(w_rem))
    )
    return out.select(
        F.col("__g").alias(stratum_col),
        "n_pop",
        F.round(F.sqrt(var), 6).alias("stddev"),
        F.round(share, 6).alias("share"),
        (F.col("__base")
         + F.when(F.col("__rk") <= F.col("__short"), 1).otherwise(0))
        .cast("long").alias("alloc_n"),
    )
