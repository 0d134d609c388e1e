"""Fixed-size probabilistic summaries: count-min sketch (frequency) and
Bloom filter (membership) over token/shingle streams, both built on the
repo's portable md5 hashing so a DuckDB oracle recomputes them EXACTLY.

Cormode & Muthukrishnan 2005 (public method): ``depth`` hash rows ×
``width`` buckets of counters; each item increments one bucket per row;
a lookup reads the MINIMUM of its ``depth`` buckets. Estimates only
ever OVER-count (one-sided error ≤ ε·N with ε = e/width at the usual
depth = ln(1/δ) setting) — the sketch never misses a heavy hitter.

Spark-first shape:

- **Build is one explode + one groupBy** on (row, bucket) — map-side
  combined, shuffle keyed by a key space of exactly ``depth × width``
  cells regardless of corpus size. At 100 TB the sketch table is the
  same few thousand rows it is at 1 GB; THAT is the point — the exact
  ``vocab_topk`` groupBy shuffles the full vocabulary, the sketch
  shuffles a constant.
- **Merge is addition** (``cms_merge``): sketches of two corpora with
  the same (width, depth, seed) sum bucket-wise — per-partition /
  per-day sketches combine associatively, the property every
  production sketch pipeline leans on (tested).
- **Hashing is the repo's portable md5 construction** (see
  oracle-parity usage across minhash/simhash): bucket =
  int(md5(token ⊕ row)[:8 hex]) mod width, identical arithmetic in
  Spark (``conv``) and DuckDB (hex-digit strpos sum), so the ORACLE
  RECOMPUTES THE ENTIRE SKETCH EXACTLY — unlike the HLL gate
  (a15_hll_sketch), the driver hash-checks every counter and every
  estimate bit-for-bit (``text_cms_topk``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clinpy_spark.functions.text import norm_tokens


def portable_hash32(col: Column | str, salt: str) -> Column:
    """First 8 md5 hex digits of ``value || salt`` as a non-negative
    long (< 2^32). DuckDB twin: the strpos-weighted digit sum used by
    every portable-hash oracle in queries.py."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(F.concat(c, F.lit(salt))), 1, 8), 16, 10) \
        .cast("long")


def cms_bucket(col: Column | str, row: int, width: int) -> Column:
    """Bucket of ``col`` in hash row ``row``."""
    return portable_hash32(col, f"|{row}") % width


def count_min(
    df: DataFrame,
    col: str = "t",
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Build the sketch from an item column -> (row, bucket, cnt).

    Missing cells are zero by omission (lookups treat absent joins as
    0); the materialized table is ≤ depth×width rows."""
    buckets = F.array(*[cms_bucket(col, d, width) for d in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum sketches built with identical (width, depth, seed): counters
    add bucket-wise, so per-shard sketches combine associatively."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    items: DataFrame,
    col: str = "t",
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Estimate each item's count: min over its ``depth`` buckets.

    ``items`` is the (small) candidate table — the sketch side is a
    broadcastable depth×width table, so the lookup is a broadcast join,
    no shuffle of the candidates."""
    probes = items.select(
        F.col(col),
        F.posexplode(
            F.array(*[cms_bucket(col, d, width) for d in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_cnt"))
    )


def refresh_cms(
    catalog,
    name: str,
    batch: DataFrame,
    col: str = "t",
    width: int = 256,
    depth: int = 3,
) -> None:
    """Fold one appended batch into a PERSISTED count-min sketch — the
    sketch-shaped twin of ``incremental.refresh_stats``: sketch only the
    batch (small), ``cms_merge`` with the ≤depth×width-row state, swap.
    Cost per refresh is O(|batch| + depth·width), independent of how
    much corpus the sketch already summarizes — at 100 TB the state
    read is a constant few thousand rows, which is the entire reason to
    keep a sketch instead of exact per-token counts."""
    parts = count_min(batch, col, width, depth)
    if catalog.exists(name):
        merged = cms_merge(catalog.table(name), parts)
        catalog.overwrite_staged(merged, name)
    else:
        catalog.write(parts, name)


def bloom_bits(
    items: DataFrame,
    col: str = "s",
    n_bits: int = 65_536,
    k: int = 4,
) -> DataFrame:
    """Bloom filter of an item set -> its set-bit table ``(bit,)``.

    Bit positions are the portable md5 hashes (salt ``#j`` per hash
    function), so the filter is engine-recomputable. The table is at
    most ``min(n_bits, k·|items|)`` rows — for a benchmark/blocklist
    side this is kilobytes and broadcastable, which is the point: the
    corpus side probes it without shuffling its own shingles anywhere."""
    pos = F.array(*[portable_hash32(col, f"#{j}") % n_bits for j in range(k)])
    return (
        items.select(F.explode(pos).alias("bit")).distinct()
    )


def bloom_probe(
    pairs: DataFrame,
    key_cols: list[str],
    col: str,
    bits: DataFrame,
    n_bits: int = 65_536,
    k: int = 4,
    assume_distinct: bool = False,
) -> DataFrame:
    """Membership probe: one row per DISTINCT (``key_cols`` + ``col``)
    group with ``bloom_maybe`` — true iff ALL ``k`` bit positions are
    set (Bloom semantics: no false negatives, false positives at the
    classic (1-e^{-kn/m})^k rate). The probe is ``k`` BROADCAST left
    joins, one per hash function — zero explode, no regroup. The only
    shuffle is the ``distinct`` that upholds the one-row-per-group
    contract (callers counting hits would otherwise double-count
    duplicate probe rows); pass ``assume_distinct=True`` when the input
    is already distinct on (key_cols, col) to skip it and make the
    probe fully shuffle-free."""
    out = pairs.select(*key_cols, col)
    if not assume_distinct:
        out = out.distinct()
    for j in range(k):
        bcol = f"__bp{j}"
        marked = bits.select(F.col("bit").alias(bcol),
                             F.lit(True).alias(f"__in{j}"))
        out = (out.withColumn(bcol, portable_hash32(col, f"#{j}") % n_bits)
               .join(F.broadcast(marked), bcol, "left"))
    maybe = F.lit(True)
    for j in range(k):
        maybe = maybe & F.col(f"__in{j}").isNotNull()
    return out.select(*key_cols, col, maybe.alias("bloom_maybe"))


def cms_token_topk(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 10,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Heavy hitters with sketch-estimated counts: the exact top-``k``
    tokens (deterministic (count desc, token) order) annotated with the
    CMS estimate — (token, exact_cnt, cms_cnt, overestimates). At scale
    the exact side runs on a sample or a candidate stream while the
    sketch summarizes the full corpus; here both run on the corpus so
    the one-sided-error property (cms_cnt >= exact_cnt, always) is
    checkable row by row."""
    tok = docs.select(F.explode(norm_tokens(text_col)).alias("t"))
    exact = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("t"))
        .limit(k)
    )
    sketch = count_min(tok, "t", width, depth)
    est = cms_lookup(sketch, exact, "t", width, depth)
    return (
        exact.join(est, "t")
        .select(
            F.col("t").alias("token"),
            "exact_cnt",
            "cms_cnt",
            (F.col("cms_cnt") >= F.col("exact_cnt")).alias("overestimates"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Beyer et al. 2007, "On
# Synopses for Distinct-Value Estimation Under Multiset Operations".
# The k smallest hash values of a set determine (a) a distinct-count
# estimate (k-1)/h_(k) and (b) set-operation estimates by merging
# sketches. Built on the portable md5 coordinate, so the sketch AND
# every estimate are deterministic and EXACTLY recomputable by the
# DuckDB oracle (hash-checked, not gated).
# ---------------------------------------------------------------------------

_KMV_SPACE = float(1 << 32)


def kmv_sketch(
    df: DataFrame,
    col: str,
    group_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: (group, hashes array<long> of the k
    smallest distinct 32-bit md5 coordinates). One distinct + one rank
    window per group — the sort spills, the result is k longs per group
    no matter the corpus (the mergeable summary a 100 TB pipeline
    ships between stages)."""
    from pyspark.sql import Window

    h = (
        df.select(F.col(group_col).alias("__g"), F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .distinct()
        .withColumn("__h", portable_hash32("__v", f"|{seed}"))
        # distinct VALUES can collide in 32 bits; the sketch is a set of
        # hash values, so dedup the coordinates before ranking
        .select("__g", "__h").distinct()
    )
    w = Window.partitionBy("__g").orderBy(F.asc("__h"))
    return (
        h.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .groupBy(F.col("__g").alias(group_col))
        .agg(F.sort_array(F.collect_list("__h")).alias("hashes"))
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """(group, n_distinct_est): (k-1) / normalized k-th smallest hash;
    a group with fewer than k distinct values is EXACT (its sketch is
    the whole hash set)."""
    n = F.size("hashes")
    kth = F.element_at("hashes", k).cast("double") / F.lit(_KMV_SPACE)
    est = F.when(n < k, n.cast("double")).otherwise((F.lit(k - 1)) / kth)
    cols = [c for c in sketch.columns if c != "hashes"]
    return sketch.select(*cols, est.alias("n_distinct_est"))


def kmv_union_jaccard(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Merge two single-group sketches -> one row (union_est,
    jaccard_est, intersect_est): the merged sketch is the k smallest of
    the hash union; jaccard_est = |merged ∩ A ∩ B| / |merged| (Beyer's
    K-statistic), intersect_est = jaccard_est * union_est. Every step
    is deterministic array math on two k-length arrays."""
    # limit(1) enforces the single-group contract structurally: the
    # cross join's both sides are provably constant-row in the physical
    # plan (shape-level audit, tools/explain_audit.py), and a caller
    # accidentally passing a multi-group sketch can't silently blow up
    # the pair space.
    a = sketch_a.select(F.col("hashes").alias("__ha")).limit(1)
    b = sketch_b.select(F.col("hashes").alias("__hb")).limit(1)
    merged = F.slice(F.array_sort(F.array_union("__ha", "__hb")), 1, k)
    both = F.array_intersect("__ha", "__hb")
    kk = F.size(merged)
    kth = F.element_at(merged, kk).cast("double") / F.lit(_KMV_SPACE)
    # exact when the merged sketch holds the whole union
    union_est = F.when(kk < k, kk.cast("double")).otherwise(F.lit(k - 1) / kth)
    inter_in_merged = F.size(F.array_intersect(merged, both))
    jac = inter_in_merged.cast("double") / kk
    return (
        a.crossJoin(b)
        .select(
            F.round(union_est, 4).alias("union_est"),
            F.round(jac, 6).alias("jaccard_est"),
            F.round(jac * union_est, 4).alias("intersect_est"),
        )
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Merge two per-group KMV sketch tables: per group, the k smallest
    of the hash union (groups present in only one side pass through).
    Pure array math on two k-length arrays — the mergeability that lets
    per-shard / per-day sketches combine associatively."""
    ga = a.select(F.col(group_col), F.col("hashes").alias("__ha"))
    gb = b.select(F.col(group_col), F.col("hashes").alias("__hb"))
    return (
        ga.join(gb, group_col, "full_outer")
        .select(
            group_col,
            F.slice(
                F.array_sort(F.array_union(
                    F.coalesce("__ha", F.array().cast("array<long>")),
                    F.coalesce("__hb", F.array().cast("array<long>")),
                )), 1, k,
            ).alias("hashes"),
        )
    )


def refresh_kmv(
    catalog,
    name: str,
    batch: DataFrame,
    col: str,
    group_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> None:
    """Fold one appended batch into a PERSISTED per-group KMV sketch —
    the distinct-count twin of ``refresh_cms``: sketch only the batch,
    merge with the k-longs-per-group state, swap. Cost per refresh is
    O(|batch| + groups*k) no matter how much corpus the sketch already
    summarizes; ``kmv_distinct_estimate`` reads the result directly."""
    parts = kmv_sketch(batch, col, group_col, k, seed)
    if catalog.exists(name):
        merged = kmv_merge(catalog.table(name), parts, group_col, k)
        catalog.overwrite_staged(merged, name)
    else:
        catalog.write(parts, name)


def heavy_hitters(
    df: DataFrame,
    col: Column | str,
    phi: float = 0.001,
) -> DataFrame:
    """EXACT frequent-items above a frequency threshold via the
    Misra-Gries candidate + exact-recount pattern: (item, n, frac) for
    every item occurring in > ``phi`` fraction of rows — the
    heavy-hitter audit (dominant tokens, hot join keys, template
    boilerplate) whose naive form is just a group-count, but whose
    SCALE form must not shuffle the full item domain.

    Pass 1 runs a Misra-Gries summary with k = ceil(1/phi) counters
    INSIDE each partition (Arrow-batched, no shuffle): MG guarantees
    any item with partition frequency > n_p/k survives its partition's
    summary, so the union of per-partition candidates is a SUPERSET of
    every global phi-heavy item (Misra-Gries 1982; the standard
    mergeable-summaries argument, Agarwal 2013). Pass 2 exact-counts
    ONLY the candidates (broadcast semi join — the candidate set is at
    most k per partition) and filters n > phi * N. Output is therefore
    EXACT — identical to the full group-count — while the shuffle
    carries candidate rows only.

    At 100 TB with phi = 1e-4: <= 10k candidates per partition, one
    broadcast of the deduped candidate list, one filtered group-count;
    the unbounded token domain never shuffles.
    """
    import math as _math

    import pandas as pd

    k = max(2, int(_math.ceil(1.0 / phi)))
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.cast("string").alias("__v")).filter(
        F.col("__v").isNotNull())

    def mg(batches):
        # Mergeable form (Agarwal et al. 2013): each Arrow batch's
        # exact value_counts merges into the summary; pruning back to
        # k-1 counters subtracts the k-th largest count from the kept
        # ones (equivalent to a run of MG decrements). Python touches
        # DISTINCT items per batch, never rows.
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, cnt in pdf["__v"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k - 1:
                cuts = sorted(counters.values(), reverse=True)
                thresh = cuts[k - 1]
                counters = {it: ct - thresh
                            for it, ct in counters.items()
                            if ct - thresh > 0}
        yield pd.DataFrame({"__v": list(counters.keys())})

    cands = (
        vals.mapInPandas(mg, "`__v` string")
        .distinct()
        .localCheckpoint(eager=False)
    )
    total = vals.agg(F.count(F.lit(1)).alias("__n"))
    counted = (
        vals.join(F.broadcast(cands), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.lit(float(phi)) * F.col("__n"))
        .select(
            F.col("__v").alias("item"),
            "n",
            F.round(F.col("n") / F.col("__n"), 6).alias("frac"),
        )
    )
