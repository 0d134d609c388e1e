"""Deduplication operators over a text corpus.

Reference analogues: exact dedup = DISTINCT-on-natural-key + anti-join
(rna_functions.py:65-90, snp_functions.py:239-262); near-dup extends the
reference's overlap-fraction scoring idea (utils.py:7-25) to text via
MinHash/LSH and SimHash.

Scale design: every step is a DataFrame op. MinHash signatures are
computed with built-in hash functions inside codegen (xxhash64 with a
per-permutation salt — no Python in the hot path); LSH banding turns the
O(n^2) pair space into an equi-join on (band, band_hash) buckets, which
shuffles by bucket key and scales linearly with candidate pairs. The
exact-Jaccard verify runs only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinpy_spark.functions.text import (
    fingerprint,
    hashed_shingles_from,
    shingles,
    token_hashes,
)
from clinpy_spark.session import ensure_min_parallelism


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized text (min id wins is NOT
    guaranteed — use ``dropDuplicates`` semantics like reference A4)."""
    return df.withColumn("__fp", fingerprint(text_col)).dropDuplicates(["__fp"]).drop("__fp")


def exact_dedup_stats(df: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-group corpus size vs distinct-fingerprint count."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(fingerprint(text_col)).alias("n_unique"),
        )
    )


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> DataFrame:
    """Corpus-global passage dedup with document reconstruction (the
    C4/RefinedWeb move: drop every repeated passage, keep its FIRST
    occurrence corpus-wide, and stitch the surviving passages back into
    each document).

    Returns (id, n_chunks, n_kept, clean_text). Documents split into
    fixed ``chunk_words``-word passages; a passage's first occurrence is
    the minimal (doc id, position). One explode + one window shuffle on
    the passage value + one reassembly agg on the doc id — no pairwise
    anything; at 100 TB the window key should be a hash of the passage
    (join-width, not semantics).
    """
    exploded = explode_chunks(df, id_col, text_col, chunk_words)
    from pyspark.sql import Window

    w = Window.partitionBy("__chunk").orderBy(F.asc("__id"), F.asc("__pos"))
    flagged = exploded.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__kept", F.col("__rk") == 1
    )
    return reassemble_passages(flagged, id_col)


def explode_chunks(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   chunk_words: int = 10) -> DataFrame:
    """Documents -> one row per fixed-width passage: (__id, __pos,
    __chunk). Shared by the batch and streaming passage dedup."""
    from clinpy_spark.functions.text import norm_tokens

    toks = norm_tokens(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * chunk_words + 1, chunk_words)),
    )
    arr = df.select(F.col(id_col).alias("__id"), chunks.alias("__chunks"))
    if not df.isStreaming:
        # Materialize the per-doc chunk arrays BEFORE the explode:
        # Generate over the interpreted tokenize/slice HOF re-evaluates
        # its subexpressions per OUTPUT chunk row (no codegen
        # subexpression elimination under a generator — the same
        # pathology ppjoin_pairs/minhash hit; A/B-measured 0.91s vs
        # 0.07s for the explode alone at sf0.1, full passage_dedup
        # 1.46s -> 0.70s). Streams pass through unbarriered:
        # localCheckpoint is a batch-only API and a micro-batch's
        # explode volume is bounded by the trigger.
        arr = arr.localCheckpoint(eager=False)
    return arr.select("__id", F.posexplode("__chunks").alias("__pos", "__chunk"))


def reassemble_passages(flagged: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(__id, __pos, __chunk, __kept) decisions -> the passage_dedup
    output shape (id, n_chunks, n_kept, clean_text): surviving chunks
    stitched back in position order. Plain batch aggregation — in a
    streaming pipeline run it inside ``foreachBatch`` (a document's
    chunks always share a micro-batch: they explode from one row)."""
    kept = F.when(F.col("__kept"), F.struct(F.col("__pos"), F.col("__chunk")))
    return (
        flagged.groupBy("__id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(kept).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["__chunk"]),
            ).alias("clean_text"),
        )
        .withColumnRenamed("__id", id_col)
    )


def minhash_signature(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      num_hashes: int = 64, shingle_n: int = 3,
                      portable: bool = False) -> DataFrame:
    """MinHash signature as array<long> of length ``num_hashes``.

    Permutation i is simulated by xxhash64(shingle, salt=i); the
    signature element is the min over the document's distinct shingles.

    ``portable=True`` swaps both primitives for md5-derived twins a
    DuckDB oracle can recompute exactly: shingle identity is the STRING
    word n-gram (same construction as :func:`ngram_jaccard_pairs`'s
    oracle) and permutation i hashes ``md5(shingle || '|' || i)``'s
    first 15 hex digits to a 60-bit value. The aggregate shape — the
    operator under test — is identical; only the hash family differs.

    Physical shape (fast path): tokens are hashed once and shingle
    identity is a hash of n consecutive token hashes
    (``hashed_shingles`` — string shingle construction is ~6x slower);
    the per-doc distinct-shingle arrays then cross the Arrow boundary
    ONCE and a numpy pass computes all ``num_hashes`` seeded hashes +
    per-doc minima, BIT-IDENTICAL to the previous
    explode + 64-min-column JVM aggregate (verified value-for-value on
    all fixtures): Spark evaluates ``xxhash64(h, lit(i))`` as
    ``XXH64.hashInt(i, seed=XXH64.hashLong(h, seed=42))``, so the
    inner hash is computed once per shingle and the 64 outer hashes
    are five u64 ops each over a per-seed constant. The JVM aggregate
    spent ~2.3s warm at sf0.1 updating 64 min buffer slots per
    exploded row; the vectorized pass is ~0.3s for the same 260k x 64
    hash grid, and the heavy shingle hashing stays in codegen'd JVM
    expressions. Per-task state is one numpy constant table (guide
    §4.5); only (id, array<long>) columns cross the boundary.

    Do NOT "optimize" this into a per-row
    ``array_min(transform(sh, s -> xxhash64(s, i)))``: measured ~9x
    SLOWER (higher-order functions are interpreted), and the Python
    lambda API silently drops the extra ``F.lit(i)`` argument to
    ``xxhash64`` — every salt hashes identically, collapsing the
    signature (the SQL-parsed lambda form is correct but still
    interpreted-slow).
    """
    if portable:
        # Same one-Arrow-pass shape as the fast path below (guide §4.2):
        # raw text crosses the boundary once; shingle construction
        # (functions/text.py py_shingle_set — the pinned Python twin of
        # array_distinct(shingles(...))) AND the vectorized-md5 pass
        # (functions/md5np.py — pinned bit-identical to hashlib/DuckDB
        # md5) both run in the same Arrow batch. The replaced JVM plan
        # paid 64 x (md5 + substring + conv) expression evaluations per
        # EXPLODED shingle row plus a 64-min-slot aggregate buffer
        # update per row (the r13 batch-11 fix), and after that fix
        # still ~0.7s/corpus pass of interpreted-HOF string-shingle
        # construction (the r13 "not yet optimized" floor). The md5
        # hash family itself is the contract (DuckDB recomputes it)
        # and is unchanged; only where the strings are BUILT moves.
        arrs = ensure_min_parallelism(df).select(
            F.col(id_col), F.col(text_col).alias("__txt"))
        id_type = arrs.schema[id_col].dataType.simpleString()
        nh = num_hashes
        sh_n = shingle_n

        def _sig_md5(batches):
            import numpy as np
            import pandas as pd

            from clinpy_spark.functions.md5np import (
                hex_prefix_value, md5_of_bytes_matrix, strings_to_matrix)
            from clinpy_spark.functions.text import py_shingle_set

            sfxw = len(f"|{nh - 1}")
            # Cap the dense (rows x max_len) md5 workspace (ADVICE r13:
            # a single long unbroken string — a doc with < n tokens
            # yields its whole text as ONE shingle — would otherwise
            # inflate max_len for the entire batch): flush doc-aligned
            # chunks past ~48 MB, so a pathological doc only pays for
            # its own chunk.
            budget = 48 << 20

            def run_chunk(ids, encs, counts_list):
                flat = [b for doc in encs for b in doc]
                counts = np.asarray(counts_list, dtype=np.int64)
                data, lengths = strings_to_matrix(flat, encode=False)
                starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                n = len(flat)
                rows = np.arange(n)
                # one byte-matrix workspace reused across seeds: seed i
                # appends "|i" after each shingle's own bytes (suffix
                # length is non-decreasing in i, so stale suffix bytes
                # are always re-overwritten and the padding region
                # beyond each row's length stays zero)
                buf = np.zeros((n, data.shape[1] + sfxw), dtype=np.uint8)
                buf[:, :data.shape[1]] = data
                sig = np.empty((len(ids), nh), dtype=np.int64)
                for i in range(nh):
                    sfx = f"|{i}".encode()
                    for j, byte in enumerate(sfx):
                        buf[rows, lengths + j] = byte
                    v = hex_prefix_value(
                        md5_of_bytes_matrix(buf, lengths + len(sfx)), 15)
                    # Spark's MIN over long is signed; hex15 values are
                    # < 2^60 so plain int64 minima match exactly
                    sig[:, i] = np.minimum.reduceat(v, starts)
                return pd.DataFrame({id_col: ids, "minhash": list(sig)})

            for pdf in batches:
                ids_c: list = []
                encs_c: list = []
                counts_c: list = []
                rows_c, maxlen_c = 0, 1
                for did, txt in zip(pdf[id_col], pdf["__txt"]):
                    if txt is None:
                        continue  # null text -> dropped (JVM parity)
                    enc = [s.encode("utf-8")
                           for s in py_shingle_set(txt, sh_n)]
                    dmax = max(len(b) for b in enc)
                    if rows_c and (rows_c + len(enc)) * max(maxlen_c, dmax) > budget:
                        yield run_chunk(ids_c, encs_c, counts_c)
                        ids_c, encs_c, counts_c = [], [], []
                        rows_c, maxlen_c = 0, 1
                    ids_c.append(did)
                    encs_c.append(enc)
                    counts_c.append(len(enc))
                    rows_c += len(enc)
                    maxlen_c = max(maxlen_c, dmax)
                if ids_c:
                    yield run_chunk(ids_c, encs_c, counts_c)

        return arrs.mapInPandas(
            _sig_md5, schema=f"{id_col} {id_type}, minhash array<long>")
    else:
        arrs = ensure_min_parallelism(df).select(
            F.col(id_col), token_hashes(text_col).alias("__th")
        ).select(
            F.col(id_col),
            F.array_distinct(hashed_shingles_from("__th", shingle_n)).alias("__sa"),
        )
        id_type = arrs.schema[id_col].dataType.simpleString()
        nh = num_hashes

        def _sig(batches):
            import numpy as np
            import pandas as pd

            u64 = np.uint64
            P1 = u64(0x9E3779B185EBCA87)
            P2 = u64(0xC2B2AE3D27D4EB4F)
            P3 = u64(0x165667B19E3779F9)
            P4 = u64(0x85EBCA77C2B2AE63)
            P5 = u64(0x27D4EB2F165667C5)

            def rotl(x, r):
                r = u64(r)
                return (x << r) | (x >> (u64(64) - r))

            def fmix(a):
                a = a ^ (a >> u64(33))
                a = a * P2
                a = a ^ (a >> u64(29))
                a = a * P3
                return a ^ (a >> u64(32))

            # per-seed constant of XXH64.hashInt(i, seed): (i & 0xffffffff) * P1
            ci = (np.arange(nh, dtype=np.uint64) & u64(0xFFFFFFFF)) * P1
            old = np.seterr(over="ignore")
            try:
                for pdf in batches:
                    lists = pdf["__sa"]
                    counts = np.fromiter((len(a) for a in lists), dtype=np.int64,
                                         count=len(lists))
                    keep = counts > 0
                    if not keep.any():
                        continue
                    vals = (np.concatenate([np.asarray(a, dtype=np.int64)
                                            for a in lists[keep]])
                            .view(np.uint64))
                    starts = np.concatenate(
                        ([0], np.cumsum(counts[keep])[:-1]))
                    # inner = XXH64.hashLong(shingle, seed=42), seed-free of i
                    acc = u64(42) + P5 + u64(8)
                    k1 = rotl(vals * P2, 31) * P1
                    base = fmix(rotl(acc ^ k1, 27) * P1 + P4) + P5 + u64(4)
                    sig = np.empty((int(keep.sum()), nh), dtype=np.int64)
                    for i in range(nh):
                        h = fmix(rotl(base ^ ci[i], 23) * P2 + P3)
                        # Spark MIN over long compares SIGNED
                        sig[:, i] = np.minimum.reduceat(
                            h.view(np.int64), starts)
                    yield pd.DataFrame({
                        id_col: pdf[id_col][keep],
                        "minhash": list(sig),
                    })
            finally:
                np.seterr(**old)

        return arrs.mapInPandas(
            _sig, schema=f"{id_col} {id_type}, minhash array<long>")


def band_keys(sigs: DataFrame, id_col: str, num_hashes: int, bands: int,
              portable: bool = False) -> DataFrame:
    """(id, band, band_hash) LSH bucket keys from a minhash signature
    table — one row per (document, band), band_hash = hash of that
    band's signature slice. The banding used by both the all-at-once
    near-dup pass and the persisted index. ``portable=True`` hashes the
    slice with md5 (DuckDB twin) instead of xxhash64."""
    rows_per_band = num_hashes // bands

    def _bh(b: int):
        cat = F.concat_ws(",", *[
            F.element_at("minhash", b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ])
        return F.md5(cat) if portable else F.xxhash64(cat)

    arr = sigs.select(
        F.col(id_col),
        F.array(*[
            F.struct(F.lit(b).alias("band"), _bh(b).alias("band_hash"))
            for b in range(bands)
        ]).alias("__bks"),
    )
    if not sigs.isStreaming:
        # Materialize the per-doc band-key array BEFORE the explode:
        # the generator otherwise inlines the whole ``bands``-branch
        # array (each branch a concat_ws over rows_per_band element_at
        # calls plus a hash) and re-evaluates it per OUTPUT row — the
        # standing Generate-over-big-expression pathology, here a
        # ``bands``x blowup of the band hashing (A/B-measured banded
        # stage 6.7s -> 2.6s at sf0.1 under load, band keys proven
        # identical).
        arr = arr.localCheckpoint(eager=False)
    return arr.select(id_col, F.explode("__bks").alias("bk")).select(
        id_col, "bk.band", "bk.band_hash")


def build_minhash_index(
    catalog,
    df: DataFrame,
    name: str = "minhash_index",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> None:
    """Persist the corpus side of near-dup detection: ``{name}_sigs``
    (id, minhash) and ``{name}_buckets`` (id, band, band_hash)
    partitioned by band. A NEW batch then dedups against the whole
    corpus touching only its own colliding buckets — the signature and
    banding cost for the existing corpus is paid once, not per batch
    (the incremental-ingest analogue of the reference's anti-join
    new-entity guard, rna_functions.py:65-90, for fuzzy identity)."""
    sigs = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    # Materialize once: buckets derive from the same signature pass.
    sigs = sigs.localCheckpoint(eager=False)
    catalog.write(sigs, f"{name}_sigs")
    catalog.write(band_keys(sigs, id_col, num_hashes, bands),
                  f"{name}_buckets", partition_by=["band"])


def minhash_dedup_against_index(
    catalog,
    new_docs: DataFrame,
    name: str = "minhash_index",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicates of a new batch AGAINST the persisted corpus index:
    (new_id, corpus_id, est_jaccard >= threshold).

    The batch's band keys equi-join the bucket table (partition-pruned
    by band); candidates are verified with the SIGNATURE-estimated
    Jaccard (fraction of agreeing minhash positions — the standard
    unbiased estimator; exact verification would need the corpus text,
    which the index deliberately doesn't carry). Batch-side work scales
    with the batch, corpus-side with colliding buckets only.

    REQUIRES disjoint id spaces: batch ids must not collide with corpus
    ids. ``new_id == corpus_id`` pairs are dropped as self-matches
    (otherwise probing the indexed corpus with itself reports every doc
    as its own duplicate); the flip side is that a new document which
    legitimately REUSES a corpus doc_id can never be reported as a
    near-duplicate of that corpus doc. Callers with overlapping id
    spaces must remap batch ids (e.g. prefix/offset) before calling."""
    new_sigs = minhash_signature(new_docs, id_col, text_col, num_hashes, shingle_n) \
        .localCheckpoint(eager=False)
    new_bands = band_keys(new_sigs, id_col, num_hashes, bands)

    # band is the bucket table's PARTITION column and reads back last —
    # rename by name, never positionally.
    buckets = catalog.table(f"{name}_buckets") \
        .withColumnRenamed(id_col, "corpus_id") \
        .select("corpus_id", "band", "band_hash")
    cands = (
        new_bands.toDF("new_id", "band", "band_hash")
        .join(buckets, ["band", "band_hash"])
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    corpus_sigs = catalog.table(f"{name}_sigs").toDF("corpus_id", "corpus_sig")
    est = F.aggregate(
        F.zip_with("minhash", "corpus_sig",
                   lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x,
    ) / F.lit(num_hashes)
    return (
        cands.join(new_sigs.toDF("new_id", "minhash"), "new_id")
        .join(corpus_sigs, "corpus_id")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("new_id", "corpus_id", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding + exact-Jaccard
    verification on candidates only.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    threshold. Pair space is bounded by bucket collisions, not n^2.

    ``portable=True`` runs the identical signature -> banding -> verify
    pipeline on md5-derived hashes and string shingles so a DuckDB
    oracle can recompute every stage (the oracled driver query); the
    xxhash64 default stays the fast path.
    """
    df = ensure_min_parallelism(df)
    sigs = minhash_signature(df, id_col, text_col, num_hashes, shingle_n,
                             portable=portable)

    banded = band_keys(sigs, id_col, num_hashes, bands, portable=portable)
    # Materialize the banded table once: it feeds BOTH legs of the
    # bucket self-join below, and Spark does not share common subplans —
    # without the barrier the whole signature + banding pipeline
    # executed twice inside the candidate job (measured ~1.3s of the
    # headline dedup_minhash_lsh at sf0.1). One (id, band, hash) row
    # per document band, so the pinned block stays corpus-row-bounded.
    # Guarded like the sibling barriers (ADVICE r13): checkpoint is a
    # batch-only API, and a streaming source should fail at the join
    # below (the real unsupported operation), not here.
    if not banded.isStreaming:
        banded = banded.localCheckpoint(eager=False)

    left = banded.toDF("id_a", "band", "band_hash")
    right = banded.toDF("id_b", "band", "band_hash")
    candidates = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        # Materialized once at first action (lazy checkpoint): the verify
        # step references candidates twice (pair list + the semi-join
        # below), and without this the whole signature+banding subtree
        # would execute twice. Candidate pairs are tiny next to the
        # corpus, so checkpointing them is cheap at any scale.
        .localCheckpoint(eager=False)
    )

    # Exact Jaccard on candidates, over hashed shingle SETS (identical
    # value to string-shingle Jaccard modulo 64-bit collisions, and skips
    # rebuilding shingle strings for both join legs). Tokenize ONLY the
    # documents that appear in a candidate pair (semi-join first): LSH
    # prunes the corpus, so the verify pass must not re-scan all of it.
    # No distinct: left_semi is insensitive to duplicate build-side keys,
    # so deduping here would only add a shuffle.
    cand_ids = candidates.select(F.col("id_a").alias(id_col)).union(
        candidates.select(F.col("id_b").alias(id_col))
    )
    if portable:
        # String shingle sets: bit-identical to the DuckDB oracle's
        # word n-gram construction (no 64-bit hash collisions at all).
        sh_col = F.array_distinct(shingles(text_col, shingle_n))
        sh = (
            df.join(cand_ids, id_col, "left_semi")
            .select(F.col(id_col), sh_col.alias("sh"))
            .localCheckpoint(eager=False)
        )
    else:
        sh = (
            df.join(cand_ids, id_col, "left_semi")
            .select(F.col(id_col), token_hashes(text_col).alias("__th"))
            .select(
                F.col(id_col), F.array_distinct(hashed_shingles_from("__th", shingle_n)).alias("sh")
            )
            # Referenced as both join legs (sh_a / sh_b) — materialize once.
            .localCheckpoint(eager=False)
        )
    verified = (
        candidates.join(sh.toDF("id_a", "sh_a"), "id_a")
        .join(sh.toDF("id_b", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.5,
                        block_col: str | None = None,
                        allow_all_pairs: bool = False) -> DataFrame:
    """Exact pairwise n-gram Jaccard, optionally blocked on a column
    (e.g. ``lang``) so the cross join stays within blocks. For unblocked
    full-corpus near-dup at scale use :func:`minhash_near_duplicates`.

    Without ``block_col`` the only exact plan is the O(n^2) cross join —
    a scale hazard that must be opted into explicitly with
    ``allow_all_pairs=True``; otherwise this raises rather than silently
    degrading.
    """
    if block_col is None and not allow_all_pairs:
        raise ValueError(
            "ngram_jaccard_pairs without block_col is an O(n^2) cross join; "
            "pass a block_col (e.g. lang) or opt in with allow_all_pairs=True, "
            "or use minhash_near_duplicates for unblocked corpora"
        )
    # Shingles travel and compare as xxhash64 LONGS (exact up to 64-bit
    # collisions — immaterial and deterministic; the string-exact DuckDB
    # oracle would flag one as a hash mismatch, never a silent drift).
    #
    # For threshold > 0 the intersection is computed RELATIONALLY: a
    # pair must share >= 1 shingle, so candidates come from an
    # equi-join on the (block, shingle) key and |A∩B| is the pair's
    # match count — no set arrays ever cross the shuffle, no per-block
    # cross join materializes zero-overlap pairs. (Block/opt-in guard
    # retained: a pathologically common shingle still fans out f^2
    # pairs in its bucket; blocking bounds f.)
    sh = ensure_min_parallelism(df).select(
        *([F.col(block_col).alias("__blk")] if block_col else []),
        F.col(id_col).alias("__id"),
        F.transform(F.array_distinct(shingles(text_col, shingle_n)),
                    lambda x: F.xxhash64(x)).alias("sh"),
        # Materialized once: referenced by both pair legs and the size
        # table below, and Generate over the interpreted shingle HOF
        # re-evaluates its subexpressions per output row (no codegen
        # subexpression elimination under a generator) — the barrier
        # keeps the shingling a single pass.
    ).localCheckpoint(eager=False)
    if threshold <= 0:
        # jaccard-0 pairs are requested too: only the pair join sees them
        a_cols = (["__blk"] if block_col else []) + ["id_a", "sh_a"]
        b_cols = (["__blk"] if block_col else []) + ["id_b", "sh_b"]
        a = sh.toDF(*a_cols)
        b = sh.toDF(*b_cols)
        joined = a.join(b, "__blk") if block_col else a.crossJoin(b)
        return (
            joined.filter(F.col("id_a") < F.col("id_b"))
            .withColumn("jaccard", F.size(F.array_intersect("sh_a", "sh_b"))
                        / F.size(F.array_union("sh_a", "sh_b")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        )
    ex = sh.select(*(["__blk"] if block_col else []), "__id",
                   F.explode("sh").alias("__t"))
    sizes = sh.select("__id", F.size("sh").alias("__sz"))
    join_keys = (["__blk"] if block_col else []) + ["__t"]
    a = ex.toDF(*((["__blk"] if block_col else []) + ["id_a", "__t"]))
    b = ex.toDF(*((["__blk"] if block_col else []) + ["id_b", "__t"]))
    inter = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__i"))
    )
    sa = sizes.toDF("id_a", "__sa")
    sb = sizes.toDF("id_b", "__sb")
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard",
                    F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def near_dup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                      max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs -> (doc_id,
    cluster_id), cluster_id = min doc id in the component.

    Pair emitters (minhash/simhash/embedding) produce EDGES; the dedup
    action needs COMPONENTS (a~b, b~c => {a,b,c} is one duplicate
    group). Iterative min-label propagation over the edge list WITH
    pointer jumping: each round a node takes the min of its own, its
    neighbors', and its current label-node's label — path compression
    halves the effective diameter per round, so rounds ~ log2(diameter)
    instead of diameter. The old-vs-new comparison rides along in the
    same projection (no extra convergence join); lineage is cut per
    round with localCheckpoint so the plan stays flat. Converges
    exactly; raises if max_iter rounds don't reach the fixpoint.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.union(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    # Round 0 fused into initialization: label = min(self, neighbors) —
    # the first propagate round's exact result for one groupBy instead
    # of distinct + join + groupBy (+ its checkpoint and count action).
    # Typical near-dup clusters have diameter 2-3, so this saves a full
    # round of the loop's fixed multi-job cost.
    labels = (
        edges.groupBy("src").agg(F.min("dst").alias("__mn"))
        .select(F.col("src").alias("node"),
                F.least(F.col("src"), F.col("__mn")).alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("__mid"),
            )
        )
        # Pointer jump: labels are always real node ids (mins over node
        # ids), so "my label's label" exists; chase one hop per round.
        ptr = stepped.select(F.col("node").alias("__pn"), F.col("__mid").alias("__pl"))
        jumped = (
            stepped.join(ptr, stepped["__mid"] == ptr["__pn"], "left")
            .select(
                "node", "__old",
                F.least(F.col("__mid"), F.coalesce(F.col("__pl"), F.col("__mid"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("label") != F.col("__old")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    raise RuntimeError(f"component labeling did not converge in {max_iter} iterations")


def apply_near_dedup(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep one document per near-duplicate cluster (the min id), plus
    every document that appears in no pair — the end-to-end dedup
    action over any pair emitter's output."""
    clusters = near_dup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(losers, df[id_col] == losers.doc_id, "left_anti")


def keep_best_near_dedup(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the HIGHEST-``score_col`` document per near-duplicate
    cluster (ties to the lowest id), plus every unpaired document — the
    quality-aware variant of :func:`apply_near_dedup` (production
    pipelines keep the best canonical copy of a duplicate group, not
    the smallest id). Same component machinery; one extra window over
    the cluster-sized label table, which is candidate-sized, never
    corpus-sized."""
    clusters = near_dup_clusters(pairs)
    scored = clusters.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(score_col).alias("__sc")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("__sc"), F.asc("doc_id"))
    losers = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select("doc_id")
    )
    return df.join(losers, df[id_col] == losers.doc_id, "left_anti")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, portable: bool = False) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Bit j of the fingerprint is 1 iff the sum over tokens of
    sign(bit j of xxhash64(token)) is positive. Near-duplicate detection
    = small Hamming distance between fingerprints.

    Physical shape: explode tokens and hash them with codegen'd JVM
    expressions, then fold each partition's rows into per-doc
    one-bit-count PARTIALS with one Arrow-batched numpy pass
    (np.unpackbits + run-boundary reduceat — integer-exact, so the
    fingerprint is bit-identical to a direct vote aggregate), and
    finish with a tiny JVM sum over the partial rows — single shuffle
    on the doc id, carrying ~one 64-counter row per (doc, partition)
    exactly like the previous map-side-combined vote aggregate. The
    previous form updated 64 JVM sum-buffer slots per exploded TOKEN
    row (~3s warm at sf0.1, the whole cost of dedup_simhash_pairs);
    the partials pass is ~0.3s for the same work and the shuffle
    volume at scale is unchanged (guide §2.3: this is still an
    aggregate-before-shuffle, just with the per-token arithmetic
    vectorized).

    ``portable=True`` swaps the per-token hash from xxhash64 to the
    md5-derived :func:`~clinpy_spark.functions.text.portable_token_hash64`
    so a DuckDB oracle can recompute identical fingerprints; the vote
    aggregate, bit assembly, and all downstream blocking — the operator
    under test — are unchanged.
    """
    from clinpy_spark.functions.text import portable_token_hash64

    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    tok_hash = portable_token_hash64("__tok") if portable else F.xxhash64("__tok")
    ex = ensure_min_parallelism(df).select(F.col(id_col), F.explode(toks).alias("__tok")).select(
        F.col(id_col), tok_hash.alias("__h")
    )
    id_type = ex.schema[id_col].dataType.simpleString()

    def _partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            h = pdf["__h"].to_numpy(dtype=np.int64).view(np.uint64)
            # (n, 64) 0/1 matrix; unpackbits is big-endian per byte and
            # the little-endian byte view reverses byte order, so map
            # column j of the JVM's (h >> j) & 1 to unpacked column
            # 8*(j//8) + (7 - j%8) of the byte-view unpack.
            bits_be = np.unpackbits(
                h.view(np.uint8).reshape(-1, 8), axis=1)
            order = np.array([8 * (j // 8) + (7 - j % 8)
                              for j in range(64)])
            ones = bits_be[:, order].astype(np.int64)
            # run boundaries: same-id rows need not be adjacent — a
            # repeated id just emits two partials and the JVM sum
            # merges them.
            starts = np.flatnonzero(
                np.concatenate(([True], ids[1:] != ids[:-1])))
            seg_ones = np.add.reduceat(ones, starts, axis=0)
            seg_cnt = np.diff(np.append(starts, len(ids)))
            yield pd.DataFrame({
                id_col: ids[starts],
                "__ones": list(seg_ones),
                "__cnt": seg_cnt,
            })

    parts = ex.mapInPandas(
        _partials,
        schema=f"{id_col} {id_type}, __ones array<long>, __cnt long")
    votes = parts.groupBy(id_col).agg(
        *[F.sum(F.element_at("__ones", j + 1)).alias(f"__o{j}")
          for j in range(bits)],
        F.sum("__cnt").alias("__n"),
    )

    # Assemble the fingerprint from the summed votes in one vectorized
    # pass: the previous 64-level nested
    # when/shiftleft/bitwiseOR column chain cost ~1.3s of Catalyst
    # analysis PER ACTION (the runtime work on the doc-count rows is
    # trivial); a flat 65-element array into one pandas UDF is a
    # 3-node tree. Integer-exact: votes_j = 2*ones_j - n, bit j set
    # iff votes_j > 0 — identical to the column form.
    from pyspark.sql.functions import pandas_udf

    nb = bits

    @pandas_udf("long")
    def _assemble(va):
        import numpy as np
        import pandas as pd

        M = np.stack([np.asarray(v, dtype=np.int64) for v in va])
        ones, n = M[:, :nb], M[:, nb:nb + 1]
        bitset = (2 * ones - n) > 0
        be = np.zeros((len(M), 64), dtype=np.uint8)
        order = np.array([8 * (j // 8) + (7 - j % 8) for j in range(nb)])
        be[:, order] = bitset
        fp = np.packbits(be, axis=1).view(np.int64).ravel()
        return pd.Series(fp)

    va = F.array(*[F.col(f"__o{j}") for j in range(bits)], F.col("__n"))
    return votes.select(F.col(id_col), _assemble(va).alias("simhash"))


def simhash_near_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                            max_hamming: int = 3, portable: bool = False) -> DataFrame:
    """Near-dup pairs by SimHash: block on ``max_hamming + 1`` bit
    chunks — by pigeonhole, a pair within Hamming distance ``max_hamming``
    of a 64-bit hash must agree on at least one chunk — then exact
    Hamming filter. Equi-join on chunk value, no n^2 scan.

    The chunk count is DERIVED from ``max_hamming`` (4 chunks only
    guarantee recall for distance <= 3; a fixed chunking silently missed
    pairs at larger distances). Scale note: recall costs selectivity —
    n_chunks chunks means ~64/n_chunks-bit bucket values, so large
    ``max_hamming`` fattens buckets toward the birthday bound; keep it
    small (<= 7) on big corpora.
    """
    n_chunks = max_hamming + 1
    if n_chunks > 64:
        raise ValueError(f"max_hamming={max_hamming} needs {n_chunks} chunks; a 64-bit simhash supports at most 64 (max_hamming <= 63)")
    bounds = [64 * i // n_chunks for i in range(n_chunks + 1)]

    def _chunk_val(c: int):
        lo, hi = bounds[c], bounds[c + 1]
        v = F.shiftright("simhash", lo)
        if hi - lo < 64:
            v = v.bitwiseAND(F.lit((1 << (hi - lo)) - 1))
        return v

    fps = simhash(df, id_col, text_col, portable=portable)
    chunked = fps.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("val"))
            for c in range(n_chunks)
        ])).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk", "ck.val")
    a = chunked.toDF("id_a", "sh_a", "chunk", "val")
    b = chunked.toDF("id_b", "sh_b", "chunk", "val")
    pairs = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr method, re-expressed
# relationally: instead of a corpus-wide suffix array, every k-token
# window is a row and duplication is a window-function over the gram).
#
# Scale design: one posexplode (n_tokens - k + 1 rows per doc, linear),
# one shuffle on the gram value (hash the gram at 100 TB — join width,
# not semantics), one shuffle back on the doc id. No pairwise paths.
# ---------------------------------------------------------------------------


def kgram_windows(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 8) -> DataFrame:
    """One row per k-token window: (__id, __n, __pos, __gram, __cnt,
    __rk) where __cnt is the corpus-wide occurrence count of the gram
    and __rk its rank in global (doc id, position) order — __rk == 1 is
    the occurrence ExactSubstr keeps. Docs shorter than ``k`` tokens
    yield no windows (they cannot contain a duplicated k-gram)."""
    from clinpy_spark.functions.text import norm_tokens

    base = (
        df.select(F.col(id_col).alias("__id"), norm_tokens(text_col).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") >= k)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.col("__n") - k),
        lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, k)),
    )
    wins = base.select("__id", "__n", F.posexplode(grams).alias("__pos", "__gram"))
    wg = Window.partitionBy("__gram")
    wo = wg.orderBy(F.asc("__id"), F.asc("__pos"))
    return (
        wins.withColumn("__rk", F.row_number().over(wo))
        .withColumn("__cnt", F.count("*").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    )


def substring_span_profile(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8) -> DataFrame:
    """Per-document duplicated-substring profile: (id, n_tokens,
    n_dup_tokens) where a token is duplicated iff it is covered by at
    least one k-token window whose exact text occurs >= 2 times in the
    corpus (all occurrences count, matching the paper's "fraction of
    the corpus that is an exact duplicate" measurement).

    Coverage is computed by exploding each duplicated window into its k
    token positions and DISTINCT-ing per doc — linear in the number of
    duplicated windows, never pairwise."""
    wins = kgram_windows(df, id_col, text_col, k)
    covered = (
        wins.filter(F.col("__cnt") >= 2)
        .select("__id", F.explode(F.sequence(F.col("__pos"), F.col("__pos") + k - 1)).alias("__tp"))
        .distinct()
        .groupBy("__id")
        .agg(F.count("*").alias("n_dup_tokens"))
    )
    from clinpy_spark.functions.text import norm_tokens

    all_docs = df.select(F.col(id_col).alias("__id"),
                         F.size(norm_tokens(text_col)).alias("n_tokens"))
    return (
        all_docs.join(covered, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        )
    )


def strip_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 8) -> DataFrame:
    """ExactSubstr dedup ACTION: remove every token covered by a
    NON-FIRST occurrence of a duplicated k-gram (first occurrence in
    global (doc id, position) order survives, so exactly one copy of
    each duplicated span remains corpus-wide), then stitch the
    surviving tokens back in order.

    Returns (id, n_tokens, n_removed, clean_text). Same reassembly
    shape as :func:`passage_dedup` but at token granularity."""
    from clinpy_spark.functions.text import norm_tokens

    wins = kgram_windows(df, id_col, text_col, k)
    covered = (
        wins.filter((F.col("__cnt") >= 2) & (F.col("__rk") > 1))
        .select("__id", F.explode(F.sequence(F.col("__pos"), F.col("__pos") + k - 1)).alias("__tp"))
        .distinct()
    )
    toks = (
        df.select(F.col(id_col).alias("__id"), norm_tokens(text_col).alias("__toks"))
        .select("__id", F.posexplode("__toks").alias("__tp", "__tok"))
    )
    kept = toks.join(covered, ["__id", "__tp"], "left_anti")
    return (
        toks.groupBy("__id").agg(F.count("*").alias("n_tokens"))
        .join(
            kept.groupBy("__id").agg(
                F.count("*").alias("__n_kept"),
                F.concat_ws(" ", F.transform(
                    F.array_sort(F.collect_list(F.struct("__tp", "__tok"))),
                    lambda s: s["__tok"],
                )).alias("clean_text"),
            ),
            "__id", "left",
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0))).cast("long").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def ppjoin_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the AllPairs /
    PPJoin family, Bayardo et al. 2007 / Xiao et al. 2008): all pairs
    with shingle-set Jaccard >= ``threshold``, NO false negatives —
    the exact complement to :func:`minhash_near_duplicates` when a
    recall contract isn't enough.

    Why it scales without blocking: order every set by GLOBAL token
    rarity; two sets with Jaccard >= t must share a token within their
    first n - ceil(t*n) + 1 rarest tokens, so candidates come from an
    EQUI-JOIN on prefix tokens (rare tokens -> tiny buckets; the
    birthday-bound pair space of LSH banding, but provably lossless).
    Candidates are size-filtered (t*|a| <= |b|) then verified with
    exact array intersection. Three shuffles (freq, prefix bucket,
    doc re-group) — never an n^2 cross join.
    """
    # Shingle identity travels as xxhash64 longs over the STRING word
    # n-grams (A/B-measured 2.5x faster here than the token-hash
    # construction minhash uses — this shape explodes the shingles
    # immediately, so the per-row array never amortizes the extra
    # hashing pass that pays off in minhash's 64-min aggregate).
    sets = (
        ensure_min_parallelism(df).select(
            F.col(id_col).alias("__id"),
            F.transform(F.array_distinct(shingles(text_col, shingle_n)),
                        lambda x: F.xxhash64(x)).alias("__sh"),
        )
        # Materialize the per-doc arrays BEFORE the explode: Generate
        # over this interpreted-HOF child re-evaluates shared
        # subexpressions (the split/when/transform pipeline gets no
        # codegen subexpression elimination under a generator) —
        # measured 5.9s vs 0.2s at sf0.1 for the explode alone. The
        # array rows are also strictly smaller than the exploded rows
        # the previous shape checkpointed.
        .localCheckpoint(eager=False)
    )
    toks = sets.select("__id", F.explode("__sh").alias("__t"))
    freq = toks.groupBy("__t").agg(F.count("*").alias("__f"))
    # re-group each doc's tokens ordered by (global rarity, hash)
    ordered = (
        toks.join(freq, "__t")
        .groupBy("__id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("__f", "__t"))),
            lambda s: s["__t"]).alias("__sorted"))
        .withColumn("__n", F.size("__sorted"))
        .withColumn(
            "__prefix",
            F.slice("__sorted", 1,
                    (F.col("__n") - F.ceil(F.lit(float(threshold)) * F.col("__n")) + 1)
                    .cast("int")),
        )
        # referenced FOUR times below (both prefix legs + both set
        # fetches) — materialize once or Catalyst recomputes the whole
        # freq-join + regroup subtree per reference
        .localCheckpoint(eager=False)
    )
    # Candidate pairs carry ONLY ids through the prefix-bucket join —
    # the shingle arrays would otherwise be replicated once per shared
    # prefix token before the distinct; the sets are fetched back
    # exactly once per surviving pair for verification. posexplode
    # keeps each prefix token's 1-based position for the POSITIONAL
    # filter below.
    a = ordered.select(F.col("__id").alias("id_a"), F.col("__n").alias("na"),
                       F.posexplode("__prefix").alias("__pa", "__t"))
    b = ordered.select(F.col("__id").alias("id_b"), F.col("__n").alias("nb"),
                       F.posexplode("__prefix").alias("__pb", "__t"))
    t = float(threshold)
    # PPJoin positional filter (Xiao et al. 2008): Jaccard >= t needs an
    # overlap i >= alpha = t/(1+t) * (na+nb); for a match at (sorted)
    # positions pa, pb the remaining overlap is at most
    # 1 + min(na-pa-1, nb-pb-1) (0-based positions), and for the FIRST
    # common token that bound dominates the true overlap — so dropping
    # rows under the bound is lossless while cutting the candidate
    # multiset well below the bare prefix join (measured 445k -> ~90k
    # candidate rows at sf0.1). The 1e-9 slack keeps an exactly-on-
    # boundary alpha from dropping a jaccard == t pair to double
    # rounding.
    alpha = F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb")) - F.lit(1e-9)
    ubound = F.lit(1) + F.least(F.col("na") - F.col("__pa") - 1,
                                F.col("nb") - F.col("__pb") - 1)
    cands = (
        a.join(b, "__t")
        .filter((F.col("id_a") < F.col("id_b"))
                & (F.col("nb") >= F.lit(t) * F.col("na"))
                & (F.col("na") >= F.lit(t) * F.col("nb"))
                & (ubound >= alpha))
        .select("id_a", "id_b")
        .distinct()
    )
    sets_a = ordered.select(F.col("__id").alias("id_a"), F.col("__n").alias("na"),
                            F.col("__sorted").alias("sh_a"))
    sets_b = ordered.select(F.col("__id").alias("id_b"), F.col("__n").alias("nb"),
                            F.col("__sorted").alias("sh_b"))
    # |A ∪ B| = na + nb - |A ∩ B| exactly (distinct sets), so the union
    # never needs a second array pass — jaccard is the same integer
    # ratio either way.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cands.join(sets_a, "id_a").join(sets_b, "id_b")
        .select("id_a", "id_b", "na", "nb", inter.alias("__i"))
        # Materialize the intersection COUNT before the threshold
        # filter: the filter's jaccard predicate and the emitted
        # jaccard column otherwise both inline `__i`, and
        # array_intersect is interpreted (no codegen, no cross-
        # operator subexpression elimination) — the verify paid the
        # 206k-candidate set intersection TWICE. Measured 2.45s ->
        # ~1.3s for the verify stage at sf0.1; rows after this
        # projection are four longs, so the pinned block is tiny.
        .localCheckpoint(eager=False)
        .withColumn("jaccard",
                    F.col("__i") / (F.col("na") + F.col("nb") - F.col("__i")))
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """CROSS-CORPUS fuzzy decontamination: training docs whose shingle
    sets are near-duplicates of any benchmark doc — the paraphrase-
    robust complement to exact-shingle / Bloom decontamination (a
    lightly reworded eval question shares most shingles and few exact
    5-grams). Returns (train_id, bench_id, jaccard) >= threshold.

    Same signature -> banding -> verify pipeline as
    :func:`minhash_near_duplicates`, but the band bucket join runs
    BETWEEN the two corpora: candidate volume is bounded by bucket
    collisions against the (small) benchmark side, so the training
    corpus streams through without a self-join anywhere."""
    train = ensure_min_parallelism(train)
    bt = band_keys(minhash_signature(train, id_col, text_col, num_hashes,
                                     shingle_n, portable=portable),
                   id_col, num_hashes, bands, portable=portable).toDF(
        "train_id", "band", "band_hash")
    bb = band_keys(minhash_signature(bench, id_col, text_col, num_hashes,
                                     shingle_n, portable=portable),
                   id_col, num_hashes, bands, portable=portable).toDF(
        "bench_id", "band", "band_hash")
    candidates = (
        bt.join(F.broadcast(bb), ["band", "band_hash"])
        .select("train_id", "bench_id")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _shingle_sets(df: DataFrame, ids: DataFrame, out_id: str) -> DataFrame:
        keep = df.join(ids.toDF(id_col), id_col, "left_semi")
        if portable:
            sh_col = F.array_distinct(shingles(text_col, shingle_n))
            sel = keep.select(F.col(id_col).alias(out_id), sh_col.alias(f"sh_{out_id}"))
        else:
            sel = (keep.select(F.col(id_col), token_hashes(text_col).alias("__th"))
                   .select(F.col(id_col).alias(out_id),
                           F.array_distinct(hashed_shingles_from("__th", shingle_n))
                           .alias(f"sh_{out_id}")))
        return sel.localCheckpoint(eager=False)

    sh_t = _shingle_sets(train, candidates.select("train_id"), "train_id")
    sh_b = _shingle_sets(bench, candidates.select("bench_id"), "bench_id")
    return (
        candidates.join(sh_t, "train_id").join(sh_b, "bench_id")
        .withColumn("jaccard",
                    F.size(F.array_intersect("sh_train_id", "sh_bench_id"))
                    / F.size(F.array_union("sh_train_id", "sh_bench_id")))
        .filter(F.col("jaccard") >= threshold)
        .select("train_id", "bench_id", F.round("jaccard", 4).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 200,
) -> DataFrame:
    """Directional CONTAINMENT near-duplicates: (id_a, id_b, inter,
    size_a, size_b, containment) for every ordered pair with
    |Sa ∩ Sb| / |Sa| >= threshold (a != b) — the asymmetric statistic
    Jaccard misses: a short document quoted whole inside a long one
    scores containment ~1 but Jaccard ~|Sa|/|Sb| ~ 0. The quote/
    boilerplate/subset detector that complements
    ``ngram_jaccard_pairs``.

    Candidates come RELATIONALLY from an equi-join on the shingle
    hash, so only pairs sharing >= 1 shingle are ever materialized,
    and shingles appearing in more than ``max_shingle_df`` documents
    are dropped from the CANDIDATE key (boilerplate n-grams would fan
    out df^2 pairs while identifying nothing) — they still count in
    |Sa| via the per-doc size computed before the cap. A contained
    pair whose every shared shingle is boilerplate is missed BY
    CONTRACT (stated, oracle replays the same cap).

    Scale shape: per-doc distinct shingle hashes explode once, the
    df-capped equi-join bounds fan-out by max_shingle_df per shingle,
    and each pair reduces to one count row — no all-pairs path at any
    corpus size.
    """
    # Per-doc distinct-shingle arrays materialized ONCE, then exploded:
    # the exploded rows feed three consumers (sizes, doc-frequency cap,
    # candidate join), and Generate over the interpreted shingle HOF
    # re-evaluates its subexpressions per output row — the barrier
    # keeps the shingling a single pass and the sizes become a free
    # F.size() instead of a count aggregate.
    arrs = ensure_min_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            F.transform(shingles(text_col, shingle_n),
                        lambda x: F.xxhash64(x))).alias("__sha"),
    ).localCheckpoint(eager=False)
    sh = arrs.select("__id", F.explode("__sha").alias("__sh"))
    sizes = arrs.select("__id", F.size("__sha").cast("long").alias("__sz"))
    dfreq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    kept = sh.join(
        F.broadcast(dfreq.filter(F.col("__df") <= max_shingle_df)
                    .select("__sh")),
        "__sh",
    )
    a = kept.select(F.col("__id").alias("id_a"), "__sh")
    b = kept.select(F.col("__id").alias("id_b"), "__sh")
    inter = (
        a.join(b, "__sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("size_a"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("size_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.col("size_a"), 6))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "containment")
    )


def apply_containment_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup action for :func:`containment_pairs` output — keep the
    NON-DOMINATED documents (r11 verdict #6: containment is
    directional, so the composition is keep-LONGEST, not the keep-min
    components of :func:`apply_near_dedup`).

    A document is dropped iff some pair shows it contained in a
    STRICTLY LONGER document (more distinct shingles; equal sizes
    tie-break to the smaller id so mutual containment keeps exactly
    one). The rule needs no component iteration: on a quote chain
    a ⊂ b ⊂ c both a and b are dominated and only the maximal c
    survives — the kept set is exactly the maximal elements of the
    dominance relation, which is what quote/boilerplate subsumption
    wants (each dropped doc names a kept-or-longer superset carrying
    its content).

    Scale shape: one distinct projection of the pair table (already
    candidate-sized, never corpus-sized) anti-joined against the
    corpus — no window, no loop.
    """
    losers = (
        pairs.filter(
            (F.col("size_b") > F.col("size_a"))
            | ((F.col("size_b") == F.col("size_a"))
               & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("__loser"))
        .distinct()
    )
    return df.join(losers, df[id_col] == F.col("__loser"), "left_anti")


def lsh_plan(
    spark,
    num_hashes: int = 64,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH parameter planner: one row per valid (bands,
    rows_per_band) factorization of ``num_hashes`` with the S-curve
    operating point — (bands, rows_per_band, s50, p_at_threshold,
    p_at_half_threshold, recommended). The design-time sibling of
    ``minhash_near_duplicates``: before spending a corpus pass, pick
    the banding whose collision curve midpoint s50 = (1/b)^(1/r) sits
    closest to the target Jaccard ``threshold``.

    p_collide(s) = 1 - (1 - s^r)^b (the standard LSH S-curve);
    p_at_half_threshold quantifies the false-candidate mass a
    too-permissive banding would emit. ``recommended`` marks the
    factorization minimizing |s50 - threshold| (ties to fewer bands —
    fewer bands = fewer shuffle keys per doc).

    Driver-free constant compute over a bands range of at most
    ``num_hashes`` rows; exactly replayable closed forms (round-6).
    """
    b = F.col("id").cast("double")
    r = (F.lit(num_hashes) / F.col("id")).cast("double")
    cand = (
        spark.range(1, num_hashes + 1)
        .filter((F.lit(num_hashes) % F.col("id")) == 0)
        .select(
            F.col("id").cast("int").alias("bands"),
            (F.lit(num_hashes) / F.col("id")).cast("int")
            .alias("rows_per_band"),
            F.pow(1.0 / b, 1.0 / r).alias("__s50"),
        )
    )
    t = F.lit(float(threshold))
    p_at = 1 - F.pow(
        1 - F.pow(t, F.col("rows_per_band").cast("double")),
        F.col("bands").cast("double"))
    p_half = 1 - F.pow(
        1 - F.pow(t / 2, F.col("rows_per_band").cast("double")),
        F.col("bands").cast("double"))
    w = Window.orderBy(
        F.abs(F.col("__s50") - t).asc(), F.col("bands").asc())
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .select(
            "bands", "rows_per_band",
            F.round("__s50", 6).alias("s50"),
            F.round(p_at, 6).alias("p_at_threshold"),
            F.round(p_half, 6).alias("p_at_half_threshold"),
            (F.col("__rk") == 1).alias("recommended"),
        )
    )
