"""Product quantization (PQ) for embedding columns: train sub-codebooks,
encode vectors to byte codes, and search with asymmetric distance
computation (ADC) — Jegou et al., "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — plus the OPQ rotation (Ge et al., CVPR
2013) and the exact shortlist re-rank (IVFADC+R) that set the
operating point: code-only scan for candidate generation, true-vector
distances for the final ordering.

Why this exists at 100 TB: a 128-dim float32 embedding is 512 bytes; its
PQ code with m=8 subquantizers is 8 bytes — a 64× reduction — and an ADC
scan reads ONLY the code column (column pruning keeps the raw vectors on
disk). The scan itself is a per-partition numpy table lookup
(``lut[m, code]`` gathers), Arrow-batched via ``mapInPandas``, followed
by a per-partition partial top-k so the global reduce sees at most
``partitions × |Q| × k`` candidate rows instead of ``|C| × |Q|`` scored
pairs. Compose with the IVF operator (operators/similarity.py) for
IVFPQ: probe cells first, ADC-scan only the probed cells' codes.

Training is driver-side numpy Lloyd's over a bounded ``limit(train_cap)``
prefix (same scale stance as ``fit_centroids``: no full-table action),
deterministic for a fixed seed — codebooks are a few KiB and ship to
executors inside the task closure.

Reference analogue: the reference engine has no vector index; this is
part of the beyond-reference LLM-pipeline surface (SURVEY §2.8).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinpy_spark.session import ensure_min_parallelism

CODES_SCHEMA = "match_id long, codes array<smallint>"
TOPK_SCHEMA = "query_id long, match_id long, adc_dist double"


def _kmeans_1sub(x: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Seeded Lloyd's over one subspace: (n, dsub) -> (k, dsub) float64.
    Ties in assignment break to the lowest centroid index (np.argmin);
    empty clusters keep their previous centroid — fully deterministic.

    Bit-exact vectorization (the OPQ alternation runs this ~450 times
    per fit, and the original body was ~80% of fit_opq's 3s driver
    cost): the squared distance accumulates per-dimension in the SAME
    left-to-right order np.sum(axis=2) reduces a short last axis
    (sequential), without materializing the (n, k, dsub) temp; the
    per-centroid member means gather rows via a STABLE argsort, which
    yields exactly the arrays ``x[assign == c]`` produced (same rows,
    same order), so ``members.mean(axis=0)`` returns identical bits.
    Centroids, codes, and every downstream ADC distance are unchanged
    value-for-value."""
    k = min(k, len(x))
    centroids = x[rng.choice(len(x), size=k, replace=False)].astype(np.float64)
    dsub = x.shape[1]
    for _ in range(iters):
        d = None
        for j in range(dsub):
            dj = x[:, j, None] - centroids[None, :, j]
            dj *= dj
            if d is None:
                d = dj
            else:
                d += dj
        assign = d.argmin(axis=1)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sorted_assign[1:] != sorted_assign[:-1])))
        bounds = np.append(starts, len(order))
        for i, s in enumerate(starts):
            c = int(sorted_assign[s])
            centroids[c] = x[order[s:bounds[i + 1]]].mean(axis=0)
    return centroids


def _collect_training(corpus: DataFrame, vec_col: str, train_cap: int, m: int) -> np.ndarray:
    """Bounded driver-side training sample: a ``limit(train_cap)`` prefix
    (GlobalLimit reads only enough partitions — no full scan) collected
    once -> (n, dim) float64. The embedding dim must divide by ``m``."""
    sample = corpus.select(F.col(vec_col).alias("v")).limit(train_cap).toPandas()
    if sample.empty:
        raise ValueError("cannot fit PQ codebooks on an empty corpus")
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in sample["v"]])
    if x.shape[1] % m:
        raise ValueError(f"embedding dim {x.shape[1]} not divisible by m={m}")
    return x


def _fit_codebooks_np(x: np.ndarray, m: int, k: int, iters: int, seed: int) -> np.ndarray:
    dsub = x.shape[1] // m
    rng = np.random.default_rng(seed)
    return np.stack(
        [_kmeans_1sub(x[:, i * dsub : (i + 1) * dsub], k, iters, rng) for i in range(m)]
    )


def fit_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    train_cap: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Train ``m`` sub-codebooks of ``k`` centroids each -> (m, k, d/m).

    Each subspace is clustered independently over the bounded training
    prefix (:func:`_collect_training`)."""
    return _fit_codebooks_np(_collect_training(corpus, vec_col, train_cap, m), m, k, iters, seed)


def fit_opq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    train_cap: int = 100_000,
    iters: int = 10,
    seed: int = 42,
    opq_iters: int = 15,
    inner_iters: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """Optimized Product Quantization (Ge et al., CVPR 2013, the
    non-parametric solution) -> ``(rotation (d, d), codebooks (m, k, d/m))``.

    Alternates (a) fitting codebooks on the rotated sample with (b) the
    orthogonal Procrustes update ``R = U V^T`` from
    ``SVD(X^T reconstruct(encode(X R)))`` — each step monotonically
    lowers quantization error, so the SAME m x log2(k) bit budget
    resolves finer distances. R is orthogonal: rotated-space L2 equals
    original-space L2, so ADC distances stay comparable to the exact
    baseline. Fully deterministic for a fixed seed (seeded Lloyd's +
    LAPACK SVD). Encode/search must apply the same rotation — pass it
    to :func:`pq_encode` / :func:`pq_topk` / :func:`pq_topk_rerank`."""
    x = _collect_training(corpus, vec_col, train_cap, m)
    rot = _fit_rotation_np(x, m, k, seed, opq_iters, inner_iters)
    cb = _fit_codebooks_np(x @ rot, m, k, iters, seed)
    return rot, cb


def _fit_rotation_np(x: np.ndarray, m: int, k: int, seed: int,
                     opq_iters: int, inner_iters: int) -> np.ndarray:
    rot = np.eye(x.shape[1])
    for _ in range(opq_iters):
        y = x @ rot
        cb = _fit_codebooks_np(y, m, k, inner_iters, seed)
        yhat = _reconstruct(_encode_block(y, cb), cb)
        u, _, vt = np.linalg.svd(x.T @ yhat)
        rot = u @ vt
    return rot


def _rotate_col(df: DataFrame, vec_col: str, rotation: np.ndarray, out_col: str) -> DataFrame:
    """Apply an orthogonal (d, d) rotation to an array column — an
    Arrow-batched matrix product per batch (the OPQ pretransform; the
    KiB-scale matrix rides the task closure)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(a, dtype=np.float64) for a in v])
        return pd.Series(list(x @ rotation))

    return df.withColumn(out_col, _rot(F.col(vec_col)))


def _reconstruct(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, dim) nearest-centroid reconstruction."""
    return np.concatenate(
        [codebooks[i][codes[:, i]] for i in range(codebooks.shape[0])], axis=1
    )


def _encode_block(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) int16 nearest-centroid codes per subspace."""
    m, _, dsub = codebooks.shape
    codes = np.empty((len(x), m), dtype=np.int16)
    for i in range(m):
        sub = x[:, i * dsub : (i + 1) * dsub]
        # per-dimension accumulation in np.sum(axis=2)'s sequential
        # order — bit-identical distances without the (n, k, dsub) temp
        # (same rewrite as _kmeans_1sub; ~2x on the fit's hot path)
        d = None
        for j in range(dsub):
            dj = sub[:, j, None] - codebooks[i][None, :, j]
            dj *= dj
            if d is None:
                d = dj
            else:
                d += dj
        codes[:, i] = d.argmin(axis=1)
    return codes


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Encode every vector to its (m,) code -> (match_id, codes).

    Arrow-batched mapInPandas; the codebooks (and OPQ rotation, if any)
    ride the task closure (KiB). Persist the result once per corpus —
    downstream searches scan codes only (32-64× less IO than the raw
    vectors)."""
    src = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("v")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            if rotation is not None:
                x = x @ rotation
            codes = _encode_block(x, codebooks)
            yield pd.DataFrame(
                {"match_id": pdf["match_id"].to_numpy(), "codes": list(codes)}
            )

    return src.mapInPandas(encode, CODES_SCHEMA)


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """ADC top-k by squared L2: (query_id, match_id, adc_dist).

    Batch-query shape: the query set is collected and broadcast inside
    the task closure (capped at ``max_queries`` — this is the "small
    probe batch vs huge corpus" asymmetry every ANN deployment has), the
    code table streams through executors. Per Arrow batch each query
    builds its (m, k) lookup table once; distances are gather+sum over
    int16 codes — no float vector is touched. Each partition emits only
    its local top-k per query; the global cut is a window over
    ``partitions × k`` rows per query.
    """
    qpdf = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(qpdf) > max_queries:
        raise ValueError(f"query batch exceeds max_queries={max_queries}; "
                         "chunk the probe set or raise the cap")
    if qpdf.empty:
        return codes.sparkSession.createDataFrame([], TOPK_SCHEMA)
    qids = qpdf["query_id"].to_numpy()
    qx = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf["qv"]])
    if rotation is not None:
        qx = qx @ rotation  # same orthogonal map as the codes; L2 preserved
    m, kcent, dsub = codebooks.shape
    # (nq, m, k) per-query per-subspace distance tables, built once.
    luts = np.stack(
        [
            ((qx[:, i * dsub : (i + 1) * dsub][:, None, :] - codebooks[i][None, :, :]) ** 2).sum(
                axis=2
            )
            for i in range(m)
        ],
        axis=1,
    )
    marange = np.arange(m)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Running partition-local top-k per query: O(|Q| * k) state no
        # matter how many rows the partition streams through.
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["match_id"].to_numpy()
            cm = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            for qi in range(len(qids)):
                d = luts[qi][marange[None, :], cm].sum(axis=1)  # (n,)
                mask = cids != qids[qi]
                bid, bd = cids[mask], d[mask]
                if qi in best:
                    bid = np.concatenate([best[qi][0], bid])
                    bd = np.concatenate([best[qi][1], bd])
                order = np.lexsort((bid, bd))[:k]  # ties -> smallest id
                best[qi] = (bid[order], bd[order])
        rows: dict[str, list] = {"query_id": [], "match_id": [], "adc_dist": []}
        for qi, (bid, bd) in best.items():
            rows["query_id"].extend([qids[qi]] * len(bid))
            rows["match_id"].extend(bid)
            rows["adc_dist"].extend(bd)
        if rows["query_id"]:
            yield pd.DataFrame(rows)

    partial = codes.mapInPandas(scan, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("match_id"))
    return (
        partial.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", "match_id", "adc_dist")
    )


def exact_rerank(
    shortlist: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 re-rank of ANY ANN family's candidate list
    (query_id, match_id, ...) -> (query_id, match_id, dist), true
    distances, top-``k`` per query.

    The refinement step of IVFADC+R (Jegou et al. 2011), usable behind
    pq/ivfpq/lsh/ivf shortlists alike: recall@k of a compressed or
    bucketed scan is capped by its approximation error; re-ranking
    decouples it — the approximate stage only has to put the true top-k
    somewhere in its shortlist, then exact distances sort them. Cost
    model at 100 TB: the corpus was already scanned by the cheap
    approximate stage; raw vectors are fetched for just |Q| x shortlist
    rows via a broadcast join against the tiny shortlist — a pruned
    fetch, never a shuffle of the corpus."""
    sl = shortlist.select("query_id", "match_id")
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cv"))
    d2 = F.aggregate(
        F.zip_with("__qv", "__cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("match_id"))
    return (
        cv.join(F.broadcast(sl), "match_id")  # pruned vector fetch
        .join(F.broadcast(qv), "query_id")
        .withColumn("dist", d2)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", "match_id", "dist")
    )


def pq_topk_rerank(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    corpus: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """ADC shortlist + :func:`exact_rerank` -> (query_id, match_id,
    dist) with true squared-L2. Measured at sf0.01 (m=16, k=64, 64-dim):
    recall@10 0.57 raw ADC -> 0.93+ with shortlist=50 (0.96 with OPQ)."""
    sl = pq_topk(queries, codes, codebooks, shortlist, id_col, vec_col, max_queries, rotation)
    return exact_rerank(sl, queries, corpus, k, id_col, vec_col)


def build_pq_index(
    catalog,
    corpus: DataFrame,
    name: str = "pq_index",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    train_cap: int = 100_000,
    iters: int = 10,
    seed: int = 42,
    opq: bool = False,
) -> np.ndarray:
    """Persist codebooks (``{name}_codebooks``: m, code, centroid) and the
    encoded corpus (``{name}_codes``) through the catalog. Searches then
    read the byte-code table only; the raw vector column never loads.
    With ``opq=True`` the OPQ rotation is trained too and persisted as
    ``{name}_rotation`` (one row per matrix row — d KiB-scale)."""
    if opq:
        rotation, codebooks = fit_opq(corpus, vec_col, m, k, train_cap, iters, seed)
    else:
        rotation, codebooks = None, fit_pq_codebooks(corpus, vec_col, m, k, train_cap, iters, seed)
    spark = corpus.sparkSession
    cb_rows = [
        (i, c, [float(x) for x in codebooks[i, c]])
        for i in range(codebooks.shape[0])
        for c in range(codebooks.shape[1])
    ]
    catalog.write(
        spark.createDataFrame(cb_rows, "m int, code int, centroid array<double>"),
        f"{name}_codebooks",
    )
    if rotation is not None:
        catalog.write(
            spark.createDataFrame(
                [(i, [float(x) for x in rotation[i]]) for i in range(rotation.shape[0])],
                "i int, row array<double>",
            ),
            f"{name}_rotation",
        )
    catalog.write(pq_encode(corpus, codebooks, id_col, vec_col, rotation), f"{name}_codes")
    return codebooks


def load_pq_codebooks(catalog, name: str = "pq_index") -> np.ndarray:
    """Rehydrate the (m, k, dsub) codebook array from its catalog table."""
    pdf = catalog.table(f"{name}_codebooks").toPandas().sort_values(["m", "code"])
    m = int(pdf["m"].max()) + 1
    k = int(pdf["code"].max()) + 1
    return np.asarray(
        [np.asarray(v, dtype=np.float64) for v in pdf["centroid"]]
    ).reshape(m, k, -1)


def load_pq_rotation(catalog, name: str = "pq_index") -> np.ndarray | None:
    """Rehydrate the OPQ rotation, or None for a plain-PQ index."""
    if not catalog.exists(f"{name}_rotation"):
        return None
    pdf = catalog.table(f"{name}_rotation").toPandas().sort_values("i")
    return np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["row"]])


# ---------------------------------------------------------------------------
# IVFPQ: coarse-quantizer cells (operators/similarity.py) x PQ codes — the
# FAISS-style composition. Probing prunes to n_probe/n_centroids of the
# corpus BEFORE any distance math; ADC then scores only probed-cell codes.
# ---------------------------------------------------------------------------

_PAIR_SCHEMA = "query_id long, match_id long, adc_dist double"


def _adc_score_pairs(
    pairs: DataFrame,
    codebooks: np.ndarray,
    centroids: dict[int, np.ndarray] | None = None,
) -> DataFrame:
    """Score (query_id, __qv, match_id, codes[, cell]) candidate pairs
    by ADC.

    Per Arrow batch each DISTINCT query builds its (m, k) LUT once; every
    candidate row is then a gather+sum over its codes — the float query
    vector is touched once per (query, batch), never per candidate.

    With ``centroids`` (residual PQ): codes quantize ``v - centroid(cell)``
    and the LUT is built per (query, cell) from the query's own residual
    ``qv - centroid(cell)``, so ``lut-sum`` approximates
    ``|qv - v|^2 = |(qv - ctr) - (v - ctr)|^2`` exactly as in the raw
    case — at most ``n_probe`` LUTs per query, still O(1) per candidate."""
    m, _, dsub = codebooks.shape
    marange = np.arange(m)

    def _lut_for(vec: np.ndarray) -> np.ndarray:
        return np.stack(
            [
                ((vec[i * dsub : (i + 1) * dsub][None, :] - codebooks[i]) ** 2).sum(axis=1)
                for i in range(m)
            ]
        )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        luts: dict[tuple, np.ndarray] = {}
        group_keys = "query_id" if centroids is None else ["query_id", "cell"]
        for pdf in batches:
            if pdf.empty:
                continue
            out_q, out_m, out_d = [], [], []
            for key, grp in pdf.groupby(group_keys, sort=False):
                qid = key if centroids is None else key[0]
                lut = luts.get(key)
                if lut is None:
                    qv = np.asarray(grp["__qv"].iloc[0], dtype=np.float64)
                    if centroids is not None:
                        qv = qv - centroids[int(key[1])]
                    lut = _lut_for(qv)
                    luts[key] = lut
                cm = np.asarray(list(grp["codes"]), dtype=np.int64)
                d = lut[marange[None, :], cm].sum(axis=1)
                out_q.extend([qid] * len(d))
                out_m.extend(grp["match_id"].to_numpy())
                out_d.extend(d)
            yield pd.DataFrame({"query_id": out_q, "match_id": out_m, "adc_dist": out_d})

    return pairs.mapInPandas(score, _PAIR_SCHEMA)


def build_ivfpq_index(
    catalog,
    corpus: DataFrame,
    name: str = "ivfpq_index",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 4,
    pq_k: int = 16,
    seed: int = 42,
    iters: int = 8,
    opq: bool = False,
    spill: int = 1,
) -> None:
    """Persist a residual-IVFPQ index: ``{name}_centroids`` (tiny),
    ``{name}_codebooks`` (KiB), and ``{name}_codes`` — (id, codes)
    partitioned BY CELL on disk, so a probe scans n_probe/n_centroids of
    the code files and NONE of the raw vectors. The clustering + codebook
    fit + encode cost is paid once per corpus, not once per query batch —
    the operational difference between :func:`ivfpq_topk` (self-contained,
    refits every call) and a deployment serving repeated query batches.
    Raw vectors stay in the source table; searches that want the exact
    re-rank pass it to :func:`ivfpq_index_topk` as ``rerank_corpus``.

    ``opq=True`` prepends the FAISS-style OPQ pretransform: a global
    orthogonal rotation fitted on the training sample, applied to every
    vector before clustering/encoding (Arrow-batched matvec) and
    persisted as ``{name}_rotation``; queries are rotated at search
    time. L2 is rotation-invariant, so ADC distances and the raw-vector
    re-rank stay directly comparable.

    ``spill > 1`` stores each vector's code in its ``spill`` nearest
    cell directories, one RESIDUAL code per listing (×spill code bytes,
    the SPANN trade of :func:`ivfpq_topk`); the factor rides the
    centroids table so :func:`ivfpq_index_topk` self-configures its
    min-ADC dedup."""
    from clinpy_spark.operators.similarity import _nearest_cells, fit_centroids

    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cv"))
    rotation = None
    if opq:
        x = _collect_training(c, "__cv", 100_000, m)
        rotation = _fit_rotation_np(x, m, pq_k, seed, opq_iters=5, inner_iters=4)
        c = _rotate_col(c, "__cv", rotation, "__cv")
    cents = fit_centroids(c, n_centroids, seed, max_iter=max(2, iters))
    if cents is None:
        raise ValueError("cannot index an empty corpus")
    assigned = (
        _nearest_cells(c, cents, "match_id", "__cv", max(1, spill))
        .withColumn("__rid", F.col("match_id") * n_centroids + F.col("cell"))
        .join(F.broadcast(cents), "cell")
        .withColumn("__rv", F.zip_with(F.col("__cv").cast("array<double>"),
                                       F.col("__ctr"), lambda a, b: a - b))
        .select("match_id", "cell", "__rid", "__rv")
        .localCheckpoint(eager=False)
    )
    codebooks = fit_pq_codebooks(assigned, "__rv", m, pq_k, iters=iters, seed=seed)
    spark = corpus.sparkSession
    catalog.write(
        cents.withColumnRenamed("__ctr", "centroid")
        .withColumn("spill", F.lit(max(1, spill))),
        f"{name}_centroids",
    )
    catalog.write(
        spark.createDataFrame(
            [(i, cd, [float(x) for x in codebooks[i, cd]])
             for i in range(codebooks.shape[0]) for cd in range(codebooks.shape[1])],
            "m int, code int, centroid array<double>",
        ),
        f"{name}_codebooks",
    )
    codes = (
        pq_encode(assigned, codebooks, "__rid", "__rv")
        .withColumnRenamed("match_id", "__rid")
        .join(assigned.select("match_id", "cell", "__rid"), "__rid")
        .select(F.col("match_id").alias(id_col), "cell", "codes")
    )
    catalog.write(codes, f"{name}_codes", partition_by=["cell"])
    if rotation is not None:
        catalog.write(
            spark.createDataFrame(
                [(i, [float(v) for v in rotation[i]]) for i in range(rotation.shape[0])],
                "i int, row array<double>",
            ),
            f"{name}_rotation",
        )


def ivfpq_index_topk(
    catalog,
    queries: DataFrame,
    name: str = "ivfpq_index",
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_corpus: DataFrame | None = None,
    shortlist: int = 50,
    max_queries: int = 10_000,
) -> DataFrame:
    """Search a persisted residual-IVFPQ index (see
    :func:`build_ivfpq_index`). Probed cell ids filter the
    cell-partitioned code table — partition pruning keeps the scan to
    n_probe/n_centroids of the CODES, never the raw vectors. With
    ``rerank_corpus`` the ADC shortlist is exact-re-ranked
    (:func:`exact_rerank`), which is the recommended operating point.

    Bounded-queries contract (same as :func:`pq_topk`): the re-rank
    broadcasts the query vectors, so the probe batch is capped at
    ``max_queries`` — chunk a larger probe set or raise the cap
    explicitly. This is the small-batch-vs-huge-corpus asymmetry every
    ANN deployment has; the CORPUS side is never collected."""
    from clinpy_spark.operators.similarity import _nearest_cells

    craw = catalog.table(f"{name}_centroids")
    spill = (craw.select(F.max("spill")).first()[0] or 1) \
        if "spill" in craw.columns else 1
    cents = craw.select("cell", F.col("centroid").alias("__ctr"))
    codebooks = load_pq_codebooks(catalog, name)
    cent_rows = cents.collect()  # tiny: n_centroids rows
    cent_map = {int(r["cell"]): np.asarray(r["__ctr"], dtype=np.float64)
                for r in cent_rows}
    codes = catalog.table(f"{name}_codes").select(
        F.col(id_col).alias("match_id"), "cell", "codes")
    q = ensure_min_parallelism(queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    rotation = load_pq_rotation(catalog, name)
    if rotation is not None:
        # OPQ index: probe/score in rotated space (centroids, residual
        # codebooks, and codes all live there); re-rank below stays in
        # raw space — L2 is rotation-invariant
        q = _rotate_col(q, "__qv", rotation, "__qv")
    n_probe = max(1, min(n_probe, len(cent_rows)))
    probes = _nearest_cells(q, cents, "query_id", "__qv", n_probe)
    pairs = (
        probes.join(codes, "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "__qv", "match_id", "codes", "cell")
    )
    cut = shortlist if rerank_corpus is not None else k
    scored = _adc_score_pairs(pairs, codebooks, cent_map)
    if spill > 1:
        # spilled index: a vector probed through several of its listed
        # cells keeps its best (min) ADC distance
        scored = scored.groupBy("query_id", "match_id").agg(
            F.min("adc_dist").alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("match_id"))
    adc = (
        scored
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cut)
        .select("query_id", "match_id", "adc_dist")
    )
    if rerank_corpus is None:
        return adc
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(f"query batch exceeds max_queries={max_queries}; "
                         "chunk the probe set or raise the cap")
    return exact_rerank(adc, queries, rerank_corpus, k, id_col, vec_col)


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    pq_k: int = 16,
    seed: int = 42,
    iters: int = 5,
    residual: bool = True,
    spill: int = 1,
) -> DataFrame:
    """IVF cell pruning + PQ-compressed scoring, one call.

    The candidate set is an equi-join of probed cells against the
    cell-tagged code table (shuffle on the tiny cell id); ADC scores the
    surviving ~n_probe/n_centroids fraction.

    ``spill > 1`` lists every corpus vector in its ``spill`` nearest
    cells (SPANN-style boundary duplication, same trade as
    ``ivf_topk``): each listing gets its OWN residual code against that
    cell's centroid, and (query, match) repeats across probed cells
    collapse to their minimum ADC distance before the top-k cut.

    ``residual=True`` (FAISS-style, the default): codebooks quantize
    ``v - centroid(cell)`` instead of raw vectors. Residuals span the
    within-cell spread — a fraction of the corpus diameter — so the same
    m×pq_k code budget resolves far finer distances (measurably better
    recall@k at equal bytes; tested). The subtraction is a JVM-side
    ``zip_with`` against the broadcast centroid table; scoring builds at
    most ``n_probe`` LUTs per query from the query's own residual.
    ``residual=False`` keeps the raw-vector variant, whose
    ``n_probe == n_centroids`` + lossless-codebook degradation to exact
    search is the unit proof."""
    from clinpy_spark.operators.similarity import _nearest_cells, fit_centroids

    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cv"))
    q = ensure_min_parallelism(queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    # Coarse quantizer converges in few iterations on the bounded
    # training prefix; share the caller's iteration budget instead of
    # the standalone-IVF default (10 Spark-ML jobs -> `iters`).
    cents = fit_centroids(c, n_centroids, seed, max_iter=max(2, iters))
    if cents is None:
        return queries.sparkSession.createDataFrame([], _PAIR_SCHEMA)
    # assigned feeds the codebook fit, the encoder, and the cell map —
    # materialize once (a thrice-referenced subtree would execute thrice).
    # The row key is (vector, listed cell) — ``__rid`` — so spilled
    # vectors carry one (residual) code PER listing and the code→cell
    # join stays 1:1 (a bare match_id join would cross-multiply codes
    # across listings).
    assigned = _nearest_cells(c, cents, "match_id", "__cv", max(1, spill)) \
        .withColumn("__rid", F.col("match_id") * n_centroids + F.col("cell"))
    if residual:
        assigned = assigned.join(F.broadcast(cents), "cell").withColumn(
            "__rv",
            F.zip_with(F.col("__cv").cast("array<double>"), F.col("__ctr"),
                       lambda a, b: a - b),
        ).select("match_id", "cell", "__rid", "__rv")  # __cv dropped: nothing
        # downstream reads raw vectors, so the lazy checkpoint holds
        # residuals only (half the vector bytes)
        enc_col = "__rv"
        cent_map = {int(r["cell"]): np.asarray(r["__ctr"], dtype=np.float64)
                    for r in cents.collect()}  # tiny: n_centroids rows
    else:
        enc_col = "__cv"
        cent_map = None
    assigned = assigned.localCheckpoint(eager=False)
    codebooks = fit_pq_codebooks(assigned, enc_col, m, pq_k, iters=iters, seed=seed)
    codes = (
        pq_encode(assigned, codebooks, "__rid", enc_col)
        .withColumnRenamed("match_id", "__rid")
        .join(assigned.select("match_id", "cell", "__rid"), "__rid")
    )
    n_probe = max(1, min(n_probe, cents.count()))
    probes = _nearest_cells(q, cents, "query_id", "__qv", n_probe)
    pairs = (
        probes.join(codes, "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "__qv", "match_id", "codes", "cell")
    )
    scored = _adc_score_pairs(pairs, codebooks, cent_map)
    if spill > 1:
        scored = scored.groupBy("query_id", "match_id").agg(
            F.min("adc_dist").alias("adc_dist")
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("match_id"))
    return (
        scored
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", "match_id", "adc_dist")
    )
