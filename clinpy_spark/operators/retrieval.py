"""Lexical retrieval scoring over the documents table: BM25 and TF-IDF
as pure DataFrame aggregations.

Part of the beyond-reference LLM-pipeline surface (SURVEY §2.8): corpus
quality weighting, query-based subsetting ("give me the docs most about
X"), and hard-negative mining for retrieval training all want a
BM25-shaped score that runs AS A QUERY, not through an external search
engine.

Scale shape: one explode of the tokenized text filtered to the query's
terms (the explode output is |query_terms|-bounded per document, not
|tokens|), one aggregate per (doc, term), and term statistics joined
back via broadcast (|query_terms| rows). Corpus-level constants (N,
avgdl) are a 1-row broadcast, computed in-plan — no driver action. All
math is JVM-side column expressions; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinpy_spark.functions.text import norm_tokens as _toks


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed bag of query
    terms -> (id, score), documents with no query term omitted (their
    score is 0 by definition).

    idf uses the Lucene form ``ln(1 + (N - df + 0.5)/(df + 0.5))``,
    always positive. df counts documents CONTAINING the term (corpus-
    wide), dl/avgdl come from the same tokenization as the tf pass.
    """
    # base feeds both the corpus constants and the tf pass — a lazy
    # localCheckpoint materializes the tokenization once instead of
    # scanning (and re-splitting) the corpus twice.
    base = docs.select(
        F.col(id_col).alias("__id"), _toks(text_col).alias("__toks")
    ).withColumn("__dl", F.size("__toks")).localCheckpoint(eager=False)
    # (N, avgdl): 1-row corpus constants, broadcast into the score.
    consts = base.agg(
        F.count("*").alias("__n_docs"),
        (F.sum("__dl") / F.count("*")).alias("__avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in query_terms])
    # Explode only the query's terms per doc: array_intersect bounds the
    # fan-out at |query_terms| rows per document regardless of length.
    tf = (
        base.select(
            "__id", "__dl",
            F.explode(F.array_intersect("__toks", terms)).alias("__term"),
            F.col("__toks"),
        )
        .withColumn("__tf", F.size(F.filter("__toks", lambda t: t == F.col("__term"))))
        .select("__id", "__dl", "__term", "__tf")
    )
    df_ = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    scored = (
        tf.join(F.broadcast(df_), "__term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "__idf",
            F.log(1 + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)),
        )
        .withColumn(
            "__contrib",
            F.col("__idf") * F.col("__tf") * (k1 + 1)
            / (F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(F.sum("__contrib").alias("score"))
        .withColumnRenamed("__id", id_col)
    )


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF weights per (doc, term): tf * ln(N / df). One
    explode + two aggregates; terms under ``min_df`` docs drop out.
    The standing input to cosine-similarity retrieval or linear quality
    classifiers over lexical features."""
    base = docs.select(F.col(id_col).alias("__id"), _toks(text_col).alias("__toks")) \
        .localCheckpoint(eager=False)  # consts + tf share one tokenization
    consts = base.agg(F.count("*").alias("__n_docs"))
    tf = (
        base.select("__id", F.explode("__toks").alias("__term"))
        .groupBy("__id", "__term").agg(F.count("*").alias("__tf"))
    )
    df_ = (
        tf.groupBy("__term").agg(F.count("*").alias("__df"))
        .filter(F.col("__df") >= min_df)
    )
    return (
        tf.join(df_, "__term")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col("__id").alias(id_col),
            F.col("__term").alias("term"),
            (F.col("__tf") * F.log(F.col("__n_docs") / F.col("__df"))).alias("weight"),
        )
    )


def tfidf_query_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF score of every document against a fixed query-term bag ->
    (id, score): sum over matched terms of ``tf · ln(N/df)`` with df =
    documents containing the term. Same bounded-explode plan shape as
    :func:`bm25_scores` (array_intersect caps fan-out at |query| rows
    per doc; df and N broadcast back); the second scorer a rank-fusion
    front end wants beside BM25."""
    base = docs.select(
        F.col(id_col).alias("__id"), _toks(text_col).alias("__toks")
    ).localCheckpoint(eager=False)
    consts = base.agg(F.count("*").alias("__n_docs"))
    terms = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        base.select(
            "__id",
            F.explode(F.array_intersect("__toks", terms)).alias("__term"),
            F.col("__toks"),
        )
        .withColumn("__tf", F.size(F.filter("__toks", lambda t: t == F.col("__term"))))
        .select("__id", "__term", "__tf")
    )
    df_ = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    return (
        tf.join(F.broadcast(df_), "__term")
        .crossJoin(F.broadcast(consts))
        .withColumn("__wt", F.col("__tf")
                    * F.log(F.col("__n_docs").cast("double") / F.col("__df")))
        .groupBy("__id")
        .agg(F.sum("__wt").alias("score"))
        .withColumnRenamed("__id", id_col)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
    query_col: str | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009, public
    method): ``fused(d) = Σ_systems 1/(k + rank_sys(d))`` with the
    published k=60 default. Rank-based, so incomparable score scales
    (BM25 vs TF-IDF vs an ANN distance) fuse with no normalization; a
    document missing from one system's list simply contributes nothing.

    Ranks are taken on the 6-dp-ROUNDED score with an id tie-break, so
    the ranking (and therefore the fusion) is reproducible across
    engines — raw float scores can differ in the last ulp and would
    swap adjacent ranks. Each input is a retrieval RESULT list (top-k
    or matched-subset sized, not the corpus); pass ``query_col`` to
    rank within each query of a batched result set — without it the
    rank window is global, which is the single-result-list case by
    contract."""
    keys = ([query_col] if query_col else []) + [id_col]
    parts = []
    for df in rankings:
        w = (Window.partitionBy(query_col) if query_col else Window.partitionBy()) \
            .orderBy(F.desc(F.round(F.col(score_col), 6)), F.asc(id_col))
        parts.append(df.select(
            *keys, (1.0 / (F.lit(k) + F.row_number().over(w))).alias("__rr")))
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy(*keys).agg(F.round(F.sum("__rr"), 6).alias("rrf_score"))


def rake_keywords(
    docs: DataFrame,
    stopwords: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010, Rapid Automatic
    Keyword Extraction): corpus-level top-``top_k`` phrases as
    (phrase, n_occurrences, n_words, score) — the unsupervised
    keyphrase layer between raw token frequency (``vocab_topk``) and
    the graph-ranked sentences (``text_textrank``).

    Candidate phrases are maximal stopword-free token runs (the
    stopword list IS the phrase delimiter); word score =
    deg(w)/freq(w) where deg sums the lengths of phrases containing w
    (co-occurrence degree) and freq counts occurrences; a phrase
    scores the sum of its member word scores, so multi-word domain
    terms outrank frequent singletons.

    Scale shape: one posexplode over the corpus, phrase segmentation
    by a per-doc running stopword count (one doc-keyed window), one
    token-keyed aggregate for the word stats (broadcast back), one
    phrase-keyed aggregate, one top-k rank over the phrase vocabulary
    — no pairwise anything. Phrase strings are rebuilt with an
    array_sort on (pos, token) structs, so identical phrases hash
    identically in any engine; ties in the final rank break on the
    phrase text.
    """
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__pos", "__t"),
    ).filter(F.col("__t") != "")
    stp = F.col("__t").isin(stopwords).cast("int")
    w_run = Window.partitionBy("__id").orderBy("__pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    ph = tok.withColumn("__stp", stp).withColumn(
        "__pid", F.sum("__stp").over(w_run))
    members = ph.filter(F.col("__stp") == 0).select(
        "__id", "__pid", "__pos", "__t")
    plen = members.groupBy("__id", "__pid").agg(
        F.count(F.lit(1)).alias("__plen"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__t"))),
                lambda s: s["__t"],
            ),
            " ",
        ).alias("phrase"),
    )
    wstats = (
        members.join(plen.select("__id", "__pid", "__plen"),
                     ["__id", "__pid"])
        .groupBy("__t")
        .agg(
            F.count(F.lit(1)).alias("__freq"),
            F.sum("__plen").alias("__deg"),
        )
    )
    occ_score = (
        members.join(F.broadcast(wstats), "__t")
        .groupBy("__id", "__pid")
        .agg(
            F.round(
                F.sum(F.col("__deg").cast("double") / F.col("__freq")), 6)
            .alias("__score"))
    )
    phrases = (
        plen.join(occ_score, ["__id", "__pid"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max(F.size(F.split(F.col("phrase"), " "))).alias("n_words"),
            F.max("__score").alias("score"),
        )
    )
    w_rank = Window.orderBy(F.col("score").desc(), F.col("phrase").asc())
    return (
        phrases.withColumn("__rk", F.row_number().over(w_rank))
        .filter(F.col("__rk") <= top_k)
        .select("phrase", "n_occurrences", "n_words", "score",
                F.col("__rk").cast("int").alias("rank"))
    )
