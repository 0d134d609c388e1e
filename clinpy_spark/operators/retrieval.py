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

from pyspark.sql import DataFrame
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
