"""Corpus-trained n-gram language-model scoring: per-document surprisal
(mean negative log-likelihood) under a bigram model with add-one
smoothing — the CCNet-style statistical quality filter, self-trained on
the corpus it scores, as pure DataFrame aggregations.

Documents whose token transitions are improbable under the corpus's own
bigram statistics (gibberish, boilerplate soup, wrong-language residue)
score high and can be gated; no external LM, no UDFs.

Scale shape: ONE tokenization pass feeds both the model counts and the
scoring rows; the bigram explode is linear in corpus tokens; counts
join back on the bigram/unigram keys (shuffle joins keyed by n-gram —
at 100 TB hash the n-gram to a long first, same discipline as minhash
shingles); the vocabulary size is a 1-row broadcast.

p(cur | prev) = (c(prev, cur) + 1) / (c(prev) + V)
surprisal(doc) = mean over its transitions of  -ln p(cur | prev)
               = mean( ln(c(prev) + V) - ln(c(prev, cur) + 1) )
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tok_arrays(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from clinpy_spark.functions.text import norm_tokens

    return docs.select(F.col(id_col).alias("__id"), norm_tokens(text_col).alias("__toks"))


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, surprisal): mean -ln p(cur|prev) per document
    under the corpus's own add-one-smoothed bigram model. Documents with
    fewer than two tokens have no transitions and are omitted."""
    base = _tok_arrays(docs, id_col, text_col).localCheckpoint(eager=False)
    # one row per (doc, transition)
    pairs = base.select(
        "__id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__toks) - 1),"
                " i -> struct(__toks[i - 1] AS prev, __toks[i] AS cur))"
            )
        ).alias("__bg"),
    ).select("__id", F.col("__bg.prev").alias("prev"), F.col("__bg.cur").alias("cur"))
    uni = base.select(F.explode("__toks").alias("prev")).groupBy("prev").agg(
        F.count("*").alias("__c1"))
    vocab = uni.agg(F.count("*").alias("__v"))
    bgc = pairs.groupBy(F.col("prev").alias("__bp"), F.col("cur").alias("__bc")).agg(
        F.count("*").alias("__c2"))
    scored = (
        pairs.join(bgc, (pairs.prev == F.col("__bp")) & (pairs.cur == F.col("__bc")))
        .join(uni, "prev")
        .crossJoin(F.broadcast(vocab))
        .withColumn("__s", F.log(F.col("__c1") + F.col("__v")) - F.log(F.col("__c2") + 1))
    )
    return (
        scored.groupBy("__id")
        .agg(F.count("*").alias("n_bigrams"), F.avg("__s").alias("surprisal"))
        .withColumnRenamed("__id", id_col)
    )
