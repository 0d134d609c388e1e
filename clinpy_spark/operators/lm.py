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
    # one row per (doc, transition); the size filter also guards
    # sequence()'s descending-range surprise (sequence(1, 0) = [1, 0],
    # which would index out of bounds on a 1-token doc)
    pairs = base.filter(F.size("__toks") >= 2).select(
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


def trigram_interpolated_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """(id, n_trigrams, surprisal): mean -ln p(cur | p2 p1) per document
    under a Jelinek-Mercer interpolated trigram model self-trained on
    the corpus (the step up from :func:`bigram_surprisal` — catches
    locally-plausible-but-globally-odd token runs that bigrams miss):

        p = l3 * c3(p2,p1,cur)/c2(p2,p1)
          + l2 * c2(p1,cur)/c1(p1)
          + l1 * (c1(cur) + 1)/(N + V)

    c3/c2/c1 are raw corpus counts, N total tokens, V vocab size; the
    add-one unigram floor keeps p > 0. Documents with fewer than three
    tokens have no trigram transitions and are omitted.

    Scale shape: same as the bigram model — one tokenization feeds the
    count tables and the scoring rows, explodes are linear in corpus
    tokens, count joins shuffle on the n-gram key (hash it to a long at
    100 TB), and (N, V) is a 1-row broadcast.
    """
    l3, l2, l1 = lambdas
    base = _tok_arrays(docs, id_col, text_col).localCheckpoint(eager=False)
    # size filters guard sequence()'s descending-range surprise
    # (sequence(2, 1) = [2, 1] on a 2-token doc -> out-of-bounds index)
    tris = base.filter(F.size("__toks") >= 3).select(
        "__id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(__toks) - 1),"
                " i -> struct(__toks[i - 2] AS p2, __toks[i - 1] AS p1, __toks[i] AS cur))"
            )
        ).alias("__tg"),
    ).select("__id", "__tg.p2", "__tg.p1", "__tg.cur")
    bigrams = base.filter(F.size("__toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(__toks) - 1),"
                " i -> struct(__toks[i - 1] AS prev, __toks[i] AS cur))"
            )
        ).alias("__bg")
    ).select(F.col("__bg.prev").alias("__bp"), F.col("__bg.cur").alias("__bc"))
    tric = tris.groupBy(
        F.col("p2").alias("__t2"), F.col("p1").alias("__t1"), F.col("cur").alias("__tc")
    ).agg(F.count("*").alias("__c3"))
    bgc = bigrams.groupBy("__bp", "__bc").agg(F.count("*").alias("__c2"))
    uni = base.select(F.explode("__toks").alias("__u")).groupBy("__u").agg(
        F.count("*").alias("__c1"))
    consts = uni.agg(F.sum("__c1").alias("__n"), F.count("*").alias("__v"))
    ctx = bgc.select(F.col("__bp").alias("__xp"), F.col("__bc").alias("__xc"),
                     F.col("__c2").alias("__cctx"))
    cont = bgc.select(F.col("__bp").alias("__yp"), F.col("__bc").alias("__yc"),
                      F.col("__c2").alias("__ccont"))
    uni_prev = uni.select(F.col("__u").alias("__up"), F.col("__c1").alias("__c1p"))
    uni_cur = uni.select(F.col("__u").alias("__uc"), F.col("__c1").alias("__c1c"))
    p = (
        F.lit(l3) * F.col("__c3") / F.col("__cctx")
        + F.lit(l2) * F.col("__ccont") / F.col("__c1p")
        + F.lit(l1) * (F.col("__c1c") + 1) / (F.col("__n") + F.col("__v"))
    )
    scored = (
        tris
        .join(tric, (tris.p2 == F.col("__t2")) & (tris.p1 == F.col("__t1"))
              & (tris.cur == F.col("__tc")))
        .join(ctx, (tris.p2 == F.col("__xp")) & (tris.p1 == F.col("__xc")))
        .join(cont, (tris.p1 == F.col("__yp")) & (tris.cur == F.col("__yc")))
        .join(uni_prev, tris.p1 == F.col("__up"))
        .join(uni_cur, tris.cur == F.col("__uc"))
        .crossJoin(F.broadcast(consts))
        .withColumn("__s", -F.log(p))
    )
    return (
        scored.groupBy("__id")
        .agg(F.count("*").alias("n_trigrams"), F.avg("__s").alias("surprisal"))
        .withColumnRenamed("__id", id_col)
    )



def kneser_ney_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, surprisal): mean -ln p(cur|prev) per document
    under an INTERPOLATED KNESER-NEY bigram model self-trained on the
    corpus — the modern-smoothing rung above
    :func:`bigram_surprisal`'s add-one and
    :func:`trigram_interpolated_surprisal`'s Jelinek-Mercer: the
    backoff mass goes to the CONTINUATION probability (in how many
    distinct contexts does this word appear?) rather than raw
    frequency, so boilerplate tokens that are frequent in one context
    ("Francisco" after "San") stop inflating unseen-context
    likelihoods (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.25):

        p(cur|prev) = (c(prev,cur) - D) / c(prev ·)
                      + D * N1+(prev ·)/c(prev ·) * N1+(· cur)/T

    with c(prev ·) the bigram-token count of the context, N1+ the
    distinct-neighbor type counts, T total bigram types, and the
    discount D = n1/(n1 + 2 n2) estimated from the bigram
    count-of-counts (absolute-discounting MLE). Self-trained scoring
    means every scored bigram has c >= 1 > D, so p > 0 with no extra
    floor. Documents with fewer than two tokens are omitted.

    Scale shape: same as the sibling models — one tokenization feeds
    both count tables and scoring rows, explodes linear in corpus
    tokens, count joins shuffle on the n-gram key, and the (T, D)
    constants are a 1-row broadcast.
    """
    base = _tok_arrays(docs, id_col, text_col).localCheckpoint(eager=False)
    pairs = base.filter(F.size("__toks") >= 2).select(
        "__id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__toks) - 1),"
                " i -> struct(__toks[i - 1] AS prev, __toks[i] AS cur))"
            )
        ).alias("__bg"),
    ).select("__id", F.col("__bg.prev").alias("prev"),
             F.col("__bg.cur").alias("cur"))
    bgc = pairs.groupBy(
        F.col("prev").alias("__bp"), F.col("cur").alias("__bc")
    ).agg(F.count("*").alias("__c2"))
    ctx = bgc.groupBy(F.col("__bp").alias("prev")).agg(
        F.sum("__c2").alias("__ctot"), F.count("*").alias("__fan"))
    cont = bgc.groupBy(F.col("__bc").alias("cur")).agg(
        F.count("*").alias("__cont"))
    consts = bgc.agg(
        F.count("*").alias("__t"),
        F.sum((F.col("__c2") == 1).cast("long")).alias("__n1"),
        F.sum((F.col("__c2") == 2).cast("long")).alias("__n2"))
    d = F.when(
        F.col("__n1") + 2 * F.col("__n2") > 0,
        F.col("__n1").cast("double") / (F.col("__n1") + 2 * F.col("__n2")),
    ).otherwise(F.lit(0.5))
    p = (
        (F.col("__c2") - d) / F.col("__ctot")
        + d * F.col("__fan") / F.col("__ctot")
        * F.col("__cont") / F.col("__t")
    )
    scored = (
        pairs
        .join(bgc, (pairs.prev == F.col("__bp"))
              & (pairs.cur == F.col("__bc")))
        .join(ctx, "prev")
        .join(cont, "cur")
        .crossJoin(F.broadcast(consts))
        .withColumn("__s", -F.log(p))
    )
    return (
        scored.groupBy("__id")
        .agg(F.count("*").alias("n_bigrams"),
             F.avg("__s").alias("surprisal"))
        .withColumnRenamed("__id", id_col)
    )
