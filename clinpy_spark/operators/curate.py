"""Single-pass training-data curation pipeline.

The standard corpus-curation pass (language gate -> quality gates ->
length band -> exact dedup) expressed the Spark-native way: instead of
one filter+count JOB per stage (k actions, k scans), every row is
labeled with its FIRST failing gate in one projection (a when-chain,
whole-stage codegen), the duplicate gate rides a single window over the
fingerprint, and both the curated output and the per-gate drop report
derive from that one labeled frame — one scan + one shuffle total,
regardless of how many gates are configured.

Reference analogue: the QC gates of the reference's ingest paths
(star_sj min_unique_reads, rna_functions.py:30-45; VCF FILTER gate)
generalized to arbitrary predicate stages with an audit trail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clinpy_spark.functions.text import LANG_STOPWORDS, stopword_count, token_count

#: Label column added by :func:`label_gates`; NULL = row passed all gates.
GATE_COL = "gate"

#: Union of the per-language heuristic lists — the "does this look like
#: natural language at all" floor for the Gopher-style rules.
GOPHER_STOPWORDS: list[str] = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})


def gopher_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One projection of the integer document-quality metrics behind the
    Gopher-style repetition/format rules (Rae et al. 2021, table A1):
    word count, non-whitespace character count (mean word length =
    ``__n_nonws / __n_words`` without the division), symbol count
    (``#`` plus ``...`` runs, weighted by length), and stopword hits.

    Materialized as ONE ``select`` so the downstream gate when-chain
    references cheap attributes — Catalyst re-inlines multiply-used
    non-trivial expressions otherwise, recomputing each regex per gate.
    All metrics are integers so gate comparisons can be exact
    cross-multiplications (``3*w <= chars`` instead of float ratios),
    which keeps the oracle hash-stable.
    """
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("__n_words"),
        F.length(F.regexp_replace(t, r"\s+", "")).alias("__n_nonws"),
        (
            F.length(t) - F.length(F.regexp_replace(t, "#", ""))
            + F.lit(3) * F.regexp_count(t, F.lit(r"\.\.\."))
        ).alias("__n_symbol"),
        stopword_count(t, GOPHER_STOPWORDS).alias("__n_stop"),
    )


def gopher_gates(
    min_words: int = 25,
    max_words: int = 100_000,
    min_mean_word_len: int = 4,
    max_mean_word_len: int = 9,
    min_stopwords: int = 2,
) -> list[tuple[str, Column]]:
    """Gopher-style quality gates over :func:`gopher_metrics` columns,
    ordered first-fail for :func:`label_gates` / :func:`curation_stats`.

    Every predicate is an integer comparison (mean-word-length bounds as
    cross-multiplications, symbol ratio as ``10*symbols >= words`` i.e.
    >= 0.1) — no float boundary behavior to diverge between engines.
    """
    w, nonws = F.col("__n_words"), F.col("__n_nonws")
    return [
        ("too_short", w < min_words),
        ("too_long", w > max_words),
        ("word_length", (nonws < min_mean_word_len * w) | (nonws > max_mean_word_len * w)),
        ("symbol_heavy", F.lit(10) * F.col("__n_symbol") >= w),
        ("low_stopword", F.col("__n_stop") < min_stopwords),
    ]


def label_gates(
    df: DataFrame,
    gates: list[tuple[str, Column]],
    *,
    dedup_on: Column | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Label each row with the name of the FIRST gate it fails.

    ``gates`` is an ordered list of (name, fails) where ``fails`` is a
    boolean Column that is True when the row should be dropped. Adds a
    string column :data:`GATE_COL` (NULL = kept). With ``dedup_on`` (a
    key expression, e.g. ``fingerprint("text")``), a terminal
    ``"duplicate"`` gate marks every row after the first (by ``id_col``)
    sharing the key — deduplication runs among rows that passed the
    scalar gates, so a duplicate of a dropped row is not itself dropped.
    """
    label = F.lit(None).cast("string")
    for name, fails in reversed(gates):
        label = F.when(fails, F.lit(name)).otherwise(label)
    out = df.withColumn(GATE_COL, label)
    if dedup_on is not None:
        # One shuffle on the dedup key; the pass/fail flag joins the
        # partition key so failed rows never displace a kept row's rank.
        w = Window.partitionBy(dedup_on, F.col(GATE_COL).isNull()).orderBy(id_col)
        out = out.withColumn(
            GATE_COL,
            F.when(
                F.col(GATE_COL).isNull() & (F.row_number().over(w) > 1),
                F.lit("duplicate"),
            ).otherwise(F.col(GATE_COL)),
        )
    return out


def curate(df: DataFrame, gates: list[tuple[str, Column]], *,
           dedup_on: Column | None = None, id_col: str = "doc_id") -> DataFrame:
    """Rows surviving every gate, original schema."""
    return (
        label_gates(df, gates, dedup_on=dedup_on, id_col=id_col)
        .filter(F.col(GATE_COL).isNull())
        .drop(GATE_COL)
    )


def curation_stats(df: DataFrame, gates: list[tuple[str, Column]], *,
                   dedup_on: Column | None = None, id_col: str = "doc_id") -> DataFrame:
    """Per-gate drop counts plus the ``kept`` row — the pipeline audit
    report, from the same single labeled pass."""
    return (
        label_gates(df, gates, dedup_on=dedup_on, id_col=id_col)
        .groupBy(F.coalesce(F.col(GATE_COL), F.lit("kept")).alias(GATE_COL))
        .agg(F.count("*").alias("n"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", hashed-n-gram
    variant): per-doc (id, n_tokens, log_importance) scoring how much
    more likely the doc's token profile is under the TARGET
    distribution (a trusted/high-quality subset) than under the raw
    corpus — the principled "make the corpus look like the target"
    selection layer on top of the rule gates (``gopher_gates``) and
    the model classifier (``operators/classify.py``).

    Features are whitespace word unigrams hashed into ``n_buckets``
    via the portable md5 coordinate (engine-replayable, no vocabulary
    pass); bucket distributions carry add-1 smoothing; a doc's score
    is the LENGTH-NORMALIZED mean log-ratio (geometric-mean importance
    — without the normalization long docs dominate any cutoff).
    Downstream: rank by weight (ties to id) and keep the head, or
    hash-threshold for a stochastic resample.

    Scale shape: one explode+groupBy over the corpus and one over the
    target for the two BOUNDED (n_buckets-row) histograms, broadcast
    back onto the exploded corpus for one per-doc aggregate — the
    corpus streams twice, all joins broadcast, no vocabulary-sized
    shuffle.
    """
    def toks(df):
        return df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("__t"),
        ).filter(F.col("__t") != "")

    def bucket(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(col, F.lit(":" + seed))), 1, 8),
                16, 10,
            ).cast("long") % n_buckets
        )

    corpus_tok = toks(docs).select("__id", bucket(F.col("__t")).alias("__b"))
    target_tok = toks(target).select(bucket(F.col("__t")).alias("__b"))
    spine = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("__b"))
    cs = corpus_tok.groupBy("__b").agg(F.count(F.lit(1)).alias("__ns"))
    ct = target_tok.groupBy("__b").agg(F.count(F.lit(1)).alias("__nt"))
    hist = (
        spine.join(F.broadcast(cs), "__b", "left")
        .join(F.broadcast(ct), "__b", "left")
        .na.fill({"__ns": 0, "__nt": 0})
    )
    tot = hist.agg(
        F.sum("__ns").alias("__ts"), F.sum("__nt").alias("__tt"))
    nb = F.lit(float(n_buckets))
    ratio = hist.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log(
                (F.col("__nt").cast("double") + 1)
                / (F.col("__tt").cast("double") + nb))
            - F.log(
                (F.col("__ns").cast("double") + 1)
                / (F.col("__ts").cast("double") + nb))
        ).alias("__lr"),
    )
    per_doc = (
        corpus_tok.join(F.broadcast(ratio), "__b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("__lr") / F.count(F.lit(1))).alias("__lw"),
        )
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.round("__lw", 6).alias("log_importance"),
    )


#: PII pattern inventory — RE2/Java-compatible subset ONLY (no
#: lookaround, no \b, [.] instead of escapes) so Spark's JVM regex and
#: any SQL oracle's RE2 engine count identical non-overlapping matches.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
    "phone": "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
}


def pii_scan(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII pattern counts — the redaction/compliance gate
    a training-data pipeline runs before anything ships: adds one
    ``pii_<name>`` match-count column per pattern plus ``pii_any``
    (total matches). Patterns default to :data:`PII_PATTERNS`
    (email / phone / SSN-shaped / IPv4), deliberately restricted to
    the regex subset Java and RE2 count identically so the oracle can
    replay the scan verbatim.

    Scale shape: a pure per-row projection (regexp_extract_all +
    size) — no shuffle, no UDF, whole-stage-codegen eligible; compose
    with :func:`curate` to drop or route flagged documents.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    total = F.lit(0)
    for name, pat in pats.items():
        cnt = F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(pat), F.lit(0)))
        out = out.withColumn(f"pii_{name}", cnt.cast("long"))
        total = total + F.col(f"pii_{name}")
    return out.withColumn("pii_any", total.cast("long"))


def pii_summary(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Corpus-level PII exposure summary over :func:`pii_scan`:
    1 row (n_docs, then per pattern docs_<name> / matches_<name>,
    then docs_any) — the number the compliance review actually asks
    for. Exact integer counts, oracle-replayable."""
    pats = PII_PATTERNS if patterns is None else patterns
    scanned = pii_scan(df, text_col, pats)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name in pats:
        c = F.col(f"pii_{name}")
        aggs += [
            F.sum(F.when(c > 0, 1).otherwise(0)).cast("long")
            .alias(f"docs_{name}"),
            F.sum(c).cast("long").alias(f"matches_{name}"),
        ]
    aggs.append(
        F.sum(F.when(F.col("pii_any") > 0, 1).otherwise(0)).cast("long")
        .alias("docs_any"))
    return scanned.agg(*aggs)
