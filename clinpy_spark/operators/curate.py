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
