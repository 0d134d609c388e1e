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

#: Label column added by :func:`label_gates`; NULL = row passed all gates.
GATE_COL = "gate"


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
