"""Population-genetics association statistics over a genotype table —
the QC/association layer a clinpy-style variant store feeds (reference
scope: per-sample genotypes in the variants assay,
clinpy/assays/variants.py and database/variant_tables.py geno_variants;
the reference stores genotypes but leaves HWE/association to downstream
tools — here they are exact one-pass aggregates).

Input convention: one row per (variant, sample) with ``gt`` = alt-allele
dosage in {0, 1, 2} (hom-ref / het / hom-alt). Both statistics are
closed-form Pearson chi-squares over per-variant genotype counts, so a
SQL oracle recomputes them exactly (round-6 on the chi2 doubles).

- ``hwe_chi2``: Hardy-Weinberg equilibrium test per variant — observed
  genotype counts vs p^2 / 2pq / q^2 expectations (1 dof). The standard
  variant-QC gate: gross HWE violation flags genotyping error.
- ``allelic_assoc_chi2``: case/control allelic association per variant —
  the 2x2 (phenotype x allele) chi-square on allele COUNTS (each subject
  contributes 2 alleles), the basic GWAS burden readout.

Scale shape: both are a single groupBy on the variant key over
conditional-sum aggregates — one shuffle keyed by variant, perfectly
parallel, no window, no join (the 2x2 margins are per-group sums, not a
contingency cross join). Monomorphic variants (p in {0,1}) and empty
strata report chi2 = 0 by definition rather than dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hwe_chi2(df: DataFrame, variant_col: str, gt_col: str) -> DataFrame:
    """Per-variant HWE chi-square: (variant, n, n_hom_ref, n_het,
    n_hom_alt, alt_freq, chi2) with alt_freq and chi2 rounded to 6.

    chi2 = sum over the three genotype classes of (obs - exp)^2 / exp
    with exp = n * {(1-q)^2, 2q(1-q), q^2} and q = alt-allele frequency
    (2*hom_alt + het) / 2n. Monomorphic variants (q == 0 or 1) are in
    exact equilibrium: chi2 = 0 without evaluating 0/0.
    """
    gt = F.col(gt_col)
    per_v = df.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(gt == 0, 1).otherwise(0)).alias("n_hom_ref"),
        F.sum(F.when(gt == 1, 1).otherwise(0)).alias("n_het"),
        F.sum(F.when(gt == 2, 1).otherwise(0)).alias("n_hom_alt"),
    )
    q = (2 * F.col("n_hom_alt") + F.col("n_het")) / (2.0 * F.col("n"))
    p = 1 - q
    e0 = F.col("n") * p * p
    e1 = F.col("n") * 2 * p * q
    e2 = F.col("n") * q * q
    chi = (
        (F.col("n_hom_ref") - e0) * (F.col("n_hom_ref") - e0) / e0
        + (F.col("n_het") - e1) * (F.col("n_het") - e1) / e1
        + (F.col("n_hom_alt") - e2) * (F.col("n_hom_alt") - e2) / e2
    )
    return per_v.select(
        "variant", "n", "n_hom_ref", "n_het", "n_hom_alt",
        F.round(q, 6).alias("alt_freq"),
        F.when((q == 0) | (q == 1), F.lit(0.0))
        .otherwise(F.round(chi, 6))
        .alias("chi2"),
    )


def allelic_assoc_chi2(
    df: DataFrame,
    variant_col: str,
    gt_col: str,
    case_col: str,
) -> DataFrame:
    """Per-variant case/control allelic chi-square: (variant, case_alt,
    case_ref, ctrl_alt, ctrl_ref, chi2). ``case_col`` is a boolean
    phenotype; allele counts are 2 - gt ref and gt alt per subject.

    chi2 is the standard 2x2 Pearson statistic N(ad - bc)^2 /
    ((a+b)(c+d)(a+c)(b+d)); any empty margin (no cases, monomorphic)
    reports 0.0 by definition.
    """
    gt = F.col(gt_col).cast("long")
    is_case = F.col(case_col)
    per_v = df.groupBy(F.col(variant_col).alias("variant")).agg(
        F.sum(F.when(is_case, gt).otherwise(0)).alias("case_alt"),
        F.sum(F.when(is_case, 2 - gt).otherwise(0)).alias("case_ref"),
        F.sum(F.when(~is_case, gt).otherwise(0)).alias("ctrl_alt"),
        F.sum(F.when(~is_case, 2 - gt).otherwise(0)).alias("ctrl_ref"),
    )
    # Margin products overflow BIGINT past ~3e4 subjects per variant, so
    # the statistic is computed in doubles (exact while per-cell counts
    # stay below 2^26 — products then fit the 53-bit mantissa; the
    # oracle mirrors the same expression order).
    a = F.col("case_alt").cast("double")
    b = F.col("case_ref").cast("double")
    c = F.col("ctrl_alt").cast("double")
    d = F.col("ctrl_ref").cast("double")
    n = a + b + c + d
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    num = a * d - b * c
    chi = n * num * num / denom
    return per_v.select(
        "variant", "case_alt", "case_ref", "ctrl_alt", "ctrl_ref",
        F.when(denom == 0, F.lit(0.0)).otherwise(F.round(chi, 6))
        .alias("chi2"),
    )
