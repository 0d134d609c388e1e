"""Variants assay + Variant entity (reference assays/variants.py, bug
fixes per SURVEY.md §8: the join chain is variants ⋈ impacts ⋈ mapping,
region filter is a real BETWEEN, genotype filter lands on the mapping
table's samplename/gt columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.assays.base import Assay


def _checked_complement(count_col: str, margin: int, label: str):
    """``margin - count`` with a JVM-side consistency guard: a carrier
    count exceeding its phenotype margin (case_samples naming subjects
    outside the cohort, or mapping rows outside the cohort when
    cohort_size is passed) would yield a negative 2x2 cell and an
    invalid hypergeometric support downstream, so raise a clear error
    instead of emitting garbage p-values (r11 advice). The guard rides
    inside the cell expression itself — no extra pass, and Catalyst
    cannot prune it."""
    return F.when(
        F.col(count_col) > F.lit(margin),
        F.raise_error(F.concat(
            F.lit(f"fisher_exact: carrier count {count_col}="),
            F.col(count_col).cast("string"),
            F.lit(f" exceeds {label}={margin}; case_samples/cohort_size "
                  "margins are inconsistent with the genotype store"),
        )),
    ).otherwise(F.lit(margin) - F.col(count_col))

#: Reference genotype string forms (snp_functions.py:103-105,
#: variants.py:152-158): het "(0, 1)", hom-alt "(1, 1)".
GT_HET = "(0, 1)"
GT_HOM = "(1, 1)"


class Variants(Assay):
    def _names(self, rna: bool, filtered: bool) -> tuple[str, str, str]:
        prefix = ("filtered_" if filtered else "") + ("rna_" if rna else "")
        return (
            f"{prefix}variants",
            f"{prefix}variant_impacts",
            f"{prefix}sample_variants",
        )

    def select(
        self,
        samples: list | None = None,
        region: tuple[str, int, int] | None = None,
        impacts: bool = False,
        genotype: str | None = None,
        rna: bool = False,
        filtered: bool = False,
    ) -> DataFrame:
        """Variants joined to per-sample records, optionally to impact
        rows, filterable by region / samples / genotype (reference
        variants.py:53-109: J2/J3 joins, P6 BETWEEN, P8 genotype).
        """
        var_t, imp_t, map_t = self._names(rna, filtered)
        variants = self.db.table(var_t)
        mapping = self.db.table(map_t)

        if isinstance(region, DataFrame):
            # batch form (reference search_region takes a pyranges gr,
            # variants.py:82-109): keep only variants inside ANY region;
            # for per-region keyed output use :meth:`search_region`.
            variants = self.search_region(
                region, rna=rna, filtered=filtered, _master_only=True
            ).drop("region_id").distinct()
        elif region:
            chrom, start, end = region
            variants = variants.filter(
                (F.col("chrom") == chrom) & F.col("pos").between(start, end)
            )  # variants.py:91-93 intent (inverted-operator bug fixed)
        if samples:
            mapping = mapping.filter(F.col("samplename").isin(samples))  # :98 fixed
        if genotype:
            gt = {"het": GT_HET, "hom": GT_HOM}.get(genotype, genotype)
            mapping = mapping.filter(F.col("gt") == gt)  # P8

        out = variants.join(mapping, "variant_id")
        if impacts:
            # impacts carries chrom only as a layout/pruning column
            # (functionally dependent on variant_id) — drop it so the
            # join doesn't produce a duplicate chrom.
            imp = self.db.table(imp_t).drop("chrom")
            out = out.join(imp, "variant_id")  # :64 fixed chain
        return out

    def search_region(
        self,
        regions: DataFrame,
        samples: list | None = None,
        rna: bool = False,
        filtered: bool = False,
        bin_size: int = 100_000,
        _master_only: bool = False,
    ) -> DataFrame:
        """Batch region search — the reference's
        ``Variants.search_region(gr)`` takes a pyranges TABLE of regions
        (variants.py:82-109); this takes a DataFrame with ``chrom``,
        ``start``, ``end`` and optionally ``region_id`` (stamped from
        the coordinates when absent). Returns per-sample variant rows
        keyed by ``region_id`` — a variant inside two panel regions
        appears once per region, the pyranges join semantic.

        Point-in-interval via :func:`binned_interval_join`: scales to a
        large panel × large master (equi-join on (chrom, bin), no
        broadcast-nested-loop), chrom partition key prunes the
        chrom-partitioned master."""
        from clinpy_spark.functions.intervals import binned_interval_join

        rcols = set(regions.columns)
        if not {"chrom", "start", "end"} <= rcols:
            raise ValueError("regions needs chrom/start/end columns")
        if "region_id" not in rcols:
            regions = regions.withColumn(
                "region_id", F.xxhash64("chrom", "start", "end"))
        reg = regions.select(
            "region_id",
            F.col("chrom").alias("region_chrom"),
            F.col("start").alias("region_start"),
            F.col("end").alias("region_end"),
        )
        var_t, _, map_t = self._names(rna, filtered)
        hits = binned_interval_join(
            self.db.table(var_t), reg,
            left_start="pos", left_end=None,
            right_start="region_start", right_end="region_end",
            partition_keys=[("chrom", "region_chrom")],
            bin_size=bin_size,
        ).drop("region_chrom", "region_start", "region_end")
        if _master_only:
            return hits
        mapping = self.db.table(map_t)
        if samples:
            mapping = mapping.filter(F.col("samplename").isin(samples))
        return hits.join(mapping, "variant_id")

    def filter(
        self,
        impacts: list | dict | None = None,
        formats: list | dict | None = None,
        rna: bool = False,
        filtered: bool = False,
    ) -> DataFrame:
        """Config-driven filtering (reference variants.py:53-81): the
        same sqlalchemy-filters spec vocabulary — ``{"field": ...,
        "op": ..., "value": ...}`` dicts, lists as implicit AND,
        ``and``/``or``/``not`` combinators — compiled to Spark Columns
        (functions/filters.py), applied to the variants ⋈ mapping ⋈
        impacts view. ``impacts`` specs address impact columns,
        ``formats`` address the mapping table's qual/FORMAT columns
        (:meth:`list_impacts` / :meth:`list_variant_quals` enumerate
        them). Fixes folded in per SURVEY §8: the reference joins
        impacts twice and never joins mapping, so its ``formats`` specs
        could not bind; here both tables are in the view. Raises
        ValueError when both spec sets are None, like the reference."""
        if impacts is None and formats is None:
            raise ValueError(
                "Both impacts and formats are none, there are no filters specified")
        from clinpy_spark.functions.filters import specs_to_column

        out = self.select(impacts=True, rna=rna, filtered=filtered)
        if impacts is not None:
            out = out.filter(specs_to_column(impacts))
        if formats is not None:
            out = out.filter(specs_to_column(formats))
        return out

    def _dosage(self, rna: bool, filtered: bool) -> DataFrame:
        """Mapping rows with the alt-allele dosage decoded from the
        reference's genotype strings (het/hom constants above; anything
        else counts 0 — VCF rows are non-ref calls, so hom-ref never
        appears as a mapping row)."""
        _, _, map_t = self._names(rna, filtered)
        m = self.db.table(map_t)
        dose = (
            F.when(F.col("gt") == GT_HOM, 2)
            .when(F.col("gt") == GT_HET, 1)
            .otherwise(0)
        )
        return m.withColumn("__dose", dose)

    def _cohort_size(self, d: DataFrame) -> int:
        """Default genotyped-cohort size: distinct samplenames in the
        mapping table (samples whose VCF was ingested and produced
        calls). Samples without a VCF are NOT silently counted hom-ref
        — pass ``cohort_size=`` to hwe/association when the sequenced
        cohort is known to be larger (e.g. all-ref samples)."""
        return d.select("samplename").distinct().count()

    def hwe(self, rna: bool = False, filtered: bool = False,
            cohort_size: int | None = None) -> DataFrame:
        """Per-variant Hardy-Weinberg equilibrium audit over the
        project's genotypes (operators/assoc.py hwe_chi2_from_counts)
        — the genotyping-QC gate the reference leaves to downstream
        tools. Mapping rows are non-ref calls only, so the implicit
        hom-ref class is derived ARITHMETICALLY from the cohort size
        (one broadcast scalar) — no per-subject row materialization at
        any cohort scale."""
        from clinpy_spark.operators.assoc import hwe_chi2_from_counts

        d = self._dosage(rna, filtered)
        n_samples = cohort_size or self._cohort_size(d)
        per_v = d.groupBy(F.col("variant_id").alias("variant")).agg(
            F.sum(F.when(F.col("__dose") == 1, 1).otherwise(0))
            .alias("n_het"),
            F.sum(F.when(F.col("__dose") == 2, 1).otherwise(0))
            .alias("n_hom_alt"),
        ).select(
            "variant",
            F.lit(n_samples).alias("n"),
            (F.lit(n_samples) - F.col("n_het") - F.col("n_hom_alt"))
            .alias("n_hom_ref"),
            "n_het",
            "n_hom_alt",
        )
        return hwe_chi2_from_counts(per_v)

    def hwe_exact(self, rna: bool = False, filtered: bool = False,
                  cohort_size: int | None = None) -> DataFrame:
        """EXACT Hardy-Weinberg test per variant over the project's
        genotypes (operators/assoc.py hwe_exact, Wigginton 2005): the
        rare-variant QC gate :meth:`hwe`'s asymptotic chi-square gets
        wrong at small expected het counts. Same implicit-hom-ref
        count derivation as :meth:`hwe`; the exact recurrence runs in
        variant-partitioned windows (no per-variant loop)."""
        from clinpy_spark.operators.assoc import hwe_exact

        d = self._dosage(rna, filtered)
        n_samples = cohort_size or self._cohort_size(d)
        per_v = d.groupBy(F.col("variant_id").alias("variant")).agg(
            F.sum(F.when(F.col("__dose") == 1, 1).otherwise(0))
            .alias("n_het"),
            F.sum(F.when(F.col("__dose") == 2, 1).otherwise(0))
            .alias("n_hom_alt"),
        ).select(
            "variant",
            (F.lit(n_samples) - F.col("n_het") - F.col("n_hom_alt"))
            .alias("n_hom_ref"),
            "n_het",
            "n_hom_alt",
        )
        return hwe_exact(per_v)

    def association(
        self,
        case_samples: list[str],
        test: str = "allelic",
        rna: bool = False,
        filtered: bool = False,
        cohort_size: int | None = None,
        n_case: int | None = None,
    ) -> DataFrame:
        """Case/control association per variant over the project's
        genotypes: ``test`` = 'allelic' (2x2 allele chi-square),
        'trend' (Cochran-Armitage), or 'or' (Haldane odds ratio + CI)
        — the from-counts forms in operators/assoc.py. Hom-ref
        subjects (no mapping row) contribute 0 to every carrier sum,
        so the full-cohort margins come from two scalar phenotype
        totals — a biobank-sized cohort never materializes its
        genotype matrix.

        Phenotype margins follow the SAME cohort that sizes ``n``:
        with the default cohort (samples that produced calls), cases
        are counted among those; with an explicit ``cohort_size``
        (cohort widened to include all-ref subjects), cases are
        counted against the project's samples store — a case whose
        every call is hom-ref is still a case, and its 2 ref alleles
        per variant belong in case_ref, not ctrl_ref. Pass ``n_case``
        explicitly when the phenotype roster is known out-of-band."""
        from clinpy_spark.operators.assoc import (
            allelic_chi2_from_counts, odds_ratio_from_counts,
            trend_chi2_from_moments)

        d = self._dosage(rna, filtered)
        n_all = cohort_size or self._cohort_size(d)
        if n_case is None:
            if cohort_size is not None:
                st = self.db.table("samples")
                id_col = ("samplename" if "samplename" in st.columns
                          else "sample_id")
                known = st.select(F.col(id_col).alias("samplename"))
            else:
                known = d.select("samplename")
            n_case = (
                known.filter(F.col("samplename").isin(case_samples))
                .distinct().count()
            )
        n_ctrl = n_all - n_case
        is_case = F.col("samplename").isin(case_samples)
        dose = F.col("__dose")
        sums = d.groupBy(F.col("variant_id").alias("variant")).agg(
            F.sum(F.when(is_case, dose).otherwise(0)).alias("case_alt"),
            F.sum(F.when(~is_case, dose).otherwise(0)).alias("ctrl_alt"),
            F.sum(dose * dose).alias("__sq"),
        )
        if test == "trend":
            per_v = sums.select(
                "variant",
                F.lit(n_all).alias("n"),
                F.lit(n_case).alias("n_case"),
                F.col("case_alt").alias("score_case"),
                (F.col("case_alt") + F.col("ctrl_alt")).alias("score_total"),
                "__sq",
            )
            return trend_chi2_from_moments(per_v)
        if test in ("allelic", "or"):
            per_v = sums.select(
                "variant",
                "case_alt",
                (2 * n_case - F.col("case_alt")).alias("case_ref"),
                "ctrl_alt",
                (2 * n_ctrl - F.col("ctrl_alt")).alias("ctrl_ref"),
            )
            if test == "allelic":
                return allelic_chi2_from_counts(per_v)
            return odds_ratio_from_counts(per_v)
        raise ValueError(f"unknown test {test!r}; "
                         "expected allelic | trend | or")

    def fst(
        self,
        case_samples: list[str],
        rna: bool = False,
        filtered: bool = False,
        cohort_size: int | None = None,
        n_case: int | None = None,
    ) -> DataFrame:
        """Per-variant Hudson F_ST between the named sub-cohort and the
        rest of the cohort (operators/assoc.py fst_from_counts) — which
        variants stratify the two groups. Allele counts derive from the
        carrier sums plus the phenotype margins (same implicit hom-ref
        arithmetic and the same margin rules as :meth:`association`),
        so the genotype matrix is never materialized."""
        from clinpy_spark.operators.assoc import fst_from_counts

        d = self._dosage(rna, filtered)
        n_all = cohort_size or self._cohort_size(d)
        if n_case is None:
            if cohort_size is not None:
                st = self.db.table("samples")
                id_col = ("samplename" if "samplename" in st.columns
                          else "sample_id")
                known = st.select(F.col(id_col).alias("samplename"))
            else:
                known = d.select("samplename")
            n_case = (
                known.filter(F.col("samplename").isin(case_samples))
                .distinct().count()
            )
        n_ctrl = n_all - n_case
        is_case = F.col("samplename").isin(case_samples)
        per_v = d.groupBy(F.col("variant_id").alias("variant")).agg(
            F.sum(F.when(is_case, F.col("__dose")).otherwise(0))
            .alias("alt1"),
            F.sum(F.when(~is_case, F.col("__dose")).otherwise(0))
            .alias("alt2"),
        ).select(
            "variant",
            F.lit(2 * n_case).alias("n1"),
            F.lit(2 * n_ctrl).alias("n2"),
            "alt1", "alt2",
        )
        return fst_from_counts(per_v)

    def sfs(
        self,
        rna: bool = False,
        filtered: bool = False,
        cohort_size: int | None = None,
        folded: bool = True,
    ) -> DataFrame:
        """Site frequency spectrum over the project's genotypes
        (operators/assoc.py sfs_from_counts): the minor-allele-count
        histogram whose shape summarizes the cohort's demography. AC
        comes from the non-ref mapping rows, AN from the cohort size —
        the implicit-hom-ref arithmetic shared by :meth:`hwe` and
        :meth:`association` (no genotype-matrix materialization)."""
        from clinpy_spark.operators.assoc import sfs_from_counts

        d = self._dosage(rna, filtered)
        n = cohort_size or self._cohort_size(d)
        per_v = d.groupBy(F.col("variant_id").alias("variant")).agg(
            F.sum("__dose").alias("__ac")
        ).select("variant", "__ac", F.lit(2 * n).alias("__an"))
        return sfs_from_counts(per_v, folded=folded)

    def fisher_exact(
        self,
        variant_id,
        case_samples: list[str],
        rna: bool = False,
        filtered: bool = False,
        cohort_size: int | None = None,
        n_case: int | None = None,
    ) -> DataFrame:
        """Fisher's EXACT carrier-vs-phenotype test for ONE variant
        (operators/assoc.py fisher_exact_from_counts): the small-count
        rare-variant association :meth:`association`'s chi-square
        family cannot give when expected cells are tiny. Carriers are
        subjects with any non-ref call at the variant; non-carrier
        cells derive arithmetically from the phenotype margins (same
        cohort/margin rules as :meth:`association`)."""
        from clinpy_spark.operators.assoc import fisher_exact_from_counts

        d = self._dosage(rna, filtered)
        n_all = cohort_size or self._cohort_size(d)
        if n_case is None:
            if cohort_size is not None:
                st = self.db.table("samples")
                id_col = ("samplename" if "samplename" in st.columns
                          else "sample_id")
                known = st.select(F.col(id_col).alias("samplename"))
            else:
                known = d.select("samplename")
            n_case = (
                known.filter(F.col("samplename").isin(case_samples))
                .distinct().count()
            )
        n_ctrl = n_all - n_case
        is_case = F.col("samplename").isin(case_samples)
        carriers = d.filter(
            (F.col("variant_id") == F.lit(variant_id))
            & (F.col("__dose") > 0))
        counts = carriers.agg(
            F.countDistinct(
                F.when(is_case, F.col("samplename"))).alias("a"),
            F.countDistinct(
                F.when(~is_case, F.col("samplename"))).alias("b"),
        ).select(
            "a", "b",
            _checked_complement("a", n_case, "n_case").alias("c"),
            _checked_complement("b", n_ctrl, "n_ctrl").alias("d"),
        )
        return fisher_exact_from_counts(counts)

    def fisher_exact_scan(
        self,
        case_samples: list[str],
        rna: bool = False,
        filtered: bool = False,
        cohort_size: int | None = None,
        n_case: int | None = None,
    ) -> DataFrame:
        """Per-variant Fisher exact carrier-vs-phenotype scan over the
        WHOLE store (operators/assoc.py fisher_exact_scan): the
        GWAS-shaped many-tables form of :meth:`fisher_exact` — exact
        p-values for every variant in two variant-keyed window passes,
        no per-variant loop. Margins follow :meth:`association`'s
        cohort rules; non-carrier cells derive arithmetically."""
        from clinpy_spark.operators.assoc import fisher_exact_scan

        d = self._dosage(rna, filtered)
        n_all = cohort_size or self._cohort_size(d)
        if n_case is None:
            if cohort_size is not None:
                st = self.db.table("samples")
                id_col = ("samplename" if "samplename" in st.columns
                          else "sample_id")
                known = st.select(F.col(id_col).alias("samplename"))
            else:
                known = d.select("samplename")
            n_case = (
                known.filter(F.col("samplename").isin(case_samples))
                .distinct().count()
            )
        n_ctrl = n_all - n_case
        is_case = F.col("samplename").isin(case_samples)
        counts = (
            d.filter(F.col("__dose") > 0)
            .groupBy(F.col("variant_id").alias("variant"))
            .agg(
                F.countDistinct(
                    F.when(is_case, F.col("samplename"))).alias("a"),
                F.countDistinct(
                    F.when(~is_case, F.col("samplename"))).alias("b"),
            )
            .select(
                "variant", "a", "b",
                _checked_complement("a", n_case, "n_case").alias("c"),
                _checked_complement("b", n_ctrl, "n_ctrl").alias("d"),
            )
        )
        return fisher_exact_scan(counts, "variant")

    def list_impacts(self, rna: bool = False, filtered: bool = False) -> list[str]:
        """Impact-table column names, for building filter dicts
        (reference variants.py:38-43 — schema reflection; here the
        parquet footer answers without a scan)."""
        _, imp_t, _ = self._names(rna, filtered)
        return self.db.table(imp_t).columns

    def list_variant_quals(self, rna: bool = False, filtered: bool = False) -> list[str]:
        """Mapping-table column names (qual/filter + the per-sample
        FORMAT-derived columns; reference variants.py:45-51)."""
        _, _, map_t = self._names(rna, filtered)
        return self.db.table(map_t).columns

    def describe(self, rna: bool = False, filtered: bool = False) -> str:
        """Counts summary (reference variants.py:111-118, returns an
        actual string with scalar counts — A2/A3)."""
        var_t, imp_t, map_t = self._names(rna, filtered)
        n_var = self.db.table(var_t).count()
        n_imp = self.db.table(imp_t).count()
        n_samp = self.db.table(map_t).select(
            F.countDistinct("samplename").alias("n")
        ).collect()[0].n
        return f"{n_var} variants in {n_samp} samples with {n_imp} impact rows"

    def variant(self, chrom: str, pos: int, ref: str, alt: str,
                rna: bool = False, filtered: bool = False) -> "Variant":
        return Variant(self, chrom, pos, ref, alt, rna, filtered)


class Variant:
    """One variant; lazy query methods (reference variants.py:121-173)."""

    def __init__(self, assay: Variants, chrom: str, pos: int, ref: str, alt: str,
                 rna: bool = False, filtered: bool = False):
        self.assay = assay
        self.chrom, self.pos, self.ref, self.alt = chrom, pos, ref, alt
        self.rna, self.filtered = rna, filtered

    def __repr__(self):
        return f"Variant({self.chrom}:{self.pos} {self.ref}>{self.alt})"

    def _mapping(self, cohort: list[str] | None = None) -> DataFrame:
        var_t, _, map_t = self.assay._names(self.rna, self.filtered)
        me = self.assay.db.table(var_t).filter(
            (F.col("chrom") == self.chrom) & (F.col("pos") == self.pos)
            & (F.col("ref") == self.ref) & (F.col("alt") == self.alt)
        ).select("variant_id")
        mapping = self.assay.db.table(map_t)
        if cohort:
            # two-hop semi join through the samples dimension (J7 shape,
            # same as Junctions/Expression cohort resolution): the member
            # list is a broadcast-size dim slice, never a shuffle of the
            # mapping fact.
            members = (
                self.assay.db.table("samples")
                .filter(F.col("cohort").isin(cohort))
                .select(F.col("sample_id").alias("samplename"))
            )
            mapping = mapping.join(F.broadcast(members), "samplename", "left_semi")
        return mapping.join(F.broadcast(me), "variant_id", "left_semi")

    def samples(self, genotype: str | None = None,
                cohort: list[str] | None = None) -> DataFrame:
        """Samples carrying this variant, optionally only hom/het and/or
        restricted to named cohorts (reference variants.py:145-168;
        the ``cohort=`` parameter finishes the reference signature at
        variants.py:145, which accepts it but never implements it)."""
        m = self._mapping(cohort)
        if genotype:
            gt = {"het": GT_HET, "hom": GT_HOM}.get(genotype, genotype)
            m = m.filter(F.col("gt") == gt)
        return m.select("samplename").distinct()

    def impact(self) -> DataFrame:
        """This variant's impact rows (reference variants.py:163-171
        ``impact`` property — a method here: it runs a query, and the
        reference's own docstring calls every assay access lazy)."""
        var_t, imp_t, _ = self.assay._names(self.rna, self.filtered)
        me = self.assay.db.table(var_t).filter(
            (F.col("chrom") == self.chrom) & (F.col("pos") == self.pos)
            & (F.col("ref") == self.ref) & (F.col("alt") == self.alt)
        ).select("variant_id")
        return self.assay.db.table(imp_t).join(F.broadcast(me), "variant_id", "left_semi")

    def counts(self, samples: list | None = None,
               cohort: list[str] | None = None) -> DataFrame:
        """Allele stats for THIS variant over an optional sample subset
        and/or cohort restriction (ac/an/af/n_het/n_hom) — finishes the
        reference's ``counts`` TODO stub (variants.py:136-143, whose
        signature accepts ``samples=, cohort=`` but is ``pass``) by
        composing :func:`allele_counts` over the variant's own mapping
        rows, cohort-restricted via the samples-dimension semi join."""
        return allele_counts(self._mapping(cohort), samples)


def allele_counts(mapping: DataFrame, samples: list | None = None) -> DataFrame:
    """Per-variant allele stats over a sample subset — finishes the
    reference's stub (variants.py:136-143 TODO, A7): AC (alt allele
    count), AN (allele number), AF, n_het, n_hom.
    """
    m = mapping
    if samples:
        m = m.filter(F.col("samplename").isin(samples))
    is_het = F.col("gt") == GT_HET
    is_hom = F.col("gt") == GT_HOM
    dose = F.when(is_hom, 2).when(is_het, 1).otherwise(0)
    return m.groupBy("variant_id").agg(
        F.sum(dose).alias("ac"),
        (F.count("*") * 2).alias("an"),
        (F.sum(dose) / (F.count("*") * 2)).alias("af"),
        F.count(F.when(is_het, 1)).alias("n_het"),
        F.count(F.when(is_hom, 1)).alias("n_hom"),
    )
