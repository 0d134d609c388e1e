"""Expression assay (reference assays/expression.py, bugs fixed:
correct table/column per SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.assays.base import Assay


class Expression(Assay):
    def select(
        self,
        features: list[str] | None = None,
        samples: list | None = None,
        cohort: list[str] | None = None,
        what: str = "gene",
        metric: str | None = None,
        long: bool = True,
    ) -> DataFrame:
        """Expression values, long by default; ``long=False`` pivots to a
        feature × sample matrix of ``metric`` (reference expression.py:
        17-61: P1/P3 + J7 cohort semi-join + A6 pivot).
        """
        if what not in ("gene", "transcript"):
            raise ValueError("what must be 'gene' or 'transcript'")
        table = "gene_expression" if what == "gene" else "transcript_expression"
        key = what
        df = self.db.table(table)
        if features:
            df = df.filter(F.col(key).isin(features))
        if samples:
            df = df.filter(F.col("samplename").isin(samples))
        if cohort:
            members = (
                self.db.table("samples")
                .filter(F.col("cohort").isin(cohort))
                .select(F.col("sample_id").alias("samplename"))
            )
            df = df.join(F.broadcast(members), "samplename", "left_semi")
        if long:
            return df
        metric = metric or "tpm"
        # Pivot values are left open (samples unknown a priori); callers
        # with >10k samples should raise spark.sql.pivotMaxValues or stay
        # long (SURVEY.md §7 hard-point 4).
        return df.groupBy(key).pivot("samplename").agg(F.first(metric))

    def normalize(
        self,
        what: str = "gene",
        method: str = "cpm",
        log2: bool = False,
        **select_kwargs,
    ) -> DataFrame:
        """Long expression with a per-sample normalized column appended
        (beyond-reference extension; the reference stores RSEM's
        TPM/FPKM but offers no within-project normalization).

        ``cpm``: expected_count scaled to counts-per-million over each
        sample's library size — one window over samplename (a single
        shuffle), no driver pass. ``log2`` applies log2(x + 1).
        """
        if method != "cpm":
            raise ValueError(f"unknown normalization method {method!r}")
        from pyspark.sql import Window

        df = self.select(what=what, long=True, **select_kwargs)
        lib = F.sum("expected_count").over(Window.partitionBy("samplename"))
        norm = F.col("expected_count") * F.lit(1_000_000.0) / lib
        if log2:
            norm = F.log2(norm + F.lit(1.0))
        return df.withColumn("cpm", norm)
