"""Project / samples assay (reference assays/project.py).

``samples`` is the dimension table; mandatory columns are ``sample_id``
and ``cohort`` (create_project.py:57-61); arbitrary metadata columns plus
a ``user_annot`` map column ride along (SURVEY.md §8 normalizes the
reference's sample_id/study_id confusion to ``sample_id``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.assays.base import Assay


class Project(Assay):
    def samples(self, cohort: list[str] | None = None,
                samples: list | None = None,
                columns: list[str] | None = None) -> DataFrame:
        """Sample metadata, optionally filtered (reference project.py:20-39:
        P1 projection + P3 isin)."""
        df = self.db.table("samples")
        if cohort:
            df = df.filter(F.col("cohort").isin(cohort))
        if samples:
            df = df.filter(F.col("sample_id").isin(samples))
        if columns:
            keep = ["sample_id", "cohort"] + [c for c in columns if c not in ("sample_id", "cohort")]
            df = df.select(*keep)
        return df

    def annotate_sample(self, sample_id, annotation: dict) -> None:
        """Upsert free-form annotation (reference project.py:41-53, S11).

        Parquet has no point UPDATE; the samples dim is small by design,
        so this is a read-modify-overwrite of one table — the documented
        scale stance in SURVEY.md §4.2 (Delta MERGE if it ever grows).
        """
        df = self.db.table("samples")
        payload = json.dumps(annotation, sort_keys=True)
        updated = df.withColumn(
            "user_annot",
            F.when(F.col("sample_id") == F.lit(sample_id), F.lit(payload))
            .otherwise(F.col("user_annot")),
        )
        # Materialize before overwriting the source directory.
        rows = updated.collect()
        out = self.spark.createDataFrame(rows, updated.schema)
        self.db.write(out, "samples", mode="overwrite")

    def describe(self) -> str:
        """Per-cohort sample counts (reference project.py:56-66, A1)."""
        counts = (
            self.db.table("samples").groupBy("cohort").agg(F.count("*").alias("n"))
            .orderBy("cohort").collect()
        )
        total = sum(r.n for r in counts)
        lines = [f"Project with {total} samples:"] + [
            f"  cohort {r.cohort}: {r.n}" for r in counts
        ]
        return "\n".join(lines)
