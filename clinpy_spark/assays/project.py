"""Project / samples assay (reference assays/project.py).

``samples`` is the dimension table; mandatory columns are ``sample_id``
and ``cohort`` (create_project.py:57-61); arbitrary metadata columns plus
a ``user_annot`` map column ride along (SURVEY.md §8 normalizes the
reference's sample_id/study_id confusion to ``sample_id``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.assays.base import Assay


class Project(Assay):
    def view_meta_fields(self) -> list[str]:
        """Queryable sample-metadata field names: the samples table's
        columns plus the keys present in the ``user_annot`` map
        (reference project.py:12-18 — which reads one row's JSON blob
        and misses keys other rows carry; here the key set is the
        DISTINCT union over the whole table, one exploded aggregate)."""
        df = self.db.table("samples")
        static = [c for c in df.columns if c != "user_annot"]
        keys = (
            df.select(F.explode(F.map_keys(F.coalesce(
                F.col("user_annot"), F.expr("cast(map() as map<string,string>)")
            ))).alias("k"))
            .distinct().collect()
        )
        return static + sorted(r.k for r in keys)

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

        ``user_annot`` is a real ``map<string,string>`` (SURVEY §1.5):
        the new keys MERGE into the existing map (new values win on key
        collision) instead of replacing the whole blob. Parquet has no
        point UPDATE; the rewrite goes through ``update_staged`` — a
        fresh read, staged write, and atomic swap all under the
        per-table lock, so concurrent annotations serialize and none is
        lost. No driver collect.
        """
        new_keys = list(annotation.keys())
        new_map = F.create_map(*[
            F.lit(x) for k in new_keys for x in (str(k), str(annotation[k]))
        ])
        old = F.coalesce(
            F.col("user_annot"), F.expr("cast(map() as map<string,string>)")
        )
        merged = F.map_concat(
            F.map_filter(old, lambda k, _: ~k.isin([str(k_) for k_ in new_keys])),
            new_map,
        )
        self.db.update_staged(
            "samples",
            lambda df: df.withColumn(
                "user_annot",
                F.when(F.col("sample_id") == F.lit(sample_id), merged)
                .otherwise(F.col("user_annot")),
            ),
        )

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

    # -- clinical time-to-event readouts over the samples dimension --

    def _cohort_obs(self, time_field: str, event_field: str,
                    by: str) -> DataFrame:
        """(grp, t, evt) observations from samples columns or
        ``user_annot`` map keys (annotation values are strings — cast
        here); rows missing either clinical field are dropped."""
        df = self.db.table("samples")

        def col_of(field: str) -> F.Column:
            if field in df.columns:
                return F.col(field)
            return F.col("user_annot").getItem(field)

        obs = df.select(
            col_of(by).cast("string").alias("grp"),
            col_of(time_field).cast("long").alias("t"),
            col_of(event_field).cast("int").alias("evt"),
        )
        return obs.filter(F.col("t").isNotNull() & F.col("evt").isNotNull())

    def survival(
        self,
        time_field: str,
        event_field: str,
        by: str = "cohort",
        estimator: str = "km",
    ) -> DataFrame:
        """Survival readout per cohort straight from the project's
        sample store (fields from samples columns or user_annot):
        ``estimator`` = 'km' (Kaplan-Meier curve), 'ci' (KM +
        Greenwood bands), or 'na' (Nelson-Aalen cumulative hazard) —
        operators/survival.py over the (by, time, event) observations.
        The clinical companion to Variants.hwe/association."""
        from clinpy_spark.operators.survival import (
            km_curve, km_greenwood, nelson_aalen)

        fn = {"km": km_curve, "ci": km_greenwood, "na": nelson_aalen}.get(
            estimator)
        if fn is None:
            raise ValueError(
                f"unknown estimator {estimator!r}; expected km | ci | na")
        return fn(self._cohort_obs(time_field, event_field, by),
                  "t", "evt", "grp")

    def logrank(
        self,
        time_field: str,
        event_field: str,
        group_a: str,
        group_b: str,
        by: str = "cohort",
    ) -> DataFrame:
        """Two-cohort log-rank test over the sample store — do the two
        named cohorts share a survival curve? (operators/survival.py
        logrank_test)."""
        from clinpy_spark.operators.survival import logrank_test

        return logrank_test(
            self._cohort_obs(time_field, event_field, by),
            "t", "evt", "grp", group_a, group_b)

    def logrank_k(
        self,
        time_field: str,
        event_field: str,
        by: str = "cohort",
        groups: list | None = None,
    ) -> DataFrame:
        """k-cohort log-rank test over the sample store — do ALL the
        cohorts (or the named subset) share a survival curve? One row
        per cohort plus the pooled k-1-df chi-square
        (operators/survival.py logrank_k). The reference's cohort model
        is k-ary (clinpy/assays/project.py:60-66); this is the matching
        k-arm readout."""
        from clinpy_spark.operators.survival import logrank_k

        obs = self._cohort_obs(time_field, event_field, by)
        if groups is not None:
            obs = obs.filter(F.col("grp").isin(list(groups)))
        return logrank_k(obs, "t", "evt", "grp")
