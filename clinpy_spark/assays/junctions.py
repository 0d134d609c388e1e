"""Junctions assay + Junction entity (reference assays/junction.py —
the richest query surface in the reference; bug fixes per SURVEY.md §8).

Every method builds a lazy DataFrame; nothing is collected until the
caller acts. The reference's driver-side overlap loop (junction.py:
294-321) is a column expression here (J13); interval joins against the
genome run as broadcast range joins (annotation sides are small) with
the binned join available for large-large cases (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.assays.base import Assay
from clinpy_spark.functions.ids import junction_id
from clinpy_spark.functions.intervals import overlap_fraction


class Junctions(Assay):
    def _tables(self, filtered: bool) -> tuple[str, str]:
        # junction.py:28-35: filtered flag picks table pair.
        return (
            ("junctions", "sample_to_junction")
            if filtered
            else ("all_junctions", "sample_to_alljunction")
        )

    def select(
        self,
        samples: list | None = None,
        cohort: list[str] | None = None,
        counts: bool = True,
        uniq: bool = False,
        filtered: bool = True,
        df: bool = True,
    ) -> DataFrame | list["Junction"]:
        """Junctions, optionally with per-sample read counts, filtered by
        sample list or cohort (reference junction.py:14-61: P1 + J1
        bridge join + J7 two-hop semi-join).

        ``uniq=True`` drops the per-sample dimension and returns distinct
        junctions (the reference's ``uniq`` flag).

        ``df=False`` returns :class:`Junction` entity objects instead of
        a DataFrame (reference junction.py:63-72 — whose loop RETURNS on
        the first iteration, so it only ever yields one object; fixed
        here: one entity per distinct junction, each with the live
        ``.samples()`` / genome query surface). This is a deliberate
        collect at the API edge — entity count is the distinct-junction
        cardinality of the selection, and the reference also
        materializes here. Unlike the reference, ``uniq=True`` with
        ``df=False`` is supported (entities carry coordinates, not
        per-sample counts, so the NotImplementedError at :71 is moot).
        """
        out = self._select_df(samples, cohort, counts, uniq, filtered)
        if df:
            return out
        coords = ["chrom", "start", "end", "strand"]
        rows = out.select(*coords).dropDuplicates(coords).collect()
        return [
            Junction(self, r.chrom, r.start, r.end, r.strand, filtered)
            for r in rows
        ]

    def _select_df(
        self,
        samples: list | None,
        cohort: list[str] | None,
        counts: bool,
        uniq: bool,
        filtered: bool,
    ) -> DataFrame:
        junc_t, bridge_t = self._tables(filtered)
        junc = self.db.table(junc_t)
        if not counts and not samples and not cohort:
            return junc.distinct() if uniq else junc

        bridge = self.db.table(bridge_t)
        if cohort:
            members = (
                self.db.table("samples")
                .filter(F.col("cohort").isin(cohort))
                .select(F.col("sample_id").alias("samplename"))
            )
            bridge = bridge.join(F.broadcast(members), "samplename", "left_semi")
        if samples:
            bridge = bridge.filter(F.col("samplename").isin(samples))

        # Write-time catalog stats drive the build-side choice: a small
        # junction master broadcasts (no shuffle of the big bridge); an
        # unknown or large one falls through to Spark's own estimate.
        junc = self.db.hint_small(junc_t, junc)
        if uniq:
            return junc.join(
                bridge.select("junction").distinct(),
                junc.id == F.col("junction"), "left_semi",
            )
        out = junc.join(bridge, junc.id == bridge.junction)
        if not counts:
            out = out.drop("uniq_map", "multi_map")
        return out.drop("junction")

    def search(
        self,
        chrom: "str | DataFrame",
        start: int | None = None,
        end: int | None = None,
        strand: str | None = None,
        samples: list | None = None,
        unique: bool = False,
        filtered: bool = True,
    ) -> DataFrame:
        """Junctions overlapping a region (reference junction.py:76-112):
        same chrom+strand, ``end >= start AND start <= end`` overlap.
        ``samples`` restricts the JUNCTION SET to those carried by the
        given samples (the reference's IN-subquery; note its documented
        semantics: with ``unique=False`` the sample join still returns
        every carrier of a matching junction, not only the listed ones).
        ``unique=True`` returns coordinates only. Chrom-partitioned
        masters prune the scan to one partition; the bridge join
        broadcasts the (small) region-matched junction set.

        Passing a DataFrame of regions as the first argument (the
        reference's pyranges form) delegates to :meth:`search_regions`."""
        if isinstance(chrom, DataFrame):
            return self.search_regions(
                chrom, samples=samples, unique=unique, filtered=filtered)
        junc_t, bridge_t = self._tables(filtered)
        j = self.db.table(junc_t).filter(
            (F.col("chrom") == chrom) & (F.col("strand") == strand)
            & (F.col("end") >= start) & (F.col("start") <= end)
        )
        bridge = self.db.table(bridge_t)
        if samples:
            carried = bridge.filter(F.col("samplename").isin(samples)).select("junction")
            j = j.join(F.broadcast(carried), j.id == F.col("junction"), "left_semi")
        if unique:
            return j.select("chrom", "start", "end", "strand")
        return (
            j.join(bridge, j.id == bridge.junction)
            .select("chrom", "start", "end", "strand",
                    "samplename", "uniq_map", "multi_map")
        )

    def search_regions(
        self,
        regions: DataFrame,
        samples: list | None = None,
        unique: bool = False,
        filtered: bool = True,
        bin_size: int = 100_000,
    ) -> DataFrame:
        """Batch form of :meth:`search` — the reference's
        ``Junctions.search(gr)`` takes a pyranges object, i.e. a TABLE
        of regions (junction.py:74-112); this takes the Spark-native
        equivalent: a DataFrame with columns ``chrom``, ``start``,
        ``end`` and optionally ``strand`` and ``region_id``. Output rows
        are keyed by ``region_id`` (stamped deterministically from the
        coordinates when absent), one row per (region, overlapping
        junction[, carrier]) — the pyranges join result, relational.

        Runs through :func:`binned_interval_join`: both sides can be
        large (a million-region panel against the full junction master
        stays an equi-join on (chrom[, strand], bin) — never a
        broadcast-nested-loop), and the chrom partition key lines up
        with the master's chrom-partitioned layout for pruning."""
        from clinpy_spark.functions.intervals import binned_interval_join

        rcols = set(regions.columns)
        if not {"chrom", "start", "end"} <= rcols:
            raise ValueError("regions needs chrom/start/end columns")
        if "region_id" not in rcols:
            regions = regions.withColumn(
                "region_id",
                F.xxhash64("chrom", "start", "end",
                           *(["strand"] if "strand" in rcols else [])),
            )
        ren = {"chrom": "region_chrom", "start": "region_start",
               "end": "region_end", "strand": "region_strand"}
        reg = regions.select(
            "region_id",
            *[F.col(c).alias(ren[c]) for c in ("chrom", "start", "end", "strand")
              if c in rcols],
        )
        keys = [("chrom", "region_chrom")]
        if "region_strand" in reg.columns:
            keys.append(("strand", "region_strand"))

        junc_t, bridge_t = self._tables(filtered)
        j = self.db.table(junc_t)
        bridge = self.db.table(bridge_t)
        if samples:
            carried = bridge.filter(
                F.col("samplename").isin(samples)).select("junction")
            j = j.join(F.broadcast(carried), j.id == F.col("junction"),
                       "left_semi")
        hits = binned_interval_join(
            j, reg,
            left_start="start", left_end="end",
            right_start="region_start", right_end="region_end",
            partition_keys=keys,
            bin_size=bin_size,
        )
        if unique:
            return hits.select("region_id", "chrom", "start", "end", "strand")
        return (
            hits.join(bridge, hits.id == bridge.junction)
            .select("region_id", "chrom", "start", "end", "strand",
                    "samplename", "uniq_map", "multi_map")
        )

    def filter(self, junc_func: Callable, schema=None, write: bool = False,
               **kwargs) -> DataFrame:
        """Per-sample user filter (reference junction.py:113-130 U1 +
        readme.md:109-111): ``junc_func(pandas_df, **kwargs) -> pandas_df``
        over columns (chrom,start,end,strand,uniq_map,multi_map,
        samplename), applied independently per sample — exactly Spark's
        grouped-map ``applyInPandas``.

        ``write=True`` completes the reference's intent (the stub at
        junction.py:113-130 was meant to WRITE the filtered junction
        tables): the surviving rows replace the ``junctions`` master
        (dedup + hash id, chrom-partitioned/start-sorted like the ETL)
        and ``sample_to_junction`` bridge. Requires the default schema
        (natural keys must survive the filter).
        """
        import functools

        junc = self.db.table("all_junctions")
        bridge = self.db.table("sample_to_alljunction")
        full = junc.join(bridge, junc.id == bridge.junction).select(
            "chrom", "start", "end", "strand", "uniq_map", "multi_map", "samplename"
        )
        fn = functools.partial(junc_func, **kwargs) if kwargs else junc_func
        out_schema = schema or full.schema
        out = full.groupBy("samplename").applyInPandas(lambda pdf: fn(pdf), out_schema)
        if write:
            if schema is not None:
                raise ValueError("write=True requires the default schema")
            from clinpy_spark.functions.ids import junction_id

            out = out.localCheckpoint(eager=True)  # run the UDF once
            natural = ["chrom", "start", "end", "strand"]
            master = (
                out.select(*natural).dropDuplicates(natural)
                .withColumn("id", junction_id()).select("id", *natural)
            )
            self.db.write(master.sortWithinPartitions("start"), "junctions",
                          partition_by=["chrom"])
            self.db.write(
                out.select("samplename", junction_id().alias("junction"),
                           "uniq_map", "multi_map"),
                "sample_to_junction",
            )
        return out

    def nearest_genes(self, filtered: bool = True,
                      max_distance: int | None = None) -> DataFrame:
        """Nearest gene per junction across the whole table (overlap ->
        distance 0), the bulk annotation pyranges users run after the
        reference hands them raw ranges (junction.py:176-185). Scales as
        the composed nearest-interval join (operators/genome.py) — no
        cross join."""
        from clinpy_spark.operators.genome import nearest_feature

        if self.genome is None:
            raise ValueError("no genome catalog attached to this project")
        junc_t, _ = self._tables(filtered)
        return nearest_feature(
            self.db.table(junc_t), self.genome.table("genes"),
            max_distance=max_distance,
        ).withColumnRenamed("f_id", "gene")

    def junction(self, chrom: str, start: int, end: int, strand: str,
                 filtered: bool = True) -> "Junction":
        return Junction(self, chrom, start, end, strand, filtered)


class Junction:
    """One junction; methods are lazy queries (reference junction.py:
    133-385: 'like all other assays this is lazy')."""

    def __init__(self, assay: Junctions, chrom: str, start: int, end: int,
                 strand: str, filtered: bool = True):
        self.assay = assay
        self.chrom, self.start, self.end, self.strand = chrom, start, end, strand
        self.filtered = filtered

    def __repr__(self):
        return f"Junction({self.chrom}:{self.start}-{self.end}:{self.strand})"

    # -- project-side queries ------------------------------------------

    def _candidates(self) -> DataFrame:
        junc_t, _ = self.assay._tables(self.filtered)
        return self.assay.db.table(junc_t).filter(
            (F.col("chrom") == self.chrom) & (F.col("strand") == self.strand)
        )  # junction.py:279-280 (P4)

    def samples(
        self,
        mode: str = "exact",
        tol5: int = 0,
        tol3: int = 0,
        min_overlap: float = 0.9,
        reciprocal: bool = False,
        annotate: bool = False,
    ) -> DataFrame:
        """Samples carrying 'the same' junction under exact / tolerance /
        overlap matching (reference junction.py:265-338, J8/J12/J13 —
        the overlap mode's driver loop is a column expression here).
        """
        cand = self._candidates()
        if mode == "exact":
            matches = cand.filter((F.col("start") == self.start) & (F.col("end") == self.end))
        elif mode == "tolerance":
            matches = cand.filter(
                (F.col("start") >= self.start - tol5) & (F.col("end") <= self.end + tol3)
            )  # junction.py:285-287 (J12)
        elif mode == "overlap":
            s, e = F.lit(self.start), F.lit(self.end)
            frac_self = overlap_fraction(s, e, F.col("start"), F.col("end"))
            frac_other = overlap_fraction(F.col("start"), F.col("end"), s, e)
            cond = frac_self >= min_overlap
            if reciprocal:
                cond = cond & (frac_other >= min_overlap)  # junction.py:302-315 (J13)
            matches = cand.filter(cond)
        else:
            raise ValueError("mode must be exact|tolerance|overlap")

        _, bridge_t = self.assay._tables(self.filtered)
        bridge = self.assay.db.table(bridge_t)
        hits = bridge.join(
            F.broadcast(matches.select("id")), bridge.junction == F.col("id"), "left_semi"
        )  # junction.py:281-290 (J8 semi)
        if not annotate:
            return hits.select("samplename").distinct()
        junc_t, _ = self.assay._tables(self.filtered)
        coords = self.assay.db.table(junc_t)
        return hits.join(coords, hits.junction == coords.id, "left").drop("id")  # J9

    # -- genome-side queries -------------------------------------------

    def _genome(self):
        if self.assay.genome is None:
            raise ValueError("no genome catalog attached to this project")
        return self.assay.genome

    def genes(self) -> DataFrame:
        """Genes whose span covers the junction start OR end, same
        chrom+strand (reference junction.py:152-185, J10 interval join —
        annotation side broadcast)."""
        g = self._genome().table("genes")
        s, e = F.lit(self.start), F.lit(self.end)
        covers = ((F.col("start") <= s) & (F.col("end") >= s)) | (
            (F.col("start") <= e) & (F.col("end") >= e)
        )
        return g.filter(
            (F.col("chrom") == self.chrom) & (F.col("strand") == self.strand) & covers
        )

    def transcripts(self, biotype: list[str] | None = None) -> DataFrame:
        """Transcripts of those genes whose span covers either end
        (reference junction.py:187-227, J11)."""
        tx = self._genome().table("transcripts")
        hit_genes = self.genes().select(F.col("id").alias("__gid"))
        tx = tx.join(F.broadcast(hit_genes), tx.gene == F.col("__gid"), "left_semi")
        s, e = F.lit(self.start), F.lit(self.end)
        covers = ((F.col("start") <= s) & (F.col("end") >= s)) | (
            (F.col("start") <= e) & (F.col("end") >= e)
        )
        tx = tx.filter(covers)
        if biotype:
            tx = tx.filter(F.col("biotype").isin(biotype))
        return tx

    def features(self, transcripts: list[str] | None = None) -> DataFrame:
        """Classify the junction's start and end as landing in an exon or
        intron of the given (or overlapping) transcripts (reference
        junction.py:229-263, J14 point-in-interval join; the reference's
        pandas IntervalArray becomes a relational union of two
        point-in-interval joins tagged with a literal).
        """
        if transcripts:
            keep = lambda t: t.filter(F.col("transcript").isin(transcripts))  # noqa: E731
        else:
            # Semi-join against the overlapping-transcripts query — same
            # plan shape as J8, no driver round-trip (the id list never
            # materializes on the driver).
            tx_ids = self.transcripts().select(F.col("id").alias("transcript"))
            keep = lambda t: t.join(F.broadcast(tx_ids), "transcript", "left_semi")  # noqa: E731
        out = []
        for table, tag in (("exons", "exon"), ("introns", "intron")):
            t = keep(self._genome().table(table))
            for point, which in ((self.start, "start"), (self.end, "end")):
                out.append(
                    t.filter((F.col("start") <= point) & (F.col("end") >= point))
                    .select(
                        "transcript",
                        F.lit(which).alias("junction_side"),
                        F.lit(tag).alias("feature"),
                        "start", "end",
                    )
                )
        res = out[0]
        for df in out[1:]:
            res = res.unionByName(df)
        return res

    def nearest_gene(self, max_distance: int | None = None) -> DataFrame:
        """The closest gene to THIS junction on its chrom (distance 0
        when overlapping) — complements :meth:`genes`, which only
        returns genes covering an endpoint."""
        from clinpy_spark.operators.genome import nearest_feature

        spark = self.assay.db.spark
        me = spark.createDataFrame(
            [(0, self.chrom, self.start, self.end)],
            "id long, chrom string, start long, end long",
        )
        return nearest_feature(
            me, self._genome().table("genes"), max_distance=max_distance
        ).select(F.col("f_id").alias("gene"), "distance")

    def new_transcript(
        self,
        transcript: str,
        frags: DataFrame | None = None,
        sequence: bool = False,
        kind: str = "nuc",
    ) -> DataFrame:
        """Exon structure of ``transcript`` with boundaries trimmed at the
        junction: exons fully 5' of the junction keep their coords, the
        flanking exons are cut to the junction's start/end, exons inside
        the junction span are dropped (reference junction.py:342-376 U3).

        ``sequence=True`` additionally assembles the new transcript's
        sequence from a :func:`~clinpy_spark.sources.fasta.read_fasta`
        fragment table (``frags``) — the reference's
        ``genome.get_sequence`` step (junction.py:369-375): spliced
        concat of the trimmed exons, reverse-complemented for '-'
        transcripts; ``kind="aa"`` translates to amino acids. Returns a
        1-row (transcript, strand, sequence) DataFrame in that mode.
        """
        if sequence and frags is None:
            raise ValueError("sequence=True needs a read_fasta fragment table (frags=)")
        ex = self._genome().table("exons").filter(F.col("transcript") == transcript)
        s, e = F.lit(self.start), F.lit(self.end)
        kept = ex.filter((F.col("end") <= s) | (F.col("start") >= e) |
                         ((F.col("start") <= s) & (F.col("end") >= s)) |
                         ((F.col("start") <= e) & (F.col("end") >= e)))
        trimmed = kept.select(
            "transcript",
            F.when((F.col("start") <= e) & (F.col("end") >= e), e)
            .otherwise(F.col("start")).alias("start"),
            F.when((F.col("start") <= s) & (F.col("end") >= s), s)
            .otherwise(F.col("end")).alias("end"),
            "chrom", "strand",
        )
        trimmed = trimmed.filter(F.col("start") < F.col("end")).distinct().orderBy("start")
        if not sequence:
            return trimmed
        from clinpy_spark.sources.fasta import fetch_transcript_sequences, translate

        seq = fetch_transcript_sequences(frags, trimmed)
        if kind == "aa":
            seq = seq.withColumn("sequence", translate("sequence"))
        elif kind != "nuc":
            raise ValueError(f"kind must be 'nuc' or 'aa', got {kind!r}")
        return seq
