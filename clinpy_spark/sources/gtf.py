"""GTF/GFF2 gene-annotation reader and genome-catalog builder.

The reference keeps gene/transcript/exon/intron tables in a separate
pytxdb genome database built externally from Ensembl (readme.md:53-68)
and joins against it in every Junction method (junction.py:159, 196-198,
240-244, 351-352). This module replaces that external dependency with a
distributed build straight from the public GTF format: one text scan,
attribute parsing via regexp (JVM-side), genes/transcripts/exons
projected by feature type, and introns DERIVED as the gaps between
consecutive exons of each transcript (a lag window over exon starts —
no driver loop, no external tool).

Scale: the scan parallelizes over the (typically multi-hundred-MB,
splittable-when-uncompressed) GTF; the intron window shuffles once on
transcript id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinpy_spark.session import ProjectCatalog

_GTF_COLS = ("chrom", "source", "feature", "start", "end", "score", "strand", "frame", "attributes")


def _attr(name: str):
    """Extract one `key "value";`-style GTF attribute (empty -> NULL)."""
    ex = F.regexp_extract("attributes", rf'{name} "([^"]*)"', 1)
    return F.when(ex == "", None).otherwise(ex)


def read_gtf(spark: SparkSession, path: str) -> DataFrame:
    """Raw GTF rows: 9 tab-separated columns, '#' comment lines dropped."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    parts = F.split("value", "\t")
    return lines.select(*[
        parts.getItem(i).alias(c) for i, c in enumerate(_GTF_COLS)
    ]).withColumns({
        "start": F.col("start").cast("long"),
        "end": F.col("end").cast("long"),
    })


def build_genome_catalog(spark: SparkSession, gtf_path: str, genome_dir: str) -> ProjectCatalog:
    """GTF -> genome project dir with the four tables the assay API joins
    against (schemas match the reference's pytxdb surface, SURVEY §1.2):

    - genes(id, chrom, start, end, strand, name, description, biotype)
    - transcripts(id, gene, start, end, biotype)
    - exons(transcript, start, end, chrom, strand, exon_number)
    - introns(transcript, start, end, chrom, strand) — derived per
      transcript as [prev exon end, next exon start] via a lag window.
    """
    gtf = read_gtf(spark, gtf_path)

    genes = gtf.filter(F.col("feature") == "gene").select(
        _attr("gene_id").alias("id"),
        "chrom", "start", "end", "strand",
        _attr("gene_name").alias("name"),
        _attr("description").alias("description"),
        F.coalesce(_attr("gene_biotype"), _attr("gene_type")).alias("biotype"),
    )
    transcripts = gtf.filter(F.col("feature") == "transcript").select(
        _attr("transcript_id").alias("id"),
        _attr("gene_id").alias("gene"),
        "start", "end",
        F.coalesce(_attr("transcript_biotype"), _attr("transcript_type")).alias("biotype"),
    )
    exons = gtf.filter(F.col("feature") == "exon").select(
        _attr("transcript_id").alias("transcript"),
        "start", "end", "chrom", "strand",
        _attr("exon_number").cast("long").alias("exon_number"),
    )

    w = Window.partitionBy("transcript").orderBy("start")
    introns = (
        exons.withColumn("__prev_end", F.lag("end").over(w))
        .filter(F.col("__prev_end").isNotNull() & (F.col("__prev_end") < F.col("start")))
        .select(
            "transcript",
            F.col("__prev_end").alias("start"),
            F.col("start").alias("end"),
            "chrom", "strand",
        )
    )

    catalog = ProjectCatalog(spark, genome_dir)
    catalog.write(genes, "genes")
    catalog.write(transcripts, "transcripts")
    catalog.write(exons, "exons")
    catalog.write(introns, "introns")
    return catalog
