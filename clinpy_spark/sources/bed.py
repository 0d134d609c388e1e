"""BED interval file source.

The reference hands genomic intervals around as pyranges objects
(junction.py:176-185, 229-263); BED is the interchange format those
objects load from/save to, so a Spark-native BED scan closes the loop:
any external annotation track becomes a features DataFrame usable by
the interval/nearest operators (functions/intervals.py,
operators/genome.py).

BED3..BED6 columns: chrom, start, end [, name, score, strand]. Header
noise (``track``/``browser``/``#`` lines) is filtered; missing trailing
columns null-pad, '.' placeholders become NULL. Everything stays a
DataFrame scan — executors parse in parallel, filters/projection push
into the CSV reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: chrom/start/end are mandatory (BED3); the rest null-pad.
_BED6 = ["chrom", "start", "end", "name", "score", "strand"]


def read_bed(spark: SparkSession, path: str, samplename: str | None = None) -> DataFrame:
    """BED3..BED6 -> DataFrame(chrom, start, end, name, score, strand
    [, samplename]). start/end are the BED half-open 0-based coordinates
    as written (callers that mix BED with 1-based sources shift
    explicitly — silent coordinate fixups are how off-by-ones spread)."""
    # Explicit all-string schema: the CSV reader would otherwise derive
    # the column count from the FIRST line (a 1-column ``track`` header
    # truncates every data row); with a fixed schema short rows null-pad
    # and extra BED12 columns are ignored.
    schema = ", ".join(f"{c} string" for c in _BED6)
    df = spark.read.csv(path, sep="\t", header=False, schema=schema, mode="PERMISSIVE")
    df = df.filter(
        ~F.col("chrom").startswith("track")
        & ~F.col("chrom").startswith("browser")
        & ~F.col("chrom").startswith("#")
    )
    out = df.select(
        F.col("chrom"),
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
        F.when(F.col("name") == ".", None).otherwise(F.col("name")).alias("name"),
        F.when(F.col("score") == ".", None).otherwise(F.col("score"))
         .cast("double").alias("score"),
        F.when(F.col("strand") == ".", None).otherwise(F.col("strand")).alias("strand"),
    )
    if samplename is not None:
        out = out.withColumn("samplename", F.lit(samplename))
    return out
