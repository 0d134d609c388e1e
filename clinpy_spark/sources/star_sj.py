"""STAR ``SJ.out.tab`` splice-junction reader.

Reference rna_functions.py:30-43: headerless 9-column TSV; strand code
0/1/2 -> ./+/- (the reference uses a row-wise pandas apply at :5-13 — here
a when-chain, P9, so it stays in codegen); QC filter ``uniq_map >= n``
and ``strand != '.'`` (P7) applied at ingest; drops motif/annotated/
max_ohang (P11); stamps samplename (P14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinpy_spark.schema import STAR_SJ_RAW


def read_star_sj(
    spark: SparkSession,
    path: str,
    samplename: str,
    min_unique_reads: int = 0,
    filter_unstranded: bool = True,
) -> DataFrame:
    """-> (samplename, chrom, start, end, strand, uniq_map, multi_map)."""
    df = spark.read.csv(path, sep="\t", header=False, schema=STAR_SJ_RAW)
    strand = (
        F.when(F.col("strand_code") == 1, "+")
        .when(F.col("strand_code") == 2, "-")
        .when(F.col("strand_code") == 0, ".")
        .otherwise(F.raise_error(F.concat(F.lit("unknown strand code "), F.col("strand_code"))))
    )
    out = df.select(
        F.lit(samplename).alias("samplename"),
        "chrom", "start", "end",
        strand.alias("strand"),
        "uniq_map", "multi_map",
    )
    if min_unique_reads:
        out = out.filter(F.col("uniq_map") >= min_unique_reads)
    if filter_unstranded:
        out = out.filter(F.col("strand") != ".")
    return out
