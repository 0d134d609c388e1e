"""VCF reader: distributed text scan + column-expression parse.

The reference iterates a pysam ``VariantFile`` row-by-row on the driver
(snp_functions.py:81-131): CHROM/POS/ID/REF/ALT/QUAL/FILTER, the first
sample's FORMAT values, and the VEP ``CSQ`` INFO field split on ``|``
per transcript consequence, exploded to one row per consequence.

Spark-first shape: ``spark.read.text`` -> filter header lines ->
``split``/``regexp_extract`` column ops, CSQ as ArrayType -> ``explode``
(A9/A10). Everything stays in whole-stage codegen; at 100 TB the VCF
lines parse in parallel across executors (no pysam, no driver loop).
Header introspection (S6) reads only the header lines driver-side,
matching the reference's per-file metadata pass (snp_functions.py:11-52).
"""

from __future__ import annotations

import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _header_lines(path: str, max_lines: int = 5000) -> list[str]:
    opener = gzip.open if path.endswith(".gz") else open
    out = []
    with opener(path, "rt") as fh:
        for line in fh:
            if not line.startswith("#"):
                break
            out.append(line.rstrip("\n"))
            if len(out) >= max_lines:
                break
    return out


def vcf_csq_fields(path: str) -> list[str]:
    """CSQ field names from the ``##INFO=<ID=CSQ...Format: a|b|c">``
    header line, lowercased (reference snp_functions.py:26-33, 50-51)."""
    for line in _header_lines(path):
        if line.startswith("##INFO=<ID=CSQ"):
            fmt = line.split("Format: ")[-1].rstrip('">')
            return [f.lower() for f in fmt.split("|")]
    return []


def vcf_format_keys(path: str) -> list[str]:
    """FORMAT keys declared in the header, lowercased (reference
    snp_functions.py:35-43)."""
    keys = []
    for line in _header_lines(path):
        if line.startswith("##FORMAT=<ID="):
            keys.append(line.split("##FORMAT=<ID=")[1].split(",")[0].lower())
    return keys


def read_vcf(
    spark: SparkSession,
    path: str,
    samplename: str,
    csq_fields: list[str] | None = None,
    format_keys: list[str] | None = None,
    explode_csq: bool = True,
) -> DataFrame:
    """-> one row per variant (or per consequence when ``explode_csq``):
    (samplename, chrom, pos, id, ref, alt, qual, filter, <format keys>,
    csq struct fields...).

    Genotype is kept both raw (``gt``) and as the reference's stringified
    tuple form ``"(0, 1)"`` (snp_functions.py:103-105) for parity with
    genotype filters (variants.py:152-158).
    """
    csq_fields = csq_fields if csq_fields is not None else vcf_csq_fields(path)
    format_keys = format_keys if format_keys is not None else vcf_format_keys(path)

    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    c = F.split("value", "\t")
    df = lines.select(
        F.lit(samplename).alias("samplename"),
        c.getItem(0).alias("chrom"),
        c.getItem(1).cast("long").alias("pos"),
        F.when(c.getItem(2) == ".", None).otherwise(c.getItem(2)).alias("id"),
        c.getItem(3).alias("ref"),
        c.getItem(4).alias("alt"),
        F.when(c.getItem(5) == ".", None).otherwise(c.getItem(5)).cast("double").alias("qual"),
        c.getItem(6).alias("filter"),
        c.getItem(7).alias("_info"),
        c.getItem(8).alias("_format"),
        c.getItem(9).alias("_sample0"),
    )

    # FORMAT: map keys to the first sample's values (snp_functions.py:98-105).
    fmt_map = F.map_from_arrays(F.split("_format", ":"), F.split("_sample0", ":"))
    for key in format_keys:
        df = df.withColumn(key, fmt_map.getItem(key.upper()))
    if "gt" in format_keys:
        # "0/1" or "0|1" -> "(0, 1)" — the reference's stringified tuple.
        parts = F.split(F.col("gt"), r"[/|]")
        df = df.withColumn(
            "gt", F.concat(F.lit("("), F.concat_ws(", ", parts), F.lit(")"))
        )

    if csq_fields:
        # CSQ=a|b|c,a2|b2|c2 -> array of structs -> explode (A9/A10).
        csq_str = F.regexp_extract("_info", r"(?:^|;)CSQ=([^;]*)", 1)
        one = F.transform(
            F.split(csq_str, ","),
            lambda entry: F.struct(*[
                F.when(F.split(entry, r"\|").getItem(i) == "", None)
                .otherwise(F.split(entry, r"\|").getItem(i))
                .alias(name)
                for i, name in enumerate(csq_fields)
            ]),
        )
        df = df.withColumn("csq", F.when(csq_str == "", F.array()).otherwise(one))
        if explode_csq:
            df = df.withColumn("csq", F.explode_outer("csq")).select("*", "csq.*").drop("csq")

    return df.drop("_info", "_format", "_sample0")
