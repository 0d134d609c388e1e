"""SAM (Sequence Alignment/Map) text-format scan — the alignment
modality of the reference's ingestion surface, re-expressed without
pysam (the reference shells out to pysam/htslib for BAM access, e.g.
its FASTA/alignment plumbing around clinpy/assays/junction.py and the
expression pipelines; SAM is the TSV twin of BAM per the htslib spec
<https://samtools.github.io/hts-specs/SAMv1.pdf>, so a pure-Spark text
scan covers the text modality end-to-end and BAM stays a documented
binary-codec non-goal).

Everything is built-in column expressions — header filter, 11 mandatory
fields typed per spec, FLAG bit decode, and the CIGAR reference span
(sum of M/D/N/=/X op lengths) via regexp_extract_all + aggregate, so
the scan stays inside whole-stage codegen and parallelizes like any
text source. Optional tags are kept raw in ``tags`` (array<string>) —
typed tag extraction is a per-tag column op callers add when needed.

Scale shape: one line-delimited text scan (splittable), no UDFs, no
driver parsing; header introspection reads only ``@``-prefixed lines
(limit-bounded collect of the reference-sequence dictionary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: SAM FLAG bits per the spec, name -> mask.
FLAG_BITS = {
    "is_paired": 0x1,
    "is_proper_pair": 0x2,
    "is_unmapped": 0x4,
    "mate_unmapped": 0x8,
    "is_reverse": 0x10,
    "mate_reverse": 0x20,
    "is_first": 0x40,
    "is_second": 0x80,
    "is_secondary": 0x100,
    "is_qcfail": 0x200,
    "is_duplicate": 0x400,
    "is_supplementary": 0x800,
}


def cigar_ref_span(cigar):
    """Reference-consumed length of a CIGAR string (sum of M/I/D/N/S/
    H/P/=/X op lengths for ops that consume the REFERENCE: M, D, N, =,
    X) as a long column; NULL for '*' (unavailable)."""
    c = F.col(cigar) if isinstance(cigar, str) else cigar
    ops = F.regexp_extract_all(c, F.lit(r"(\d+)([MIDNSHP=X])"), 0)
    span = F.aggregate(
        ops,
        F.lit(0).cast("long"),
        lambda acc, op: acc
        + F.when(
            F.substring(op, -1, 1).isin("M", "D", "N", "=", "X"),
            F.regexp_extract(op, r"(\d+)", 1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.when(c == "*", F.lit(None).cast("long")).otherwise(span)


def scan_sam(spark: SparkSession, path: str) -> DataFrame:
    """Typed alignment records from a SAM text file: the 11 mandatory
    fields (qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen,
    seq, qual), the decoded FLAG bits (one boolean per
    :data:`FLAG_BITS` entry), ``ref_span`` and the closed-interval
    ``end_pos`` (pos + ref_span - 1) ready for the interval-join
    operators. '*' placeholders become NULL in rname/cigar/seq/qual;
    unmapped reads keep pos but NULL end_pos.
    """
    lines = spark.read.text(path)
    rec = lines.filter(~F.col("value").startswith("@"))
    p = F.split(F.col("value"), "\t")
    star_null = lambda c: F.when(c == "*", F.lit(None)).otherwise(c)
    df = rec.select(
        p[0].alias("qname"),
        p[1].cast("int").alias("flag"),
        star_null(p[2]).alias("rname"),
        p[3].cast("long").alias("pos"),
        p[4].cast("int").alias("mapq"),
        star_null(p[5]).alias("cigar"),
        star_null(p[6]).alias("rnext"),
        p[7].cast("long").alias("pnext"),
        p[8].cast("long").alias("tlen"),
        star_null(p[9]).alias("seq"),
        star_null(p[10]).alias("qual"),
        F.slice(p, 12, 1_000).alias("tags"),
    )
    for name, mask in FLAG_BITS.items():
        df = df.withColumn(
            name, F.col("flag").bitwiseAND(F.lit(mask)) != 0)
    df = df.withColumn("ref_span", cigar_ref_span("cigar"))
    return df.withColumn(
        "end_pos",
        F.when(
            ~F.col("is_unmapped") & F.col("ref_span").isNotNull(),
            F.col("pos") + F.col("ref_span") - 1,
        ),
    )


def sam_header(spark: SparkSession, path: str) -> dict:
    """Parsed header: {'sq': [(name, length), ...], 'rg': [read-group
    id, ...], 'pg': [program id, ...]} — the reference-sequence
    dictionary the genomics operators validate coordinates against.
    Bounded collect: headers only (a SAM header is KB-scale by spec).
    """
    hdr = (
        spark.read.text(path)
        .filter(F.col("value").startswith("@"))
        .limit(100_000)
        .collect()
    )
    out: dict = {"sq": [], "rg": [], "pg": []}
    for row in hdr:
        parts = row.value.split("\t")
        tag = parts[0]
        kv = dict(
            p.split(":", 1) for p in parts[1:] if ":" in p)
        if tag == "@SQ" and "SN" in kv and "LN" in kv:
            out["sq"].append((kv["SN"], int(kv["LN"])))
        elif tag == "@RG" and "ID" in kv:
            out["rg"].append(kv["ID"])
        elif tag == "@PG" and "ID" in kv:
            out["pg"].append(kv["ID"])
    return out
