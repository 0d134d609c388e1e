"""FASTA source + sequence assembly (reference junction.py:342-376's
genome.get_sequence capability, Spark-first)."""

import pytest
from pyspark.sql import functions as F

from clinpy_spark.sources.fasta import (
    fetch_sequences,
    fetch_transcript_sequences,
    read_fasta,
    translate,
)

CHR1 = "ACGTACGTGGCCTTAAGGCCAACCGGTTACGTACGTAAAAACCCCCGGGGGTTTTTACGT"  # 60 bases
CHR2 = "TTGGCCAATTGGCCAATTGG"  # 20 bases

_COMP = str.maketrans("ACGT", "TGCA")


def _rc(s):
    return s.translate(_COMP)[::-1]


@pytest.fixture(scope="module")
def frags(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("fa") / "toy.fa"
    lines = [">chr1 assembly=toy"]
    lines += [CHR1[i:i + 10] for i in range(0, len(CHR1), 10)]
    lines += [">chr2"]
    lines += [CHR2[i:i + 7] for i in range(0, len(CHR2), 7)]
    p.write_text("\n".join(lines) + "\n")
    return read_fasta(spark, str(p)).localCheckpoint()


def test_read_fasta_fragments(frags):
    rows = frags.collect()
    by_chrom = {}
    for r in rows:
        by_chrom.setdefault(r.chrom, []).append((r.off, r.frag, r.frag_len))
    assert set(by_chrom) == {"chr1", "chr2"}
    c1 = sorted(by_chrom["chr1"])
    assert [o for o, _, _ in c1] == [0, 10, 20, 30, 40, 50]
    assert "".join(f for _, f, _ in c1) == CHR1
    c2 = sorted(by_chrom["chr2"])
    assert [o for o, _, _ in c2] == [0, 7, 14]  # 7-char lines
    assert "".join(f for _, f, _ in c2) == CHR2


def test_fetch_sequences_plus_minus_and_line_spans(spark, frags):
    # 1-based inclusive ranges; r2 spans three 10-char lines; r3 is '-'
    ranges = spark.createDataFrame(
        [(1, "chr1", 1, 4, "+"),      # ACGT
         (2, "chr1", 8, 33, "+"),     # crosses offsets 10,20,30
         (3, "chr1", 8, 33, "-"),     # revcomp of r2
         (4, "chr2", 6, 9, "+"),      # crosses the 7-char boundary
         (5, "chr1", 60, 60, "+")],   # final base
        "range_id long, chrom string, start long, end long, strand string",
    )
    got = {r.range_id: r.sequence for r in fetch_sequences(frags, ranges).collect()}
    assert got[1] == "ACGT"
    assert got[2] == CHR1[7:33]
    assert got[3] == _rc(CHR1[7:33])
    assert got[4] == CHR2[5:9]
    assert got[5] == CHR1[59:]


def test_fetch_transcript_sequences_spliced_and_reverse(spark, frags):
    # '+' transcript: exon pieces concat in genomic order; '-' transcript:
    # revcomp of the same concat (identical to per-exon revcomp in
    # descending order).
    exons = spark.createDataFrame(
        [("tp", 1, 10, "chr1", "+"), ("tp", 21, 30, "chr1", "+"),
         ("tm", 1, 10, "chr1", "-"), ("tm", 21, 30, "chr1", "-")],
        "transcript string, start long, end long, chrom string, strand string",
    )
    got = {r.transcript: r.sequence
           for r in fetch_transcript_sequences(frags, exons).collect()}
    spliced = CHR1[0:10] + CHR1[20:30]
    assert got["tp"] == spliced
    assert got["tm"] == _rc(spliced)


def test_translate_codons(spark):
    df = spark.createDataFrame(
        [(1, "ATGGCC"), (2, "ATGGC"), (3, "ATGNNNTAA"), (4, "atgtgg"), (5, "")],
        "id long, seq string",
    )
    got = {r.id: r.aa for r in df.select("id", translate("seq").alias("aa")).collect()}
    assert got[1] == "MA"
    assert got[2] == "M"          # trailing partial codon dropped
    assert got[3] == "MX*"        # ambiguous codon -> X, stop -> *
    assert got[4] == "MW"         # case-insensitive
    assert got[5] == ""
    stop = {r.id: r.aa for r in df.select(
        "id", translate("seq", to_stop=True).alias("aa")).collect()}
    assert stop[3] == "MX"
