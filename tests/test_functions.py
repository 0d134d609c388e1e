"""Unit tests for the column-expression library."""

from pyspark.sql import functions as F

from clinpy_spark.functions.ids import hash_id, junction_id
from clinpy_spark.functions.intervals import (
    binned_interval_join,
    interval_overlaps,
    overlap_fraction,
    point_in_interval,
)
from clinpy_spark.functions.text import fingerprint, lang_id, shingles, token_count
from clinpy_spark.functions.vectors import cosine_similarity, dot


def test_overlap_fraction_piecewise(spark):
    # Port of the reference's calc_overlap semantics (utils.py:7-25):
    # disjoint -> 0, self contained in other -> 1, partial -> fraction
    # of self's length.
    rows = [
        # (s1, e1, s2, e2, expected)
        (0, 10, 20, 30, 0.0),        # disjoint
        (5, 10, 0, 20, 1.0),         # contained
        (0, 10, 5, 20, 0.5),         # partial right
        (10, 20, 5, 15, 0.5),        # partial left
        (0, 10, 0, 10, 1.0),         # identical
    ]
    df = spark.createDataFrame(rows, "s1 long, e1 long, s2 long, e2 long, expected double")
    out = df.withColumn("got", overlap_fraction("s1", "e1", "s2", "e2")).collect()
    for r in out:
        assert abs(r.got - r.expected) < 1e-9, r


def test_interval_predicates(spark):
    df = spark.createDataFrame([(1,)], "x int")
    row = df.select(
        interval_overlaps(F.lit(0), F.lit(10), F.lit(10), F.lit(20)).alias("touch"),
        interval_overlaps(F.lit(0), F.lit(9), F.lit(10), F.lit(20)).alias("apart"),
        point_in_interval(F.lit(5), F.lit(0), F.lit(10)).alias("inside"),
        point_in_interval(F.lit(11), F.lit(0), F.lit(10)).alias("outside"),
    ).collect()[0]
    assert row.touch and not row.apart and row.inside and not row.outside


def test_binned_interval_join_matches_naive(spark):
    # Random-ish points and intervals; binned join must equal the naive
    # non-equi join exactly.
    points = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(200)], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(j, (j * 61) % 900, (j * 61) % 900 + 50) for j in range(50)],
        "iid long, s long, e long",
    )
    binned = binned_interval_join(
        points, intervals, left_start="p", left_end=None,
        right_start="s", right_end="e", bin_size=64,
    ).select("pid", "iid")
    naive = points.join(
        intervals, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))
    ).select("pid", "iid")
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, naive.collect()))
    assert binned.count() > 0


def test_binned_interval_join_intervals(spark):
    a = spark.createDataFrame([(1, 0, 100), (2, 500, 700)], "aid long, as long, ae long")
    b = spark.createDataFrame([(10, 90, 200), (20, 900, 950)], "bid long, bs long, be long")
    out = binned_interval_join(
        a, b, left_start="as", left_end="ae", right_start="bs", right_end="be", bin_size=50
    ).select("aid", "bid").collect()
    assert sorted(map(tuple, out)) == [(1, 10)]


def test_binned_interval_join_right_full_match_naive(spark):
    # right/full outer flavors must equal the naive non-equi outer
    # joins exactly — same de-binned anti-join padding as 'left',
    # applied to the interval side (right) or both sides (full).
    # Duplicate rows on both sides keep their multiplicity; multi-bin
    # unmatched intervals come back exactly once.
    a = spark.createDataFrame(
        [(1, 0, 100), (2, 500, 700), (2, 500, 700), (3, 5000, 5900)],
        "aid long, as long, ae long",
    )
    b = spark.createDataFrame(
        [(10, 90, 200), (11, 95, 650), (20, 900, 950), (20, 900, 950), (30, 7000, 8000)],
        "bid long, bs long, be long",
    )
    overlap = (F.col("ae") >= F.col("bs")) & (F.col("as") <= F.col("be"))
    for how in ("right", "full"):
        got = binned_interval_join(
            a, b, left_start="as", left_end="ae",
            right_start="bs", right_end="be", bin_size=50, how=how,
        ).select("aid", "bid")
        naive = a.join(b, overlap, how).select("aid", "bid")
        assert sorted(map(tuple, got.collect()), key=str) == \
            sorted(map(tuple, naive.collect()), key=str), how
    # the 20-bin unmatched interval (bid=30) appears exactly once
    full = binned_interval_join(
        a, b, left_start="as", left_end="ae",
        right_start="bs", right_end="be", bin_size=50, how="full",
    )
    assert full.filter("bid = 30").count() == 1


def test_binned_interval_join_left_matches_naive(spark):
    # Left join must equal the naive non-equi LEFT join exactly —
    # unmatched multi-bin intervals come back exactly once (de-binned
    # padding), matched rows keep inner multiplicity, and duplicate
    # left rows keep their multiplicity on both branches.
    a = spark.createDataFrame(
        [(1, 0, 100), (2, 500, 700), (2, 500, 700), (3, 5000, 5900)],
        "aid long, as long, ae long",
    )
    b = spark.createDataFrame(
        [(10, 90, 200), (11, 95, 650), (20, 900, 950)],
        "bid long, bs long, be long",
    )
    got = binned_interval_join(
        a, b, left_start="as", left_end="ae",
        right_start="bs", right_end="be", bin_size=50, how="left",
    ).select("aid", "bid")
    naive = a.join(
        b, (F.col("ae") >= F.col("bs")) & (F.col("as") <= F.col("be")), "left"
    ).select("aid", "bid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # the 18-bin unmatched interval (aid=3) appears exactly once
    assert got.filter("aid = 3").count() == 1


def test_binned_interval_join_left_points(spark):
    # Point-in-interval left join: unmatched points padded once.
    pts = spark.createDataFrame([(1, 50), (2, 5000)], "pid long, p long")
    iv = spark.createDataFrame([(10, 0, 100)], "iid long, s long, e long")
    got = binned_interval_join(
        pts, iv, left_start="p", left_end=None,
        right_start="s", right_end="e", bin_size=64, how="left",
    ).select("pid", "iid")
    assert sorted(map(tuple, got.collect()), key=str) == [(1, 10), (2, None)]


def test_hash_id_deterministic_and_distinct(spark):
    df = spark.createDataFrame(
        [("chr1", 100, 200, "+"), ("chr1", 100, 200, "-"), ("chr1", 100, 200, "+")],
        "chrom string, start long, end long, strand string",
    )
    ids = [r.id for r in df.select(junction_id().alias("id")).collect()]
    assert ids[0] == ids[2] and ids[0] != ids[1]
    # hash_id accepts Columns too
    n = df.select(hash_id(F.col("chrom"), F.col("start")).alias("h")).distinct().count()
    assert n == 1


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("   ",), ("der hund ist nicht da",)],
        "text string",
    )
    rows = df.select(
        token_count("text").alias("ntok"),
        fingerprint("text").alias("fp"),
        lang_id("text").alias("lang"),
    ).collect()
    assert rows[0].ntok == 5
    assert rows[1].ntok == 0
    assert rows[0].lang == "en"
    assert rows[2].lang == "de"
    assert len(rows[0].fp) == 32  # md5 hex


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = df.select(shingles("text", 3).alias("sh")).collect()
    assert got[0].sh == ["a b c", "b c d"]
    assert got[1].sh == ["a b"]  # shorter than n -> whole text


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
                               "a array<double>, b array<double>")
    rows = df.select(dot("a", "b").alias("d"), cosine_similarity("a", "b").alias("c")).collect()
    assert rows[0].d == 1.0 and abs(rows[0].c - 1.0) < 1e-12
    assert rows[1].d == 0.0 and abs(rows[1].c) < 1e-12


def test_rolling_fingerprint(spark):
    from clinpy_spark.functions.text import rolling_fingerprint

    B, M = 1_000_003, 2_147_483_647
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "gamma beta alpha"),
         (4, "alpha beta"), (5, "gamma")],
        "id long, text string",
    )
    out = {r.id: r.fp for r in df.select("id", rolling_fingerprint("text").alias("fp")).collect()}
    assert out[1] == out[2]                  # deterministic
    assert out[1] != out[3]                  # order-sensitive
    assert all(0 <= v < M for v in out.values())
    # Incremental-extension identity: fp("alpha beta gamma") ==
    # (fp("alpha beta") * B + (xxhash64("gamma") mod 2^20)) mod M.
    h_gamma = df.select(F.pmod(F.xxhash64(F.lit("gamma")), F.lit(1 << 20)).alias("h")).first().h
    assert out[1] == (out[4] * B + h_gamma) % M


def test_sketch_aggregates_track_exact(spark):
    """The 100 TB swap-ins for the exact profiling aggregates:
    approx_percentile (t-digest-style sketch, mergeable across
    partitions) tracks percentile(), and approx_count_distinct (HLL++)
    tracks countDistinct(), both within their documented error."""
    df = spark.range(10_000).selectExpr("cast(id * 37 % 1000 as double) as v")
    exact_p, approx_p = df.select(
        F.percentile("v", F.lit(0.9)), F.approx_percentile("v", F.lit(0.9), F.lit(10_000))
    ).first()
    assert abs(exact_p - approx_p) <= 1.0  # accuracy=10k -> near-exact here

    exact_d, approx_d = df.select(
        F.count_distinct("v"), F.approx_count_distinct("v", 0.02)
    ).first()
    assert abs(approx_d - exact_d) / exact_d < 0.05
