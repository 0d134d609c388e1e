"""Property-based checks (hypothesis) for the interval machinery.

The binned range join is an *algebraic rewrite* of a theta join — these
tests assert the rewrite is exact on arbitrary inputs (negative
coordinates, zero-length intervals, bin-boundary straddlers, any bin
size), which example-based tests tend to miss.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clinpy_spark.functions.intervals import (
    binned_interval_join,
    interval_overlaps,
    overlap_fraction,
    point_in_interval,
)

# One hypothesis example = a whole dataset (single Spark job per example).
_coord = st.integers(min_value=-2_000, max_value=2_000)
_len = st.integers(min_value=0, max_value=800)

_intervals = st.lists(
    st.tuples(_coord, _len).map(lambda t: (t[0], t[0] + t[1])),
    min_size=1, max_size=12,
)
_points = st.lists(_coord, min_size=1, max_size=12)
_bin = st.sampled_from([1, 7, 100, 1000])


def _ref_overlap(s1: int, e1: int, s2: int, e2: int) -> float:
    """Reference semantics (utils.py:7-25 intent): disjoint -> 0, self
    contained in other -> 1, else overlap / len(self)."""
    if e1 < s2 or s1 > e2:
        return 0.0
    if s1 >= s2 and e1 <= e2:
        return 1.0
    return max(0, min(e1, e2) - max(s1, s2)) / (e1 - s1)


@settings(max_examples=8, deadline=None)
@given(pairs=st.lists(st.tuples(_coord, st.integers(1, 800), _coord, _len), min_size=1, max_size=20))
def test_overlap_fraction_matches_piecewise_reference(spark, pairs):
    rows = [(s1, s1 + l1, s2, s2 + l2) for s1, l1, s2, l2 in pairs]
    df = spark.createDataFrame(rows, "s1 long, e1 long, s2 long, e2 long")
    got = df.select(overlap_fraction("s1", "e1", "s2", "e2").alias("f")).collect()
    for r, (s1, e1, s2, e2) in zip(got, rows):
        assert abs(r.f - _ref_overlap(s1, e1, s2, e2)) < 1e-12, (s1, e1, s2, e2)


@settings(max_examples=6, deadline=None)
@given(left=_intervals, right=_intervals, bin_size=_bin)
def test_binned_interval_join_equals_theta_join(spark, left, right, bin_size):
    ldf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(left)], "lid long, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(right)], "rid long, rs long, re long"
    )
    naive = {
        (r.lid, r.rid)
        for r in ldf.crossJoin(rdf)
        .filter(interval_overlaps("ls", "le", "rs", "re"))
        .collect()
    }
    binned = {
        (r.lid, r.rid)
        for r in binned_interval_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=bin_size,
        ).collect()
    }
    assert binned == naive


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 200)),
                  min_size=1, max_size=30),
    tol=st.integers(1, 40),
)
def test_banded_pair_join_equals_self_join(spark, rows, tol):
    """Skew-safe banded pair join == naive per-key self-join, including a
    HOT KEY (key 0 gets every generated row appended again shifted, so
    one key dominates) — the quadratic-risk case the binned plan bounds."""
    from clinpy_spark.functions.intervals import banded_pair_join

    hot = [(0, v + 1) for _, v in rows]  # pile extra rows onto key 0
    data = [(i, k, v) for i, (k, v) in enumerate(rows + hot)]
    df = spark.createDataFrame(data, "id long, k long, v long")
    a, b = df.toDF("a_id", "k", "a_v"), df.toDF("b_id", "bk", "b_v")
    naive = {
        (r.k, r.a_id, r.b_id)
        for r in a.join(b, (F.col("k") == F.col("bk")) & (F.col("a_id") < F.col("b_id")))
        .filter(F.abs(F.col("a_v") - F.col("b_v")) <= tol).collect()
    }
    # Pure binned route (hot_threshold=0) and hybrid route (key 0 always
    # hot: it holds >= len(rows) rows and the threshold sits one below;
    # other keys may route either way) must both equal the naive join.
    for thr in (0, len(rows) - 1):
        banded = banded_pair_join(df, key_cols=["k"], value_col="v",
                                  id_col="id", tol=tol, hot_threshold=thr)
        got = {(r.k, r.a_id, r.b_id) for r in banded.collect()}
        assert got == naive, f"hot_threshold={thr}"
    # The hot leg's equi key must include the value bin, not the key
    # alone — that is the skew guarantee (join groups bounded per bin).
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "__bin" in plan


@settings(max_examples=6, deadline=None)
@given(points=_points, right=_intervals, bin_size=_bin)
def test_binned_point_join_equals_theta_join(spark, points, right, bin_size):
    pdf = spark.createDataFrame([(i, p) for i, p in enumerate(points)], "pid long, p long")
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(right)], "rid long, rs long, re long"
    )
    naive = {
        (r.pid, r.rid)
        for r in pdf.crossJoin(rdf).filter(point_in_interval("p", "rs", "re")).collect()
    }
    binned = {
        (r.pid, r.rid)
        for r in binned_interval_join(
            pdf, rdf, left_start="p", left_end=None,
            right_start="rs", right_end="re", bin_size=bin_size,
        ).collect()
    }
    assert binned == naive


@settings(max_examples=6, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15),
)
def test_asof_join_matches_duckdb(spark, left, right):
    """Cross-engine property: asof_join == DuckDB's native ASOF LEFT JOIN
    on arbitrary keyed event sets (right side deduped to unique (k, t),
    as the operator contract requires for determinism)."""
    import duckdb

    from clinpy_spark.operators.asof import asof_join

    right = list({(k, t): None for k, t in right})  # unique (k, t)
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in right], "k long, t long, v long"
    )
    got = {
        (r.lid): (r.v, r.t_right)
        for r in asof_join(ldf, rdf, key="k", left_time="t").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k BIGINT, t BIGINT)")
    con.execute("CREATE TABLE r(k BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)",
                    [(i, k, t) for i, (k, t) in enumerate(left)])
    con.executemany("INSERT INTO r VALUES (?, ?, ?)",
                    [(k, t, k * 1000 + t) for k, t in right])
    expect = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            "SELECT l.lid, r.v, r.t FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(left=_intervals, right=_intervals, bin_size=_bin, dup=st.integers(2, 3))
def test_binned_interval_join_preserves_duplicate_rows(spark, left, right, bin_size, dup):
    """Emit-once via first-shared-bin must NOT collapse genuinely
    duplicate input rows (the old all-column dropDuplicates did): each
    of the `dup` copies of a left row matches independently."""
    from collections import Counter

    ldf = spark.createDataFrame(
        [(s, e) for (s, e) in left for _ in range(dup)], "ls long, le long"
    )
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(right)], "rid long, rs long, re long"
    )
    naive = Counter(
        (r.ls, r.le, r.rid)
        for r in ldf.crossJoin(rdf)
        .filter(interval_overlaps("ls", "le", "rs", "re"))
        .collect()
    )
    binned = Counter(
        (r.ls, r.le, r.rid)
        for r in binned_interval_join(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_size=bin_size,
        ).collect()
    )
    assert binned == naive


@settings(max_examples=6, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    budget=st.sampled_from([10, 25, 64]),
)
def test_pack_chunks_invariants(spark, toks, budget):
    """Offset-bucketed packing matches a sequential reference
    implementation of the same definition (chunk = start_offset //
    budget) on arbitrary token sequences, and chunk ids are monotone
    along doc order starting at 0."""
    from clinpy_spark.operators.pack import pack_chunks

    rows = [(i, "g", " ".join(["w"] * n) if n else "") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = sorted(
        ((r.doc_id, r.chunk_id, r.n_tok) for r in pack_chunks(df, budget=budget).collect())
    )
    expected, offset = {}, 0
    for i, n in enumerate(toks):
        expected[i] = offset // budget
        offset += n
    assert {d: c for d, c, _ in out} == expected
    chunk_ids = [c for _, c, _ in out]
    assert chunk_ids == sorted(chunk_ids) and chunk_ids[0] == 0


@settings(max_examples=6, deadline=None)
@given(
    fa=st.floats(min_value=0.05, max_value=0.5),
    fb=st.floats(min_value=0.5, max_value=1.0),
    seed=st.integers(min_value=0, max_value=99),
)
def test_deterministic_sample_monotone(spark, fa, fb, seed):
    """Hash sampling is monotone in the fraction: the keep-set at a
    smaller fraction is a subset of the keep-set at a larger one (same
    seed) — the property that makes mixtures/splits consistent."""
    from clinpy_spark.operators.sample import deterministic_sample

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    small = {r.doc_id for r in deterministic_sample(df, fa, "doc_id", seed=seed).collect()}
    large = {r.doc_id for r in deterministic_sample(df, fb, "doc_id", seed=seed).collect()}
    assert small <= large


@settings(max_examples=6, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(0, 500), st.integers(0, 80)),
                  min_size=0, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 500), st.integers(0, 80)),
                   min_size=0, max_size=15),
    bin_size=st.sampled_from([7, 50, 128]),
    how=st.sampled_from(["left", "right", "full"]),
)
def test_binned_interval_outer_joins_equal_theta_joins(spark, left, right, bin_size, how):
    """Every outer flavor of the binned interval join must equal the
    naive non-equi outer join as a MULTISET (padding preserves the
    multiplicity of duplicate unmatched rows; matched rows keep inner
    multiplicity)."""
    from collections import Counter

    ldf = spark.createDataFrame(
        [(i % 10, s, s + d) for i, (s, d) in enumerate(left)], "lid long, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [(i % 10, s, s + d) for i, (s, d) in enumerate(right)], "rid long, rs long, re long"
    )
    naive = Counter(
        (r.lid, r.rid) for r in
        ldf.join(rdf, interval_overlaps("ls", "le", "rs", "re"), how).collect()
    )
    got = Counter(
        (r.lid, r.rid) for r in
        binned_interval_join(ldf, rdf, left_start="ls", left_end="le",
                             right_start="rs", right_end="re",
                             bin_size=bin_size, how=how).collect()
    )
    assert got == naive


def test_epoch_seconds_type_robust(spark):
    """epoch_seconds gives the same whole-second value whether the
    source column is numeric epoch, TIMESTAMP, or TIMESTAMP_NTZ — the
    schema-drift guard for the events table (the driver's generator has
    shipped all three flavors across rounds)."""
    from clinpy_spark.functions.time import epoch_seconds

    df = spark.sql("""
        SELECT CAST(1700000123 AS BIGINT) AS as_num,
               CAST(timestamp'2023-11-14 22:15:23' AS TIMESTAMP) AS as_ts,
               CAST(timestamp_ntz'2023-11-14 22:15:23' AS TIMESTAMP_NTZ) AS as_ntz
    """)
    row = df.select(
        epoch_seconds("as_num").alias("n"),
        epoch_seconds("as_ts").alias("t"),
        epoch_seconds("as_ntz").alias("z"),
    ).collect()[0]
    assert row.n == row.t == row.z == 1700000123


@settings(max_examples=6, deadline=None)
@given(
    offs=st.lists(st.integers(0, 50_000), min_size=1, max_size=60),
    gap=st.integers(60, 3600),
    bucket=st.sampled_from([600, 1800, 7200]),
)
def test_sessionize_bucketed_property(spark, offs, gap, bucket):
    """Two-phase sessionize == plain sessionize for arbitrary event
    layouts, gaps, and bucket widths (incl. buckets narrower than the
    session gap — maximal boundary merging)."""
    import datetime as dt

    from clinpy_spark.operators.windows import sessionize, sessionize_bucketed

    t0 = dt.datetime(2024, 3, 1)
    rows = [(i, t0 + dt.timedelta(seconds=o), i % 3) for i, o in enumerate(offs)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    plain = {r.event_id: r.session_id for r in sessionize(df, gap_seconds=gap).collect()}
    two = {r.event_id: r.session_id for r in
           sessionize_bucketed(df, gap_seconds=gap, bucket_seconds=bucket).collect()}
    assert two == plain


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=2, max_size=16),
    k=st.sampled_from([1, 2]),
)
def test_fuzzy_pairs_equals_naive_levenshtein(spark, words, k):
    """Salted length-band blocking + banded threshold levenshtein is an
    algebraic rewrite of the all-pairs filter — exact on arbitrary
    strings (tiny alphabet forces dense near-duplicates, empty strings
    and equal strings included)."""
    from clinpy_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(list(enumerate(words)), "id long, s string")
    got = {(r.a_id, r.b_id): r.edits
           for r in fuzzy_pairs(df, "id", "s", max_edits=k, num_salts=4).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {}
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            d = lev(words[i], words[j])
            if d <= k:
                want[(i, j)] = d
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    n_bases=st.integers(min_value=1, max_value=200),
    line_w=st.integers(min_value=1, max_value=23),
    ranges=st.lists(
        st.tuples(st.integers(0, 199), st.integers(1, 200), st.booleans()),
        min_size=1, max_size=8,
    ),
    seed=st.integers(0, 10_000),
)
def test_fetch_sequences_equals_python_slicing(spark, tmp_path_factory, n_bases, line_w, ranges, seed):
    """The fragment-table range join + cut + ordered concat equals plain
    string slicing for ANY line width and any in-bounds 1-based
    inclusive range, both strands."""
    import random

    from clinpy_spark.sources.fasta import fetch_sequences, read_fasta

    rng = random.Random(seed)
    chrom = "".join(rng.choice("ACGT") for _ in range(n_bases))
    fa = tmp_path_factory.mktemp("pfa") / "g.fa"
    fa.write_text(">c\n" + "\n".join(
        chrom[i:i + line_w] for i in range(0, n_bases, line_w)) + "\n")
    frags = read_fasta(spark, str(fa))

    rows, want = [], {}
    comp = str.maketrans("ACGT", "TGCA")
    for i, (s0, ln, minus) in enumerate(ranges):
        s = (s0 % n_bases) + 1                      # 1-based start in bounds
        e = min(n_bases, s + ln - 1)                # inclusive end
        strand = "-" if minus else "+"
        rows.append((i, "c", s, e, strand))
        sub = chrom[s - 1:e]
        want[i] = sub.translate(comp)[::-1] if minus else sub
    rdf = spark.createDataFrame(
        rows, "range_id long, chrom string, start long, end long, strand string"
    )
    got = {r.range_id: r.sequence for r in fetch_sequences(frags, rdf).collect()}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    dim_rows=st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 50), st.integers(1, 40)),
        min_size=1, max_size=10,
    ),
    facts=st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 120)), min_size=1, max_size=10
    ),
)
def test_scd2_lookup_flavors_equal_python_reference(spark, dim_rows, facts):
    """All four join flavors equal a brute-force reference over arbitrary
    version layouts (overlapping versions, facts before the first
    version, keys on only one side)."""
    from clinpy_spark.operators.merge import scd2_lookup

    # build non-overlapping-ish versions per key: (k, attr, ef, et|None)
    dim = []
    for idx, (k, ef, ln) in enumerate(dim_rows):
        dim.append((k, f"v{idx}", ef, None if idx % 3 == 0 else ef + ln))
    fact_rows = [(k, ts, f"f{i}") for i, (k, ts) in enumerate(facts)]
    ddf = spark.createDataFrame(
        dim, "k long, attr string, effective_from long, effective_to long"
    )
    fdf = spark.createDataFrame(fact_rows, "k long, ts long, tag string")

    def valid(d, f):
        return d[0] == f[0] and d[2] <= f[1] and (d[3] is None or f[1] < d[3])

    inner = {(f[2], d[1]) for f in fact_rows for d in dim if valid(d, f)}
    matched_f = {f[2] for f in fact_rows for d in dim if valid(d, f)}
    matched_d = {d[1] for d in dim for f in fact_rows if valid(d, f)}

    got_inner = {(r.tag, r.attr) for r in scd2_lookup(fdf, ddf, ["k"], "ts").collect()}
    assert got_inner == inner

    left = {(r.tag, r.attr) for r in scd2_lookup(fdf, ddf, ["k"], "ts", how="left").collect()}
    assert left == inner | {(f[2], None) for f in fact_rows if f[2] not in matched_f}

    right = {(r.tag, r.attr) for r in scd2_lookup(fdf, ddf, ["k"], "ts", how="right").collect()}
    assert right == inner | {(None, d[1]) for d in dim if d[1] not in matched_d}

    full = {(r.tag, r.attr) for r in scd2_lookup(fdf, ddf, ["k"], "ts", how="full").collect()}
    assert full == left | right


# ---------------------------------------------------------------------------
# Codec round-trip properties (pure numpy — no Spark session needed).
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    level=st.sampled_from([0, 1, 6, 9]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, level, seed):
    """encode_png ∘ _png_pixels is the identity for every supported
    channel count, shape, and compression level."""
    import numpy as np

    from clinpy_spark.operators.multimodal import (
        _png_pixels, encode_png, parse_png_header,
    )

    px = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    payload = encode_png(px, level=level)
    hdr = parse_png_header(payload)
    assert hdr is not None and hdr[:2] == (w, h)
    assert np.array_equal(_png_pixels(payload, hdr), px)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 3),
    bps=st.sampled_from([8, 16]),
    blocksize=st.sampled_from([16, 64, 192]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, ch, bps, blocksize, seed):
    """encode_flac ∘ decode_flac is the identity (lossless) for every
    channel count, bit depth, and frame split."""
    import numpy as np

    from clinpy_spark.operators.flac import decode_flac, encode_flac

    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = np.random.default_rng(seed).integers(lo, hi + 1, (n, ch)).astype(np.int64)
    got = decode_flac(encode_flac(x, bps=bps, blocksize=blocksize))
    assert got is not None and np.array_equal(got, x)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       which=st.sampled_from(["jpeg", "flac", "avi", "gif", "tiff", "mp2"]))
def test_codec_corruption_never_raises(seed, which):
    """Malformed payloads must decode to None, never raise out of an
    executor batch: random byte corruption of valid
    JPEG/FLAC/AVI/GIF/TIFF/MP2 streams (hits every header segment and
    the entropy data)."""
    import numpy as np

    from clinpy_spark.operators.avi import decode_avi_frame, encode_avi_mjpeg
    from clinpy_spark.operators.flac import decode_flac, encode_flac
    from clinpy_spark.operators.gif import decode_gif, encode_gif
    from clinpy_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    if which == "jpeg":
        base = encode_jpeg(rng.integers(0, 256, (10, 13, 3), dtype=np.uint8))
        decode = decode_jpeg
    elif which == "flac":
        base = encode_flac(rng.integers(-100, 100, (200, 2)).astype(np.int32),
                           blocksize=64)
        decode = decode_flac
    elif which == "gif":
        base = encode_gif(np.stack([np.full((9, 11, 3), f, np.uint8)
                                    for f in (10, 80, 150)]))
        decode = decode_gif
    elif which == "tiff":
        from clinpy_spark.operators.tiff import decode_tiff, encode_tiff

        base = encode_tiff(rng.integers(0, 256, (9, 11, 3), dtype=np.uint8))
        decode = decode_tiff
    elif which == "mp2":
        from clinpy_spark.operators.mp2 import decode_mp2, encode_mp2

        t = np.arange(2304)
        base = encode_mp2(0.4 * np.sin(2 * np.pi * 700 * t / 48000))
        decode = decode_mp2
    else:
        base = encode_avi_mjpeg(
            [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)])
        decode = lambda p: decode_avi_frame(p, 0)  # noqa: E731
    buf = bytearray(base)
    for _ in range(int(rng.integers(1, 8))):
        buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
    out = decode(bytes(buf))
    assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    fill=st.integers(0, 255),
    quality=st.sampled_from([75, 92, 100]),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_constant_fill_exact_property(h, w, fill, quality, restart):
    """Constant-fill images survive the lossy JPEG round trip EXACTLY at
    any quality/shape/restart-interval — the invariant the mm oracles
    lean on (DC-only blocks: quantization error < half an intensity
    step after the IDCT)."""
    import numpy as np

    from clinpy_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = np.full((h, w, 3), fill, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px, quality=quality, restart_interval=restart))
    assert np.array_equal(got, px)


@settings(max_examples=6, deadline=None)
@given(
    lwords=st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=1, max_size=10),
    rwords=st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=1, max_size=10),
    k=st.sampled_from([1, 2]),
)
def test_fuzzy_join_equals_naive_levenshtein(spark, lwords, rwords, k):
    """The distinct-first two-table fuzzy join equals the naive cross
    filter: every (left, right) pair within the budget appears exactly
    once with the exact distance — duplicates, empty strings, and
    identical strings included."""
    from clinpy_spark.operators.fuzzy import fuzzy_join

    ldf = spark.createDataFrame(list(enumerate(lwords)), "lid long, s string")
    rdf = spark.createDataFrame(list(enumerate(rwords)), "rid long, s string")
    rows = fuzzy_join(ldf, rdf, "s", "s", max_edits=k, num_salts=4).collect()
    got = sorted((r.lid, r.rid, r.edits) for r in rows)
    assert len(got) == len(set(got))  # exactly-once

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted(
        (li, ri, lev(a, b))
        for li, a in enumerate(lwords) for ri, b in enumerate(rwords)
        if lev(a, b) <= k
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    ntones=st.integers(1, 5),
    bitrate=st.sampled_from([96, 128, 192, 384]),
)
def test_mp2_roundtrip_snr_property(seed, ntones, bitrate):
    """Any band-limited multi-tone signal survives the MP2 round trip
    above a 15 dB SNR floor at any table-A bitrate (lossy codec: gate,
    not equality — the mm_audio_lossy_gate contract generalized to
    random signals)."""
    import numpy as np

    from clinpy_spark.operators.mp2 import SYNTH_DELAY, decode_mp2, encode_mp2

    rng = np.random.default_rng(seed)
    n = 4608  # 4 frames
    t = np.arange(n)
    freqs = rng.uniform(100, 15000, ntones)
    amps = rng.uniform(0.1, 0.8, ntones)
    amps = amps / max(1.25 * amps.sum(), 1.0)  # headroom, no clipping
    x = sum(a * np.sin(2 * np.pi * f * t / 48000) for a, f in zip(amps, freqs))
    y = decode_mp2(encode_mp2(x, rate=48000, bitrate=bitrate))
    assert y is not None and y.shape == (n, 1)
    a = x[: n - SYNTH_DELAY]
    b = y[SYNTH_DELAY:, 0][: len(a)]
    a2, b2 = a[700:-700], b[700:-700]
    snr = 10 * np.log10((a2 ** 2).mean() / max(((a2 - b2) ** 2).mean(), 1e-300))
    assert snr > 15.0, (snr, list(freqs), list(amps), bitrate)


def _naive_bpe_fit(wf, n):
    """Reference trainer: recount every pair from scratch each
    iteration (O(n·V·L)); max count, ties to lexicographically
    smallest pair — the semantics _fit_merges must reproduce."""
    words = [list(w) for w, _ in wf]
    counts = [c for _, c in wf]
    merges = []
    for _ in range(n):
        pc = {}
        for syms, c in zip(words, counts):
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        mx = max(pc.values())
        best = min(p for p, c in pc.items() if c == mx)
        merges.append(best)
        a, b = best
        for i, syms in enumerate(words):
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


@settings(max_examples=60, deadline=None)
@given(
    wf=st.lists(
        st.tuples(st.text(alphabet="abc", min_size=1, max_size=8),
                  st.integers(1, 20)),
        min_size=1, max_size=12,
        unique_by=lambda t: t[0],
    ),
    n=st.integers(0, 15),
)
def test_bpe_incremental_trainer_equals_naive(wf, n):
    """The heap/inverted-index trainer is bit-identical to the
    recount-from-scratch reference on arbitrary word-frequency tables
    (overlapping pairs like 'aaa', ties, single-char words included)."""
    from clinpy_spark.operators.bpe import _fit_merges

    assert _fit_merges(list(wf), n) == _naive_bpe_fit(list(wf), n)


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(st.characters(blacklist_categories=("Cs", "Zs", "Cc")),
                min_size=1, max_size=12),
        min_size=1, max_size=8,
    ),
    nm=st.integers(0, 30),
)
def test_bpe_encode_lossless_any_unicode(words, nm):
    """BPE segmentation is lossless for ANY unicode word (base symbols
    are the word's own characters), including words whose characters
    never appeared in training — unseen chars stay single-char tokens."""
    from clinpy_spark.operators.bpe import _encode_word, _fit_merges

    wf = [(w, i + 1) for i, w in enumerate(dict.fromkeys(words))]
    ranks = {p: i for i, p in enumerate(_fit_merges(list(wf), nm))}
    for w, _ in wf:
        assert "".join(_encode_word(w, ranks)) == w
    # unseen word: still lossless, tokens are chars or trained merges
    assert "".join(_encode_word("zzz-unseen-é中", ranks)) == "zzz-unseen-é中"


# --- PPJoin prefix-filter losslessness -------------------------------------

_vocab = [f"w{i}" for i in range(12)]
_doc = st.lists(st.sampled_from(_vocab), min_size=3, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)
_thresh = st.sampled_from([0.2, 0.4, 0.6, 0.8])


@settings(max_examples=6, deadline=None)
@given(texts=_corpus, threshold=_thresh)
def test_ppjoin_prefix_filter_is_lossless(spark, texts, threshold):
    """The prefix-filtered candidate set must contain every pair the
    exact all-pairs join finds, for arbitrary small corpora drawn from
    a tiny vocabulary (maximal shingle collisions = the adversarial
    case for prefix pruning) at several thresholds."""
    from clinpy_spark.operators.dedup import ngram_jaccard_pairs, ppjoin_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(df, threshold=threshold,
                                          allow_all_pairs=True).collect()}
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ppjoin_pairs(df, threshold=threshold).collect()}
    assert got == exact


@settings(max_examples=6, deadline=None)
@given(
    olds=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 3)), min_size=0,
                  max_size=8, unique_by=lambda t: t[0]),
    news=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 3)), min_size=0,
                  max_size=8, unique_by=lambda t: t[0]),
)
def test_snapshot_diff_reconstructs_new(spark, olds, news):
    """Applying the CDC feed to the old snapshot reproduces the new one
    exactly: new = (old minus deletes minus updates) union (inserted +
    updated rows from new)."""
    from clinpy_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(olds, "k long, v int") if olds else \
        spark.createDataFrame([], "k long, v int")
    new = spark.createDataFrame(news, "k long, v int") if news else \
        spark.createDataFrame([], "k long, v int")
    diff = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    old_m, new_m = dict(olds), dict(news)
    rebuilt = {k: v for k, v in old_m.items()
               if diff.get(k) not in ("delete", "update")}
    for k, ch in diff.items():
        if ch in ("insert", "update"):
            rebuilt[k] = new_m[k]
    assert rebuilt == new_m


# Grid floats: the affine transform must be EXACT in float arithmetic
# (arbitrary doubles near zero collapse onto the offset — 7.0 + 2e-30
# == 7.0 — merging ECDF steps and genuinely changing D; that is float
# behavior, not a KS property violation).
_grid = st.integers(min_value=-1000, max_value=1000).map(lambda i: i / 4.0)


@given(
    a=st.lists(_grid, min_size=3, max_size=25),
    b=st.lists(_grid, min_size=3, max_size=25),
)
@settings(max_examples=8, deadline=None)
def test_ks_invariant_under_monotone_transform(spark, a, b):
    """KS is a rank statistic: applying the same strictly-increasing
    exact transform (2x + 7) to BOTH samples leaves D unchanged, and D
    is symmetric in the sample order."""
    from clinpy_spark.operators.drift import ks_two_sample

    da = spark.createDataFrame([(v,) for v in a], "v double")
    db = spark.createDataFrame([(v,) for v in b], "v double")
    base = ks_two_sample(da, db, "v").collect()[0]

    ta = spark.createDataFrame([(2.0 * v + 7.0,) for v in a], "v double")
    tb = spark.createDataFrame([(2.0 * v + 7.0,) for v in b], "v double")
    trans = ks_two_sample(ta, tb, "v").collect()[0]
    assert trans.ks_d == base.ks_d

    swapped = ks_two_sample(db, da, "v").collect()[0]
    assert swapped.ks_d == base.ks_d
    assert (swapped.n_a, swapped.n_b) == (base.n_b, base.n_a)


@given(
    # dyadic grid floats: percentile interpolation and the affine map
    # are then EXACT in float arithmetic (arbitrary doubles make the
    # transformed interpolated edge differ by 1 ulp from the
    # transformed edge, flipping strict > bin comparisons — float
    # behavior, not a PSI property violation)
    vals=st.lists(st.integers(min_value=0, max_value=100).map(lambda i: i / 2.0),
                  min_size=10, max_size=40),
)
@settings(max_examples=8, deadline=None)
def test_psi_zero_on_identical_and_affine_invariant(spark, vals):
    """PSI of a cohort against itself is ~0 in every bin, and scaling
    BOTH cohorts by the same positive exact affine map leaves every
    per-bin contribution unchanged (binning is quantile-based)."""
    from clinpy_spark.operators.drift import psi_table

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = psi_table(df, df, "v", n_bins=4).collect()
    assert all(abs(r.psi_contrib) < 1e-9 for r in rows)

    df2 = spark.createDataFrame([(3.0 * v + 11.0,) for v in vals], "v double")
    shifted = psi_table(df2, df2, "v", n_bins=4).collect()
    assert [(r.ref_n, r.cur_n) for r in shifted] == [(r.ref_n, r.cur_n) for r in rows]


# ---------------------------------------------------------------------------
# Survival / genetics / interval-merge properties (round-10 operators).
# One hypothesis example = one whole cohort (single Spark job per example).
# ---------------------------------------------------------------------------

_subjects = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),            # cohort
        st.integers(min_value=1, max_value=12),  # event/censor time
        st.integers(min_value=0, max_value=1),   # evt flag
    ),
    min_size=1, max_size=24,
)


@settings(max_examples=8, deadline=None)
@given(rows=_subjects)
def test_km_curve_is_monotone_and_bounded(spark, rows):
    """On ANY cohort: survival is non-increasing in time within each
    group, confined to [0, 1], and equals the closed-form product of
    the per-time factors computed in python."""
    from clinpy_spark.operators.survival import km_curve

    df = spark.createDataFrame(rows, "grp string, t long, evt int")
    out = km_curve(df, "t", "evt", "grp").collect()
    by_g: dict = {}
    for r in sorted(out, key=lambda r: (r.grp, r.t)):
        prev = by_g.get(r.grp, 1.0)
        assert 0.0 <= r.survival <= prev + 1e-9, (r.grp, r.t)
        by_g[r.grp] = r.survival
    # python reference: sequential product over the same grid
    import collections
    grid = collections.defaultdict(dict)
    for g, t, e in rows:
        d, c = grid[g].get(t, (0, 0))
        grid[g][t] = (d + e, c + (1 - e))
    for g, times in grid.items():
        n = sum(d + c for d, c in times.values())
        s = 1.0
        for t in sorted(times):
            d, c = times[t]
            s = 0.0 if d >= n else s * (1 - d / n)
            got = [r.survival for r in out if r.grp == g and r.t == t][0]
            assert abs(got - round(s, 6)) <= 1e-9, (g, t, s)
            n -= d + c


@settings(max_examples=8, deadline=None)
@given(rows=_subjects)
def test_logrank_symmetric_under_group_swap(spark, rows):
    """chi2 is symmetric in the two arms: testing (a vs b) equals
    (b vs a); with a single-arm cohort the statistic degenerates to
    NULL/0 expectations rather than crashing."""
    from clinpy_spark.operators.survival import logrank_test

    df = spark.createDataFrame(rows, "grp string, t long, evt int")
    ab = logrank_test(df, "t", "evt", "grp", "a", "b").collect()[0]
    ba = logrank_test(df, "t", "evt", "grp", "b", "a").collect()[0]
    if ab.chi2 is not None and ba.chi2 is not None:
        assert abs(ab.chi2 - ba.chi2) <= 2e-6
    assert ab.n_a == ba.n_b and ab.n_b == ba.n_a


@settings(max_examples=8, deadline=None)
@given(rows=_subjects)
def test_logrank_k_two_arms_recovers_mantel_cox(spark, rows):
    """On ANY 2-arm cohort, the exact Mantel-Cox statistic is
    recoverable from the k-group readout: (observed - expected)^2 /
    var_marginal of either row equals logrank_test's chi2 (for k = 2
    the marginal hypergeometric variance IS the pooled variance, and
    O - E is sign-flipped between the arms). Also checks O and E each
    sum to the total event count across arms."""
    from clinpy_spark.operators.survival import logrank_k, logrank_test

    df = spark.createDataFrame(rows, "grp string, t long, evt int")
    two = logrank_test(df, "t", "evt", "grp", "a", "b").collect()[0]
    kk = {r.grp: r for r in logrank_k(df, "t", "evt", "grp").collect()}
    total_events = sum(e for _, _, e in rows)
    assert sum(r.observed for r in kk.values()) == total_events
    if kk:
        assert abs(sum(float(r.expected) for r in kk.values())
                   - total_events) <= 1e-4
    if "a" in kk and "b" in kk:
        ra = kk["a"]
        assert ra.n == two.n_a and kk["b"].n == two.n_b
        assert ra.observed == two.observed_a
        assert abs(ra.expected - two.expected_a) <= 2e-6
        if two.chi2 is not None and ra.var_marginal and ra.var_marginal > 0:
            mc = (ra.observed - ra.expected) ** 2 / ra.var_marginal
            assert abs(mc - two.chi2) <= 1e-4
        assert kk["a"].df == kk["b"].df == len(kk) - 1


@settings(max_examples=8, deadline=None)
@given(rows=_subjects)
def test_stratified_logrank_single_stratum_is_plain(spark, rows):
    """With ONE stratum the stratified log-rank must equal the plain
    Mantel-Cox statistic exactly (same O, E, V, chi2)."""
    from clinpy_spark.operators.survival import (
        logrank_stratified, logrank_test)

    df = spark.createDataFrame(rows, "grp string, t long, evt int") \
        .withColumn("site", F.lit("s0"))
    plain = logrank_test(df, "t", "evt", "grp", "a", "b").collect()[0]
    strat = logrank_stratified(
        df, "t", "evt", "grp", "site", "a", "b").collect()[0]
    assert (strat.observed_a, strat.n_a, strat.n_b) == (
        plain.observed_a, plain.n_a, plain.n_b)
    assert strat.expected_a == plain.expected_a
    assert strat.chi2 == plain.chi2
    # an event-free cohort has no contributing strata (grid empty after
    # the d > 0 cut) — both statistics degenerate to the same NULL row
    assert strat.n_strata == (1 if plain.observed_a is not None else 0)


@settings(max_examples=8, deadline=None)
@given(rows=_subjects)
def test_cox_score_indicator_covariate_is_logrank(spark, rows):
    """The Cox score test at beta=0 with a 0/1 indicator covariate is
    EXACTLY the two-group log-rank statistic (same U = O-E and the same
    hypergeometric variance): chi2 match to rounding on any cohort."""
    from clinpy_spark.operators.survival import cox_score, logrank_test

    df = spark.createDataFrame(rows, "grp string, t long, evt int")
    lr = logrank_test(df, "t", "evt", "grp", "a", "b").collect()[0]
    cx = cox_score(
        df.withColumn("x", (F.col("grp") == "a").cast("int")),
        "t", "evt", "x").collect()[0]
    assert cx.n_subjects == lr.n_a + lr.n_b
    if lr.chi2 is None:
        assert cx.chi2 is None
    else:
        assert abs(cx.chi2 - lr.chi2) <= 2e-6
        assert abs(cx.u - (lr.observed_a - lr.expected_a)) <= 2e-6


@settings(max_examples=8, deadline=None)
@given(rows=_subjects)
def test_fh_weighted_logrank_rho0_gamma0_is_plain(spark, rows):
    """Fleming-Harrington G(0,0) weights every event time by 1 — the
    statistic must equal the plain Mantel-Cox log-rank exactly (same
    chi2, O, E) on any cohort."""
    from clinpy_spark.operators.survival import logrank_test, logrank_weighted

    df = spark.createDataFrame(rows, "grp string, t long, evt int")
    plain = logrank_test(df, "t", "evt", "grp", "a", "b").collect()[0]
    fh = logrank_weighted(
        df, "t", "evt", "grp", "a", "b", rho=0.0, gamma=0.0).collect()[0]
    assert (fh.observed_a, fh.n_a, fh.n_b) == (
        plain.observed_a, plain.n_a, plain.n_b)
    assert fh.expected_a == plain.expected_a
    if plain.chi2 is None:
        assert fh.chi2 is None
    else:
        assert abs(fh.chi2 - plain.chi2) <= 2e-6


_cr_subjects = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),             # cohort
        st.integers(min_value=1, max_value=10),  # time
        st.integers(min_value=0, max_value=2),   # status: 0 cens, 1/2 cause
    ),
    min_size=1, max_size=24,
)


@settings(max_examples=8, deadline=None)
@given(rows=_cr_subjects)
def test_cuminc_partitions_unity_with_km(spark, rows):
    """Aalen-Johansen identity on ANY competing-risks cohort: at every
    observed time, sum_k CIF_k(t) + S(t) == 1 with S the all-cause KM
    (the property 1 - KM_k violates under competing risks). CIFs are
    non-decreasing in time."""
    from clinpy_spark.operators.survival import cuminc, km_curve

    df = spark.createDataFrame(rows, "grp string, t long, st int")
    cif = cuminc(df, "t", "st", "grp", causes=[1, 2]).collect()
    km = {(r.grp, r.t): r.survival
          for r in km_curve(
              df.withColumn("evt", (F.col("st") != 0).cast("int")),
              "t", "evt", "grp").collect()}
    by_gt: dict = {}
    for r in cif:
        by_gt.setdefault((r.grp, r.t), 0.0)
        by_gt[(r.grp, r.t)] += r.cif
    for key, total_cif in by_gt.items():
        assert abs(total_cif + km[key] - 1.0) <= 5e-6, key
    # monotone per (group, cause)
    last: dict = {}
    for r in sorted(cif, key=lambda r: (r.grp, r.cause, r.t)):
        prev = last.get((r.grp, r.cause), 0.0)
        assert r.cif >= prev - 1e-9
        last[(r.grp, r.cause)] = r.cif


_genos = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # variant
        st.integers(min_value=0, max_value=2),   # gt dosage
        st.booleans(),                           # case
    ),
    min_size=1, max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(rows=_genos)
def test_hwe_invariant_under_allele_relabel(spark, rows):
    """Swapping ref/alt labels (gt -> 2 - gt) leaves the HWE chi-square
    unchanged and mirrors the genotype-class counts."""
    from clinpy_spark.operators.assoc import hwe_chi2

    df = spark.createDataFrame(rows, "variant long, gt int, case boolean")
    swapped = df.withColumn("gt", 2 - F.col("gt"))
    a = {r.variant: r for r in hwe_chi2(df, "variant", "gt").collect()}
    b = {r.variant: r for r in hwe_chi2(swapped, "variant", "gt").collect()}
    for v in a:
        assert abs(a[v].chi2 - b[v].chi2) <= 2e-6, v
        assert (a[v].n_hom_ref, a[v].n_hom_alt) == (b[v].n_hom_alt, b[v].n_hom_ref)


@settings(max_examples=8, deadline=None)
@given(rows=_genos)
def test_trend_and_allelic_symmetric_under_phenotype_swap(spark, rows):
    """Swapping case/control labels leaves both association
    chi-squares unchanged (the 2x2 and trend statistics are symmetric
    in the phenotype)."""
    from clinpy_spark.operators.assoc import allelic_assoc_chi2, trend_chi2

    df = spark.createDataFrame(rows, "variant long, gt int, case boolean")
    sw = df.withColumn("case", ~F.col("case"))
    for fn in (allelic_assoc_chi2, trend_chi2):
        a = {r.variant: r.chi2 for r in fn(df, "variant", "gt", "case").collect()}
        b = {r.variant: r.chi2 for r in fn(sw, "variant", "gt", "case").collect()}
        for v in a:
            assert abs(a[v] - b[v]) <= 2e-6, (fn.__name__, v)


_merge_rows = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=20),
    ).map(lambda t: (t[0], t[1], t[1] + t[2])),
    min_size=1, max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(rows=_merge_rows)
def test_merge_intervals_idempotent_and_covering(spark, rows):
    """Merging is idempotent (re-merging the output is the identity up
    to n_merged=1), output blocks are disjoint and non-touching within
    a group, and total coverage equals the union length computed in
    python."""
    from clinpy_spark.functions.intervals import merge_intervals

    df = spark.createDataFrame(rows, "g string, s long, e long")
    once = merge_intervals(df, "g", "s", "e")
    blocks = sorted(
        ((r.g, r.s, r.e) for r in once.collect()), key=lambda t: (t[0], t[1]))
    for (g1, s1, e1), (g2, s2, e2) in zip(blocks, blocks[1:]):
        if g1 == g2:
            assert s2 > e1, (g1, s1, e1, s2, e2)  # disjoint, not touching
    twice = merge_intervals(
        once.select("g", "s", "e"), "g", "s", "e").collect()
    assert sorted((r.g, r.s, r.e) for r in twice) == blocks
    assert all(r.n_merged == 1 for r in twice)
    # coverage vs python union of closed intervals
    import collections
    per_g = collections.defaultdict(list)
    for g, s, e in rows:
        per_g[g].append((s, e))
    for g, ivs in per_g.items():
        pts = set()
        for s, e in ivs:
            pts.update(range(2 * s, 2 * e + 1))   # half-unit grid
        got = sum(2 * (e - s) + 1 for (gg, s, e) in blocks if gg == g)
        assert got == len(pts), g


_edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=14),
              st.integers(min_value=0, max_value=14)),
    min_size=1, max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(pairs=_edge_lists)
def test_triangle_count_equals_naive_on_any_graph(spark, pairs):
    """Degree-oriented enumeration equals brute-force u<v<w counting on
    arbitrary multigraph input (self-loops/duplicates/reversals)."""
    from clinpy_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(pairs, "s long, d long")
    (r,) = triangle_stats(df, "s", "d").collect()
    e = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    naive = sum(
        1 for (u, v) in e for w in range(15)
        if v < w and (u, w) in e and (v, w) in e)
    wedges = 0
    deg: dict = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    wedges = sum(k * (k - 1) // 2 for k in deg.values())
    assert (r.n_triangles, r.n_edges, r.n_wedges) == (naive, len(e), wedges)


@settings(max_examples=6, deadline=None)
@given(pairs=_edge_lists, iters=st.integers(min_value=1, max_value=4))
def test_pagerank_conserves_mass_on_any_graph(spark, pairs, iters):
    """On ANY symmetrized simple graph the rank vector sums to 1 after
    every number of power steps (no dangling leakage), and every rank
    is positive."""
    from clinpy_spark.operators.graph import pagerank

    if not any(a != b for a, b in pairs):
        return  # no edges survive canonicalization
    df = spark.createDataFrame(pairs, "s long, d long")
    out = pagerank(df, "s", "d", iterations=iters).collect()
    assert all(r.pr > 0 for r in out)
    assert abs(sum(r.pr for r in out) - 1.0) <= 1e-4


_roh_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),    # sample
        st.integers(min_value=0, max_value=1),    # chrom
        st.integers(min_value=0, max_value=25),   # pos
        st.integers(min_value=0, max_value=2),    # gt
    ),
    min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1], t[2]),
)


@settings(max_examples=8, deadline=None)
@given(rows=_roh_rows, min_sites=st.integers(min_value=1, max_value=4))
def test_roh_runs_equal_python_reference(spark, rows, min_sites):
    """Gaps-and-islands ROH equals a sequential python scan over each
    (sample, chrom) site list for any genotype pattern and cutoff."""
    from clinpy_spark.operators.assoc import roh_runs

    df = spark.createDataFrame(rows, "s long, chrom long, pos long, gt int")
    got = {(r.sample, r.chrom, r.start_pos): (r.end_pos, r.n_sites)
           for r in roh_runs(df, "s", "chrom", "pos", "gt",
                             min_sites=min_sites).collect()}
    import collections
    per = collections.defaultdict(list)
    for s, c, p, g in rows:
        per[(s, c)].append((p, g))
    exp = {}
    for (s, c), sites in per.items():
        run: list = []
        for p, g in sorted(sites):
            if g != 1:
                run.append(p)
            else:
                if len(run) >= min_sites:
                    exp[(s, c, run[0])] = (run[-1], len(run))
                run = []
        if len(run) >= min_sites:
            exp[(s, c, run[0])] = (run[-1], len(run))
    assert got == exp


@settings(max_examples=12, deadline=None)
@given(
    a=st.lists(st.tuples(st.integers(0, 200), st.integers(0, 40)),
               min_size=1, max_size=8),
    b=st.lists(st.tuples(st.integers(0, 200), st.integers(0, 40)),
               min_size=0, max_size=8),
)
def test_subtract_intervals_equals_pointwise_complement(spark, a, b):
    """On arbitrary closed integer intervals, the relational
    subtraction covers EXACTLY the integer points of A not covered by
    any B interval, with pieces disjoint per A row (checked against a
    naive per-point set computation)."""
    from clinpy_spark.functions.intervals import subtract_intervals

    a_rows = [(i, "g", s, s + ln) for i, (s, ln) in enumerate(a)]
    b_rows = [("g", s, s + ln) for s, ln in b]
    adf = spark.createDataFrame(a_rows, "id long, g string, s long, e long")
    bdf = (spark.createDataFrame(b_rows, "g string, s long, e long")
           if b_rows else
           spark.createDataFrame([], "g string, s long, e long"))
    out = subtract_intervals(adf, bdf, "g", "s", "e", "id").collect()
    covered_b = set()
    for s, ln in b:
        covered_b.update(range(s, s + ln + 1))
    got: dict[int, set] = {}
    for r in out:
        pts = set(range(r.s, r.e + 1))
        assert r.e >= r.s
        assert not (pts & got.get(r.id, set())), "pieces overlap"
        got.setdefault(r.id, set()).update(pts)
    for i, (s, ln) in enumerate(a):
        want = set(range(s, s + ln + 1)) - covered_b
        assert got.get(i, set()) == want, (i, s, ln)


@settings(max_examples=12, deadline=None)
@given(xs=st.lists(st.integers(0, 50), min_size=1, max_size=20))
def test_cusum_equals_recursive_definition(spark, xs):
    """The window-algebra CUSUM equals the textbook recursion
    S+_t = max(0, S+_{t-1} + (x_t - mu)) computed sequentially (and
    the mirrored S-), including argmax tie-breaks to the earliest
    period."""
    import pytest

    from clinpy_spark.operators.windows import cusum_changepoint

    df = spark.createDataFrame(
        [(float(i), x) for i, x in enumerate(xs)], "p double, x long")
    out = cusum_changepoint(df, "p", "x").collect()[0]
    mu = sum(xs) / len(xs)
    sp = sn = 0.0
    best_p = (0.0, 0); best_n = (0.0, 0)
    for t, x in enumerate(xs):
        sp = max(0.0, sp + (x - mu))
        sn = max(0.0, sn + (mu - x))
        if sp > best_p[0] + 1e-9:
            best_p = (sp, t)
        if sn > best_n[0] + 1e-9:
            best_n = (sn, t)
    assert out.max_cusum_pos == pytest.approx(round(best_p[0], 6), abs=1e-6)
    assert out.max_cusum_neg == pytest.approx(round(best_n[0], 6), abs=1e-6)
    assert out.t_pos == float(best_p[1])
    assert out.t_neg == float(best_n[1])


@settings(max_examples=12, deadline=None)
@given(
    va=st.lists(st.integers(0, 30), min_size=1, max_size=15),
    vb=st.lists(st.integers(0, 30), min_size=1, max_size=15),
)
def test_mann_whitney_u_sum_identity(spark, va, vb):
    """U_a + U_b = n_a * n_b for any two samples (with midranks), and
    the statistic is invariant under a strictly monotone transform of
    the values (rank-based by construction)."""
    import pytest

    from clinpy_spark.operators.assoc import mann_whitney_u

    rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
    df = spark.createDataFrame(rows, "g string, v double")
    ra = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    rb = mann_whitney_u(df, "v", "g", "b", "a").collect()[0]
    assert ra.u_a + rb.u_a == pytest.approx(len(va) * len(vb))
    mono = df.select("g", (F.col("v") * 3 + 100).alias("v"))
    rm = mann_whitney_u(mono, "v", "g", "a", "b").collect()[0]
    assert rm.u_a == ra.u_a and rm.z == ra.z


@settings(max_examples=8, deadline=None)
@given(
    trios=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 2)),
        min_size=1, max_size=20),
)
def test_mendel_errors_match_allele_enumeration(spark, trios):
    """The closed-form transmittable-range rule agrees with brute-force
    enumeration of parental allele transmissions for every genotype
    combination."""
    from clinpy_spark.operators.assoc import mendel_errors

    def possible(f, m, c):
        fa = {0: [0], 1: [0, 1], 2: [1]}[f]
        ma = {0: [0], 1: [0, 1], 2: [1]}[m]
        return c in {x + y for x in fa for y in ma}

    rows = [(i, f, m, c) for i, (f, m, c) in enumerate(trios)]
    df = spark.createDataFrame(rows, "v long, f int, m int, c int")
    out = {r.v: r.n_errors for r in
           mendel_errors(df, "v", "f", "m", "c").collect()}
    for i, (f, m, c) in enumerate(trios):
        assert out[i] == (0 if possible(f, m, c) else 1), (f, m, c)


@settings(max_examples=6, deadline=None)
@given(
    va=st.lists(st.integers(0, 12), min_size=2, max_size=15),
    vb=st.lists(st.integers(0, 12), min_size=2, max_size=15),
)
def test_kruskal_two_groups_is_mannwhitney_z2(spark, va, vb):
    """For k = 2 the tie-corrected Kruskal-Wallis H equals the
    Mann-Whitney z^2 on ANY data (both are the same rank statistic),
    and the plain H is invariant under swapping group labels."""
    from clinpy_spark.operators.assoc import kruskal_wallis, mann_whitney_u

    rows = ([(float(v), "a") for v in va] + [(float(v), "b") for v in vb])
    df = spark.createDataFrame(rows, "v double, g string")
    h = kruskal_wallis(df, "v", "g").collect()[0]
    z = mann_whitney_u(df, "v", "g", "a", "b").collect()[0].z
    if z is None:
        assert h.h_corrected is None or abs(h.h_corrected) < 1e-9
    else:
        assert h.h_corrected is not None
        assert abs(h.h_corrected - z * z) < 1e-4
    swapped = spark.createDataFrame(
        [(v, "b" if g == "a" else "a") for v, g in rows],
        "v double, g string")
    h2 = kruskal_wallis(swapped, "v", "g").collect()[0]
    assert abs(h.h - h2.h) < 1e-9


@settings(max_examples=6, deadline=None)
@given(ps=st.lists(
    st.integers(0, 10_000).map(lambda i: i / 10_000), min_size=1,
    max_size=25))
def test_bh_adjust_stepup_invariants(spark, ps):
    """BH adjusted p-values dominate the raw p (p_adj >= p), stay in
    [0, 1], are non-decreasing along the rank order, and match the
    direct min-over-suffix definition."""
    from clinpy_spark.operators.quality import bh_adjust

    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(ps)], "test_id long, p double")
    out = sorted(bh_adjust(df, "p", "test_id").collect(),
                 key=lambda r: r.bh_rank)
    n = len(ps)
    ordered = sorted(range(n), key=lambda i: (ps[i], i))
    ref = [min(min(ps[ordered[j]] * n / (j + 1), 1.0)
               for j in range(i, n)) for i in range(n)]
    for i, r in enumerate(out):
        assert abs(r.p_adj - ref[i]) < 1e-9
        assert r.p_adj >= r.p - 1e-12 and 0 <= r.p_adj <= 1
        if i:
            assert r.p_adj >= out[i - 1].p_adj - 1e-12


@settings(max_examples=6, deadline=None)
@given(
    a=st.integers(0, 12), b=st.integers(0, 12),
    c=st.integers(0, 12), d=st.integers(0, 12),
)
def test_fisher_exact_tail_identities(spark, a, b, c, d):
    """One-sided tails overlap exactly at the observed point
    (p_left + p_right = 1 + pmf_obs); the two-sided p is at most 1,
    at least the observed pmf, and invariant under transposing the
    table (swapping which margin is 'exposure')."""
    import math as m

    from clinpy_spark.operators.assoc import fisher_exact_2x2

    if a + b + c + d == 0:
        return
    rows = ([(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d)
    df = spark.createDataFrame(rows, "e int, y int")
    out = fisher_exact_2x2(df, "e", "y").collect()[0]

    def pmf(k, n, r1, c1):
        return (m.comb(r1, k) * m.comb(n - r1, c1 - k) / m.comb(n, c1))

    n, r1, c1 = a + b + c + d, a + b, a + c
    p_obs = pmf(a, n, r1, c1)
    assert abs((out.p_left + out.p_right) - (1 + p_obs)) < 1e-6
    assert p_obs - 1e-6 <= out.p_two_sided <= 1.0
    # transpose: exposure <-> outcome swaps b and c, keeps a and d
    trows = [(y, e) for e, y in rows]
    tout = fisher_exact_2x2(
        spark.createDataFrame(trows, "e int, y int"), "e", "y").collect()[0]
    assert abs(tout.p_two_sided - out.p_two_sided) < 1e-6


@settings(max_examples=6, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=2, max_size=60),
    budget=st.integers(1, 500),
)
def test_neyman_allocation_sums_to_budget(spark, data, budget):
    """Largest-remainder integerization: allocations are nonnegative
    and sum EXACTLY to the budget on any strata mix (including
    all-constant strata, where everything lands by remainder rank)."""
    from clinpy_spark.operators.sample import neyman_allocation

    df = spark.createDataFrame(
        [(f"g{g}", float(v)) for g, v in data], "g string, v double")
    out = neyman_allocation(df, "g", "v", budget).collect()
    assert all(r.alloc_n >= 0 for r in out)
    assert sum(r.alloc_n for r in out) == budget


@settings(max_examples=5, deadline=None)
@given(
    cells=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2),
                  st.integers(1, 40), st.integers(0, 40)),
        min_size=4, max_size=12),
    iters=st.integers(2, 5),
)
def test_logistic_multi_matches_local_numpy_irls(spark, cells, iters):
    """The distributed d=2 IRLS is the EXACT same recurrence as a
    local numpy replay over the collected grid (same start, same step
    count, same det>0 guard) — property-pinned on arbitrary small
    grids including singular ones."""
    import numpy as np

    from clinpy_spark.operators.assoc import logistic_newton_multi

    # build a per-cell grid and expand to rows
    rows = []
    for x1, x2, n, p in cells:
        p = min(p, n)
        rows += [(float(x1), float(x2), 1)] * p
        rows += [(float(x1), float(x2), 0)] * (n - p)
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    got = logistic_newton_multi(
        df, ["x1", "x2"], "y", iterations=iters).collect()[0]

    # local replay: identical algorithm on the aggregated grid
    grid = {}
    for x1, x2, y in rows:
        n, p = grid.get((x1, x2), (0, 0))
        grid[(x1, x2)] = (n + 1, p + y)
    from clinpy_spark.functions.cramer import solve3, var3_diag

    xs = np.array([[1.0, k[0], k[1]] for k in grid])
    nn = np.array([v[0] for v in grid.values()], dtype=float)
    pp = np.array([v[1] for v in grid.values()], dtype=float)

    def mom(beta):
        mu = 1 / (1 + np.exp(-(xs @ np.asarray(beta))))
        w = nn * mu * (1 - mu)
        u = xs.T @ (pp - nn * mu)
        info = (xs * w[:, None]).T @ xs
        return [float(v) for v in u], info

    # the fitter's r13 contract: explicit Cramer updates in the
    # oracle's operand order (functions/cramer.py) and ROUND-5
    # emission — this replay pins exactly that recurrence
    beta = [0.0, 0.0, 0.0]
    for _ in range(iters):
        u, info = mom(beta)
        det, d0, d1, d2 = solve3(
            u[0], u[1], u[2],
            float(info[0, 0]), float(info[0, 1]), float(info[0, 2]),
            float(info[1, 1]), float(info[1, 2]), float(info[2, 2]))
        if d0 is None:
            beta = None
            break
        beta = [beta[0] + d0, beta[1] + d1, beta[2] + d2]
    if beta is None:
        assert got.beta0 is None
        return
    u, info = mom(beta)
    det = (float(info[0, 0]) * (float(info[1, 1]) * float(info[2, 2])
                                - float(info[1, 2]) * float(info[1, 2]))
           - float(info[0, 1]) * (float(info[0, 1]) * float(info[2, 2])
                                  - float(info[1, 2]) * float(info[0, 2]))
           + float(info[0, 2]) * (float(info[0, 1]) * float(info[1, 2])
                                  - float(info[1, 1]) * float(info[0, 2])))
    if not det > 0:
        assert got.beta0 is None
        return
    _, v1, v2 = var3_diag(
        float(info[0, 0]), float(info[0, 1]), float(info[0, 2]),
        float(info[1, 1]), float(info[1, 2]), float(info[2, 2]), det)
    assert got.beta0 == round(float(beta[0]), 5) + 0.0
    assert got.beta1 == round(float(beta[1]), 5) + 0.0
    assert got.beta2 == round(float(beta[2]), 5) + 0.0
    assert got.se1 == round(math.sqrt(v1), 5) + 0.0
    assert got.se2 == round(math.sqrt(v2), 5) + 0.0
    assert (got.n, got.n_pos) == (int(nn.sum()), int(pp.sum()))


@settings(max_examples=5, deadline=None)
@given(
    subjects=st.lists(
        st.tuples(st.integers(1, 12), st.booleans(), st.booleans(),
                  st.booleans()),
        min_size=8, max_size=60),
    iters=st.integers(2, 4),
)
def test_cox_multi_matches_local_numpy_replay(spark, subjects, iters):
    """The distributed d=2 Breslow-Newton is the EXACT same recurrence
    as a local numpy replay over the collected subjects (same start,
    step count, det guard, Breslow tie handling) — property-pinned on
    arbitrary small cohorts including event-free and singular ones."""
    import numpy as np

    from clinpy_spark.operators.survival import cox_newton_multi

    rows = [(t, int(e), float(x1), float(x2))
            for t, e, x1, x2 in subjects]
    df = spark.createDataFrame(rows, "t long, e int, x1 double, x2 double")
    got = cox_newton_multi(df, "t", "e", ["x1", "x2"],
                           iterations=iters).collect()[0]

    arr = np.array(rows, dtype=float)  # t, e, x1, x2
    times = np.unique(arr[arr[:, 1] == 1, 0])

    def moments(beta):
        u = np.zeros(2)
        info = np.zeros((2, 2))
        n_ev = 0
        for t in times:
            at = arr[arr[:, 0] >= t]
            ev = arr[(arr[:, 0] == t) & (arr[:, 1] == 1)]
            x = at[:, 2:4]
            ex = np.exp(x @ beta)
            s0 = ex.sum()
            s1 = (x * ex[:, None]).sum(axis=0)
            s2 = (x[:, :, None] * x[:, None, :] * ex[:, None, None]).sum(axis=0)
            d = len(ev)
            da = ev[:, 2:4].sum(axis=0)
            u += da - d * s1 / s0
            info += d * (s2 / s0 - np.outer(s1 / s0, s1 / s0))
            n_ev += d
        return u, info, n_ev

    from clinpy_spark.functions.cramer import solve2

    if len(times) == 0:
        assert got.beta1 is None
        return
    # pin the r13 contract: explicit 2x2 Cramer updates (the oracle's
    # operand order, functions/cramer.py) and ROUND-5 emission
    beta = [0.0, 0.0]
    for _ in range(iters):
        u, info, n_ev = moments(np.asarray(beta))
        det, d1, d2 = solve2(float(u[0]), float(u[1]),
                             float(info[0, 0]), float(info[0, 1]),
                             float(info[1, 1]))
        if d1 is None:
            beta = None
            break
        beta = [beta[0] + d1, beta[1] + d2]
    if beta is None:
        assert got.beta1 is None
        return
    u, info, n_ev = moments(np.asarray(beta))
    det = (float(info[0, 0]) * float(info[1, 1])
           - float(info[0, 1]) * float(info[0, 1]))
    if not det > 0:
        assert got.beta1 is None
        return
    assert got.beta1 == round(float(beta[0]), 5) + 0.0
    assert got.beta2 == round(float(beta[1]), 5) + 0.0
    assert got.se1 == round(math.sqrt(float(info[1, 1]) / det), 5) + 0.0
    assert got.n_events == n_ev
    assert got.n_subjects == len(rows)
