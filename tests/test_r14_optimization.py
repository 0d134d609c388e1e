"""Round-14 optimization pins.

- The numpy XXH64 fast-path minhash signature equals the JVM
  ``F.min(F.xxhash64(shingle_hash, lit(i)))`` form value-for-value
  (r13 verdict #3 — the md5 twin already had this pin; the fast path's
  main consumer ``dedup_minhash_lsh`` is rows-only, so a numpy edge
  regression would otherwise drift silently).
- The survival Newton fitters' bounded-grid guard: past
  ``_GRID_DRIVER_MAX`` rows the steps run as the distributed per-step
  recurrence, and both branches emit identical results (r13 verdict
  #2 — distinct event times are data-sized, so the driver collect must
  be capped).
- The driver-side reduction order is deterministic by construction:
  any input partitioning yields bit-identical unrounded emissions
  (r13 verdict #1 — collect order varies with partition layout, which
  is exactly what flipped surv_cox_multi's driver record).
- Divergent Newton steps (huge beta) emit NULL like the old
  inf -> NaN distributed plan instead of raising OverflowError
  (ADVICE r13).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import clinpy_spark.operators.survival as surv


def _mixed_docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=3, text="completely different content here with words"),
        Row(doc_id=4, text=""),          # empty text -> single shingle
        Row(doc_id=5, text="one two"),   # fewer tokens than shingle_n
        Row(doc_id=6, text="  spaced   out    tokens   everywhere  "),
    ]
    return spark.createDataFrame(rows)


def test_minhash_fast_signature_matches_jvm_xxhash64(spark):
    # value-for-value pin of the vectorized XXH64 signature against the
    # explode + F.min(F.xxhash64(h, lit(i))) JVM form it replaced
    from clinpy_spark.functions.text import hashed_shingles_from, token_hashes
    from clinpy_spark.operators.dedup import minhash_signature

    df = _mixed_docs(spark)
    nh = 16
    got = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signature(
            df, "doc_id", "text", num_hashes=nh, shingle_n=3).collect()
    }

    sh = df.select(
        "doc_id", token_hashes("text").alias("__th")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(
            hashed_shingles_from("__th", 3))).alias("__h"),
    )
    ref_rows = sh.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"m{i}")
        for i in range(nh)
    ]).collect()
    ref = {r["doc_id"]: [r[f"m{i}"] for i in range(nh)] for r in ref_rows}

    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == ref[k], k


def _cohort(spark, n=40):
    # deterministic small cohort with many distinct event times
    rows = []
    for i in range(n):
        rows.append(Row(
            t=float(i % 17 + 1) + (0.5 if i % 5 == 0 else 0.0),
            e=1 if i % 3 != 0 else 0,
            x=1.0 if i % 2 == 0 else 0.0,
            x2=float((i // 2) % 2),
            x3=float(i % 3),
        ))
    return spark.createDataFrame(rows)


def test_newton_beta_fallback_matches_driver(spark, monkeypatch):
    from clinpy_spark.operators.survival import cox_newton

    df = _cohort(spark)
    fast = cox_newton(df, "t", "e", "x", iterations=3).collect()
    monkeypatch.setattr(surv, "_GRID_DRIVER_MAX", 0)
    slow = cox_newton(df, "t", "e", "x", iterations=3).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


def test_cox_multi_fallback_matches_driver(spark, monkeypatch):
    from clinpy_spark.operators.survival import cox_newton_multi

    df = _cohort(spark)
    fast = cox_newton_multi(df, "t", "e", ["x", "x2", "x3"],
                            iterations=4).collect()
    monkeypatch.setattr(surv, "_GRID_DRIVER_MAX", 0)
    slow = cox_newton_multi(df, "t", "e", ["x", "x2", "x3"],
                            iterations=4).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


def test_cox_multi_reduction_order_partition_invariant(spark):
    # the r13 driver red record's root cause: collect order depends on
    # partition layout. The sorted reduction must emit bit-identical
    # UNROUNDED values under any repartitioning of the input.
    from clinpy_spark.operators.survival import cox_newton_multi

    df = _cohort(spark, n=60)
    base = None
    for parts in (1, 3, 7):
        out = cox_newton_multi(
            df.repartition(parts), "t", "e", ["x", "x2"],
            iterations=4, digits=None).collect()[0]
        vals = tuple(out)
        if base is None:
            base = vals
        else:
            assert vals == base, parts


def test_py_shingle_set_matches_jvm_shingles(spark):
    # the portable minhash signature now builds shingles inside its
    # Arrow pass; the Python twin must match array_distinct(shingles())
    # exactly — any string diff silently changes the md5 signature
    from clinpy_spark.functions.text import py_shingle_set, shingles

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        " ",
        "one two",
        "one",
        "  leading and trailing  ",
        "\tleading tab",
        "internal\ttab and\nnewline and\x0bvtab and\fform and\rcr",
        "Mixed CASE Tokens HERE and MORE of THEM",
        "repeat repeat repeat repeat repeat repeat",
        "unicode café ÉCLAIR straße tokens here",
        "double  space   collapse    everywhere here now",
        "a b c d e f g h i j",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    for n in (2, 3, 5):
        jvm = {r["i"]: set(r["sh"]) for r in df.select(
            "i", F.array_distinct(shingles("text", n)).alias("sh")
        ).collect()}
        for i, t in enumerate(texts):
            assert py_shingle_set(t, n) == jvm[i], (n, i, t)


def test_newton_divergence_emits_null_not_overflow(spark):
    # a grid whose first Newton step is ~1e12 pushes exp(beta) past the
    # float range on step 2: the old distributed plan propagated
    # inf -> NaN -> NULL; the driver loop must do the same, not raise
    grid = spark.createDataFrame(
        [Row(__t=1.0, n=10**12, n1=1, d=1, d1=1)])
    out = surv._newton_beta(spark, grid, 3).collect()
    assert len(out) == 1 and out[0]["beta"] is None
