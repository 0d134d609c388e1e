"""Fuzzy string matching join: all pairs within an edit-distance budget,
without the all-pairs cross join.

Entity-resolution / near-dup staple (product names, author strings,
OCR'd text). The blocking is LOSSLESS by the triangle bound
``|len(a) - len(b)| <= levenshtein(a, b)``: replicating one side into
its ``2*max_edits + 1`` neighboring length bins and equi-joining on
exact length can never drop a qualifying pair, and each pair meets in
exactly one bin (the other side's true length) so nothing double-
counts.

Two scale levers beyond the band:

- **Salted join key.** Real corpora concentrate on a handful of
  lengths (TPC-H part names span ~15), so a plain equi-join on length
  has ~15 reduce buckets no matter how many cores exist. The probe
  side keys on (length bin, hash(id) % num_salts) and the build side
  replicates across all salts — same pairs, ``num_salts``x the
  parallelism (the salted_join move from operators/skew.py, applied to
  a theta-ish join).
- **Banded levenshtein.** The verify runs Spark's ``threshold``
  variant — O(max_edits * n) per pair instead of O(n^2) — and still
  returns the exact distance for qualifying pairs.

A segment-blocking layer (PassJoin family) was measured and REJECTED
for the default path: position-anchored segments collide massively on
low-entropy vocabularies (part names draw ~12-char segments from ~92
color words), emitting more candidate volume than they prune. On
high-entropy corpora it would help; the length+salt shape is the one
that is never pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.session import ensure_min_parallelism


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edits: int = 2,
    num_salts: int = 32,
) -> DataFrame:
    """Unordered within-table pairs (a_id < b_id) with
    ``levenshtein <= max_edits`` -> (a_id, b_id, edits)."""
    k = max_edits
    df = ensure_min_parallelism(df)
    a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(text_col).alias("__a_txt"),
        F.explode(
            F.sequence(F.length(text_col) - k, F.length(text_col) + k)
        ).alias("__bin"),
    ).withColumn("__salt", F.pmod(F.xxhash64(F.col("a_id")), F.lit(num_salts)))
    b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(text_col).alias("__b_txt"),
        F.length(text_col).cast("long").alias("__bin"),
    ).withColumn("__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(num_salts - 1).cast("long"))))
    return (
        a.join(b, ["__bin", "__salt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("edits", F.levenshtein("__a_txt", "__b_txt", k))
        .filter(F.col("edits") >= 0)  # banded: -1 means "> max_edits"
        .select("a_id", "b_id", "edits")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_edits: int = 2,
    suffixes: tuple[str, str] = ("_l", "_r"),
    num_salts: int = 32,
) -> DataFrame:
    """Two-table fuzzy equi-match: every (left, right) row pair whose
    strings are within ``max_edits``, plus an ``edits`` column. Same
    lossless length blocking; right side carries its exact length, left
    replicates into the band. Column names shared by both inputs
    (including ``left_on == right_on``, the common case) are
    disambiguated with ``suffixes``.

    The join key is salted exactly like :func:`fuzzy_pairs` — string
    lengths concentrate on a handful of values, so (bin,) alone caps the
    reduce-side parallelism at the number of distinct lengths.  The left
    probe side hashes its whole row into one of ``num_salts`` buckets and
    the right build side replicates across all of them: identical pair
    set, ``num_salts``x the reducers."""
    shared = set(left.columns) & set(right.columns)
    lmap = {c: c + suffixes[0] if c in shared else c for c in left.columns}
    rmap = {c: c + suffixes[1] if c in shared else c for c in right.columns}
    # The probe side MUST be pre-spread: when the build side broadcasts
    # (small dims), there is no shuffle at all, so probe-task count = scan
    # partition count — a single-file input would run every candidate
    # levenshtein on one core regardless of the salt (measured 45s -> 2s
    # at sf0.1). Same recipe as fuzzy_pairs; no-op on multi-file data.
    lb = (
        ensure_min_parallelism(left).select(*[F.col(c).alias(lmap[c]) for c in left.columns])
        .withColumn(
            "__bin",
            F.explode(F.sequence(F.length(lmap[left_on]) - max_edits,
                                 F.length(lmap[left_on]) + max_edits)),
        )
        .withColumn("__salt", F.pmod(F.xxhash64(*[lmap[c] for c in left.columns]), F.lit(num_salts)))
    )
    rb = (
        right.select(*[F.col(c).alias(rmap[c]) for c in right.columns])
        .withColumn("__bin", F.length(rmap[right_on]))
        .withColumn("__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(num_salts - 1).cast("long"))))
    )
    return (
        lb.join(rb, ["__bin", "__salt"])
        .withColumn("edits", F.levenshtein(F.col(lmap[left_on]), F.col(rmap[right_on]), max_edits))
        .filter(F.col("edits") >= 0)  # banded: -1 means "> max_edits"
        .drop("__bin", "__salt")
    )
