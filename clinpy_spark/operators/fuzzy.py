"""Fuzzy string matching join: all pairs within an edit-distance budget,
without the all-pairs cross join.

Entity-resolution / near-dup staple (product names, author strings,
OCR'd text). The blocking is LOSSLESS by the triangle bound
``|len(a) - len(b)| <= levenshtein(a, b)``: replicating one side into
its ``2*max_edits + 1`` neighboring length bins and equi-joining on
exact length can never drop a qualifying pair, and each pair meets in
exactly one bin (the other side's true length) so nothing double-
counts. The expensive exact ``levenshtein`` evaluates only on
candidates sharing a length bin — at 100 TB add a second blocking key
(q-gram prefix a la PPJoin) inside the same equi-join to cut candidates
further; the filter stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edits: int = 2,
) -> DataFrame:
    """Unordered within-table pairs (a_id < b_id) with
    ``levenshtein <= max_edits`` -> (a_id, b_id, edits)."""
    a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(text_col).alias("__a_txt"),
        F.explode(
            F.sequence(
                F.length(text_col) - max_edits, F.length(text_col) + max_edits
            )
        ).alias("__bin"),
    )
    b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(text_col).alias("__b_txt"),
        F.length(text_col).alias("__bin"),
    )
    return (
        a.join(b, "__bin")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("edits", F.levenshtein("__a_txt", "__b_txt"))
        .filter(F.col("edits") <= max_edits)
        .select("a_id", "b_id", "edits")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_edits: int = 2,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Two-table fuzzy equi-match: every (left, right) row pair whose
    strings are within ``max_edits``, plus an ``edits`` column. Same
    lossless length blocking; right side carries its exact length, left
    replicates into the band. Column names shared by both inputs
    (including ``left_on == right_on``, the common case) are
    disambiguated with ``suffixes``."""
    shared = set(left.columns) & set(right.columns)
    lmap = {c: c + suffixes[0] if c in shared else c for c in left.columns}
    rmap = {c: c + suffixes[1] if c in shared else c for c in right.columns}
    lb = left.select(*[F.col(c).alias(lmap[c]) for c in left.columns]).withColumn(
        "__bin",
        F.explode(F.sequence(F.length(lmap[left_on]) - max_edits,
                             F.length(lmap[left_on]) + max_edits)),
    )
    rb = right.select(*[F.col(c).alias(rmap[c]) for c in right.columns]).withColumn(
        "__bin", F.length(rmap[right_on]))
    return (
        lb.join(rb, "__bin")
        .withColumn("edits", F.levenshtein(F.col(lmap[left_on]), F.col(rmap[right_on])))
        .filter(F.col("edits") <= max_edits)
        .drop("__bin")
    )
