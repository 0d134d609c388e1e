"""Vector math over ``array<float>`` columns — pure built-in expressions.

Used by the similarity-search operators over the ``embeddings`` table.
``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Python
per-row UDF), but note: Spark evaluates higher-order functions
INTERPRETED — they never enter whole-stage codegen. That is fine for
per-row scoring and small probe sets; per-candidate-PAIR hot loops
(recall baselines, all-pairs verification) use the Arrow-batched numpy
GEMM paths in ``operators/similarity.py`` (``exact_cosine_pairs``,
``exact_l2_topk``) instead — measured ~10x on the gates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
