"""Distributed PCA / whitening over an embedding column.

The dimensionality-reduction rung of the embedding pipeline (pairs with
operators/pq.py's OPQ rotation, which is also an orthogonal map): fit
principal components from DISTRIBUTED second moments, apply the
projection as an Arrow-batched GEMM, optionally whiten (unit variance
per component) — the standard preprocessing before ANN indexing or
clustering at scale.

Scale design: the fit is ONE pass — each partition emits its partial
(count, sum, sum-of-outer-products) via ``mapInPandas`` (d + d*d
doubles per partition, bounded by the vector width, never by rows); the
driver sums partials and runs a d x d ``eigh`` (d <= a few thousand —
trivial driver math, same discipline as pq.py's codebook fit). The
apply streams through executors as numpy GEMM per Arrow batch; no
shuffle anywhere. Eigenvector sign is fixed (largest-|component|
coordinate made positive) so results are deterministic across runs and
partitionings.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_partials(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass -> (n, sum, sum of outer products)."""
    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(list(pdf["__v"]), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            ss = x.T @ x if ss is None else ss + x.T @ x
        if n:
            yield pd.DataFrame({
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()],
            })

    rows = (
        df.select(F.col(vec_col).alias("__v"))
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("cannot fit PCA on an empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0)
    d = s.shape[0]
    return n, s, ss.reshape(d, d)


def fit_pca(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components, eigvals): top-``n_components`` principal axes
    of the corpus, deterministic (sign-fixed), from one distributed
    moments pass + a driver-side d x d eigendecomposition."""
    n, s, ss = _moment_partials(corpus, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # (p, d)
    vals = np.maximum(vals[order], 0.0)
    # sign fix: make each component's largest-|coord| positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eigvals: np.ndarray | None = None,
    whiten: bool = False,
    eps: float = 1e-9,
    out_col: str = "projected",
) -> DataFrame:
    """Project (and optionally whiten) every vector onto the fitted
    components: one numpy GEMM per Arrow batch, no shuffle. Output
    (id, out_col array<double> of length p)."""
    if whiten:
        if eigvals is None:
            raise ValueError("whitening needs the fitted eigvals")
        scale = 1.0 / np.sqrt(eigvals + eps)
    else:
        scale = np.ones(components.shape[0])

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(list(pdf["__v"]), dtype=np.float64)
            z = (x - mean[None, :]) @ components.T * scale[None, :]
            yield pd.DataFrame({"__id": pdf["__id"], "__z": list(z)})

    # Derive the id field's type from the input schema — hardcoding `long`
    # broke string/int doc-id columns at runtime.
    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .mapInPandas(proj, f"__id {id_type}, __z array<double>")
        .select(F.col("__id").alias(id_col), F.col("__z").alias(out_col))
    )


def pca_variance_report(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
) -> tuple[float, float]:
    """(variance_explained_frac, reconstruction_mse_ratio) for the
    top-p fit — the two numbers the PCA contract gates on. For exact
    PCA these satisfy mse_ratio == 1 - variance_explained (verified by
    the gate within float tolerance)."""
    n, s, ss = _moment_partials(corpus, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = float(vals.sum())
    top = float(vals[:n_components].sum())
    if total <= 0:
        return 1.0, 0.0
    return top / total, 1.0 - top / total
