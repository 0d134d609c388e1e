"""Sequence packing and vocabulary building for training pipelines.

Two standard pre-training data ops expressed as pure window/aggregate
plans:

- :func:`pack_chunks` — offset-bucketed sequence packing: each document
  is assigned to ``chunk = floor(start_offset / budget)`` where
  ``start_offset`` is the running token total before it (window cumsum,
  one shuffle). This is the parallelizable form of packing — true
  next-fit greedy ("close the chunk when the next doc would overflow")
  is a sequential recurrence no window can express. Consequences, by
  definition: a document straddling a budget boundary belongs to the
  chunk where it STARTS (that chunk's token sum can exceed the budget
  by less than that document's length), and a document longer than the
  budget makes the following chunk ids skip. Deterministic given the
  order column; chunks average ``budget`` tokens.
- :func:`vocab_topk` — corpus token frequencies -> the top-k vocabulary
  with dense ranks (explode + count is map-side combined; the rank
  window shuffles only the distinct-token table, which is vocabulary-
  sized, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinpy_spark.functions.text import norm_tokens, token_count, tokens


def pack_chunks(
    df: DataFrame,
    *,
    budget: int = 2048,
    group_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a ``chunk_id`` within its group such that
    consecutive documents (by ``order_col``) share a chunk until the
    token budget would overflow."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ntok = token_count(F.col(text_col))
    return df.select(
        F.col(group_col),
        F.col(order_col),
        ntok.alias("n_tok"),
        F.floor((F.sum(ntok).over(w) - ntok) / budget).alias("chunk_id"),
    )


def split_long_docs(
    df: DataFrame,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "piece",
) -> DataFrame:
    """Split each document's token stream into consecutive
    ``budget``-token pieces (last piece ragged) ->
    ``(id, piece_idx, piece, piece_tok)``.

    The pre-pass :func:`pack_chunks` wants: offset-bucketed packing
    lets a long document overflow its chunk by up to its own length, so
    pipelines split oversize docs FIRST and pack the pieces. Pure
    ``sequence`` explode + ``slice`` — no UDF, fan-out exactly
    ceil(n_tok/budget) per doc, and both ops are engine-portable (the
    oracle recomputes every piece boundary)."""
    base = (
        df.select(F.col(id_col), norm_tokens(text_col).alias("__tk"))
        .withColumn("__n", F.size("__tk"))
    )
    n_pieces = F.ceil(F.col("__n") / F.lit(budget)).cast("long")
    return (
        base.select(
            id_col, "__tk",
            F.explode(F.sequence(F.lit(0), n_pieces - 1)).alias("piece_idx"),
        )
        .select(
            id_col, "piece_idx",
            F.slice("__tk", F.col("piece_idx") * budget + 1, F.lit(budget)
                    ).alias(out_col),
        )
        .withColumn("piece_tok", F.size(out_col).cast("long"))
    )


def pack_chunk_stats(df: DataFrame, *, budget: int = 2048, group_col: str = "lang",
                     order_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-chunk packing report: document count and token fill."""
    packed = pack_chunks(df, budget=budget, group_col=group_col,
                         order_col=order_col, text_col=text_col)
    return packed.groupBy(group_col, "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tok"),
    )


def vocab_topk(df: DataFrame, *, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-``k`` tokens by corpus frequency with a dense vocabulary id
    (1 = most frequent; ties broken by token text for determinism)."""
    tok = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        tok.withColumn("vocab_id", F.row_number().over(w))
        .filter(F.col("vocab_id") <= k)
    )
