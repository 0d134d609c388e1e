"""Corpus ETL: catalog-level wiring of the curation/mixture/split
operators into materialized tables.

The operators (``operators/curate.py``, ``operators/sample.py``) are
pure transforms; this module is the thin ETL layer that lands their
outputs as project tables the way ``create_project`` lands assay
tables: curated corpus + audit report from ONE labeled pass, and a
training export physically partitioned by split so downstream trainers
read ``split=train/`` without scanning the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clinpy_spark.operators.curate import GATE_COL, label_gates
from clinpy_spark.operators.sample import mix_corpus, split_corpus
from clinpy_spark.session import ProjectCatalog


def curate_corpus(
    catalog: ProjectCatalog,
    df: DataFrame,
    gates: list[tuple[str, Column]],
    *,
    name: str = "corpus",
    dedup_on: Column | None = None,
    id_col: str = "doc_id",
) -> None:
    """Write ``{name}_curated`` (rows passing every gate, original
    schema) and ``{name}_report`` (per-gate drop counts) from a single
    labeled pass — the labeling runs once into a checkpoint, not once
    per output."""
    labeled = label_gates(df, gates, dedup_on=dedup_on, id_col=id_col) \
        .localCheckpoint(eager=False)
    catalog.write(labeled.filter(F.col(GATE_COL).isNull()).drop(GATE_COL),
                  f"{name}_curated")
    catalog.write(
        labeled.groupBy(F.coalesce(F.col(GATE_COL), F.lit("kept")).alias(GATE_COL))
        .agg(F.count("*").alias("n")),
        f"{name}_report",
    )


def export_splits(
    catalog: ProjectCatalog,
    df: DataFrame,
    splits: dict[str, float],
    *,
    name: str = "corpus_export",
    fractions: dict[str, float] | None = None,
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> None:
    """Training export: optional mixture down-sampling, deterministic
    split assignment, written partitioned by ``split`` — trainers read
    one directory, and the same (row, seed) always lands in the same
    file-system partition across rebuilds."""
    out = df
    if fractions:
        out = mix_corpus(out, fractions, group_col=group_col,
                         key_col=key_col, seed=seed)
    out = split_corpus(out, splits, key_col=key_col, seed=seed)
    catalog.write(out, name, partition_by=["split"])


def export_jsonl(
    df: DataFrame,
    path: str,
    *,
    n_shards: int | None = None,
    shard_key: str = "doc_id",
    compression: str | None = "gzip",
) -> None:
    """Emit the corpus as JSONL shards — the interchange format most
    training loaders consume. Sharding is DETERMINISTIC: rows are
    repartitioned by hash of ``shard_key`` into ``n_shards`` files, so
    a rebuild (or a different cluster size) produces the same
    row-to-shard assignment — resumable downloads and per-shard
    checksums stay valid. Spark's native json writer streams
    executor-side; nothing is collected."""
    from pyspark.sql import functions as F

    out = df
    if n_shards:
        out = df.repartition(n_shards, F.crc32(F.col(shard_key).cast("string")))
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
