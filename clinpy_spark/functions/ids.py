"""Deterministic surrogate ids.

The reference relies on SQLite autoincrement primary keys
(rna_tables.py:8,18; implicit rowids for dynamic tables) and pays two
natural-key joins per ingest batch to resolve them back
(rna_functions.py:92-97, snp_functions.py:266-286 — the join the author
flags "TODO this is very slow" at snp_functions.py:265).

Autoincrement is the single most Spark-hostile feature of the reference:
it serializes ingest. We replace it with a deterministic 64-bit hash of
the natural key — distributed-safe, stable across incremental loads, and
it turns both id-resolution joins into a pure column computation.

Collision stance: xxhash64 over <=1e9 distinct keys gives collision
probability ~2.7e-2 at 1e9 (birthday bound) — acceptable for surrogate
join ids because the natural key remains the source of truth; callers
that need certainty join on the natural key (the API keeps both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_id(*cols: Column | str) -> Column:
    """64-bit deterministic id from a natural key (replaces A12)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def junction_id(chrom: Column | str = "chrom", start: Column | str = "start",
                end: Column | str = "end", strand: Column | str = "strand") -> Column:
    """Surrogate id for a splice junction (reference rna_tables.py:8)."""
    return hash_id(chrom, start, end, strand)


def variant_id(chrom: Column | str = "chrom", pos: Column | str = "pos",
               ref: Column | str = "ref", alt: Column | str = "alt") -> Column:
    """Surrogate id for a variant (reference snp_tables.py:6)."""
    return hash_id(chrom, pos, ref, alt)
