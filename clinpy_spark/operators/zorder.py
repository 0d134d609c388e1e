"""Z-order (Morton-curve) write layout: cluster a table so parquet
min/max footer stats prune on SEVERAL columns at once.

A sort on one column gives perfect pruning on that column and none on
any other. Interleaving the bits of two (or more) normalized column
ranks and sorting by the interleaved key gives every file a tight
bounding BOX over all participating columns — the layout move behind
Delta/Iceberg OPTIMIZE ZORDER, here as plain column expressions over
plain parquet: normalize each column to a ``bits``-bit rank, interleave
bits JVM-side (shift/and/or fold — whole-stage codegen, no UDF), range-
partition + sort by the key, drop it before writing.

Normalization is linear min-max by default (min/max from a 1-row
broadcast aggregate — the whitelisted scalar shape). Linear ranks
degrade on heavily skewed columns; pass explicit ``breaks`` (e.g. from
``approx_percentile``) to rank by quantile instead — the interleave and
layout machinery are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__zkey"


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Bit-interleave ``bits``-bit ranks into one Morton key (col 0 gets
    the highest bit at each level)."""
    n = len(ranks)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1).cast("long"))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return out


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    breaks: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Append the Morton key column (``__zkey``) for ``cols``.

    Each column maps to a ``bits``-bit rank: linear min-max scaling
    (nulls rank 0) by default, or per-column quantile ``breaks`` for
    skewed data. The min/max pass is one broadcast 1-row aggregate.

    ``bits * len(cols)`` must fit in the 63 value bits of a signed long;
    beyond that the interleave would shift into the sign bit and
    silently corrupt the Morton ordering, so we raise instead.
    """
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder key needs bits*len(cols) <= 63 (got {bits}*{len(cols)}="
            f"{bits * len(cols)}); lower bits= for this many columns"
        )
    hi = (1 << bits) - 1
    if breaks is None:
        stats = df.agg(*[f(c).alias(f"__{n}_{c}") for c in cols
                         for n, f in (("mn", F.min), ("mx", F.max))])
        out = df.crossJoin(F.broadcast(stats))
        ranks = []
        for c in cols:
            mn, mx = F.col(f"__mn_{c}").cast("double"), F.col(f"__mx_{c}").cast("double")
            span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
            r = F.floor((F.col(c).cast("double") - mn) / span * hi).cast("long")
            ranks.append(F.coalesce(F.least(F.greatest(r, F.lit(0)), F.lit(hi)), F.lit(0)))
        return out.withColumn(Z_COL, _interleave(ranks, bits)) \
            .drop(*[f"__{n}_{c}" for c in cols for n in ("mn", "mx")])
    ranks = []
    for c in cols:
        bks = breaks[c]
        r = F.lit(0).cast("long")
        for b in bks:  # rank = count of breaks below the value
            r = r + F.when(F.col(c) > b, 1).otherwise(0)
        ranks.append((r * hi / max(len(bks), 1)).cast("long"))
    return df.withColumn(Z_COL, _interleave(ranks, bits))


def write_zordered(
    catalog,
    df: DataFrame,
    name: str,
    cols: list[str],
    num_files: int = 32,
    bits: int = 12,
    breaks: dict[str, list[float]] | None = None,
) -> None:
    """Write ``df`` z-ordered on ``cols``: range-partition by the Morton
    key (contiguous curve segments per file — the property that makes
    footer boxes tight), sort within, drop the key, write through the
    catalog (stats manifest included)."""
    keyed = with_zorder_key(df, cols, bits, breaks)
    laid = (
        keyed.repartitionByRange(num_files, F.col(Z_COL))
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
    )
    catalog.write(laid, name)


def files_containing(path: str, preds: dict[str, float]) -> tuple[int, int]:
    """(matching files, total files) whose parquet footer min/max box
    admits the conjunctive point predicate — the pruning a reader gets
    for free from footer stats. Metadata-only reads."""
    import os

    import pyarrow.parquet as papq

    total = hit = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = papq.ParquetFile(os.path.join(dp, f)).metadata
            ok = True
            schema_names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for col, v in preds.items():
                lo, hi = None, None
                ci = schema_names[col]
                stats_missing = False
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        stats_missing = True
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if stats_missing:
                    continue  # no stats -> a reader MUST read it: counts as hit
                if not (lo <= v <= hi):
                    ok = False
                    break
            hit += ok
    return hit, total
