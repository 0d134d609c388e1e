"""Event-time helpers robust to the parquet timestamp flavor.

The driver's testdata has flipped ``events.ts`` between numeric epoch,
TIMESTAMP and TIMESTAMP_NTZ across regenerations; Spark 4 refuses a
direct ``CAST(TIMESTAMP_NTZ AS BIGINT)``. ``epoch_seconds`` goes
through an intermediate TIMESTAMP cast, which is defined for all three
input flavors (BIGINT seconds -> timestamp, NTZ -> session-local
timestamp — identity under the UTC session set in
clinpy_spark.session) and then truncates to whole epoch seconds,
matching DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)`` for post-1970
data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since the epoch, for timestamp / ntz / numeric input."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
