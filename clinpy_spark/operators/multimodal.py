"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extraction runs as Arrow-batched pandas
iterators (``mapInPandas``) so the heavy per-item work happens on
executors in vectorized batches, never on the driver.

The actual codec step is STUBBED: the image/audio libraries are not in
this container. ``fake_decode_features`` is a deterministic stand-in
that exercises the real Spark-side contract (schema, batching,
partitioning); swap ``_decode_one`` for a real decoder (PIL/librosa/
pyav) in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature-extraction stage.
MEDIA_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("mean_intensity", DoubleType()),
])


def as_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Standardize to the engine's media frame: (media_id, media_type,
    payload binary). ``payload_col`` may be string (cast) or binary."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
    )


def _decode_one(payload: bytes, media_type: str) -> tuple[int, int, float]:
    """STUB decoder. Replace with PIL.Image.open / soundfile / pyav.

    Deterministic fake: derives (width, height, mean_intensity) from the
    byte content so tests are stable. Raises NotImplementedError for
    media types the stub does not model, mirroring where a real codec
    registry would dispatch.
    """
    if media_type not in {"image", "audio"}:
        raise NotImplementedError(f"no codec registered for media_type={media_type!r}")
    n = len(payload)
    width = (n % 64) + 1
    height = (n % 48) + 1
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, mean_intensity


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode + featurize each media item via mapInPandas (Arrow batches).

    The per-batch pandas loop is the idiomatic shape for codec work: the
    payload bytes never leave the executor, batches amortize the
    Python<->JVM hop, and the output schema is fixed so downstream
    relational ops (joins to metadata, aggregations) stay JVM-side.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, mi = _decode_one(payload, mtype)
                rows.append((int(mid), mtype, len(payload), w, h, mi))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    from clinpy_spark.session import ensure_min_parallelism

    # Codec work is the per-core bottleneck — never let a coarse input
    # layout serialize it.
    return ensure_min_parallelism(media).mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


#: Output schema of the resize stage: payload out, target dims + the
#: (stub-)resized payload in.
MEDIA_RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("payload", BinaryType()),
])


def resize(media: DataFrame, width: int = 224, height: int = 224,
           batch_size: int = 256) -> DataFrame:
    """Resize every media item to (width, height) via mapInPandas.

    The codec step is STUBBED (no image libs in this container): the fake
    'resample' deterministically re-chunks the payload bytes to
    width*height length, preserving the real contract — binary in /
    binary out on executors, fixed output schema, Arrow batching. Swap
    ``_resize_one`` for PIL's ``Image.resize`` in production.
    """

    def _resize_one(payload: bytes) -> bytes:
        target = width * height
        if not payload:
            return bytes(target)
        reps = -(-target // len(payload))  # ceil-repeat then trim
        return (payload * reps)[:target]

    def _do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "width": width,
                "height": height,
                "payload": [
                    _resize_one(bytes(p) if p is not None else b"")
                    for p in pdf["payload"]
                ],
            })
            yield out

    from clinpy_spark.session import ensure_min_parallelism

    return ensure_min_parallelism(media).mapInPandas(_do, schema=MEDIA_RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' stub: emit up to ``max_frames`` offsets per item
    (a real video path would emit decoded keyframes). Pure relational:
    sequence + explode, no Python."""
    n = F.length("payload").cast("long")
    offsets = F.slice(
        F.sequence(F.lit(0).cast("long"), F.greatest(n - 1, F.lit(0).cast("long")), F.lit(every_n_bytes).cast("long")),
        1, max_frames,
    )
    return media.select("media_id", "media_type", F.explode(offsets).alias("frame_offset"))
