"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extraction runs as Arrow-batched pandas
iterators (``mapInPandas``) so the heavy per-item work happens on
executors in vectorized batches, never on the driver.

Codec status: **PPM (P6) images decode and resize for real** — header
parse + numpy pixel math needs no image library. Other formats
(JPEG/PNG/audio) fall back to a deterministic stand-in that exercises
the Spark-side contract (schema, batching, partitioning); swap the
fallback for PIL/librosa/pyav in production — the dispatch seam is
``_decode_one`` / ``_resize_one``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


def parse_ppm_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a binary-PPM (P6) header -> (width, height, maxval,
    data_offset), or None if the payload is not P6. Handles the spec's
    whitespace and ``#`` comments."""
    if not payload.startswith(b"P6"):
        return None
    i, toks = 2, []
    while len(toks) < 3 and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.find(b"\n", i)
            if i < 0:
                return None
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            try:
                toks.append(int(payload[i:j]))
            except ValueError:
                return None
            i = j
    if len(toks) < 3 or i >= len(payload):
        return None
    i += 1  # single whitespace byte after maxval, then raw RGB data
    w, h, maxval = toks
    # maxval > 255 means 2-byte big-endian samples; the decode/resize
    # paths assume 1 byte per sample, so 16-bit P6 takes the fallback
    # rather than decoding a wrong mean / re-emitting corrupt pixels.
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255 or len(payload) - i < w * h * 3:
        return None
    return w, h, maxval, i


def _ppm_pixels(payload: bytes, hdr: tuple[int, int, int, int]) -> np.ndarray:
    w, h, _, off = hdr
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)


def _decode_one(payload: bytes, media_type: str) -> tuple[int, int, float]:
    """Decode dispatch: REAL codec for PPM (P6) images — header parse +
    numpy mean over pixels; deterministic fallback for formats whose
    codecs aren't in this container (swap for PIL/librosa in
    production). Raises NotImplementedError for unregistered media
    types, mirroring a real codec registry."""
    if media_type not in {"image", "audio"}:
        raise NotImplementedError(f"no codec registered for media_type={media_type!r}")
    hdr = parse_ppm_header(payload)
    if hdr is not None:
        w, h, maxval, _ = hdr
        return w, h, float(_ppm_pixels(payload, hdr).mean()) / maxval
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

    PPM (P6) payloads resize FOR REAL — nearest-neighbor resample via
    numpy index maps, re-emitted as valid P6. Other formats fall back
    to a deterministic byte re-chunk that preserves the contract —
    binary in / binary out on executors, fixed output schema, Arrow
    batching; swap the fallback for PIL's ``Image.resize`` in
    production.
    """

    def _resize_one(payload: bytes) -> bytes:
        hdr = parse_ppm_header(payload)
        if hdr is not None:
            w, h, maxval, _ = hdr
            px = _ppm_pixels(payload, hdr)
            rows = (np.arange(height) * h) // height
            cols = (np.arange(width) * w) // width
            out = px[rows][:, cols]
            return b"P6\n%d %d\n%d\n" % (width, height, maxval) + out.tobytes()
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
