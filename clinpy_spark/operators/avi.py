"""AVI (RIFF) container with MJPEG frames — the video leg of the
multimodal surface, built on the baseline JPEG codec (operators/jpeg.py).

MJPEG-in-AVI is the simplest real video format: a RIFF container whose
``movi`` list holds one complete JFIF image per ``00dc`` chunk. Parsing
it needs only chunk walking; decoding frames reuses :func:`decode_jpeg`.
That upgrades video from "emit byte offsets" (the old stub semantics of
``frame_sample``) to real keyframe extraction: sample every Nth frame,
decode it, featurize it — the shape a training pipeline needs for
video->image-model distillation.

Writer emits a minimally-complete AVI (avih + one video strl with strh/
strf, movi, idx1) that standard players accept; reader tolerates any
RIFF layout and finds frames by chunk id, so foreign MJPEG AVIs decode
too. Non-MJPEG codecs (anything whose frames don't parse as JPEG)
surface as None per frame rather than wrong pixels.
"""

from __future__ import annotations

import numpy as np

from clinpy_spark.operators.jpeg import decode_jpeg, encode_jpeg, parse_jpeg_header


def parse_avi_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """RIFF/AVI header -> (width, height, n_frames, fps*1000), or None.
    Reads the ``avih`` main header; width/height/frame-count live there."""
    if len(payload) < 32 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"LIST":
            ltype = payload[pos + 8:pos + 12]
            if ltype == b"hdrl":
                # descend: avih is the first chunk inside hdrl
                ipos = pos + 12
                while ipos + 8 <= pos + 8 + clen:
                    icid = payload[ipos:ipos + 4]
                    ilen = int.from_bytes(payload[ipos + 4:ipos + 8], "little")
                    if icid == b"avih" and ilen >= 40:
                        b = payload[ipos + 8:ipos + 8 + ilen]
                        usec = int.from_bytes(b[0:4], "little")
                        frames = int.from_bytes(b[16:20], "little")
                        w = int.from_bytes(b[32:36], "little")
                        h = int.from_bytes(b[36:40], "little")
                        fps_milli = round(1e9 / usec) if usec else 0
                        if w <= 0 or h <= 0:
                            return None
                        return w, h, frames, fps_milli
                    ipos += 8 + ilen + (ilen & 1)
            pos += 8 + clen + (clen & 1)
        else:
            pos += 8 + clen + (clen & 1)
    return None


def avi_frames(payload: bytes) -> list[bytes]:
    """Every compressed video frame (``..dc`` chunk) in stream order.
    Pure chunk walk — no index required (idx1 is optional per spec)."""
    out: list[bytes] = []
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return out
    stack = [(12, len(payload))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            clen = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if cid == b"LIST":
                stack.append((pos + 12, min(end, pos + 8 + clen)))
            elif cid[2:4] == b"dc":
                out.append(payload[pos + 8:pos + 8 + clen])
            pos += 8 + clen + (clen & 1)
    return out


def decode_avi_frame(payload: bytes, frame_no: int) -> np.ndarray | None:
    """Decode one frame by index -> (h, w, c) uint8, or None."""
    frames = avi_frames(payload)
    if not 0 <= frame_no < len(frames):
        return None
    return decode_jpeg(frames[frame_no])


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25,
                     quality: int = 92) -> bytes:
    """uint8 (h, w, 3) frames -> MJPEG AVI bytes (avih + strl + movi +
    idx1). All frames must share one shape."""
    if not frames:
        raise ValueError("cannot encode an empty frame list")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = 1_000_000 // fps
    maxb = max(len(j) for j in jpegs)
    avih = (usec.to_bytes(4, "little") + (maxb * fps).to_bytes(4, "little")
            + (0).to_bytes(4, "little") + (0x10).to_bytes(4, "little")  # HASINDEX
            + len(jpegs).to_bytes(4, "little") + (0).to_bytes(4, "little")
            + (1).to_bytes(4, "little") + maxb.to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + bytes(16))
    strh = (b"vids" + b"MJPG" + bytes(12)
            + (1).to_bytes(4, "little") + fps.to_bytes(4, "little")  # scale/rate
            + (0).to_bytes(4, "little") + len(jpegs).to_bytes(4, "little")
            + maxb.to_bytes(4, "little") + (0xFFFFFFFF).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + w.to_bytes(2, "little") + h.to_bytes(2, "little"))
    strf = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
            + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + b"MJPG"
            + (w * h * 3).to_bytes(4, "little") + bytes(16))
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list start + 4)
    idx, off = b"", 4
    for j in jpegs:
        idx += b"00dc" + (0x10).to_bytes(4, "little") + off.to_bytes(4, "little") \
               + len(j).to_bytes(4, "little")
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


__all__ = [
    "parse_avi_header", "avi_frames", "decode_avi_frame", "encode_avi_mjpeg",
    "decode_jpeg", "parse_jpeg_header",
]
