"""GIF (87a/89a) codec in stdlib + numpy — LZW, palettes, animation.

GIF is everywhere in scraped web corpora, so the multimodal surface
decodes it for real like PNG/JPEG (operators/multimodal.py dispatch),
including multi-frame animations, which feed the same
``frame_extract`` keyframe path as MJPEG-AVI video.

Scope (decode): GIF87a/89a, global and local color tables, variable-
width LSB-first LZW with dictionary resets, interlaced images (4-pass),
multi-frame streams with frame rectangles composited onto the logical
screen ("do not dispose" semantics — each emitted frame is the screen
after drawing; transparency via the 89a graphic control extension is
honored as "leave underlying pixel"). Malformed payloads return None,
never raise (same contract as the JPEG/FLAC decoders, fuzz-tested).
Scope (encode): full-frame frames sharing one <=256-color palette,
real LZW compression, optional per-frame delay — standard viewers
accept the output, and the format is lossless for paletted content so
round-trips are exact.

Perf stance: LZW is bit-serial per code (a Python loop), palette
mapping and compositing are vectorized numpy; production swaps in PIL
via the same ``_decode_one`` dispatch seam.
"""

from __future__ import annotations

import numpy as np


def parse_gif_header(payload: bytes) -> tuple[int, int, int] | None:
    """GIF signature + logical screen -> (width, height, n_frames), or
    None. Frame count requires a cheap block walk (no LZW decode)."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    # decompression-bomb guard: a corrupt header can declare a 65535^2
    # screen whose compositing would touch ~12 GiB; no legitimate GIF in
    # a training corpus is near 64 MPix
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        return None
    try:
        frames = sum(1 for _ in _walk_frames(payload))
    except (IndexError, ValueError):
        return None
    if frames == 0:
        return None
    return w, h, frames


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while payload[pos]:
        pos += 1 + payload[pos]
    return pos + 1


def _walk_frames(payload: bytes):
    """Yield (descriptor_offset, gce_packed, transparent_idx) per image
    block; raises IndexError/ValueError on malformed streams."""
    pos = 13
    packed = payload[10]
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x7))
    gce = (0, -1)
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = payload[pos + 1]
            if label == 0xF9 and payload[pos + 2] >= 4:
                flags = payload[pos + 3]
                tidx = payload[pos + 6] if flags & 1 else -1
                gce = (flags, tidx)
            pos = _skip_subblocks(payload, pos + 2)
        elif b == 0x2C:  # image descriptor
            yield pos, gce[0], gce[1]
            gce = (0, -1)
            ipos = pos + 10
            if payload[pos + 9] & 0x80:  # local color table
                ipos += 3 * (2 << (payload[pos + 9] & 0x7))
            ipos += 1  # LZW min code size
            pos = _skip_subblocks(payload, ipos)
        else:
            raise ValueError("unknown block")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    if not 1 <= min_code_size <= 11:  # spec: 2..8; corrupt byte -> 2^255 table
        raise ValueError("invalid LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    dict_base = [(i,) for i in range(clear)] + [(), ()]
    table = list(dict_base)
    out: list[int] = []
    acc = n = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n -= code_size
            if code == clear:
                table = list(dict_base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("bad LZW code")
            out.extend(entry)
            if len(out) > max_pixels:
                raise ValueError("LZW overrun")
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray | None:
    """GIF bytes -> (n_frames, h, w, 3) uint8 composited frames, or None."""
    try:
        return _decode_gif_inner(payload)
    except (IndexError, ValueError, KeyError, OverflowError):
        return None


def _decode_gif_inner(payload: bytes) -> np.ndarray | None:
    hdr = parse_gif_header(payload)
    if hdr is None:
        return None
    w, h, _ = hdr
    packed, bg = payload[10], payload[11]
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = np.frombuffer(payload, np.uint8, count=3 * n, offset=13).reshape(n, 3)
    screen = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        screen[:] = gct[bg]
    frames = []
    for pos, _flags, tidx in _walk_frames(payload):
        left = int.from_bytes(payload[pos + 1:pos + 3], "little")
        top = int.from_bytes(payload[pos + 3:pos + 5], "little")
        fw = int.from_bytes(payload[pos + 5:pos + 7], "little")
        fh = int.from_bytes(payload[pos + 7:pos + 9], "little")
        ipacked = payload[pos + 9]
        ipos = pos + 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x7)
            ct = np.frombuffer(payload, np.uint8, count=3 * n, offset=ipos).reshape(n, 3)
            ipos += 3 * n
        if ct is None or fw <= 0 or fh <= 0 or left + fw > w or top + fh > h:
            return None
        mcs = payload[ipos]
        ipos += 1
        chunks = []
        while payload[ipos]:
            ln = payload[ipos]
            chunks.append(payload[ipos + 1:ipos + 1 + ln])
            ipos += 1 + ln
        idx = _lzw_decode(b"".join(chunks), mcs, fw * fh)
        if len(idx) < fw * fh:
            return None
        px = np.asarray(idx[: fw * fh], dtype=np.int64)
        if int(px.max()) >= len(ct):
            return None
        if ipacked & 0x40:  # interlaced: reorder rows per the 4 passes
            rows = px.reshape(fh, fw)
            order = [y for start, step in _INTERLACE_PASSES for y in range(start, fh, step)]
            deinter = np.empty_like(rows)
            deinter[order] = rows
            rows = deinter
        else:
            rows = px.reshape(fh, fw)
        region = screen[top:top + fh, left:left + fw]
        rgb = ct[rows]
        if tidx >= 0:
            mask = rows != tidx
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(screen.copy())
    if not frames:
        return None
    return np.stack(frames)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    acc = n = 0

    def put(code: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += code_size
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    put(clear)
    prev: tuple[int, ...] = ()
    for v in indices:
        cur = prev + (int(v),)
        if cur in table:
            prev = cur
            continue
        put(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:  # dictionary full: reset
            put(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = (int(v),)
    if prev:
        put(table[prev])
    put(end)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: np.ndarray | list, delay_cs: int = 4) -> bytes:
    """(h, w, 3) or (n, h, w, 3) uint8 -> GIF89a bytes. All frames share
    one palette built from the distinct colors (<= 256 required — GIF is
    paletted by definition; quantization belongs to a real image lib).
    Lossless for paletted content, so round-trips are exact."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = arr[None]
    n, h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(colors)}; quantize first")
    bits = max(1, int(len(colors) - 1).bit_length())
    size_field = max(0, bits - 1)
    table_n = 2 << size_field
    palette = np.zeros((table_n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    mcs = max(2, bits)
    idx_frames = inverse.reshape(n, h, w)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((mcs - 1) << 4) | size_field, 0, 0])
    out += palette.tobytes()
    if n > 1:
        # NETSCAPE looping extension, the standard animation marker
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi in range(n):
        out += b"\x21\xF9\x04\x00" + delay_cs.to_bytes(2, "little") + b"\x00\x00"
        out += b"\x2C" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        out.append(mcs)
        data = _lzw_encode(idx_frames[fi].reshape(-1), mcs)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
