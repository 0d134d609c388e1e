"""Baseline TIFF codec in stdlib + numpy.

Scanned-document corpora (OCR / document-AI training sets) ship TIFF,
so the multimodal surface decodes it for real alongside
PNG/JPEG/GIF/BMP/PPM (operators/multimodal.py dispatch).

Scope (decode): both byte orders (II/MM), 8-bit samples, grayscale
(photometric 0/1, including min-is-white inversion) and RGB, strip
layout, compression 1 (none), 32773 (PackBits), and 5 (TIFF-LZW — which
is NOT GIF LZW: MSB-first bit packing and the "early change" code-width
bump one code before the table fills), horizontal-differencing
predictor (tag 317 = 2). Tiled, 16-bit, palette, and JPEG-in-TIFF
variants return None so callers fall back rather than decode wrong
pixels; malformed payloads return None, never raise (fuzz contract
shared with the other codecs).
Scope (encode): uncompressed single-strip gray/RGB, little-endian —
minimal, valid, byte-length formula-predictable (8 header + N*12+6 IFD
+ pixel data), which is what lets an SQL oracle check it.

Perf stance: PackBits/LZW are byte/code-serial Python loops
(correctness first); row assembly, predictor undo, and photometric
transforms are vectorized numpy. Production swaps in PIL via the same
``_decode_one`` dispatch seam.
"""

from __future__ import annotations

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd_at(payload: bytes, lt: str, off: int
                 ) -> tuple[dict[int, tuple[int, int, int]], int] | None:
    """IFD at ``off`` -> ({tag: (type, count, value_or_offset)},
    next_ifd_offset); inline values decoded left-justified per spec."""
    if off <= 0 or off + 2 > len(payload):
        return None
    n = int.from_bytes(payload[off:off + 2], lt)
    out: dict[int, tuple[int, int, int]] = {}
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(payload):
            return None
        tag = int.from_bytes(payload[pos:pos + 2], lt)
        typ = int.from_bytes(payload[pos + 2:pos + 4], lt)
        cnt = int.from_bytes(payload[pos + 4:pos + 8], lt)
        val = int.from_bytes(payload[pos + 8:pos + 12], lt)
        if typ in (1, 3) and cnt == 1:
            # short/byte scalars live left-justified in the value field
            val = int.from_bytes(payload[pos + 8:pos + 8 + _TYPE_SIZES[typ]], lt)
        out[tag] = (typ, cnt, val)
        pos += 12
    if pos + 4 > len(payload):
        return out, 0
    return out, int.from_bytes(payload[pos:pos + 4], lt)


def _read_ifd(payload: bytes, lt: str) -> dict[int, tuple[int, int, int]] | None:
    r = _read_ifd_at(payload, lt, int.from_bytes(payload[4:8], lt))
    return r[0] if r else None


def _ifd_offsets(payload: bytes, lt: str, max_pages: int = 1000) -> list[int]:
    """Walk the IFD chain -> page offsets (seen-set breaks cycles)."""
    offs, seen = [], set()
    off = int.from_bytes(payload[4:8], lt)
    while off and off not in seen and len(offs) < max_pages:
        seen.add(off)
        r = _read_ifd_at(payload, lt, off)
        if r is None:
            break
        offs.append(off)
        off = r[1]
    return offs


def _tag_values(payload: bytes, lt: str, entry: tuple[int, int, int]) -> list[int]:
    typ, cnt, val = entry
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise ValueError("unsupported tag type")
    if cnt > (1 << 20):  # corrupt count field: no sane strip table is
        raise ValueError("implausible tag count")  # a million entries
    if typ in (1, 3) and cnt == 1:
        return [val]  # already decoded left-justified by _read_ifd
    if size * cnt <= 4:
        base = val.to_bytes(4, lt)
        return [int.from_bytes(base[i * size:(i + 1) * size], lt) for i in range(cnt)]
    if val + size * cnt > len(payload):
        # Out-of-line data past EOF: a truncated strip-offset array would
        # otherwise slice to b'' and silently decode as offset 0, making
        # _decode_page return header bytes as pixels. Raise instead (the
        # decode wrappers catch ValueError -> None, never wrong pixels).
        raise ValueError("tag data extends past end of payload")
    return [
        int.from_bytes(payload[val + i * size: val + (i + 1) * size], lt)
        for i in range(cnt)
    ]


def parse_tiff_header(payload: bytes) -> tuple[int, int, int] | None:
    """TIFF magic + first IFD -> (width, height, samples_per_pixel), or
    None unless it is an 8-bit stripped gray/RGB baseline TIFF."""
    try:
        if len(payload) < 8:
            return None
        if payload[:4] == b"II*\x00":
            lt = "little"
        elif payload[:4] == b"MM\x00*":
            lt = "big"
        else:
            return None
        ifd = _read_ifd(payload, lt)
        if ifd is None:
            return None
        return _page_dims(payload, lt, ifd)
    except (IndexError, ValueError, OverflowError):
        return None


def _page_dims(payload: bytes, lt: str,
               ifd: dict[int, tuple[int, int, int]]) -> tuple[int, int, int] | None:
    """Validate one page's IFD -> (w, h, spp) or None if unsupported."""
    if 256 not in ifd or 257 not in ifd or 273 not in ifd:
        return None
    w = _tag_values(payload, lt, ifd[256])[0]
    h = _tag_values(payload, lt, ifd[257])[0]
    spp = _tag_values(payload, lt, ifd[277])[0] if 277 in ifd else 1
    bits = _tag_values(payload, lt, ifd[258]) if 258 in ifd else [8]
    comp = _tag_values(payload, lt, ifd[259])[0] if 259 in ifd else 1
    photo = _tag_values(payload, lt, ifd[262])[0] if 262 in ifd else 1
    if 322 in ifd or 323 in ifd:  # tiled
        return None
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        return None
    if spp not in (1, 3) or any(b != 8 for b in bits) or len(bits) != spp:
        return None
    if comp not in (1, 5, 32773) or photo not in (0, 1, 2):
        return None
    return w, h, spp


def tiff_page_count(payload: bytes) -> int:
    """Number of IFDs in the chain (multi-page documents), 0 if not TIFF."""
    try:
        if len(payload) < 8 or payload[:4] not in (b"II*\x00", b"MM\x00*"):
            return 0
        lt = "little" if payload[:2] == b"II" else "big"
        return len(_ifd_offsets(payload, lt))
    except (IndexError, ValueError, OverflowError):
        return 0


def _packbits(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out)


def _lzw_tiff(data: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW: MSB-first codes, 256=clear, 257=EOI, early
    change (width bumps at table size 511/1023/2047)."""
    out = bytearray()
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    acc = n = 0
    for byte in data:
        acc = (acc << 8) | byte
        n += 8
        while n >= width:
            code = (acc >> (n - width)) & ((1 << width) - 1)
            n -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("bad LZW code")
            out += entry
            if len(out) > expect:
                raise ValueError("LZW overrun")
            prev = entry
            if len(table) + 1 >= (1 << width) and width < 12:  # early change
                width += 1
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray | None:
    """TIFF bytes -> FIRST page as (h, w, channels) uint8, or None."""
    try:
        pages = _decode_tiff_pages_inner(payload, first_only=True)
        return pages[0] if pages else None
    except (IndexError, ValueError, KeyError, OverflowError):
        return None


def decode_tiff_pages(payload: bytes) -> list[np.ndarray] | None:
    """Multi-page TIFF -> list of (h, w, channels) uint8 arrays (pages
    may differ in shape), or None if any page is unsupported — a partial
    document silently missing pages is worse than an explicit fallback."""
    try:
        return _decode_tiff_pages_inner(payload, first_only=False)
    except (IndexError, ValueError, KeyError, OverflowError):
        return None


def _decode_tiff_pages_inner(payload: bytes, first_only: bool) -> list[np.ndarray] | None:
    if len(payload) < 8 or payload[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    lt = "little" if payload[:2] == b"II" else "big"
    out = []
    for off in _ifd_offsets(payload, lt):
        r = _read_ifd_at(payload, lt, off)
        if r is None:
            return None
        px = _decode_page(payload, lt, r[0])
        if px is None:
            return None
        out.append(px)
        if first_only:
            break
    return out or None


def _decode_page(payload: bytes, lt: str,
                 ifd: dict[int, tuple[int, int, int]]) -> np.ndarray | None:
    dims = _page_dims(payload, lt, ifd)
    if dims is None:
        return None
    w, h, spp = dims
    comp = _tag_values(payload, lt, ifd[259])[0] if 259 in ifd else 1
    photo = _tag_values(payload, lt, ifd[262])[0] if 262 in ifd else 1
    offsets = _tag_values(payload, lt, ifd[273])
    rows_per = _tag_values(payload, lt, ifd[278])[0] if 278 in ifd else h
    counts = (_tag_values(payload, lt, ifd[279])
              if 279 in ifd else [len(payload) - offsets[0]])
    predictor = _tag_values(payload, lt, ifd[317])[0] if 317 in ifd else 1
    if predictor not in (1, 2):
        return None
    row_bytes = w * spp
    raw = bytearray()
    for si, off in enumerate(offsets):
        strip_rows = min(rows_per, h - si * rows_per)
        expect = strip_rows * row_bytes
        chunk = payload[off: off + counts[min(si, len(counts) - 1)]]
        if comp == 1:
            got = chunk[:expect]
        elif comp == 32773:
            got = _packbits(chunk, expect)
        else:
            got = _lzw_tiff(chunk, expect)
        if len(got) < expect:
            return None
        raw += got[:expect]
    px = np.frombuffer(bytes(raw), np.uint8, count=h * row_bytes).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: cumsum per channel
        px = px.astype(np.int64).cumsum(axis=1).astype(np.uint8)
    if photo == 0:  # min-is-white grayscale
        px = 255 - px
    return px.copy()


def _encode_page(px: np.ndarray, ifd_off: int, next_ifd: int) -> bytes:
    """One page's IFD + data at absolute offset ``ifd_off``; the IFD's
    next pointer is set to ``next_ifd`` (0 terminates the chain)."""
    h, w, c = px.shape
    data = px.tobytes()
    tags = [
        (256, 3, 1, w),            # width
        (257, 3, 1, h),            # height
        (259, 3, 1, 1),            # no compression
        (262, 3, 1, 1 if c == 1 else 2),  # photometric
        (273, 4, 1, 0),            # strip offset (patched below)
        (277, 3, 1, c),            # samples per pixel
        (278, 3, 1, h),            # rows per strip
        (279, 4, 1, len(data)),    # strip byte count
    ]
    if c == 3:
        # bits-per-sample triple doesn't fit inline: needs an offset
        tags.insert(2, (258, 3, 3, 0))
    else:
        tags.insert(2, (258, 3, 1, 8))
    n = len(tags)
    data_off = ifd_off + 2 + n * 12 + 4
    extra = b""
    if c == 3:
        bits_off = data_off
        extra = (8).to_bytes(2, "little") * 3
        data_off += 6
        tags = [(t, ty, cn, bits_off if t == 258 else v) for t, ty, cn, v in tags]
    tags = [(t, ty, cn, data_off if t == 273 else v) for t, ty, cn, v in tags]
    out = bytearray(n.to_bytes(2, "little"))
    for tag, typ, cnt, val in tags:
        out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        out += cnt.to_bytes(4, "little")
        if typ == 3 and cnt == 1:
            out += val.to_bytes(2, "little") + b"\x00\x00"
        else:
            out += val.to_bytes(4, "little")
    out += next_ifd.to_bytes(4, "little")
    out += extra + data
    return bytes(out)


def page_size(px: np.ndarray) -> int:
    """Encoded byte size of one page (IFD + data)."""
    h, w, c = px.shape
    return 2 + (9 * 12) + 4 + (6 if c == 3 else 0) + h * w * c


def encode_tiff(px: np.ndarray | list) -> bytes:
    """uint8 (h, w), (h, w, 1|3), or a LIST of such pages ->
    uncompressed little-endian TIFF (single strip per page; multi-page
    via the IFD chain — the scanned-document layout). Byte length =
    8 + sum over pages of (2 + n_tags*12 + 4 [+6 for RGB] + h*w*c),
    exactly (what the SQL oracle leans on)."""
    pages = px if isinstance(px, list) else [px]
    norm = []
    for p in pages:
        p = np.asarray(p, dtype=np.uint8)
        if p.ndim == 2:
            p = p[:, :, None]
        if p.shape[2] not in (1, 3):
            raise ValueError("encode_tiff supports 1 or 3 channels")
        norm.append(p)
    if not norm:
        raise ValueError("cannot encode an empty page list")
    out = bytearray(b"II*\x00" + (8).to_bytes(4, "little"))
    off = 8
    for i, p in enumerate(norm):
        nxt = 0 if i == len(norm) - 1 else off + page_size(p)
        out += _encode_page(p, off, nxt)
        off += page_size(p)
    return bytes(out)
