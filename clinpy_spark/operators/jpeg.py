"""Baseline JPEG (ITU-T T.81 / JFIF) codec in stdlib + numpy.

Closes the last "declared stand-in" of the multimodal surface
(operators/multimodal.py): with no PIL/imageio/cv2 in the container,
baseline sequential JPEG is still a pure-spec format — marker parse,
Huffman entropy coding (Annex K standard tables), zigzag + quantization,
8x8 DCT-II as a numpy matrix product, YCbCr color transform.

Scope (decode): baseline DCT (SOF0) only, 8-bit, 1 or 3 components,
sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers
honored. Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
modes return None so callers fall back rather than decode wrong pixels.
Scope (encode): 4:4:4 (or grayscale) with the Annex K quantization
tables scaled by ``quality`` and the Annex K Huffman tables.

Perf stance, same as the PNG unfilter: the entropy decode is inherently
bit-serial (each Huffman symbol's length is unknown until decoded), so
it runs as a Python-per-symbol loop — correctness first; everything
block-parallel (dequant, IDCT, color) is vectorized numpy over all
blocks at once. At cluster scale this runs inside Arrow-batched
``mapInPandas`` on executors (operators/multimodal.py), so throughput
scales with cores; swap in PIL/libjpeg-turbo in production via the same
``_decode_one`` dispatch seam.

JPEG is lossy: round-trips are near-exact, not byte-exact. The oracled
query contract therefore uses constant-fill images (DC-only blocks
survive quantization exactly; see queries.py::mm_jpeg_features), and the
pytest round-trip asserts a tight max-error bound on natural images.
"""

from __future__ import annotations

import numpy as np

# -- tables (ITU-T T.81 Annex K) --------------------------------------------

#: zigzag scan order: index i of the scan -> (row, col) flattened offset.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_QL = np.array([  # Annex K.1 luminance quantization
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_QC = np.array([  # Annex K.2 chrominance quantization
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K.3: (BITS counts per code length 1..16, HUFFVAL symbol list)
_HT_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_HT_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_HT_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

#: orthonormal 8x8 DCT-II basis: T[u, x] = a(u) cos((2x+1) u pi / 16).
_DCT = np.array([
    [(np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment -> {symbol: (code, length)}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Decoder map {(length, code): symbol}."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * s + 50) // 100, 1, 255).astype(np.int64)
    qc = np.clip((_QC * s + 50) // 100, 1, 255).astype(np.int64)
    return ql, qc


# -- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (entropy-coded segment boundary)."""
        if self.n:
            self.put(0x7F, 8 - self.n)
        self.buf += bytes([0xFF, 0xD0 + (n % 8)])


def _encode_coeff(w: _BitWriter, v: int, table: dict[int, tuple[int, int]],
                  run: int = 0, is_dc: bool = True) -> None:
    mag = abs(v)
    t = mag.bit_length()
    sym = t if is_dc else (run << 4) | t
    code, ln = table[sym]
    w.put(code, ln)
    if t:
        w.put(v if v >= 0 else v + (1 << t) - 1, t)


def encode_jpeg(px: np.ndarray, quality: int = 92, restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 -> baseline JFIF bytes (4:4:4).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resync points a parallel decoder can seek to)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    ql, qc = _quality_tables(quality)
    x = px.astype(np.float64)
    if nc == 3:
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        comps = [x[:, :, 0]]
    qts = [ql] + ([qc, qc] if nc == 3 else [])
    dc_tabs = [_huff_codes(*_HT_DC_L)] + ([_huff_codes(*_HT_DC_C)] * 2 if nc == 3 else [])
    ac_tabs = [_huff_codes(*_HT_AC_L)] + ([_huff_codes(*_HT_AC_C)] * 2 if nc == 3 else [])

    bh, bw = -(-h // 8), -(-w // 8)
    quantized = []
    for ci, comp in enumerate(comps):
        pad = np.pad(comp, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") - 128.0
        blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)  # (bh, bw, 8, 8)
        freq = _DCT @ blocks @ _DCT.T
        quantized.append(np.round(freq / qts[ci]).astype(np.int64))

    wtr = _BitWriter()
    pred = [0] * nc
    n_rst = 0
    for by in range(bh):
        for bx in range(bw):
            n_mcu = by * bw + bx
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.restart(n_rst)
                n_rst += 1
                pred = [0] * nc
            for ci in range(nc):
                zz = quantized[ci][by, bx].reshape(64)[ZIGZAG]
                _encode_coeff(wtr, int(zz[0]) - pred[ci], dc_tabs[ci], is_dc=True)
                pred[ci] = int(zz[0])
                run = 0
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                for i in range(1, last + 1):
                    if zz[i] == 0:
                        run += 1
                        if run == 16:
                            _encode_coeff(wtr, 0, ac_tabs[ci], run=15, is_dc=False)  # ZRL
                            run = 0
                        continue
                    _encode_coeff(wtr, int(zz[i]), ac_tabs[ci], run=run, is_dc=False)
                    run = 0
                if last < 63:
                    code, ln = ac_tabs[ci][0x00]  # EOB
                    wtr.put(code, ln)
    scan = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in q.reshape(64)[ZIGZAG]))

    def dht(cls: int, tid: int, tab: tuple[list[int], list[int]]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(tab[0]) + bytes(tab[1]))

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    sos = bytes([nc])
    for ci in range(nc):
        qid = 0 if ci == 0 else 1
        hid = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, qid])  # 4:4:4 sampling
        sos += bytes([ci + 1, (hid << 4) | hid])
    sos += bytes([0, 63, 0])

    out = b"\xFF\xD8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if nc == 3:
        out += dqt(1, qc)
    out += seg(0xC0, sof)
    out += dht(0, 0, _HT_DC_L) + dht(1, 0, _HT_AC_L)
    if nc == 3:
        out += dht(0, 1, _HT_DC_C) + dht(1, 1, _HT_AC_C)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, sos) + scan + b"\xFF\xD9"  # EOI
    return out


# -- decoder ----------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via reset()
                return False
            else:
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bit(self) -> int:
        if not self.n and not self._fill():
            raise EOFError
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v

    def reset_to_marker(self) -> None:
        """Skip to just after the next RSTn marker, dropping bit state."""
        self.acc = self.n = 0
        while not (self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def parse_jpeg_header(payload: bytes) -> tuple[int, int, int] | None:
    """SOI + baseline SOF0 scan -> (width, height, n_components), or None
    for anything that is not a baseline sequential 8-bit JPEG."""
    if len(payload) < 4 or payload[:2] != b"\xFF\xD8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            return None
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        if marker == 0xC0:
            if payload[pos + 4] != 8:
                return None  # 12-bit
            h = int.from_bytes(payload[pos + 5:pos + 7], "big")
            w = int.from_bytes(payload[pos + 7:pos + 9], "big")
            nc = payload[pos + 9]
            # 64 MPix decompression-bomb guard (same as the GIF decoder):
            # corrupt dims would allocate-and-touch tens of GiB of blocks
            if w <= 0 or h <= 0 or nc not in (1, 3) or w * h > (1 << 26):
                return None
            return w, h, nc
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            return None  # extended / progressive / lossless / arithmetic
        pos += 2 + ln
    return None


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline JFIF bytes -> (h, w, nc) uint8, or None if unsupported
    or malformed — a corrupt payload must never raise out of an executor
    batch, so the whole walk is exception-bounded."""
    try:
        return _decode_jpeg_inner(payload)
    except (EOFError, IndexError, ValueError, KeyError, StopIteration, OverflowError):
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:  # noqa: C901
    if parse_jpeg_header(payload) is None:
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec:
                    return None  # 16-bit tables
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], np.uint8)
                qt[tid] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[(cls, tid)] = _huff_lookup(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                return None
            frame = (w, h, comps)
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                return None
            w, h, comps = frame
            scomp = []
            for ci in range(body[0]):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                c = next(c for c in comps if c["id"] == cid)
                scomp.append((c, tabs >> 4, tabs & 0xF))
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # per-component coefficient block grids
            grids = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.int64)
                for c in comps
            ]
            r = _BitReader(payload, pos + 2 + ln)
            pred = [0] * len(comps)
            try:
                for my in range(mcuy):
                    for mx in range(mcux):
                        n_mcu = my * mcux + mx
                        if restart and n_mcu and n_mcu % restart == 0:
                            r.reset_to_marker()
                            pred = [0] * len(comps)
                        for ci, (c, dct, act) in enumerate(scomp):
                            dtab, atab = huff[(0, dct)], huff[(1, act)]
                            for vy in range(c["v"]):
                                for vx in range(c["h"]):
                                    zz = np.zeros(64, dtype=np.int64)
                                    t = _decode_symbol(r, dtab)
                                    diff = _extend(r.bits(t), t) if t else 0
                                    pred[ci] += diff
                                    zz[0] = pred[ci]
                                    i = 1
                                    while i < 64:
                                        sym = _decode_symbol(r, atab)
                                        if sym == 0x00:  # EOB
                                            break
                                        run, t = sym >> 4, sym & 0xF
                                        if t == 0 and run == 15:  # ZRL
                                            i += 16
                                            continue
                                        i += run
                                        if i > 63:
                                            return None
                                        zz[i] = _extend(r.bits(t), t)
                                        i += 1
                                    blk = np.zeros(64, dtype=np.int64)
                                    blk[ZIGZAG] = zz
                                    grids[ci][my * c["v"] + vy, mx * c["h"] + vx] = \
                                        blk.reshape(8, 8)
            except (EOFError, IndexError, ValueError):
                # truncated stream, invalid Huffman code, or run overflow:
                # a malformed payload must yield None (caller falls back),
                # never an exception out of the executor batch
                return None
            # dequantize + IDCT + upsample, all components vectorized
            planes = []
            for ci, c in enumerate(comps):
                deq = grids[ci] * qt[c["q"]][None, None]
                spat = _DCT.T @ deq.astype(np.float64) @ _DCT + 128.0
                gy, gx = grids[ci].shape[:2]
                img = spat.transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
                ry, rx = vmax // c["v"], hmax // c["h"]
                if ry > 1 or rx > 1:
                    img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
                planes.append(img[:h, :w])
            if len(planes) == 3:
                y, cb, cr = planes
                out = np.stack([
                    y + 1.402 * (cr - 128.0),
                    y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                    y + 1.772 * (cb - 128.0),
                ], axis=2)
            else:
                out = planes[0][:, :, None]
            return np.clip(np.round(out), 0, 255).astype(np.uint8)
        elif marker == 0xD9:
            return None
        pos += 2 + ln
    return None
