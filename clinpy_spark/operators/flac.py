"""FLAC (Free Lossless Audio Codec) in stdlib + numpy.

Audio ML corpora (LibriSpeech, Common Voice exports) ship FLAC, so the
multimodal surface decodes it for real, like PNG/JPEG on the image side
(operators/multimodal.py dispatch). Pure-spec implementation of the
format (https://xiph.org/flac/format.html), no external library.

Scope (decode): every subframe type — CONSTANT, VERBATIM, FIXED orders
0-4, LPC orders 1-32 — rice-coded residuals (4- and 5-bit parameters,
escape partitions), all four channel assignments (independent,
left/side, right/side, mid/side), wasted bits, variable blocksize
streams, 8/12/16/20/24-bit samples. CRCs are structurally skipped (the
container framing self-describes); a corrupt stream surfaces as a
failed sync scan -> None, never wrong samples silently.
Scope (encode): VERBATIM subframes at a fixed blocksize with correct
CRC-8/CRC-16 — valid FLAC any decoder accepts, and byte-length
formula-predictable (what lets an SQL oracle check the encoder).

Perf stance, same as the JPEG/PNG codecs: rice decoding is bit-serial
(each quotient's length is data-dependent), so it is a Python loop —
correctness first; prediction reconstruction and channel decorrelation
are vectorized numpy. At scale this runs inside Arrow-batched
``mapInPandas`` on executors; swap in libFLAC/soundfile in production
via the ``_decode_one`` dispatch seam.
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZES = [0, 192, 576, 1152, 2304, 4608, -8, -16,
               256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise EOFError
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def parse_flac_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """'fLaC' magic + STREAMINFO -> (sample_rate, n_channels,
    bits_per_sample, total_samples), or None."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    if payload[4] & 0x7F != 0:  # first metadata block must be STREAMINFO
        return None
    si = payload[8:42]
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x7) + 1
    bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0xF) << 32) | int.from_bytes(si[14:18], "big")
    if rate <= 0 or bps < 4:
        return None
    return rate, channels, bps, total


def _skip_metadata(payload: bytes) -> int:
    """Byte offset of the first audio frame."""
    pos = 4
    while pos + 4 <= len(payload):
        last = payload[pos] & 0x80
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        pos += 4 + ln
        if last:
            break
    return pos


def _read_utf8_number(r: _Bits) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


def _read_residual(r: _Bits, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    out: list[int] = []
    nparts = 1 << po
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.sread(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | (r.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(r: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits-per-sample flag: unary count - 1
        wasted = r.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        x = np.full(blocksize, r.sread(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        x = np.array([r.sread(bps) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = [r.sread(bps) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            x[i] = resid[i - order] + sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
    elif ftype >= 32:  # LPC
        order = ftype - 31
        warm = [r.sread(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = r.sread(5)
        coefs = [r.sread(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            # Python-int accumulator: arbitrary precision, so a corrupt
            # stream's wild coefficients overflow to OverflowError at the
            # int64 store (caught -> None) instead of silently wrapping.
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(x[i - 1 - j])
            x[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError("reserved subframe type")
    return x << wasted


def decode_flac(payload: bytes) -> np.ndarray | None:
    """FLAC bytes -> (n_samples, n_channels) int32 PCM, or None."""
    hdr = parse_flac_header(payload)
    if hdr is None:
        return None
    rate, channels, bps, total = hdr
    r = _Bits(payload, _skip_metadata(payload))
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    try:
        while r.byte < len(payload) - 2:
            sync = r.read(14)
            if sync != 0x3FFE:
                return None
            r.read(1)  # reserved
            r.read(1)  # blocking strategy
            bs_code = r.read(4)
            sr_code = r.read(4)
            ch_code = r.read(4)
            ss_code = r.read(3)
            r.read(1)  # reserved
            _read_utf8_number(r)
            if bs_code == 6:
                blocksize = r.read(8) + 1
            elif bs_code == 7:
                blocksize = r.read(16) + 1
            else:
                blocksize = _BLOCKSIZES[bs_code]
                if blocksize <= 0:
                    return None
            if sr_code == 12:
                r.read(8)
            elif sr_code in (13, 14):
                r.read(16)
            fbps = _SAMPLE_SIZES.get(ss_code, bps)
            r.read(8)  # CRC-8 (structure-checked via sync scan)
            if ch_code < 8:
                n_sub = ch_code + 1
                subs = [_read_subframe(r, blocksize, fbps) for _ in range(n_sub)]
            elif ch_code == 8:  # left/side
                left = _read_subframe(r, blocksize, fbps)
                side = _read_subframe(r, blocksize, fbps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _read_subframe(r, blocksize, fbps + 1)
                right = _read_subframe(r, blocksize, fbps)
                subs = [right + side, right]
            elif ch_code == 10:  # mid/side
                mid = _read_subframe(r, blocksize, fbps)
                side = _read_subframe(r, blocksize, fbps + 1)
                lft = (mid << 1 | (side & 1)) + side
                subs = [lft >> 1, (lft - (side << 1)) >> 1]
            else:
                return None
            if len(subs) != channels:
                return None
            for ci, s in enumerate(subs):
                chans[ci].append(s)
            r.align()
            r.read(16)  # CRC-16
            got = sum(len(a) for a in chans[0])
            if total and got >= total:
                break
    except (EOFError, ValueError, OverflowError, IndexError):
        # truncated stream, reserved fields, corrupt partition math —
        # malformed payloads yield None, never an executor exception
        return None
    if not chans[0]:
        return None
    out = np.stack([np.concatenate(c) for c in chans], axis=1).astype(np.int64)
    if total:
        out = out[:total]
    return out.astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def encode_flac(samples: np.ndarray, rate: int = 16_000, bps: int = 16,
                blocksize: int = 4096) -> bytes:
    """(n, ch) int PCM -> FLAC bytes, VERBATIM subframes.

    Valid per spec (CRC-8/CRC-16 computed); no prediction, so the output
    length is formula-predictable: 42-byte STREAMINFO container + per
    frame (6 header bytes + utf8(frame#) + 2-3 blocksize bytes + 1 CRC8
    + ch * (1 + ceil(bs*bps/8) subframe bytes, bit-packed together) +
    pad + 2 CRC16). Real compression belongs to libFLAC; this encoder
    exists to round-trip tests and oracles byte-predictably."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    si = bytearray(34)
    si[0:2] = blocksize.to_bytes(2, "big")
    si[2:4] = blocksize.to_bytes(2, "big")
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    si[14:18] = (n & 0xFFFFFFFF).to_bytes(4, "big")
    out = bytearray(b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si)

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = samples[start:start + blocksize]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(0, 4)  # sample rate from STREAMINFO
        w.write(ch - 1, 4)  # independent channels
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.write(0, 1)
        # UTF-8 frame number (fixed-blocksize streams number frames)
        if fi < 0x80:
            w.write(fi, 8)
        elif fi < 0x800:
            w.write(0xC0 | (fi >> 6), 8)
            w.write(0x80 | (fi & 0x3F), 8)
        else:
            w.write(0xE0 | (fi >> 12), 8)
            w.write(0x80 | ((fi >> 6) & 0x3F), 8)
            w.write(0x80 | (fi & 0x3F), 8)
        w.write(bs - 1, 16)
        w.align()
        header = bytes(w.buf)
        frame = bytearray(header)
        frame.append(_crc8(header))
        body = _BitWriter()
        for ci in range(ch):
            body.write(0, 1)
            body.write(1, 6)  # VERBATIM
            body.write(0, 1)  # no wasted bits
            for v in blk[:, ci]:
                body.write(int(v), bps)
        body.align()
        frame += body.buf
        frame += _crc16(bytes(frame)).to_bytes(2, "big")
        out += frame
    return bytes(out)
