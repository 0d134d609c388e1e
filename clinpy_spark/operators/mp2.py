"""MPEG-1 Audio Layer II (MP2) codec — pure numpy, public spec only.

Closes the last lossy-audio stand-in (``multimodal.py`` dispatch): the
bitstream layout follows ISO/IEC 11172-3 Layer II — 32-bit frame
header, bit-allocation tables (A: 27 subbands, B: 30, C: 8, D: 12),
SCFSI, 6-bit scalefactor indices, grouped (3/5/9-step) and ungrouped
sample codes, C/D requantization constants, and the 32-band polyphase
filterbank structure (analysis matrixing / windowed synthesis).

One documented deviation: the normative 512-tap prototype window
(ISO table 3-B.3) is a published TABLE, not a formula, so this module
derives its own near-perfect-reconstruction pseudo-QMF prototype
(windowed sinc, spectrally flattened — standard filter-bank theory).
Encode/decode are exact inverses of each other through that prototype
(round-trip SNR is gated by the ``mm_audio_lossy_gate`` oracle query);
a FOREIGN MP2 stream decodes with the correct bitstream semantics but
a slightly different synthesis window — intelligible, not bit-faithful.
Swap ``_PROTO`` for the ISO table in production for exactness.

Decoder contract (same as every codec in this repo): corrupt or
unsupported input -> ``None``, never an exception, never wrong audio.
Decompression-bomb guard: decode caps output at 2^24 samples.
"""

from __future__ import annotations

import heapq

import numpy as np

#: Layer II bitrate table (kbps), index 0 = free format (unsupported).
BITRATES_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
#: MPEG-1 sampling-frequency table.
SAMPLE_RATES = [44100, 48000, 32000]

#: Quantizer classes: (steps, grouped, code_bits). Grouped classes pack
#: 3 samples into one base-``steps`` code of ``code_bits`` bits.
_QUANT = [
    (3, True, 5), (5, True, 7), (7, False, 3), (9, True, 10),
    (15, False, 4), (31, False, 5), (63, False, 6), (127, False, 7),
    (255, False, 8), (511, False, 9), (1023, False, 10), (2047, False, 11),
    (4095, False, 12), (8191, False, 13), (16383, False, 14),
    (32767, False, 15), (65535, False, 16),
]

#: Allocation-value -> quantizer mapping per pattern row (value v>0 maps
#: to _QUANT[row[v]-1]; 17 therefore selects the 65535-step class).
_ALLOC_ROWS = [
    [0, 1, 2, 17],
    [0, 1, 2, 3, 4, 5, 6, 17],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 17],
    [0, 1, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17],
    [0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 17],
]

#: Per-subband (nbal, pattern-row) for each bit-allocation table.
_TAB_A = [(4, 3)] * 3 + [(4, 2)] * 8 + [(3, 1)] * 12 + [(2, 0)] * 4   # 27 sb
_TAB_B = _TAB_A + [(2, 0)] * 3                                        # 30 sb
_TAB_C = [(4, 4)] * 2 + [(3, 4)] * 6                                  # 8 sb
_TAB_D = [(4, 4)] * 2 + [(3, 4)] * 10                                 # 12 sb

#: Scalefactor table: index i -> 2.0 * 2^(-i/3), indices 0..62.
_SF = 2.0 * np.power(2.0, -np.arange(63) / 3.0)


def _table_for(sample_rate: int, bitrate_kbps: int, nch: int):
    per_ch = bitrate_kbps // nch
    if per_ch <= 48:
        return _TAB_D if sample_rate == 32000 else _TAB_C
    if per_ch <= 80:
        return _TAB_A
    return _TAB_A if sample_rate == 48000 else _TAB_B


# ---------------------------------------------------------------------------
# Filterbank: 32-band pseudo-QMF, derived near-PR prototype (see module doc)

def _make_prototype() -> np.ndarray:
    """Power-complementary half-cosine lowpass, 512 taps, linear phase.

    Magnitude M(f) = cos(32*pi*f) for f in [0, 1/64], 0 beyond — which
    satisfies M(f)^2 + M(1/64 - f)^2 = 1 exactly, so adjacent
    cosine-modulated bands reconstruct flat and non-adjacent bands don't
    overlap (the textbook near-PR pseudo-QMF condition). Sampled on an
    8192-point grid with linear phase centered at 255.5, then cropped."""
    nfft = 8192
    f = np.fft.rfftfreq(nfft)  # cycles/sample
    mag = np.where(f <= 1.0 / 64.0, np.cos(32.0 * np.pi * f), 0.0)
    phase = np.exp(-2j * np.pi * f * 255.5)
    h = np.fft.irfft(mag * phase, nfft)[:512]
    return h


_PROTO = _make_prototype()
_K = np.arange(32)[:, None]
_N512 = np.arange(512)[None, :]
#: Analysis matrix (32 x 512): S[k] = sum_n A[k,n] * x[t-n].
_A = _PROTO[None, :] * np.cos((2 * _K + 1) * (_N512 - 16) * np.pi / 64.0)
#: Synthesis matrix (32 x 512): out[t+n] += G[k,n] * S[k].
_G = 32.0 * _PROTO[None, :] * np.cos((2 * _K + 1) * (_N512 + 16) * np.pi / 64.0)


def _calibrate() -> tuple[float, int]:
    """Round-trip gain + delay of the filterbank cascade, measured on an
    impulse once at import (deterministic, ~ms)."""
    x = np.zeros(2048)
    x[800] = 1.0
    s = _analyze(x)
    y = _synthesize(s)
    d = int(np.argmax(np.abs(y)))
    return float(y[d]), d - 800


def _analyze(x: np.ndarray) -> np.ndarray:
    """x (n,) -> subband samples (n//32, 32). Window m covers
    x[32m-511 .. 32m] (zero history before t=0), newest sample last."""
    n_steps = len(x) // 32
    xp = np.concatenate([np.zeros(511), x])
    win = np.lib.stride_tricks.sliding_window_view(xp, 512)[::32][:n_steps]
    # x[t - n] for n=0..511 is the window reversed
    return win[:, ::-1] @ _A.T


def _synthesize(s: np.ndarray, tail: np.ndarray | None = None
                ) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Subband samples (m, 32) -> PCM (m*32,) by windowed overlap-add.
    With ``tail`` (480,) carried across calls, returns (pcm, new_tail)."""
    m = s.shape[0]
    out = np.zeros(m * 32 + 480)
    if tail is not None:
        out[:480] += tail
    chunk = s @ _G  # (m, 512)
    for i in range(m):
        out[i * 32: i * 32 + 512] += chunk[i]
    if tail is None:
        return out[: m * 32]
    return out[: m * 32], out[m * 32:].copy()


_RT_GAIN, _RT_DELAY = _calibrate()
#: Samples of latency a caller should trim when aligning decode(encode(x))
#: against x (exported for the SNR gate).
SYNTH_DELAY = _RT_DELAY


# ---------------------------------------------------------------------------
# Bit I/O

class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("bitstream underrun")
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.buf[first:last], "big")
        val = (chunk >> ((last * 8) - end)) & ((1 << n) - 1)
        self.pos = end
        return val


class _BitWriter:
    __slots__ = ("acc", "nbits")

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n

    def bytes_padded(self, total_bytes: int) -> bytes:
        pad = total_bytes * 8 - self.nbits
        if pad < 0:
            raise ValueError("frame overflow")
        return ((self.acc << pad)).to_bytes(total_bytes, "big")


# ---------------------------------------------------------------------------
# Requantization (ISO C/D constants, derived in closed form per class)

def _dequant_levels(qi: int) -> np.ndarray:
    """All decoded values (pre-scalefactor) indexed by RAW code."""
    steps, grouped, bits = _QUANT[qi]
    if grouped:
        c = (1 << (steps - 1).bit_length()) / steps  # 4/3, 8/5, 16/9
        d = 0.5
        dig = np.arange(steps, dtype=np.float64)
        return c * (dig / (steps - 1) - 1.0 + d)
    c = float(1 << bits) / steps
    d = 2.0 ** (1 - bits)
    raw = np.arange(1 << bits)
    m = raw ^ (1 << (bits - 1))
    v = c * (m / float(1 << (bits - 1)) - 1.0 + d)
    v[(1 << (bits - 1)) - 1] = 0.0  # illegal code: decode as silence
    return v


_DEQUANT = [_dequant_levels(i) for i in range(len(_QUANT))]


def _quantize(qi: int, s_norm: np.ndarray) -> np.ndarray:
    """Normalized samples in [-1, 1) -> RAW codes (exact inverse of
    :func:`_dequant_levels` on the representable grid)."""
    steps, grouped, bits = _QUANT[qi]
    if grouped:
        c = (1 << (steps - 1).bit_length()) / steps
        d = np.clip(np.round((s_norm / c + 0.5) * (steps - 1)), 0, steps - 1)
        return d.astype(np.int64)
    c = float(1 << bits) / steps
    dd = 2.0 ** (1 - bits)
    m = np.clip(np.round((s_norm / c - dd + 1.0) * (1 << (bits - 1))),
                0, (1 << bits) - 2).astype(np.int64)
    return m ^ (1 << (bits - 1))


# ---------------------------------------------------------------------------
# Header

def parse_mp2_header(payload: bytes, off: int = 0) -> tuple[int, int, int, int] | None:
    """MPEG-1 Layer II header at byte offset ``off`` -> (sample_rate,
    n_channels, bitrate_kbps, frame_bytes), or None."""
    try:
        if len(payload) < off + 4:
            return None
        b0, b1, b2, b3 = payload[off], payload[off + 1], payload[off + 2], payload[off + 3]
        if b0 != 0xFF or (b1 & 0xF0) != 0xF0:
            return None
        if (b1 >> 3) & 1 != 1:          # ID: MPEG-1 only
            return None
        if (b1 >> 1) & 3 != 2:          # layer bits '10' = Layer II
            return None
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            return None
        mode = (b3 >> 6) & 3
        nch = 1 if mode == 3 else 2
        bitrate = BITRATES_L2[br_idx]
        rate = SAMPLE_RATES[sr_idx]
        padding = (b2 >> 1) & 1
        frame_bytes = 144 * bitrate * 1000 // rate + padding
        if frame_bytes < 24 or off + frame_bytes > len(payload):
            return None
        return rate, nch, bitrate, frame_bytes
    except (IndexError, ValueError, OverflowError):
        return None


# ---------------------------------------------------------------------------
# Decode

def _decode_frame(buf: bytes, off: int, s_out: list, nch_expect: int):
    """Parse one frame starting at byte ``off`` (no per-frame slice of
    the stream — decoding stays O(n) in payload length) -> frame_bytes,
    appending the (36, nch, 32) subband block to ``s_out``; None on any
    inconsistency."""
    hdr = parse_mp2_header(buf, off)
    if hdr is None:
        return None
    rate, nch, bitrate, frame_bytes = hdr
    if nch != nch_expect:
        return None
    mode = (buf[off + 3] >> 6) & 3
    mode_ext = (buf[off + 3] >> 4) & 3
    protected = ((buf[off + 1] & 1) == 0)
    tab = _table_for(rate, bitrate, nch)
    sblimit = len(tab)
    bound = min((mode_ext + 1) * 4, sblimit) if mode == 1 else sblimit
    if nch == 1:
        bound = sblimit
    br = _BitReader(buf[off: off + frame_bytes],
                    32 + (16 if protected else 0))

    alloc = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        nbal, row = tab[sb]
        if sb < bound:
            for ch in range(nch):
                alloc[ch][sb] = br.read(nbal)
        else:
            a = br.read(nbal)
            for ch in range(nch):
                alloc[ch][sb] = a
    # map allocation values to quantizer indices (None = silent)
    qidx = [[None] * sblimit for _ in range(nch)]
    for ch in range(nch):
        for sb in range(sblimit):
            a = alloc[ch][sb]
            if a:
                row = _ALLOC_ROWS[tab[sb][1]]
                if a >= len(row) or row[a] == 0:
                    return None
                qidx[ch][sb] = row[a] - 1

    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = br.read(2)
    sf = np.ones((nch, sblimit, 3))
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            pat = scfsi[ch][sb]
            n_tx = {0: 3, 1: 2, 2: 1, 3: 2}[pat]
            idx = [br.read(6) for _ in range(n_tx)]
            if any(i > 62 for i in idx):
                return None
            if pat == 0:
                vals = [_SF[idx[0]], _SF[idx[1]], _SF[idx[2]]]
            elif pat == 1:
                vals = [_SF[idx[0]], _SF[idx[0]], _SF[idx[1]]]
            elif pat == 2:
                vals = [_SF[idx[0]]] * 3
            else:
                vals = [_SF[idx[0]], _SF[idx[1]], _SF[idx[1]]]
            sf[ch, sb] = vals

    s = np.zeros((36, nch, 32))
    for gr in range(12):
        part = gr // 4
        for sb in range(sblimit):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                qi = qidx[ch][sb]
                if shared and qi is None and nch == 2:
                    qi = qidx[0][sb]
                if qi is None:
                    continue
                steps, grouped, bits = _QUANT[qi]
                if grouped:
                    code = br.read(bits)
                    if code >= steps ** 3:
                        return None
                    digs = (code % steps, (code // steps) % steps,
                            (code // (steps * steps)) % steps)
                    vals = [_DEQUANT[qi][d] for d in digs]
                else:
                    vals = [_DEQUANT[qi][br.read(bits)] for _ in range(3)]
                for t in range(3):
                    v = vals[t]
                    if shared:
                        for c2 in range(nch):
                            s[gr * 3 + t, c2, sb] = v * sf[c2, sb, part]
                    else:
                        s[gr * 3 + t, ch, sb] = v * sf[ch, sb, part]
    s_out.append(s)
    return frame_bytes


def decode_mp2(payload: bytes) -> np.ndarray | None:
    """MP2 bytes -> PCM float (n_samples, n_channels) in ~[-1, 1),
    or None (corrupt / non-MP2 / unsupported). Bomb guard: 2^24 samples."""
    try:
        hdr = parse_mp2_header(payload)
        if hdr is None:
            return None
        _, nch, _, _ = hdr
        frames: list[np.ndarray] = []
        off = 0
        while off + 4 <= len(payload):
            fb = _decode_frame(payload, off, frames, nch)
            if fb is None:
                if not frames:
                    return None
                break
            off += fb
            if len(frames) * 1152 > (1 << 24):
                raise ValueError("mp2 too long")
        if not frames:
            return None
        s = np.concatenate(frames, axis=0)  # (36*f, nch, 32)
        out = np.empty((s.shape[0] * 32, nch))
        for ch in range(nch):
            out[:, ch] = _synthesize(s[:, ch, :]) / _RT_GAIN
        return out
    except (ValueError, IndexError, OverflowError):
        return None


# ---------------------------------------------------------------------------
# Encode (test-vector generator: 48 kHz table A, scfsi=0, greedy alloc)

def encode_mp2(x: np.ndarray, rate: int = 48000, bitrate: int = 192) -> bytes:
    """PCM float (n,) or (n, ch) in [-1, 1) -> MP2 bytes.

    Deliberately simple where the spec allows: always table A (so
    ``rate`` must be 48000 and bitrate/channel >= 96), scfsi=0 (all 3
    scalefactors sent), no CRC, stereo encoded as dual independent
    channels. Allocation is a greedy water-filling on per-subband peak
    scalefactor / quantizer resolution. Exact bit-level inverse of
    :func:`decode_mp2`'s parser."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    if rate != 48000:
        raise ValueError("encode_mp2 emits 48 kHz table-A frames only")
    if bitrate // nch < 96 or bitrate not in BITRATES_L2:
        raise ValueError("bitrate/channel must be >= 96 kbps (table A)")
    if nch == 2 and bitrate < 64:
        raise ValueError("invalid stereo bitrate")
    n_frames = max(1, -(-x.shape[0] // 1152))
    xp = np.zeros((n_frames * 1152, nch))
    xp[: x.shape[0]] = np.clip(x, -0.999, 0.999)
    sub = np.stack([_analyze(xp[:, ch]) for ch in range(nch)], axis=1)  # (steps, nch, 32)

    tab = _TAB_A
    sblimit = len(tab)
    frame_bytes = 144 * bitrate * 1000 // rate
    out = bytearray()
    br_idx = BITRATES_L2.index(bitrate)
    mode = 3 if nch == 1 else 0
    for f in range(n_frames):
        s = sub[f * 36: (f + 1) * 36]  # (36, nch, 32)
        # scalefactor indices per (ch, sb, part)
        sf_idx = np.zeros((nch, sblimit, 3), dtype=np.int64)
        for ch in range(nch):
            for sb in range(sblimit):
                for part in range(3):
                    peak = np.abs(s[part * 12: (part + 1) * 12, ch, sb]).max()
                    # smallest scalefactor >= peak (table is descending):
                    # searchsorted returns the first sf BELOW the peak,
                    # so step back one to avoid clipping s/sf past 1.
                    i = int(np.searchsorted(-_SF, -max(peak, 1e-10))) - 1
                    sf_idx[ch, sb, part] = min(max(i, 0), 62)
        # greedy allocation within the bit budget
        alloc = np.zeros((nch, sblimit), dtype=np.int64)
        budget = frame_bytes * 8 - 32
        budget -= sum(nbal * nch for nbal, _ in tab)           # allocation field
        spent = 0

        def _sample_bits(row: list[int], a: int) -> int:
            if a == 0:
                return 0
            steps, grouped, bits = _QUANT[row[a] - 1]
            return 12 * (bits if grouped else 3 * bits)

        # priority: estimated quantization error = peak / current steps
        # (scalefactors track the peak, so error scales with peak); silent
        # subbands (pure filter leakage below -100 dB) get nothing.
        heap = []
        for ch in range(nch):
            for sb in range(sblimit):
                peak = float(np.abs(s[:, ch, sb]).max())
                if peak > 1e-6:
                    heapq.heappush(heap, (-peak, ch, sb, peak))
        while heap:
            _, ch, sb, peak = heapq.heappop(heap)
            row = _ALLOC_ROWS[tab[sb][1]]
            a = alloc[ch, sb]
            if a + 1 >= len(row):
                continue
            delta = _sample_bits(row, a + 1) - _sample_bits(row, a)
            if a == 0:
                delta += 2 + 18  # scfsi + 3 scalefactors appear
            if spent + delta > budget:
                continue
            spent += delta
            alloc[ch, sb] = a + 1
            steps = _QUANT[row[a + 1] - 1][0]
            heapq.heappush(heap, (-peak / steps, ch, sb, peak))

        w = _BitWriter()
        w.write(0xFFF, 12)
        w.write(1, 1)            # ID = MPEG-1
        w.write(2, 2)            # layer II
        w.write(1, 1)            # protection: none
        w.write(br_idx, 4)
        w.write(1, 2)            # 48 kHz
        w.write(0, 1)            # padding
        w.write(0, 1)            # private
        w.write(mode, 2)
        w.write(0, 2)            # mode_ext
        w.write(0, 1)            # copyright
        w.write(0, 1)            # original
        w.write(0, 2)            # emphasis
        for sb in range(sblimit):
            for ch in range(nch):
                w.write(int(alloc[ch, sb]), tab[sb][0])
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch, sb]:
                    w.write(0, 2)  # scfsi = 0
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch, sb]:
                    for part in range(3):
                        w.write(int(sf_idx[ch, sb, part]), 6)
        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                for ch in range(nch):
                    a = alloc[ch, sb]
                    if not a:
                        continue
                    qi = _ALLOC_ROWS[tab[sb][1]][a] - 1
                    steps, grouped, bits = _QUANT[qi]
                    sfv = _SF[sf_idx[ch, sb, part]]
                    vals = s[gr * 3: gr * 3 + 3, ch, sb] / sfv
                    codes = _quantize(qi, vals)
                    if grouped:
                        w.write(int(codes[0] + steps * codes[1]
                                    + steps * steps * codes[2]), bits)
                    else:
                        for t in range(3):
                            w.write(int(codes[t]), bits)
        out += w.bytes_padded(frame_bytes)
    return bytes(out)
