"""Vectorized MD5 over numpy byte matrices.

Several portable ("engine-replayable") operators derive deterministic
coordinates from ``md5(<short string>)`` — the DuckDB oracle recomputes
the same digests, so the hash family is part of the declared contract
and cannot change. What CAN change is where it executes: Spark's
``F.md5`` + ``F.conv``/``F.substring`` chain evaluates one
MessageDigest + string parse per row inside the JVM, which for the
md5-dense operators (the 64-permutation portable MinHash, the
2-digests-per-cell genotype grid) is the dominant per-task cost
(guide §4.2: hand whole batches to vectorized native code).

This module computes the SAME digests in numpy, whole-batch: all 64
rounds of the MD5 compression function run as uint32 array ops over
every message at once. Messages here are short ASCII/UTF-8 strings
(decimal keys, word shingles), so almost all of them pad to a single
64-byte block; longer messages are handled by running the compression
per block over the (rectangular) padded matrix.

Bit-identity with ``hashlib.md5`` is pinned by tests over random
lengths 0..200; the Spark-side twins (``F.md5`` -> hex substring ->
``F.conv``) are pinned by the operator oracles.
"""

from __future__ import annotations

import numpy as np

# Per-round shift amounts and sine-table constants (RFC 1321).
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4, dtype=np.uint32)
_K = np.array([int(abs(np.sin(i + 1)) * 2 ** 32) & 0xFFFFFFFF
               for i in range(64)], dtype=np.uint32)
# Message-word index used by round i.
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)], dtype=np.int64)

_INIT = (np.uint32(0x67452301), np.uint32(0xEFCDAB89),
         np.uint32(0x98BADCFE), np.uint32(0x10325476))


def pad_to_blocks(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """MD5-pad a rectangular (n, width) uint8 matrix of messages whose
    true byte lengths are ``lengths`` into an (n, n_blocks*16) uint32
    little-endian word matrix. ``width`` must leave room for the
    padding (0x80 + 8-byte length), i.e. blocks = ceil((max_len+9)/64).
    """
    n, width = data.shape
    n_blocks = (width + 9 + 63) // 64
    padded = np.zeros((n, n_blocks * 64), dtype=np.uint8)
    padded[:, :width] = data
    rows = np.arange(n)
    padded[rows, lengths] = 0x80
    bitlen = (lengths.astype(np.uint64) * np.uint64(8))
    # length goes in the last 8 bytes of the LAST block, little-endian
    padded[:, -8:] = bitlen[:, None] >> (np.arange(8, dtype=np.uint64) * 8) & 0xFF
    return padded.view(np.uint32).reshape(n, n_blocks * 16)


def digest_words(words: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run MD5 over an (n, n_blocks*16) uint32 word matrix (output of
    :func:`pad_to_blocks`); returns the four uint32 state vectors
    (a, b, c, d), each of shape (n,)."""
    n, total = words.shape
    n_blocks = total // 16
    a0 = np.full(n, _INIT[0], dtype=np.uint32)
    b0 = np.full(n, _INIT[1], dtype=np.uint32)
    c0 = np.full(n, _INIT[2], dtype=np.uint32)
    d0 = np.full(n, _INIT[3], dtype=np.uint32)
    old = np.seterr(over="ignore")
    try:
        for blk in range(n_blocks):
            m = words[:, blk * 16:(blk + 1) * 16]
            a, b, c, d = a0.copy(), b0.copy(), c0.copy(), d0.copy()
            for i in range(64):
                if i < 16:
                    f = (b & c) | (~b & d)
                elif i < 32:
                    f = (d & b) | (~d & c)
                elif i < 48:
                    f = b ^ c ^ d
                else:
                    f = c ^ (b | ~d)
                f = f + a + _K[i] + m[:, _G[i]]
                a = d
                d = c
                c = b
                s = _S[i]
                b = b + ((f << s) | (f >> np.uint32(32 - s)))
            a0 += a
            b0 += b
            c0 += c
            d0 += d
    finally:
        np.seterr(**old)
    return a0, b0, c0, d0


def md5_of_bytes_matrix(data: np.ndarray, lengths: np.ndarray):
    """MD5 state words for a rectangular uint8 message matrix.

    Messages of different lengths may need different BLOCK counts, and
    a message's digest processes exactly ceil((len+9)/64) blocks — no
    more — so rows are grouped by block count and each group padded and
    digested at its own width (one group in the common all-short case).
    """
    n = data.shape[0]
    out = tuple(np.empty(n, dtype=np.uint32) for _ in range(4))
    nb = (lengths + 9 + 63) // 64
    for blocks in np.unique(nb):
        rows = np.nonzero(nb == blocks)[0]
        width = int(blocks) * 64 - 9
        sub = data[rows]
        if sub.shape[1] < width:
            sub = np.pad(sub, ((0, 0), (0, width - sub.shape[1])))
        else:
            sub = np.ascontiguousarray(sub[:, :width])
        state = digest_words(pad_to_blocks(sub, lengths[rows]))
        for o, s in zip(out, state):
            o[rows] = s
    return out


def hex_prefix_value(state, n_hex: int) -> np.ndarray:
    """int64 value of the first ``n_hex`` hex digits of each digest —
    the vectorized twin of Spark's
    ``conv(substring(md5(x), 1, n_hex), 16, 10).cast('long')`` (and of
    DuckDB's ``('0x' || substr(md5(x), 1, n_hex))::BIGINT``). n_hex <= 15
    so the value always fits a non-negative int64.

    The digest's hex string is the little-endian byte dump of (a, b, c,
    d); its first 16 hex digits therefore read as
    byteswap64(a | b << 32). Dropping the low (16 - n_hex) digits is a
    right shift by 4 * (16 - n_hex).
    """
    if not 0 < n_hex <= 15:
        raise ValueError("n_hex must be in 1..15 to fit a signed long")
    a, b, _, _ = state
    v = a.astype(np.uint64) | (b.astype(np.uint64) << np.uint64(32))
    v = v.byteswap()
    return (v >> np.uint64(4 * (16 - n_hex))).view(np.int64)


def strings_to_matrix(strs, encode: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Pack a sequence of (short) strings/bytes into the rectangular
    uint8 matrix + lengths vector that :func:`md5_of_bytes_matrix`
    wants. O(total bytes); one frombuffer pass, no per-row numpy
    allocation."""
    bs = [s.encode("utf-8") for s in strs] if encode else list(strs)
    lengths = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    width = int(lengths.max()) if len(bs) else 1
    width = max(width, 1)
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    data = np.zeros((len(bs), width), dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    # Scatter each row's bytes: a boolean mask built from ranges is
    # O(n*width); with short rows (width <= ~64) this is fine and
    # avoids a Python-level loop over rows.
    col = np.arange(width)
    mask = col[None, :] < lengths[:, None]
    data[mask] = flat
    return data, lengths


def md5_hex_prefix_of_ints(vals: np.ndarray, n_hex: int,
                           suffix: bytes = b"") -> np.ndarray:
    """int64 value of the first ``n_hex`` md5 hex digits of
    ``str(v) + suffix`` for an int64 array — the vectorized twin of the
    ``md5(CAST(x AS VARCHAR) || '<suffix>')`` portable coordinate.
    Builds the decimal strings with integer math (no Python str())."""
    vals = np.asarray(vals, dtype=np.int64)
    if (vals < 0).any():
        raise ValueError("decimal rendering implemented for non-negative keys")
    n = len(vals)
    ndig = np.ones(n, dtype=np.int64)
    v = vals // 10
    while (v > 0).any():
        ndig += (v > 0)
        v //= 10
    max_d = int(ndig.max()) if n else 1
    width = max_d + len(suffix)
    data = np.zeros((n, width), dtype=np.uint8)
    # digits right-aligned at each row's own length
    v = vals.copy()
    for pos in range(max_d):  # pos-th digit from the right
        rows = ndig > pos
        data[rows, ndig[rows] - 1 - pos] = 48 + (v[rows] % 10)
        v //= 10
    lengths = ndig.copy()
    if suffix:
        sfx = np.frombuffer(suffix, dtype=np.uint8)
        for j, byte in enumerate(sfx):
            data[np.arange(n), ndig + j] = byte
        lengths = ndig + len(sfx)
    return hex_prefix_value(md5_of_bytes_matrix(data, lengths), n_hex)
