"""Pin the vectorized-MD5 helpers (functions/md5np.py) bit-identical to
hashlib — the portable MinHash signature's hash contract rides on them
(the operator itself is additionally end-to-end hash-oracled by
dedup_minhash_portable / text_fuzzy_decontaminate)."""

import hashlib
import random

import numpy as np

from clinpy_spark.functions.md5np import (
    hex_prefix_value,
    md5_hex_prefix_of_ints,
    md5_of_bytes_matrix,
    strings_to_matrix,
)


def _ref(s: str, n_hex: int) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:n_hex], 16)


def test_md5_strings_match_hashlib_across_block_boundaries():
    rng = random.Random(7)
    strs = []
    # every length 0..200 (covers 1..4-block messages), plus random fill,
    # plus the exact padding boundaries (55/56, 119/120 bytes)
    for length in list(range(201)) + [rng.randint(0, 200) for _ in range(300)]:
        strs.append("".join(
            rng.choice("abcdefghij xyz0123456789|:,é") for _ in range(length)))
    for length in (54, 55, 56, 63, 64, 118, 119, 120, 127, 128):
        strs.append("x" * length)
    data, lengths = strings_to_matrix(strs)
    state = md5_of_bytes_matrix(data, lengths)
    got15 = hex_prefix_value(state, 15)
    got8 = hex_prefix_value(state, 8)
    for i, s in enumerate(strs):
        assert got15[i] == _ref(s, 15), (i, s)
        assert got8[i] == _ref(s, 8), (i, s)


def test_md5_int_renderer_matches_str_cast():
    vals = np.array(
        [0, 1, 9, 10, 99, 100, 12345, 10**12, 2**62, 150000 * 200 + 199],
        dtype=np.int64)
    got = md5_hex_prefix_of_ints(vals, 8)
    exp = [_ref(str(v), 8) for v in vals]
    assert list(got) == exp
    got_sfx = md5_hex_prefix_of_ints(vals, 15, suffix=b"|63")
    exp_sfx = [_ref(str(v) + "|63", 15) for v in vals]
    assert list(got_sfx) == exp_sfx


def test_minhash_portable_signature_matches_direct_replay(spark):
    # The operator-level pin: the Arrow-pass portable signature equals a
    # per-doc hashlib replay of md5(shingle || '|i') minima — the exact
    # recurrence the DuckDB oracle recomputes.
    from pyspark.sql import Row

    from clinpy_spark.operators.dedup import minhash_signature

    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=2, text="one two"),          # < n tokens -> single shingle
        Row(doc_id=3, text="alpha beta gamma"),
        Row(doc_id=4, text=""),  # empty text -> single empty shingle, kept
    ])
    out = {r["doc_id"]: list(r["minhash"])
           for r in minhash_signature(docs, portable=True, num_hashes=16).collect()}

    def norm_shingles(text, n=3):
        # split(regexp_replace(lower(trim(x)), '\s+', ' '), ' ') — an
        # empty text yields the single empty-string token, hence one
        # empty shingle (the operator's long-standing semantics)
        toks = " ".join(text.lower().strip().split()).split(" ") \
            if text.strip() else [""]
        if len(toks) < n:
            return [" ".join(toks)]
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        seen, uniq = set(), []
        for g in grams:
            if g not in seen:
                seen.add(g)
                uniq.append(g)
        return uniq

    for doc_id, text in ((1, "alpha beta gamma delta epsilon zeta"),
                         (2, "one two"), (3, "alpha beta gamma"),
                         (4, "")):
        sh = norm_shingles(text)
        exp = [min(_ref(f"{s}|{i}", 15) for s in sh) for i in range(16)]
        assert out[doc_id] == exp, doc_id
