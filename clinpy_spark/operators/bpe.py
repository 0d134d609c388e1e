"""Distributed BPE tokenizer training and encoding.

The training-data-pipeline op the cheap regex tokenizers
(:mod:`clinpy_spark.functions.text`) stop short of: learn a byte-pair
vocabulary FROM the corpus, then segment the corpus with it.

Spark-first split of work (the SentencePiece / HuggingFace trainer
shape, re-expressed for a cluster):

1. **Corpus scan is distributed.** BPE training only needs *word
   frequencies*, never the corpus itself — ``word_frequencies`` is one
   explode + map-side-combined groupBy (linear in corpus tokens, one
   shuffle keyed by word). At 100 TB the corpus may be petabytes but
   the word-type table is ~10⁷ rows; capping to the top
   ``max_word_types`` by frequency keeps the driver summary bounded
   the same way KMeans centroids and PQ codebooks are bounded
   collects elsewhere in this repo.
2. **Merge fitting is driver-side on the bounded summary.** The greedy
   merge loop is inherently sequential (merge *i* depends on the pair
   counts after merge *i-1*) — running it over a 50k-row frequency
   table with an incremental pair-count heap is milliseconds, whereas
   an "iterative Spark jobs per merge" design would pay
   ``num_merges`` shuffles for no added parallelism. Deterministic:
   ties on count break to the lexicographically smallest pair.
3. **Encoding is distributed and Arrow-batched.** ``bpe_encode`` is a
   ``mapInPandas`` with a per-task word→tokens cache — Zipf repetition
   makes the effective cost ~O(distinct words per partition), and the
   merge table ships to executors once via closure capture (a few KB).

Tokenization contract: words are the repo-canonical ``norm_tokens``
(whitespace-collapsed, lowercased, split on single space); base symbols
are the word's own characters, so ``''.join(encode(word)) == word``
always holds and decoding is concatenation — the losslessness gate in
``text_bpe_gate`` (queries.py) verifies the full pipeline end to end.

Reference scope note: the reference engine has no tokenizer training;
this extends the text-analysis family (SURVEY.md LLM-ops section)
alongside vocab_topk (pack.py) and bigram surprisal (lm.py).
"""

from __future__ import annotations

import heapq
import re
from collections import defaultdict
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinpy_spark.functions.text import norm_tokens

_WS = re.compile(r"\s+")


def _norm_words(text: str) -> list[str]:
    """Python twin of ``norm_tokens`` — keep in lockstep (the gate
    compares JVM-side word counts against tokens produced here)."""
    return _WS.sub(" ", (text or "").strip().lower()).split(" ")


def word_frequencies(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_word_types: int = 50_000,
) -> DataFrame:
    """``(word, freq)`` for the ``max_word_types`` most frequent word
    types (ties broken by word, so the cap is deterministic). The only
    corpus-sized stage of training; everything after runs on this."""
    freqs = (
        docs.select(F.explode(norm_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return freqs.orderBy(F.desc("freq"), F.asc("word")).limit(max_word_types)


def _fit_merges(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE on a word-frequency table (pure Python, driver-side).

    Incremental: a lazy-deletion max-heap over pair counts plus a
    pair→words inverted index, so each merge touches only the words
    containing the winning pair. Pair occurrences are counted via
    adjacent zip (the classic convention: 'aaa' counts ('a','a')
    twice). Ties on count break to the lexicographically smallest
    pair — fitting is bit-deterministic for a given frequency table.
    """
    words = [list(w) for w, _ in word_freqs]
    counts = [c for _, c in word_freqs]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += counts[i]
            pair_words[p].add(i)
    # heap entries are (-count, pair); stale entries are skipped when
    # popped (lazy deletion). Tie-break needs ALL current-max pairs, so
    # pop equals into a bucket, pick min, push the rest back.
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        while heap:
            negc, p = heap[0]
            cur = pair_counts.get(p, 0)
            if cur != -negc or cur == 0:
                heapq.heappop(heap)
                if cur > 0:
                    heapq.heappush(heap, (-cur, p))
                continue
            # collect every pair tied at the max count
            bucket = []
            top = -negc
            while heap and -heap[0][0] == top:
                negc2, p2 = heapq.heappop(heap)
                if pair_counts.get(p2, 0) == top:
                    bucket.append(p2)
                elif pair_counts.get(p2, 0) > 0:
                    heapq.heappush(heap, (-pair_counts[p2], p2))
            if not bucket:
                continue
            best = min(bucket)
            for p2 in bucket:
                if p2 != best:
                    heapq.heappush(heap, (-top, p2))
            break
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        touched: set[tuple[str, str]] = set()
        for wi in sorted(pair_words[best]):
            syms = words[wi]
            c = counts[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                pair_words[p].discard(wi)
                touched.add(p)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(wi)
                touched.add(p)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p))
    return merges


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. The collect is
    bounded by ``max_word_types`` rows (word + count), never corpus-
    sized — same contract as the KMeans/PQ codebook fits."""
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(
            docs, text_col=text_col, max_word_types=max_word_types
        ).collect()
    ]
    return _fit_merges(wf, num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word: repeatedly merge the lowest-rank adjacent pair
    (left-to-right within a rank) until no merge applies — the standard
    BPE apply, which reproduces the trainer's greedy segmentation."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_tokens: bool = False,
) -> DataFrame:
    """Segment every document with a trained merge table.

    Output per doc: ``n_words``, ``n_tokens``, ``n_chars`` (of the
    word characters, i.e. normalized length minus separators),
    ``lossless`` (does concatenating each word's tokens reproduce the
    word — true by construction, verified anyway), and optionally the
    flat ``tokens`` array. Arrow-batched ``mapInPandas``; a per-task
    word cache collapses Zipf-repeated words to one segmentation.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    want_tokens = bool(return_tokens)

    schema = (
        f"{id_col} long, n_words long, n_empty_words long, n_tokens long, "
        "n_chars long, lossless boolean"
        + (", tokens array<string>" if want_tokens else "")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is None:
                hit = _encode_word(word, ranks)
                if len(cache) < 1_000_000:
                    cache[word] = hit
            return hit

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = _norm_words(text)
                toks: list[str] = []
                lossless = True
                for w in words:
                    tw = enc(w)
                    if "".join(tw) != w:
                        lossless = False
                    toks.extend(tw)
                rec = [
                    did,
                    len(words),
                    sum(1 for w in words if not w),
                    len(toks),
                    sum(len(w) for w in words),
                    lossless,
                ]
                if want_tokens:
                    rec.append(toks)
                rows.append(rec)
            cols = [id_col, "n_words", "n_empty_words", "n_tokens", "n_chars",
                    "lossless"]
            if want_tokens:
                cols.append("tokens")
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def bpe_gate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 150,
    max_word_types: int = 30_000,
) -> DataFrame:
    """One-row end-to-end gate: train on the corpus, encode the corpus,
    assert (a) every document round-trips losslessly, (b) token counts
    sit in their provable bounds (non-empty words ``<= n_tokens <=
    n_chars`` per doc — each non-empty word is at least one token, at
    most its chars; empty words encode to zero tokens), and
    (c) the learned merges actually compress (total tokens < total
    chars whenever any merge fired). Engine-independent columns
    (n_docs, total_words, total_chars) are recomputed by the DuckDB
    oracle; ``passed`` is pinned true — a regression flips the hash.
    """
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(
            docs, text_col=text_col, max_word_types=max_word_types
        ).collect()
    ]
    merges = _fit_merges(wf, num_merges)
    enc = bpe_encode(docs, merges, id_col=id_col, text_col=text_col)
    agg = enc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min(F.col("lossless").cast("int")).alias("all_lossless"),
        F.min(
            (F.col("n_words") - F.col("n_empty_words") <= F.col("n_tokens")).cast("int")
        ).alias("lo_ok"),
        F.min((F.col("n_tokens") <= F.col("n_chars")).cast("int")).alias("hi_ok"),
    )
    compressed = F.lit(len(merges) == 0) | (F.col("total_tokens") < F.col("total_chars"))
    return agg.select(
        "n_docs",
        "total_words",
        "total_chars",
        F.lit(len(wf)).cast("long").alias("n_word_types"),
        (
            (F.col("all_lossless") == 1)
            & (F.col("lo_ok") == 1)
            & (F.col("hi_ok") == 1)
            & compressed
        ).alias("passed"),
    )
