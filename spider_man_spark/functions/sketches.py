"""Similarity sketches: shingles, MinHash, SimHash — Spark-first.

MinHash signatures and LSH band hashes are **pure column expressions**
(higher-order functions over arrays + xxhash64) — no Python at all.
SimHash needs per-token bit accumulation, which is done vectorized in
an Arrow-batched pandas UDF with numpy bit tricks.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spider_man_spark.functions.text import normalize_text


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles of the normalized text; documents shorter than
    k words get their full text as the single shingle."""
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return F.when(n >= k, grams).otherwise(F.array(normalize_text(text)))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-grams (for n-gram Jaccard)."""
    t = normalize_text(text)
    ln = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), ln - F.lit(n - 1)),
        lambda i: F.substring(t, i, n),
    )
    return F.when(ln >= n, grams).otherwise(F.array(t))


def minhash_signature(shingles: Column, num_perm: int = 64) -> Column:
    """MinHash signature as array<long>: perm i = min over shingles of
    xxhash64(shingle, i).  One JVM expression per permutation — all
    codegen, no shuffle."""
    mins = [
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_perm)
    ]
    return F.array(*mins)


def lsh_band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of ``bands`` hashes, band b =
    xxhash64 over its ``rows_per_band`` signature slots.  Two docs
    collide in a band iff that band's slots are all equal — the
    standard (b, r) S-curve."""
    out = []
    for b in range(bands):
        slots = [
            F.element_at(signature, b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        out.append(F.xxhash64(F.lit(b), *slots))
    return F.array(*out)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (distinct semantics)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db))
    union = F.size(F.array_union(da, db))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


# ---------------------------------------------------------------------------
# SimHash (Arrow-batched, numpy-vectorized)
# ---------------------------------------------------------------------------

def _token_hash64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes: crc32(token) in the high
    word, crc32(reversed token) in the low word — process-stable."""
    if not tokens:
        return np.zeros(0, np.uint64)
    hi = np.array([zlib.crc32(t.encode()) for t in tokens], np.uint64)
    lo = np.array([zlib.crc32(t[::-1].encode()) for t in tokens], np.uint64)
    return (hi << np.uint64(32)) | lo


def simhash64_of(text: str) -> int:
    """Driver-side single-doc SimHash (crc-based token hashes) — a
    *shape* reference for tests (relative Hamming distances), not
    value-identical to the distributed :func:`simhash64`, whose token
    hashes are JVM xxhash64."""
    toks = " ".join(text.lower().split()).split(" ") if text else []
    h = _token_hash64([t for t in toks if t])
    if not len(h):
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    val = int((votes > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=object)))
    return val - (1 << 64) if val >= (1 << 63) else val


def _bit_votes_pack(harrs: pd.Series) -> pd.Series:
    """Numpy-only bit-vote over per-row int64 hash arrays: flatten all
    rows into one (N_tokens, 64) bit matrix, segment-sum with
    ``np.add.reduceat`` — zero per-token Python."""
    arrs = [
        np.asarray(a, dtype=np.int64).view(np.uint64)
        if a is not None and len(a)
        else np.zeros(0, np.uint64)
        for a in harrs
    ]
    lens = np.array([len(a) for a in arrs], np.int64)
    out = np.zeros(len(arrs), np.int64)
    nz = lens > 0
    if nz.any():
        flat = np.concatenate([a for a in arrs if len(a)])
        seg_len = lens[nz]
        offsets = np.zeros(int(nz.sum()), np.int64)
        offsets[1:] = np.cumsum(seg_len)[:-1]
        packed = np.zeros(int(nz.sum()), np.uint64)
        # per-bit 1-D pass (64 shifts + segment sums) — O(tokens) temps
        # instead of a (tokens, 64) matrix, which is allocation-bound
        for i in range(64):
            ones = np.add.reduceat(
                ((flat >> np.uint64(i)) & np.uint64(1)).astype(np.int64),
                offsets,
            )
            # vote_i > 0  <=>  ones > len/2  <=>  2*ones > len
            packed |= (2 * ones > seg_len).astype(np.uint64) << np.uint64(i)
        out[nz] = packed.view(np.int64)
    return pd.Series(out)


def simhash64(col: Column) -> Column:
    """Vectorized SimHash over a text column.

    Token hashing runs **JVM-side** (split + xxhash64 transform inside
    whole-stage codegen); only the 64-bit vote/pack crosses into an
    Arrow-batched pandas UDF that is pure numpy matrix work — no
    per-token (or per-row) Python anywhere.  ~an order of magnitude
    faster than hashing tokens in Python and the right shape at scale:
    the Python boundary moves O(tokens) longs, not strings."""
    toks = F.filter(
        F.split(normalize_text(col), " "), lambda t: t != F.lit("")
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    @pandas_udf("long")
    def _vote(harrs: pd.Series) -> pd.Series:
        return _bit_votes_pack(harrs)

    return _vote(hashes)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 sketches (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunks(sim: Column, chunks: int = 4) -> Column:
    """Split a 64-bit simhash into ``chunks`` k-bit words for banded
    candidate generation: two docs within (chunks-1) Hamming bits share
    at least one identical chunk (pigeonhole)."""
    width = 64 // chunks
    mask = (1 << width) - 1
    parts = [
        F.shiftrightunsigned(sim, i * width).bitwiseAND(F.lit(mask))
        for i in range(chunks)
    ]
    return F.array(*parts)
