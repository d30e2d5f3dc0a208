"""URL-seen set & dedup — the Pipeline.DuplicateFilter analogue.

The reference's dedup is ``:ets.insert_new(tid, {{Module, key}, nil})``
— first insert wins, duplicates get ``:skiped``
(pipeline/duplicate_filter.ex:26-34), default-on for downloader and
item_processor (configuration.ex:9,23,206,220).

Rebuild, scale-first:

1. **intra-epoch**: deterministic keep-one per ``url_key``
   (min (priority, depth) — a stable generalization of ETS set
   semantics, which in the reference depend on undefined insert order).
2. **cross-epoch exact**: ``left_anti`` join against the ``seen``
   table — Catalyst picks broadcast vs shuffle; at 10^10 keys the join
   shuffles *only* candidate keys, and the seen table is
   shard-partitioned by ``pmod(url_hash, n_shards)`` so partition
   pruning applies when candidates are pre-bucketed.
3. **Bloom pre-filter** (10^10-scale path): FIXED-size per-shard Bloom
   filters live in the ``seen_shards`` state table, incrementally
   OR-merged with each epoch's admitted delta (O(delta) build work,
   executor-side — never a full rebuild, never a driver collect), and
   probed via a shard-cogrouped ``applyInPandas`` *before* the exact
   anti-join — the exact join then touches only probable-positives, so
   its shuffle shrinks by ~the novelty rate.  False positives are
   impossible end-to-end (Bloom says "maybe seen" -> exact join
   verifies); false negatives are impossible by construction (the
   shards are a superset of seen: epoch admits and mid-crawl seeds
   both fold their deltas in).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def dedup_order() -> list:
    """The deterministic ordering contract (priority, depth, url_key).
    Built lazily — classic PySpark needs an active session for F.col."""
    return [F.col("priority").asc(), F.col("depth").asc(), F.col("url_key").asc()]


def _order_struct(df: DataFrame):
    """Orderable tie-break struct for the keep-one winner: the
    ordering contract (priority, depth) extended by url/retries for
    deterministic ties (url_key is constant within a group)."""
    cols = [c for c in ("priority", "depth", "url", "retries") if c in df.columns]
    return F.struct(*cols)


def intra_epoch_dedup(df: DataFrame, key: str = "url_key") -> DataFrame:
    """Keep exactly one row per key, deterministically (the ETS `:set`
    analogue with a defined winner instead of hash-order).

    Implemented as ``groupBy(key).agg(min_by(row, order))`` rather than
    a ``row_number`` window: a hash aggregate gets map-side partial
    combining and needs no per-partition sort — at 10^9 candidate rows
    that's the difference between one combine-reduced exchange and a
    full-width sort-based window."""
    val_cols = [c for c in df.columns if c != key]
    g = df.groupBy(key).agg(
        F.min_by(F.struct(*val_cols), _order_struct(df)).alias("__v")
    )
    return g.select(key, "__v.*").select(*df.columns)


def anti_join_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Drop candidates already in the seen set (first-wins)."""
    return candidates.join(
        seen.select("url_key").distinct(), "url_key", "left_anti"
    )


# ---------------------------------------------------------------------------
# Sharded Bloom layer
# ---------------------------------------------------------------------------

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — derives independent probe
    hashes from the JVM-computed xxhash64 values."""
    z = (x + _SPLITMIX_GAMMA).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _probe_positions(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2."""
    h = hashes.astype(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


def bloom_build(
    hashes: np.ndarray,
    bits_per_item: int = 16,
    k: int = 7,
    n_bits: int | None = None,
) -> bytes:
    """Build one Bloom filter (bytes) over int64 url_hash values.

    Pass ``n_bits`` (power of two) for a FIXED-size filter — required
    when filters are incrementally OR-merged across epochs (different
    sizes cannot be merged); sizing rule n_bits ~= 16 x expected keys
    per shard keeps FP under ~0.1%."""
    if n_bits is None:
        n = max(len(hashes), 1)
        n_bits = max(64, 1 << int(np.ceil(np.log2(n * bits_per_item))))
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _probe_positions(np.asarray(hashes, dtype=np.int64), n_bits, k)
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bytes(np.array([k], np.uint8).tobytes() + bits.tobytes())


def bloom_or(a: bytes, b: bytes) -> bytes:
    """OR-merge two same-size Bloom filters."""
    if len(a) != len(b) or a[0] != b[0]:
        raise ValueError("cannot merge blooms of different size/k")
    av = np.frombuffer(a, dtype=np.uint8, offset=1)
    bv = np.frombuffer(b, dtype=np.uint8, offset=1)
    return bytes(a[:1] + (av | bv).tobytes())


def bloom_probe(bloom: bytes, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership test -> bool array ('maybe present')."""
    k = bloom[0]
    bits = np.frombuffer(bloom, dtype=np.uint8, offset=1)
    n_bits = len(bits) * 8
    if not len(hashes):
        return np.zeros(0, bool)
    pos = _probe_positions(np.asarray(hashes, dtype=np.int64), n_bits, k)
    return ((bits[pos // 8] >> (pos % 8)) & 1).all(axis=1)


def build_seen_shards(
    seen: DataFrame, n_shards: int, n_bits: int = 1 << 22, epoch: int = 0
) -> DataFrame:
    """Aggregate seen rows into FIXED-size per-shard Bloom rows
    (SEEN_SHARDS_SCHEMA) via applyInPandas — one group per shard,
    built where the data lives (no driver roundtrip)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bloom": [bloom_build(hashes, n_bits=n_bits)],
                "n_items": [len(hashes)],
                "epoch": [epoch],
            }
        )

    shards = seen.select(
        F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard"),
        "url_hash",
    )
    return shards.groupBy("shard").applyInPandas(
        _build, schema="shard int, bloom binary, n_items long, epoch int"
    )


def merge_seen_shards(
    prev: DataFrame | None, delta: DataFrame, epoch: int
) -> DataFrame:
    """Incremental seen_shards update: OR-merge this epoch's delta
    filters into the previous snapshot, executor-side (union ->
    groupBy(shard) -> byte-wise OR).  O(epoch delta) build work per
    epoch instead of rebuilding every filter from the FULL seen table
    (which is O(N) per epoch, O(N^2) over a crawl)."""
    both = delta if prev is None else prev.unionByName(delta)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blooms = [bytes(b) for b in pdf["bloom"].values]
        out = blooms[0]
        for b in blooms[1:]:
            out = bloom_or(out, b)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bloom": [out],
                "n_items": [int(pdf["n_items"].sum())],
                "epoch": [epoch],
            }
        )

    return both.groupBy("shard").applyInPandas(
        _merge, schema="shard int, bloom binary, n_items long, epoch int"
    )


def bloom_probe_cogroup(
    candidates: DataFrame, shards: DataFrame, n_shards: int
) -> DataFrame:
    """Probe candidates against the seen_shards table with a
    shard-cogrouped applyInPandas: candidates and filter rows are
    co-partitioned by shard on the EXECUTORS — no driver collect, no
    closure-captured filter bytes (the round-1 design shipped ~GBs of
    bloom through the driver per epoch at the 10^10 design point).
    Returns candidates + ``maybe_seen``."""
    out_fields = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in candidates.schema.fields
    ]
    out_schema = ", ".join(out_fields) + ", maybe_seen boolean"
    cand = candidates.withColumn(
        "__shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )

    def _probe(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame):
        out = cand_pdf.drop(columns=["__shard"])
        if len(shard_pdf):
            bl = bytes(shard_pdf["bloom"].iloc[0])
            maybe = bloom_probe(
                bl, cand_pdf["url_hash"].to_numpy(dtype=np.int64)
            )
        else:
            maybe = np.zeros(len(cand_pdf), bool)
        out = out.copy()
        out["maybe_seen"] = maybe
        return out

    return (
        cand.groupby("__shard")
        .cogroup(shards.select("shard", "bloom").groupby("shard"))
        .applyInPandas(_probe, schema=out_schema)
    )


def fused_dedup_anti_join(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Intra-epoch keep-one AND seen-set subtraction in ONE url_key
    exchange: union candidate rows (tagged 0) with seen keys (tagged 1)
    and aggregate ``min_by(row, order), max(tag)`` per key — groups
    containing a seen row are dropped.

    vs window + left_anti: a single hash aggregate with map-side
    partial combining replaces one sorted window exchange plus a
    sort-merge anti join (two more sorts and a distinct) — the shared
    url_key exchange the epoch's admit path was paying twice for."""
    val_cols = [c for c in candidates.columns if c != "url_key"]
    order = _order_struct(candidates)
    # candidates sort before seen rows via the leading 0 tag, so the
    # winner is always a real candidate row
    cand2 = candidates.select(
        "url_key",
        F.struct(F.lit(0).alias("__t"), order.alias("__o")).alias("__ord"),
        F.struct(*val_cols).alias("__v"),
        F.lit(0).alias("__seen"),
    )
    vtype = cand2.schema["__v"].dataType
    otype = cand2.schema["__ord"].dataType
    seen2 = seen.select(
        "url_key",
        F.lit(None).cast(otype).alias("__ord"),
        F.lit(None).cast(vtype).alias("__v"),
        F.lit(1).alias("__seen"),
    )
    g = (
        cand2.unionByName(seen2)
        .groupBy("url_key")
        .agg(
            F.min_by("__v", "__ord").alias("__v"),
            F.max("__seen").alias("__seen"),
        )
    )
    return (
        g.filter(F.col("__seen") == 0)
        .select("url_key", "__v.*")
        .select(*candidates.columns)
    )


def dedup_candidates(
    candidates: DataFrame,
    seen: DataFrame,
    *,
    seen_shards: DataFrame | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Full dedup: intra-epoch keep-one, then seen-set subtraction,
    optionally Bloom-accelerated (exact backstop keeps it FP-free).

    With ``seen_shards`` (the per-shard Bloom table): keep-one ->
    cogrouped shard probe -> exact anti-join on probable-positives
    only — at high novelty rates the exact join touches a small slice
    of the candidates, and the seen-table scan prunes to the shards
    that had a hit."""
    if seen_shards is not None:
        fresh = intra_epoch_dedup(candidates)
        probed = bloom_probe_cogroup(fresh, seen_shards, n_shards)
        definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        verified_new = anti_join_seen(maybe, seen)
        return definitely_new.unionByName(verified_new)
    return fused_dedup_anti_join(candidates, seen)
