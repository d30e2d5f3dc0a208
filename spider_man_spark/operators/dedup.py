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
3. **Bloom pre-filter** (10^10-scale path): per-shard Bloom filters
   built from ``url_hash`` (numpy, Arrow-batched), broadcast as plain
   python bytes, probed in a ``mapInPandas`` stage *before* the exact
   anti-join — the exact join then touches only probable-positives, so
   its shuffle shrinks by ~the novelty rate.  False positives are
   impossible end-to-end (Bloom says "maybe seen" -> exact join
   verifies); false negatives are impossible by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def bloom_build(hashes: np.ndarray, bits_per_item: int = 16, k: int = 7) -> bytes:
    """Build one Bloom filter (bytes) over int64 url_hash values."""
    n = max(len(hashes), 1)
    n_bits = max(64, 1 << int(np.ceil(np.log2(n * bits_per_item))))
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _probe_positions(np.asarray(hashes, dtype=np.int64), n_bits, k)
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bytes(np.array([k], np.uint8).tobytes() + bits.tobytes())


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
    seen: DataFrame, n_shards: int, bits_per_item: int = 16, epoch: int = 0
) -> DataFrame:
    """Aggregate the exact seen table into per-shard Bloom rows
    (SEEN_SHARDS_SCHEMA) via applyInPandas — one group per shard."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bloom": [bloom_build(hashes, bits_per_item)],
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


def bloom_prefilter(
    candidates: DataFrame, shard_blooms: dict[int, bytes], n_shards: int
) -> DataFrame:
    """Keep only candidates whose url_hash is NOT ('maybe') in the
    Bloom layer, plus pass-through of probable-positives flagged for
    the exact join.  Returns candidates with a ``maybe_seen`` column.

    ``shard_blooms`` is a small driver-side dict (n_shards entries,
    each ~bits_per_item*|shard|/8 bytes) shipped to executors via UDF
    closure — the broadcast-merged-per-epoch structure from the
    north_rule.
    """

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = pdf["url_hash"].to_numpy(dtype=np.int64)
            shard = (h % n_shards + n_shards) % n_shards
            maybe = np.zeros(len(pdf), bool)
            for s in np.unique(shard):
                bl = shard_blooms.get(int(s))
                if bl is None:
                    continue
                m = shard == s
                maybe[m] = bloom_probe(bl, h[m])
            out = pdf.copy()
            out["maybe_seen"] = maybe
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    )
    return candidates.mapInPandas(_probe, schema=schema + ", maybe_seen boolean")


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
    bloom_shards: dict[int, bytes] | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Full dedup: intra-epoch keep-one, then seen-set subtraction,
    optionally Bloom-accelerated (exact backstop keeps it FP-free)."""
    if bloom_shards is not None:
        fresh = intra_epoch_dedup(candidates)
        probed = bloom_prefilter(fresh, bloom_shards, n_shards)
        definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        verified_new = anti_join_seen(maybe, seen)
        return definitely_new.unionByName(verified_new)
    return fused_dedup_anti_join(candidates, seen)
