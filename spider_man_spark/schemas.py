"""Row schemas for every state table of the crawl engine.

The reference keeps state in nine ETS tables created at
``lib/spider_man/engine.ex:429-457`` with ``:set`` semantics (last
write per key wins, engine.ex:431-432) and three event structs
(``lib/spider_man/struct/{request,response,item}.ex``).  Here each
table gets a fixed StructType — the idiomatic-Spark improvement over
the reference's schema-free Erlang terms (SURVEY.md §1.2).

Item schema is fixed by BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Frontier — the pending-Request queue (downloader_tid analogue).
# Mirrors SpiderMan.Request (struct/request.ex:4: key, url, options,
# retries, flag) plus the scheduling columns the rebuild makes explicit
# (host / host_salt / url_hash / depth / priority).
# ---------------------------------------------------------------------------
FRONTIER_SCHEMA = StructType(
    [
        StructField("url_key", StringType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("host_salt", IntegerType(), True),
        StructField("url_hash", LongType(), True),
        StructField("depth", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("retries", IntegerType(), False),
        StructField("flag", StringType(), True),
        StructField("options", MapType(StringType(), StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# Fetched — the pending-Response queue (spider_tid analogue).
# Mirrors SpiderMan.Response (struct/response.ex:4: key, env, options,
# retries, flag); Tesla.Env fields flattened into status/headers/body.
# flag round-trips request->response (component/downloader.ex:35).
# ---------------------------------------------------------------------------
FETCHED_SCHEMA = StructType(
    [
        StructField("url_key", StringType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("headers", MapType(StringType(), StringType()), True),
        StructField("body", BinaryType(), True),
        StructField("depth", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("retries", IntegerType(), False),
        StructField("flag", StringType(), True),
        StructField("options", MapType(StringType(), StringType()), True),
        StructField("fetch_ms", LongType(), True),
        StructField("fetched_at_ms", LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Fetch events — one (host, ts_ms) row per completed fetch, the feed
# for the stateful streaming per-host politeness tracker
# (streaming/live.stream_host_fetch_stats).  Written as per-epoch
# deltas so a file-stream source can tail a live crawl, mirroring the
# reference's per-host rate-limiter state surface
# (component/rate_limiter.ex via engine.ex:145-191).
# ---------------------------------------------------------------------------
FETCH_EVENTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("epoch", IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Items — the output table (item_processor_tid analogue).  Schema per
# BASELINE.json input_hint; `image_id` plays Item.key
# (struct/item.ex:4), `epoch` gives lineage, `retries` the item-level
# retry budget (struct/item.ex:4 default 1, consumed by the sink
# zip-split ack path, item_processor.ex:94-105).
# ---------------------------------------------------------------------------
ITEMS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
        StructField("retries", IntegerType(), True),
        StructField("epoch", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Failed — dead-letter table (failed_tid analogue), keyed
# {component, key} as in producer/ets.ex:154.
# ---------------------------------------------------------------------------
FAILED_SCHEMA = StructType(
    [
        StructField("component", StringType(), False),
        StructField("url_key", StringType(), False),
        StructField("url", StringType(), True),
        StructField("payload", StringType(), True),
        StructField("reason", StringType(), True),
        StructField("retries", IntegerType(), False),
        StructField("depth", IntegerType(), True),
        StructField("priority", IntegerType(), True),
        StructField("flag", StringType(), True),
        StructField("options", MapType(StringType(), StringType()), True),
        StructField("epoch", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Metrics — stats table (stats_tid analogue): rows
# {component, total, success, fail, duration} per engine.ex:449-454,
# one row per (epoch, component).
# ---------------------------------------------------------------------------
METRICS_SCHEMA = StructType(
    [
        StructField("epoch", IntegerType(), False),
        StructField("component", StringType(), False),
        StructField("total", LongType(), False),
        StructField("success", LongType(), False),
        StructField("fail", LongType(), False),
        StructField("duration_ms", LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Seen — the exact URL-seen set (DuplicateFilter analogue,
# pipeline/duplicate_filter.ex:26-34 `:ets.insert_new` first-wins).
# Partition/shard by pmod(xxhash64(url_key), n_shards).
# ---------------------------------------------------------------------------
SEEN_SCHEMA = StructType(
    [
        StructField("url_key", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("shard", IntegerType(), False),
        StructField("epoch", IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Page features — optional per-fetched-page text analysis (language,
# quality, token counts, content fingerprint), the bridge from the
# crawl engine into the training-data pipeline: a quality-filtered
# corpus is `page_features JOIN fetched bodies WHERE quality > t`.
# All features are pure column exprs over the page body.
# ---------------------------------------------------------------------------
PAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("url_key", StringType(), False),
        StructField("host", StringType(), True),
        StructField("n_chars", IntegerType(), True),
        StructField("n_tokens", IntegerType(), True),
        StructField("lang", StringType(), True),
        StructField("quality", DoubleType(), True),
        StructField("fingerprint", LongType(), True),
        StructField("epoch", IntegerType(), False),
    ]
)

# Serialized per-shard Bloom filters layered in front of the exact set
# at 10^10 scale (SURVEY.md §4 custom work #2).
SEEN_SHARDS_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("bloom", BinaryType(), False),
        StructField("n_items", LongType(), False),
        StructField("epoch", IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Robots / politeness — per-host state.  Generalizes the reference's
# single global token bucket (10 msgs / 1000 ms,
# configuration.ex:8, producer/producer.ex:37-44) to per-host tokens +
# crawl-delay; `next_allowed_ts` persists across epochs (epoch-millis).
# ---------------------------------------------------------------------------
ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("crawl_delay_ms", IntegerType(), False),
        StructField("tokens_per_epoch", IntegerType(), False),
        StructField("next_allowed_ts", LongType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("epoch", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Session state — cookie jar (Pipeline.SetCookie analogue,
# set_cookie.ex:78-87 uniq-union).  Per-host keyed (the reference is a
# global singleton = one host).
# ---------------------------------------------------------------------------
SESSION_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("cookies", ArrayType(StringType()), False),
        StructField("cookies_str", StringType(), False),
        StructField("epoch", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Corpus — the deterministic stub-fetch lookup table (the
# Requester.JustReturn analogue, test/support/just_return.ex:4-8,
# with image payloads for the SaveToFile path, save_to_file.ex:32-49).
# ---------------------------------------------------------------------------
CORPUS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("status", IntegerType(), False),
        StructField("content_type", StringType(), True),
        StructField("body", BinaryType(), True),
        StructField("links", ArrayType(StringType()), True),
        StructField("caption", StringType(), True),
        StructField("crawl_delay_ms", IntegerType(), True),
        StructField("set_cookie", StringType(), True),
    ]
)

# Default retries mirror the reference's builders
# (utils.ex:19-21: Request retries 3; utils.ex:31-33: Item retries 1).
DEFAULT_REQUEST_RETRIES = 3
DEFAULT_ITEM_RETRIES = 1

# Reference politeness ceiling: 10 requests / 1000 ms (configuration.ex:8).
DEFAULT_TOKENS_PER_EPOCH = 10
DEFAULT_EPOCH_MS = 1000
