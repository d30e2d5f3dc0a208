"""spider_man_spark — a PySpark-native micro-batched crawl/dataflow engine.

A from-scratch rebuild of the *capabilities* of feng19/spider_man (an
Elixir Broadway/GenStage web-crawling framework, reference at
/root/reference) as an idiomatic Spark engine:

* The reference's three actor stages (Downloader -> Spider ->
  ItemProcessor, ``lib/spider_man.ex:5-12``) become one deterministic
  DataFrame job per **epoch**; the parse->frontier feedback edge is
  closed in the driver loop (``plans/job.py``).
* The nine ETS tables (``lib/spider_man/engine.ex:20-33``) become
  parquet state tables: frontier, seen, seen_shards, robots, items,
  failed, metrics, session_state (``schemas.py``).
* Pipelines/duplicate-filter/politeness become column expressions,
  anti-joins and window ranks; fetch+parse are Arrow-batched pandas
  UDFs (never per-row Python).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from spider_man_spark.builders import (
    build_item,
    build_items,
    build_request,
    build_requests,
    set_flag,
    set_key,
)
from spider_man_spark.config import CrawlConfig, merge_settings, validate_settings
from spider_man_spark.session import get_spark

__all__ = [
    "CrawlConfig",
    "build_item",
    "build_items",
    "build_request",
    "build_requests",
    "get_spark",
    "merge_settings",
    "set_flag",
    "set_key",
    "validate_settings",
]

__version__ = "0.1.0"
