"""Multi-job registry — the Application/start_child analogue.

The reference supervises many spiders under one application
(application.ex:10-45; list_spiders lib/spider_man.ex:249-256).  Here
multiple named CrawlJobs share one SparkSession, each with its own
workdir namespace.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from spider_man_spark.config import CrawlConfig
from spider_man_spark.plans.job import CrawlJob

_JOBS: dict[str, CrawlJob] = {}


def start(
    spark: SparkSession,
    name: str,
    base_dir: str = "./data",
    corpus: DataFrame | None = None,
    **cfg_kw: Any,
) -> CrawlJob:
    """Start (or return) a named crawl job; its state lives under
    base_dir/name."""
    if name in _JOBS:
        return _JOBS[name]
    cfg = CrawlConfig(
        job_name=name, workdir=os.path.join(base_dir, name), **cfg_kw
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    _JOBS[name] = job
    return job


def stop(name: str) -> bool:
    job = _JOBS.pop(name, None)
    if job is None:
        return False
    job.stop()
    return True


def list_jobs() -> list[str]:
    return sorted(_JOBS)


def get(name: str) -> CrawlJob | None:
    return _JOBS.get(name)
