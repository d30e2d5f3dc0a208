"""Retry / dead-letter semantics — the producer-acker analogue.

Reference behavior (producer/ets.ex:139-165 + component.ex:28-37):
failed events with ``retries > 0`` are re-inserted into their source
table with ``retries - 1``; exhausted events land in ``failed_tid``
keyed ``{component, key}``; ``:skiped`` events are dropped without
retry.  ``retry_failed`` (engine.ex:218-244) drains the dead-letter
table, resets retries to ``max_retries`` and re-inserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_man_spark.schemas import DEFAULT_REQUEST_RETRIES

def _ok():
    return (F.col("status") >= 200) & (F.col("status") <= 299)


def split_fetch_results(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok, failed) by HTTP status; status 0 = transport failure."""
    return fetched.filter(_ok()), fetched.filter(~_ok())


def requeue_failures(
    failures: DataFrame,
    component: str,
    epoch: int,
    reason: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(retry_frontier_rows, dead_letter_rows).

    retry rows go back to the frontier with retries-1 (component.ex:
    28-37); exhausted rows become FAILED_SCHEMA dead letters keyed
    (component, url_key) (producer/ets.ex:154).  ``reason`` overrides
    the default status-derived reason (used for pipeline-errored rows
    that carry a ``_reason`` column — downloader pipeline errors fail
    the message in the reference too, pipeline.ex:30-38).
    """
    reason_col = (
        reason
        if reason is not None
        else F.concat(F.lit("status_"), F.col("status"))
    )
    retry = failures.filter(F.col("retries") > 0).select(
        "url_key",
        "url",
        "host",
        F.lit(None).cast("int").alias("host_salt"),
        F.lit(None).cast("long").alias("url_hash"),
        "depth",
        "priority",
        (F.col("retries") - 1).alias("retries"),
        "flag",
        "options",
    )
    dead = failures.filter(F.col("retries") <= 0).select(
        F.lit(component).alias("component"),
        "url_key",
        "url",
        F.col("status").cast("string").alias("payload"),
        reason_col.alias("reason"),
        (F.col("retries") - 1).alias("retries"),  # ref lands at -1
        "depth",
        "priority",
        "flag",
        "options",
        F.lit(epoch).cast("int").alias("epoch"),
    )
    return retry, dead


def retry_failed(
    failed: DataFrame,
    component: str | None = None,
    max_retries: int = DEFAULT_REQUEST_RETRIES,
) -> tuple[DataFrame, DataFrame]:
    """Engine.retry_failed analogue: (frontier_rows, remaining_failed).

    Drains the dead-letter table (optionally one component), resets
    retries to ``max_retries`` and emits frontier rows for re-fetch.
    """
    take = failed if component is None else failed.filter(
        F.col("component") == component
    )
    keep = failed.join(take.select("component", "url_key"),
                       ["component", "url_key"], "left_anti")
    rows = take.select(
        "url_key",
        "url",
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("int").alias("host_salt"),
        F.lit(None).cast("long").alias("url_hash"),
        F.coalesce("depth", F.lit(0)).alias("depth"),
        F.coalesce("priority", F.lit(0)).alias("priority"),
        F.lit(max_retries).alias("retries"),
        "flag",
        "options",
    )
    return rows, keep
