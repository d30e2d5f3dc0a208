"""Streaming views over a running crawl's state directories.

The reference prints stats every second from a console-printer task
(stats.ex:59-100, engine.ex:610-612).  The Spark-native equivalent is
a Structured Streaming file-source query tailing the epoch delta dirs:

* :func:`stream_metrics` — running per-component totals + tps
  (stats-fold analogue, complete-mode aggregate).
* :func:`stream_items` — append-mode tail of arriving items.
* :func:`windowed_event_counts` — event-time tumbling-window counts
  with a watermark over any (ts, key) stream: the standard
  late-data-tolerant streaming aggregation surface.

All run with any trigger; tests use ``trigger(availableNow=True)`` +
memory sink for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_man_spark.schemas import (
    FETCH_EVENTS_SCHEMA,
    ITEMS_SCHEMA,
    METRICS_SCHEMA,
)


def stream_metrics(spark: SparkSession, workdir: str) -> DataFrame:
    """Streaming per-component rollup of the metrics deltas."""
    src = (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{workdir}/metrics/e_*")
    )
    return (
        src.groupBy("component")
        .agg(
            F.sum("total").alias("total"),
            F.sum("success").alias("success"),
            F.sum("fail").alias("fail"),
            F.sum("duration_ms").alias("duration_ms"),
        )
        .withColumn(
            "tps",
            F.when(
                F.col("duration_ms") > 0,
                F.round(F.col("success") / (F.col("duration_ms") / 1000.0), 3),
            ).otherwise(F.lit(0.0)),
        )
    )


def stream_items(spark: SparkSession, workdir: str) -> DataFrame:
    """Append-mode tail of the items table (bytes dropped: a monitor
    stream should not move payloads)."""
    src = (
        spark.readStream.schema(ITEMS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{workdir}/items/e_*")
    )
    return src.select("image_id", "w", "h", "fmt", "caption", "phash", "epoch")


def stream_fetch_events(spark: SparkSession, workdir: str) -> DataFrame:
    """Streaming tail of the fetch_events deltas a crawl writes when
    ``emit_fetch_events`` is on — the input
    :func:`stream_host_fetch_stats` expects (one ``(host, ts_ms)`` row
    per completed fetch).

    Delivery is AT-LEAST-ONCE across crash recovery by default: if
    the driver dies after an epoch's fetch_events write but before
    its manifest commit, the epoch re-runs and rewrites the dir with
    new part-file names, which a live tail ingests again (the file
    source cannot roll back its checkpoint).  Totals in the stateful
    tracker then over-count that one epoch — acceptable for a
    monitoring surface (the reference's console stats have the same
    semantics); exact counts live in the transactional metrics table.

    EXACTLY-ONCE is available via
    ``CrawlConfig.fetch_events_exactly_once``: the crawl then stages
    each epoch's delta in a hidden dir this source's ``e_*`` glob
    can never match and renames it into place only after the epoch's
    manifest commit (publish-on-commit; a crash between commit and
    publish is rolled forward at the next job init), so a re-run
    epoch's first, uncommitted write is never ingested."""
    return (
        spark.readStream.schema(FETCH_EVENTS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{workdir}/fetch_events/e_*")
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling window + watermark (late-data handling) —
    works on a streaming or batch DataFrame identically."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(key_col)
    ).agg(F.count("*").alias("n"))


def stream_host_fetch_stats(
    fetch_events: DataFrame, min_gap_ms: int = 0
) -> DataFrame:
    """Custom STATEFUL streaming operator over a stream of completed
    fetches ``(host, ts_ms)``: running per-host totals plus
    politeness-gap violations (two fetches on one host closer than
    ``min_gap_ms``), with the per-host state — last fetch timestamp,
    running counts — carried across micro-batches via
    ``applyInPandasWithState`` and recovered from the checkpoint
    across restarts.

    This is the streaming rebuild of the per-host rate-limiter state
    the reference keeps driver-local in ETS
    (component/rate_limiter.ex via engine.ex:145-191 options): here
    the state lives in Spark's state store, sharded by the group key,
    so 10^7 hosts of politeness state scale with the cluster instead
    of one process.  Output mode ``update``: one refreshed row per
    host per batch that saw it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = int(min_gap_ms)

    def track(key, pdfs, state):
        import numpy as np
        import pandas as pd

        (host,) = key
        last_ts, n, viol = state.get if state.exists else (None, 0, 0)
        # concat ALL Arrow chunks before sorting — a group whose
        # micro-batch spans several chunks must gap-scan one combined
        # timeline, not per-chunk timelines; then the scan is a single
        # vectorized diff (a hot host can deliver 10^6 events in one
        # batch — a per-row Python loop would be this operator's floor)
        chunks = [pdf["ts_ms"].to_numpy(dtype=np.int64) for pdf in pdfs]
        ts = (
            np.sort(np.concatenate(chunks))
            if chunks else np.empty(0, dtype=np.int64)
        )
        if ts.size:
            if gap > 0:
                seq = ts if last_ts is None else np.concatenate(
                    ([np.int64(last_ts)], ts)
                )
                viol += int((np.diff(seq) < gap).sum())
            last_ts = int(ts[-1])
            n += int(ts.size)
        state.update((last_ts, n, viol))
        yield pd.DataFrame(
            {
                "host": [host],
                "fetches": [n],
                "violations": [viol],
                "last_ts_ms": [last_ts],
            }
        )

    return fetch_events.groupBy("host").applyInPandasWithState(
        track,
        outputStructType=(
            "host string, fetches long, violations long, last_ts_ms long"
        ),
        stateStructType="last_ts long, fetches long, violations long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
