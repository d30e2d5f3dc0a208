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

from spider_man_spark.schemas import ITEMS_SCHEMA, METRICS_SCHEMA


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
