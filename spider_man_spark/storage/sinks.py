"""Sink implementations.

Scale note: every sink is a distributed ``df.write`` — the
``single_file`` option (used by byte-golden tests, mirroring the
reference's single-fd writes, storage/json_lines.ex:22-31) coalesces
to one partition and is for small outputs only.

Per-item ack protocol (item_processor.ex:94-112): ``store`` may return
a DataFrame with columns ``image_id``, ``ok:boolean`` and optionally
``reason:string`` — the engine zip-splits it into success/fail
accounting: failed rows retry (item ``retries - 1``) through the
pending queue and dead-letter on exhaustion.  Any other return value
(path string, None, list) means the whole batch succeeded; a raised
exception fails the epoch (the reference's ``{:error, _}`` whole-batch
result).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger("spider_man_spark.storage")


def _concat_part_files(path: str, suffix: str, out: str) -> None:
    parts = sorted(glob.glob(os.path.join(path, f"part-*{suffix}")))
    with open(out, "wb") as w:
        for p in parts:
            with open(p, "rb") as r:
                w.write(r.read())


class JsonLinesStorage:
    """K1: one JSON object per line of the item value
    (storage/json_lines.ex:22-31).  Default path mirrors
    ``./data/[Job]_[Second].jsonl`` (utils.ex:80-81)."""

    def __init__(self, path: str, single_file: bool = False) -> None:
        self.path = path
        self.single_file = single_file

    def store(self, items: DataFrame, epoch: int) -> str:
        out = f"{self.path}/e_{epoch:05d}"
        df = items.select(
            F.to_json(
                # bytes (binary payload) and retries (engine ack
                # bookkeeping) are not part of the item value
                F.struct(*[c for c in items.columns
                           if c not in ("bytes", "retries")])
            ).alias("value")
        )
        if self.single_file:
            df = df.coalesce(1)
        df.write.mode("overwrite").text(out)
        if self.single_file:
            _concat_part_files(out, ".txt", f"{out}.jsonl")
            return f"{out}.jsonl"
        return out


class CsvStorage:
    """K2: CSV with projected ``headers`` columns (missing -> empty),
    RFC4180 CRLF line endings, one header row — byte-compatible with
    the reference golden (storage/csv.ex:31-33,57-71; the doubled
    header in csv_test.exs is a test artifact, see FIXTURES.md §9)."""

    def __init__(
        self, path: str, headers: list[str], single_file: bool = False
    ) -> None:
        self.path = path
        self.headers = headers
        self.single_file = single_file

    def store(self, items: DataFrame, epoch: int) -> str:
        out = f"{self.path}/e_{epoch:05d}"
        cols = [
            (F.col(h) if h in items.columns else F.lit(None)).cast("string").alias(h)
            for h in self.headers
        ]
        df = items.select(*cols)
        if self.single_file:
            df = df.coalesce(1)
        (
            df.write.mode("overwrite")
            .option("header", True)
            .option("lineSep", "\r\n")
            .option("emptyValue", "")
            .csv(out)
        )
        if self.single_file:
            _concat_part_files(out, ".csv", f"{out}.csv")
            return f"{out}.csv"
        return out


class TableStorage:
    """K3: the ETS-storage analogue — a keyed parquet table with
    `:set` semantics (last write per key wins, engine.ex:431-432;
    storage/ets.ex:22-35).  ``merge`` rewrites the table keeping the
    highest-epoch row per key — on Iceberg this is a MERGE INTO."""

    def __init__(self, path: str, key: str = "image_id") -> None:
        self.path = path
        self.key = key

    def store(self, items: DataFrame, epoch: int) -> str:
        out = f"{self.path}/e_{epoch:05d}"
        items.write.mode("overwrite").parquet(out)
        return out

    def merged(self, spark) -> DataFrame:
        paths = sorted(glob.glob(os.path.join(self.path, "e_*")))
        df = spark.read.parquet(*paths)
        w = Window.partitionBy(self.key).orderBy(F.col("epoch").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )


class KeyedJsonStorage:
    """K7 Pipeline.JsonEncode2File analogue (json_encode2file.ex:22-32):
    one JSON object per item key.  Spark-native form: a parquet/json
    write partitioned by key prefix (writing one literal file per key
    is an anti-pattern at crawl scale; the 2-char key-hash prefix dirs
    keep file counts bounded while preserving key-addressability)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def store(self, items: DataFrame, epoch: int) -> str:
        out = f"{self.path}/e_{epoch:05d}"
        df = items.select(
            F.substring(F.md5(F.col("image_id")), 1, 2).alias("kp"),
            F.to_json(
                F.struct(*[c for c in items.columns
                           if c not in ("bytes", "retries")])
            ).alias("value"),
        )
        df.write.mode("overwrite").partitionBy("kp").text(out)
        return out


class LogStorage:
    """K4: debug sink (storage/log.ex:18-22)."""

    def __init__(self, limit: int = 20) -> None:
        self.limit = limit
        self.logged: list[str] = []

    def store(self, items: DataFrame, epoch: int) -> None:
        for row in items.limit(self.limit).collect():
            msg = f"epoch={epoch} item={row.asDict()}"
            self.logged.append(msg)
            logger.debug(msg)


class MultiStorage:
    """K5: fan-out to N sub-sinks (storage/multi.ex:17-27).  The items
    DataFrame is cached once so each sink re-reads memory, not lineage."""

    def __init__(self, sinks: list[Any]) -> None:
        self.sinks = sinks

    def store(self, items: DataFrame, epoch: int) -> list[Any]:
        items = items.cache()
        items.count()
        try:
            return [s.store(items, epoch) for s in self.sinks]
        finally:
            items.unpersist()


def resolve_storage(spec: Any, workdir: str) -> Any:
    """K6 dispatch: False -> None (stage disabled), 'table'/'jsonl'/
    'csv:h1,h2'/'log' shorthands, instances pass through, lists ->
    MultiStorage."""
    if spec is False or spec is None:
        return None
    if isinstance(spec, list):
        return MultiStorage([resolve_storage(s, workdir) for s in spec])
    if isinstance(spec, str):
        if spec == "table":
            return TableStorage(os.path.join(workdir, "items_table"))
        if spec == "jsonl":
            return JsonLinesStorage(os.path.join(workdir, "items_jsonl"))
        if spec.startswith("csv:"):
            return CsvStorage(
                os.path.join(workdir, "items_csv"), spec[4:].split(",")
            )
        if spec == "log":
            return LogStorage()
        raise ValueError(f"unknown storage spec {spec!r}")
    if hasattr(spec, "store"):
        return spec
    raise ValueError(f"unknown storage spec {spec!r}")
