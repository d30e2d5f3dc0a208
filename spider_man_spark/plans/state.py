"""Epoch-versioned parquet state store — the dump2file/ets_file analogue.

The reference checkpoints all nine ETS tables to ``.ets`` files with
md5 verification and restores them at boot (engine.ex:193-216,
409-427; utils.ex:84-98).  Here every state table is a directory of
epoch-stamped parquet snapshots/deltas plus an atomic JSON manifest —
functionally the Iceberg-snapshot layout (one snapshot per epoch,
time-travel by epoch, atomic commit), expressed on plain parquet so it
runs in this sandbox; on a cluster each kind maps 1:1 onto an Iceberg
table with snapshot-per-epoch commits.

Layout:
  workdir/<kind>/e_00042/*.parquet   (no '=' in dir names on purpose —
                                      keeps Spark partition discovery
                                      out of the way of explicit epoch
                                      data columns)
  workdir/manifest.json              {"epoch": N, ...} via tmp+rename

SNAPSHOT kinds (read latest <= N): frontier, robots, session,
pending_fetched, pending_items.
DELTA kinds (read union of all <= N): seen, items, failed, metrics.
Resume = read manifest, ignore dirs beyond the committed epoch —
uncommitted partial epochs are invisible, which is exactly Iceberg's
snapshot-isolation behavior.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SNAPSHOT_KINDS = frozenset(
    {"frontier", "robots", "session", "pending_fetched", "pending_items",
     "seen_shards"}
)
DELTA_KINDS = frozenset(
    {"seen", "items", "failed", "metrics", "page_features"}
)


def _edir(epoch: int) -> str:
    return f"e_{epoch:05d}"


class StateStore:
    def __init__(self, spark: SparkSession, workdir: str) -> None:
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    # -- manifest (atomic commit marker) --
    def manifest(self) -> dict:
        p = os.path.join(self.workdir, "manifest.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def commit(self, **kv) -> None:
        m = self.manifest()
        m.update(kv)
        p = os.path.join(self.workdir, "manifest.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, p)

    def last_epoch(self) -> int:
        return int(self.manifest().get("epoch", -1))

    # -- writes --
    def write(self, kind: str, df: DataFrame, epoch: int) -> None:
        path = os.path.join(self.workdir, kind, _edir(epoch))
        df.write.mode("overwrite").parquet(path)

    def write_rows_local(
        self, kind: str, rows: list[tuple], schema: StructType, epoch: int
    ) -> None:
        """Write a handful of DRIVER-side rows as a spark-readable
        parquet dir via pyarrow — no Spark job (a scheduling round
        trip for 4 metrics rows is pure fixed cost on the epoch's
        critical path)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        type_map = {
            "int": pa.int32(),
            "bigint": pa.int64(),
            "string": pa.string(),
            "double": pa.float64(),
            "boolean": pa.bool_(),
        }
        fields = [
            pa.field(f.name, type_map[f.dataType.simpleString()], f.nullable)
            for f in schema.fields
        ]
        cols = {
            f.name: [r[i] for r in rows] for i, f in enumerate(schema.fields)
        }
        path = os.path.join(self.workdir, kind, _edir(epoch))
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.table(cols, schema=pa.schema(fields)),
            os.path.join(path, "part-00000.parquet"),
        )
        open(os.path.join(path, "_SUCCESS"), "w").close()

    def rewrite(self, kind: str, df: DataFrame, epoch: int) -> None:
        """Overwrite an epoch dir with a DataFrame that may READ from
        that same dir: localCheckpoint(eager) materializes the data
        and truncates lineage first, so the overwrite can't consume
        its own deleted input."""
        self.write(kind, df.localCheckpoint(eager=True), epoch)

    # -- reads --
    def _epochs(self, kind: str, up_to: int) -> list[int]:
        d = os.path.join(self.workdir, kind)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("e_"):
                e = int(name[2:])
                if e <= up_to and os.path.exists(
                    os.path.join(d, name, "_SUCCESS")
                ):
                    out.append(e)
        return sorted(out)

    def read_snapshot(
        self, kind: str, up_to: int, schema: StructType | None = None
    ) -> DataFrame | None:
        eps = self._epochs(kind, up_to)
        if not eps:
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            return None
        return self.spark.read.parquet(
            os.path.join(self.workdir, kind, _edir(eps[-1]))
        )

    def read_deltas(
        self, kind: str, up_to: int, schema: StructType | None = None
    ) -> DataFrame | None:
        eps = self._epochs(kind, up_to)
        if not eps:
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            return None
        paths = [os.path.join(self.workdir, kind, _edir(e)) for e in eps]
        return self.spark.read.parquet(*paths)

    def read_delta_single(
        self, kind: str, epoch: int, schema: StructType | None = None
    ) -> DataFrame | None:
        """Read exactly one epoch's delta dir (empty/None if absent) —
        used by writers that merge into the *current* epoch's delta
        without re-reading every older delta."""
        path = os.path.join(self.workdir, kind, _edir(epoch))
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return self.spark.read.parquet(path)
        if schema is not None:
            return self.spark.createDataFrame([], schema)
        return None

    def compact(self, kind: str, epoch: int) -> int:
        """Merge all delta dirs <= epoch into one dir at ``epoch`` and
        drop the older dirs (Iceberg snapshot-expiration analogue:
        trades per-epoch time travel below ``epoch`` for O(1) dirs).
        Returns the number of dirs compacted away."""
        eps = self._epochs(kind, epoch)
        if len(eps) <= 1:
            return 0
        merged = self.read_deltas(kind, epoch)
        self.rewrite(kind, merged, epoch)
        removed = 0
        for e in eps:
            if e != epoch:
                shutil.rmtree(
                    os.path.join(self.workdir, kind, _edir(e)),
                    ignore_errors=True,
                )
                removed += 1
        return removed

    def prune_beyond(self, epoch: int) -> None:
        """Drop uncommitted partial-epoch dirs (crash cleanup)."""
        for kind in SNAPSHOT_KINDS | DELTA_KINDS:
            d = os.path.join(self.workdir, kind)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if name.startswith("e_") and int(name[2:]) > epoch:
                    shutil.rmtree(os.path.join(d, name), ignore_errors=True)
