"""Item sinks — the Storage behaviour analogues (K1-K6).

Reference storages (lib/spider_man/storage/): JsonLines (default),
CSV with header projection, ETS table (set semantics), Log, Multi
fan-out; ``storage: false`` disables the item-processor stage
entirely (storage/storage.ex:15-118).

Rebuild sinks share one contract: ``store(items_df, epoch) -> path or
None``.  The registry resolves the reference's atom/tuple/list config
forms (K6: module | {module, arg} | [list]).
"""

from __future__ import annotations

from spider_man_spark.storage.sinks import (
    CsvStorage,
    JsonLinesStorage,
    KeyedJsonStorage,
    LogStorage,
    MultiStorage,
    TableStorage,
    resolve_storage,
)

__all__ = [
    "CsvStorage",
    "JsonLinesStorage",
    "KeyedJsonStorage",
    "LogStorage",
    "MultiStorage",
    "TableStorage",
    "resolve_storage",
]
