"""Sink tests — csv_test.exs / json_lines golden analogues + table
set-semantics + multi fan-out + storage=False."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spider_man_spark.storage import (
    CsvStorage,
    JsonLinesStorage,
    LogStorage,
    MultiStorage,
    TableStorage,
    resolve_storage,
)


@pytest.fixture()
def items(spark):
    return spark.createDataFrame(
        [(str(i), f"cap-{i}", i, 2 * i) for i in (1, 2, 3)],
        "image_id string, caption string, a int, b int",
    ).withColumn("epoch", F.lit(0))


def test_csv_golden_bytes(spark, tmp_path, items):
    """storage/csv_test.exs golden: header a,b then 1,2/2,4/3,6 with
    RFC4180 CRLF endings."""
    sink = CsvStorage(str(tmp_path / "csv"), ["a", "b"], single_file=True)
    out = sink.store(items.orderBy("a").coalesce(1), 0)
    data = open(out, "rb").read()
    assert data == b"a,b\r\n1,2\r\n2,4\r\n3,6\r\n"


def test_csv_missing_header_columns_are_empty(spark, tmp_path, items):
    sink = CsvStorage(str(tmp_path / "csv2"), ["a", "nope"], single_file=True)
    out = sink.store(items.orderBy("a").coalesce(1), 0)
    data = open(out, "rb").read()
    assert data == b"a,nope\r\n1,\r\n2,\r\n3,\r\n"


def test_jsonl_lines_parse_back(spark, tmp_path, items):
    """json_lines golden: one JSON per line, all items present."""
    sink = JsonLinesStorage(str(tmp_path / "jl"), single_file=True)
    out = sink.store(items, 0)
    lines = open(out).read().splitlines()
    assert len(lines) == 3
    got = sorted(json.loads(line)["caption"] for line in lines)
    assert got == ["cap-1", "cap-2", "cap-3"]


def test_table_storage_set_semantics(spark, tmp_path, items):
    """ETS-set analogue: last write per key wins across epochs
    (engine.ex:431-432)."""
    sink = TableStorage(str(tmp_path / "tbl"))
    sink.store(items, 0)
    update = spark.createDataFrame(
        [("2", "cap-2-new", 9, 9)],
        "image_id string, caption string, a int, b int",
    ).withColumn("epoch", F.lit(1))
    sink.store(update, 1)
    merged = {r.image_id: r.caption for r in sink.merged(spark).collect()}
    assert merged == {"1": "cap-1", "2": "cap-2-new", "3": "cap-3"}


def test_multi_fanout(spark, tmp_path, items):
    log = LogStorage()
    multi = MultiStorage(
        [JsonLinesStorage(str(tmp_path / "m1"), single_file=True), log]
    )
    multi.store(items, 0)
    assert len(log.logged) == 3


def test_resolve_storage_forms(tmp_path):
    wd = str(tmp_path)
    assert resolve_storage(False, wd) is None
    assert isinstance(resolve_storage("table", wd), TableStorage)
    assert isinstance(resolve_storage("jsonl", wd), JsonLinesStorage)
    csv = resolve_storage("csv:x,y", wd)
    assert isinstance(csv, CsvStorage) and csv.headers == ["x", "y"]
    multi = resolve_storage(["table", "log"], wd)
    assert isinstance(multi, MultiStorage) and len(multi.sinks) == 2
    with pytest.raises(ValueError):
        resolve_storage("bogus", wd)


def test_keyed_json_storage(spark, tmp_path, items):
    """K7 JsonEncode2File analogue: key-addressable JSON objects,
    bounded dir fan-out via 2-char key-hash prefix."""
    import glob
    import json as _json

    from spider_man_spark.storage import KeyedJsonStorage

    sink = KeyedJsonStorage(str(tmp_path / "kj"))
    out = sink.store(items, 0)
    files = glob.glob(out + "/kp=*/*.txt")
    assert files
    vals = []
    for f in files:
        vals += [_json.loads(x) for x in open(f).read().splitlines()]
    assert sorted(v["image_id"] for v in vals) == ["1", "2", "3"]


def test_json_encode_stage(spark, items):
    """P4 JsonEncode pipeline stage."""
    import json as _json

    from spider_man_spark.operators.pipeline import json_encode_stage, run_pipeline

    out = run_pipeline(items, [json_encode_stage(["image_id", "caption"])])
    row = out.filter("image_id = '2'").first()
    assert _json.loads(row.json) == {"image_id": "2", "caption": "cap-2"}
