"""Item-processor parity tests (C6 + K8 non-skip forward).

Mirrors the reference's per-item storage results zip-split
(item_processor.ex:94-112, engine_test.exs:244-283 retry semantics),
batcher partition_by (configuration.ex:138-149), and SaveToFile
non-skip forward (save_to_file.ex:40-44, flag transmit through the
image hop as in common_spider_test.exs:133-159).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_man_spark.config import CrawlConfig
from spider_man_spark.plans.job import CrawlJob
from spider_man_spark.sources.corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    return make_corpus(
        spark, n_hosts=2, pages_per_host=8, out_degree=2, images_per_host=2,
        hot_hosts=0, crawl_delays=(0,),
    ).cache()


def _make_items_only_callback():
    """handle_response emitting one item per response, no requests.
    Built inside a factory so the function pickles by VALUE (a
    module-level test function pickles by reference, which executors
    can't import)."""

    def _cb(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        return pd.DataFrame(
            {
                "kind": ["item"] * n,
                "url": pdf["url"].values,
                "depth": pdf["depth"].values,
                "priority": pdf["priority"].values,
                "flag": [None] * n,
                "options": [None] * n,
                "image_id": pdf["url_key"].values,
                "bytes": [None] * n,
                "caption": [
                    "c-" + u.rsplit("/", 1)[1] for u in pdf["url"].values
                ],
            }
        )

    return _cb


class FlakySink:
    """Per-item results: rows whose image_id ends in a digit divisible
    by 3 fail with reason 'sink_boom'."""

    def __init__(self) -> None:
        self.batches: list[list[str]] = []

    def store(self, items, epoch):
        self.batches.append(
            sorted(r.image_id for r in items.select("image_id").collect())
        )
        return items.select(
            "image_id",
            (F.substring(F.col("image_id"), -1, 1).cast("int") % 3 != 0)
            .alias("ok"),
            F.lit("sink_boom").alias("reason"),
        )


def test_sink_per_item_retry_then_dead_letter(spark, tmp_path, corpus):
    sink = FlakySink()
    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), tokens_per_epoch=50, max_epochs=10,
        callbacks={"handle_response": _make_items_only_callback()}, storage=sink,
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    seeds = [f"http://h0.test/p/{i}" for i in range(1, 8)]
    job.insert_requests(seeds)
    out = job.run_until_zero()
    assert out["epochs"] < cfg.max_epochs

    fail_ids = {f"http://h0.test/p/{i}" for i in (3, 6)}
    ok_ids = {f"http://h0.test/p/{i}" for i in (1, 2, 4, 5, 7)}
    # items state table holds only successfully-stored rows
    stored = {r.image_id for r in job.items().collect()}
    assert stored == ok_ids
    # failing rows retried exactly once (item retries default 1), i.e.
    # each appears in two sink batches, then dead-letters
    from collections import Counter

    seen = Counter(i for b in sink.batches for i in b)
    assert all(seen[i] == 2 for i in fail_ids)
    assert all(seen[i] == 1 for i in ok_ids)
    dead = {r.url_key: r for r in job.failed().collect()}
    assert set(dead) == fail_ids
    for r in dead.values():
        assert r.component == "item_processor"
        assert r.reason == "sink_boom"
        assert r.retries == -1


class CaptureSink:
    def __init__(self) -> None:
        self.plans: list[str] = []

    def store(self, items, epoch):
        self.plans.append(items._jdf.queryExecution().analyzed().toString())
        return None


def test_partition_by_repartitions_sink_input(spark, tmp_path, corpus):
    sink = CaptureSink()
    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), tokens_per_epoch=50, max_epochs=10,
        callbacks={"handle_response": _make_items_only_callback()}, storage=sink,
        partition_by="caption",
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    job.insert_requests(["http://h0.test/p/1", "http://h0.test/p/2"])
    job.step()
    assert sink.plans and "RepartitionByExpression" in sink.plans[0]
    assert "caption" in sink.plans[0]


def test_save_to_file_nonskip_forwards_with_rewritten_url(
    spark, tmp_path, corpus
):
    """save2file responses are stored AND continue to handle_response
    with url rewritten to the storage path; _and_skip responses are
    stored but never reach the spider (flag transmit through the image
    hop)."""
    img0 = "http://h0.test/img/0"
    img1 = "http://h0.test/img/1"

    def handle(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples():
            if r.flag == "save2file":
                rows.append(
                    dict(kind="item", url=r.url, depth=0, priority=0,
                         flag=None, options=None,
                         image_id="cb-" + r.url_key, bytes=None,
                         caption=f"{r.flag}|{r.url}")
                )
            elif r.flag is None:
                rows.append(
                    dict(kind="request", url=img0, depth=0, priority=0,
                         flag="save2file", options=None, image_id=None,
                         bytes=None, caption=None)
                )
                rows.append(
                    dict(kind="request", url=img1, depth=0, priority=0,
                         flag="save2file_and_skip", options=None,
                         image_id=None, bytes=None, caption=None)
                )
        cols = ["kind", "url", "depth", "priority", "flag", "options",
                "image_id", "bytes", "caption"]
        return pd.DataFrame(rows, columns=cols)

    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), tokens_per_epoch=50, max_epochs=10,
        callbacks={"handle_response": handle}, save_to_file="saved",
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    job.insert_requests(["http://h0.test/p/0"])
    out = job.run_until_zero()
    assert out["epochs"] < cfg.max_epochs
    items = {r.image_id: r for r in job.items().collect()}
    # both flagged images stored as decoded items (SaveToFile save)
    assert items[img0].fmt is not None and items[img0].w > 0
    assert items[img1].fmt is not None and items[img1].w > 0
    # only the non-skip one continued to the spider, with the url
    # rewritten to the storage path and the flag preserved
    assert f"cb-{img0}" in items
    assert items[f"cb-{img0}"].caption == f"save2file|saved/{img0}"
    assert f"cb-{img1}" not in items


class PartialAckSink:
    """Returns acks ONLY for image_ids ending in an even digit — odd
    ones go silently unacked (the reference's zip-split assumes 1:1
    coverage; the engine must not treat silence as success)."""

    def __init__(self) -> None:
        self.batches: list[list[str]] = []

    def store(self, items, epoch):
        self.batches.append(
            sorted(r.image_id for r in items.select("image_id").collect())
        )
        return items.filter(
            F.substring(F.col("image_id"), -1, 1).cast("int") % 2 == 0
        ).select(
            "image_id", F.lit(True).alias("ok"), F.lit(None).cast("string").alias("reason")
        )


def test_missing_acks_are_failures(spark, tmp_path, corpus):
    """Items absent from the sink's ack DataFrame are failures (reason
    'missing_ack'), not silent successes: they retry once then
    dead-letter."""
    sink = PartialAckSink()
    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), tokens_per_epoch=50, max_epochs=10,
        callbacks={"handle_response": _make_items_only_callback()}, storage=sink,
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    seeds = [f"http://h0.test/p/{i}" for i in range(1, 7)]
    job.insert_requests(seeds)
    out = job.run_until_zero()
    assert out["epochs"] < cfg.max_epochs

    acked = {f"http://h0.test/p/{i}" for i in (2, 4, 6)}
    silent = {f"http://h0.test/p/{i}" for i in (1, 3, 5)}
    stored = {r.image_id for r in job.items().collect()}
    assert stored == acked
    dead = {r.url_key: r for r in job.failed().collect()}
    assert set(dead) == silent
    assert all(r.reason == "missing_ack" for r in dead.values())
    # each silent item was offered to the sink twice (retries=1 default)
    from collections import Counter

    seen = Counter(i for b in sink.batches for i in b)
    assert all(seen[i] == 2 for i in silent)
    assert all(seen[i] == 1 for i in acked)


class DuplicateAckSink:
    """Returns TWO ack rows per item; for ids ending in '3' the second
    row is a failure.  Mixed verdicts must collapse to failure and must
    not fan out duplicate pending/dead rows."""

    def store(self, items, epoch):
        base = items.select("image_id")
        ok_rows = base.select(
            "image_id", F.lit(True).alias("ok"),
            F.lit(None).cast("string").alias("reason"),
        )
        second = base.select(
            "image_id",
            (~F.col("image_id").endswith("3")).alias("ok"),
            F.lit("dup_nack").alias("reason"),
        )
        return ok_rows.unionAll(second)


def test_duplicate_acks_collapse_without_fanout(spark, tmp_path, corpus):
    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), tokens_per_epoch=50, max_epochs=10,
        callbacks={"handle_response": _make_items_only_callback()},
        storage=DuplicateAckSink(),
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    seeds = [f"http://h0.test/p/{i}" for i in range(1, 7)]
    job.insert_requests(seeds)
    out = job.run_until_zero()
    assert out["epochs"] < cfg.max_epochs

    bad = "http://h0.test/p/3"
    stored = sorted(r.image_id for r in job.items().collect())
    assert stored == sorted(s for s in seeds if s != bad)  # no dup rows
    dead = [r for r in job.failed().collect()]
    assert [r.url_key for r in dead] == [bad]  # exactly one dead row
    assert dead[0].reason == "dup_nack"


def test_lazy_ack_lineage_evaluated_exactly_once(spark, tmp_path, corpus):
    """A sink whose ack DataFrame performs the 'upload' lazily (inside
    its own lineage) must have that lineage evaluated exactly once per
    store() call — deriving ok_items from an unpersisted ack would
    re-run the side effects at the deferred items write."""
    log = str(tmp_path / "uploads.log")

    class LazyUploadSink:
        def store(self, items, epoch):
            logp = log

            def _upload(batches):
                for pdf in batches:
                    with open(logp, "a") as f:
                        for i in pdf["image_id"].values:
                            f.write(i + "\n")
                    yield pd.DataFrame(
                        {
                            "image_id": pdf["image_id"].values,
                            "ok": [
                                not i.endswith("3")
                                for i in pdf["image_id"].values
                            ],
                            "reason": ["lazy_boom"] * len(pdf),
                        }
                    )

            return items.select("image_id").coalesce(1).mapInPandas(
                _upload, "image_id string, ok boolean, reason string"
            )

    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), tokens_per_epoch=50, max_epochs=10,
        callbacks={"handle_response": _make_items_only_callback()},
        storage=LazyUploadSink(),
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    seeds = [f"http://h0.test/p/{i}" for i in range(1, 7)]
    job.insert_requests(seeds)
    out = job.run_until_zero()
    assert out["epochs"] < cfg.max_epochs

    from collections import Counter

    with open(log) as f:
        uploads = Counter(line.strip() for line in f if line.strip())
    bad = "http://h0.test/p/3"
    # failing item uploaded twice (one retry), everything else once —
    # NO re-evaluations beyond the per-epoch store() call
    assert uploads[bad] == 2
    assert all(uploads[s] == 1 for s in seeds if s != bad)
