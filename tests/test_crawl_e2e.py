"""End-to-end crawl tests — the spider_test.exs / engine_test.exs
analogues: whole-flow stepping, golden outputs, retry/dead-letter,
checkpoint round-trip, determinism, politeness."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spider_man_spark.config import CrawlConfig
from spider_man_spark.functions.images import decode_image, make_image, psnr
from spider_man_spark.plans.job import CrawlJob
from spider_man_spark.sources.corpus import (
    caption_of,
    expected_image_phash,
    make_corpus,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return make_corpus(
        spark, n_hosts=3, pages_per_host=8, out_degree=2, images_per_host=2,
        hot_hosts=1,
    ).cache()


def _job(spark, tmp_path, corpus, **kw):
    kw.setdefault("tokens_per_epoch", 50)
    kw.setdefault("max_epochs", 30)
    cfg = CrawlConfig(workdir=str(tmp_path / "wd"), **kw)
    return CrawlJob(spark, cfg, corpus=corpus)


def test_whole_flow_stepped(spark, tmp_path, corpus):
    """Mirrors test/spider_test.exs:20-78 'whole flow': one request,
    step each component via suspend/continue, observing stage-by-stage
    progress."""
    job = _job(spark, tmp_path, corpus)
    job.suspend()  # all components
    assert job.status == "suspended"
    assert job.insert_requests(["http://h0.test/p/1"]) == 1

    r = job.step()  # everything suspended: nothing moves
    assert r.scheduled == 0 and r.fetched_ok == 0

    job.continue_("downloader")
    job.suspended -= {"downloader"}
    r = job.step()  # fetch happens, parse parked
    assert r.scheduled == 1 and r.fetched_ok == 1
    assert r.new_requests == 0 and r.items == 0

    job.continue_("spider")
    r = job.step()  # parked response parsed -> new requests + item reqs
    assert r.new_requests > 0

    job.continue_("item_processor")
    assert job.status == "running"


def test_jsonl_golden_ten_seeds(spark, tmp_path, corpus):
    """Mirrors test/spider_test.exs:81-128 'save to json lines':
    10 seeds keyed 1..10 -> exactly 10 items 'test-{key}', recovered
    sorted."""

    def handle_response(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "kind": ["item"] * len(pdf),
                "url": pdf["url"].values,
                "depth": pdf["depth"].values,
                "priority": pdf["priority"].values,
                "flag": [None] * len(pdf),
                "options": [None] * len(pdf),
                "image_id": pdf["url_key"].values,
                "bytes": [None] * len(pdf),
                "caption": ["test-" + u.rsplit("/", 1)[1] for u in pdf["url"].values],
            }
        )

    job = _job(
        spark, tmp_path, corpus,
        callbacks={"handle_response": handle_response},
        storage="jsonl",
    )
    seeds = [f"http://h0.test/p/{i}" for i in range(1, 8)] + [
        f"http://h1.test/p/{i}" for i in range(1, 4)
    ]
    assert job.insert_requests(seeds) == 10
    out = job.run_until_zero()
    assert out["epochs"] <= 5
    items = job.items()
    assert items.count() == 10
    captions = sorted(r.caption for r in items.collect())
    assert captions == sorted(f"test-{u.rsplit('/', 1)[1]}" for u in seeds)


def test_bfs_reaches_graph_and_items_match_corpus(spark, tmp_path, corpus):
    """Full crawl of the small graph: every fetched image item carries
    the exact corpus caption (input_hint equality) and decodes with
    PSNR >= 40 vs the generator original."""
    job = _job(spark, tmp_path, corpus)
    job.insert_requests(["http://h0.test/p/0", "http://h1.test/p/0",
                         "http://h2.test/p/0"])
    job.run_until_zero()
    items = job.items().collect()
    assert len(items) == 6  # 3 hosts x 2 images
    for it in items:
        hi = int(it.image_id.split("//h")[1].split(".")[0])
        ki = int(it.image_id.rsplit("/", 1)[1])
        assert it.caption == caption_of(hi, ki)  # exact caption equality
        assert it.phash == expected_image_phash(hi, ki)
        px = decode_image(bytes(it.bytes))
        orig = make_image(
            f"h{hi}-img{ki}", 32 + 8 * (ki % 4), 32 + 8 * (hi % 3)
        )
        assert psnr(orig, px) >= 40.0
        assert (it.h, it.w) == orig.shape[:2]
    # crawl -> deduplicated-training-set bridge: the 6 crawled images
    # are all distinct content, so the full dedup pass keeps them all
    kept = job.image_dedup_keep().select("image_id").collect()
    assert sorted(r.image_id for r in kept) == sorted(
        it.image_id for it in items
    )


def test_retry_and_dead_letter(spark, tmp_path):
    """Mirrors engine_test.exs:244-283 retry_failed: a 500 page burns
    retries down to -1 in the dead-letter table; retry_failed re-seeds
    it and it reprocesses."""
    c = make_corpus(spark, n_hosts=1, pages_per_host=40, out_degree=1,
                    images_per_host=1)
    # page j=13 has status 500 (retryable by frontier semantics)
    job = _job(spark, tmp_path, c, max_retries=2)
    job.insert_requests(["http://h0.test/p/13"])
    job.run_until_zero(max_epochs=8)
    failed = job.failed().collect()
    assert len(failed) == 1
    row = failed[0]
    assert row.component == "downloader"
    assert row.url_key == "http://h0.test/p/13"
    assert row.retries == -1  # exhausted past zero, as in the reference
    assert row.reason == "status_500"
    # retry_failed drains the dead-letter table back into the frontier
    assert job.retry_failed() == 1
    assert job.failed().count() == 0
    assert job.frontier().count() == 1


def test_checkpoint_resume_round_trip(spark, tmp_path, corpus):
    """Mirrors engine_test.exs:289-389: state written at epoch N is
    fully recovered by a fresh job on the same workdir; the resumed
    crawl finishes identically to an uninterrupted one."""
    # uninterrupted reference run
    job_a = _job(spark, tmp_path / "a", corpus)
    job_a.insert_requests(["http://h0.test/p/0"])
    job_a.run_until_zero()
    ref_items = {(r.image_id, r.phash) for r in job_a.items().collect()}
    ref_seen = {
        r.url_key
        for r in job_a.store.read_deltas("seen", 10**6).collect()
    }

    # interrupted + resumed run
    job_b = _job(spark, tmp_path / "b", corpus)
    job_b.insert_requests(["http://h0.test/p/0"])
    for _ in range(3):
        job_b.step()
    resumed = CrawlJob.load(
        spark, str(tmp_path / "b" / "wd"), corpus=corpus,
        tokens_per_epoch=50, max_epochs=30,
    )
    assert resumed.store.last_epoch() == 3
    resumed.run_until_zero()
    got_items = {(r.image_id, r.phash) for r in resumed.items().collect()}
    got_seen = {
        r.url_key
        for r in resumed.store.read_deltas("seen", 10**6).collect()
    }
    assert got_items == ref_items
    assert got_seen == ref_seen


def test_deterministic_schedule_across_runs(spark, tmp_path, corpus):
    """north_rule: the (epoch, url_key) fetch sequence is identical
    across runs under the same seeds + politeness budget."""

    def run(path):
        job = _job(spark, path, corpus, tokens_per_epoch=5)
        job.insert_requests(["http://h0.test/p/0", "http://h2.test/p/0"])
        job.run_until_zero(max_epochs=6)
        m = job.store.read_deltas("seen", 10**6)
        return sorted(
            (r.epoch, r.url_key) for r in m.collect()
        )

    assert run(tmp_path / "r1") == run(tmp_path / "r2")


def test_politeness_tokens_and_crawl_delay(spark, tmp_path):
    """Per-host token budget respected per epoch; crawl-delay hosts
    advance next_allowed_ts and get throttled across epochs."""
    c = make_corpus(
        spark, n_hosts=2, pages_per_host=30, out_degree=4,
        images_per_host=1, hot_hosts=0, crawl_delays=(0, 500),
    )
    job = _job(spark, tmp_path, c, tokens_per_epoch=3)
    job.insert_requests(
        [f"http://h0.test/p/{i}" for i in range(10)]
        + [f"http://h1.test/p/{i}" for i in range(10)]
    )
    r1 = job.step()
    assert r1.scheduled == 6  # 3 per host
    # h1 has crawl_delay 500ms: 3 fetches push next_allowed to
    # 1000+1500=2500 > epoch2's ts (2000) -> h1 blocked in epoch 2
    r2 = job.step()
    sched2 = r2.scheduled
    robots = job.store.read_snapshot("robots", 2).collect()
    by_host = {r.host: r for r in robots}
    assert by_host["h1.test"].next_allowed_ts == 2500
    assert sched2 == 3  # only h0's 3 tokens


def test_seed_dedup_idempotent(spark, tmp_path, corpus):
    job = _job(spark, tmp_path, corpus)
    assert job.insert_requests(["http://h0.test/p/1", "HTTP://H0.test:80/p/1"]) == 1
    assert job.insert_requests(["http://h0.test/p/1"]) == 0


def test_cookie_session_harvest(spark, tmp_path, corpus):
    """SetCookie analogue: set-cookie from page 0 responses lands in
    per-host session state and is injected into later requests."""
    job = _job(spark, tmp_path, corpus, cookies=True)
    job.insert_requests(["http://h0.test/p/0"])
    job.step()
    sess = {r.host: r for r in job.store.read_snapshot("session", 1).collect()}
    assert sess["h0.test"].cookies_str == "sid=h0"
    # second epoch: scheduled requests carry the cookie header
    job.step()
    # verify via the injected options on the schedule path
    from spider_man_spark.operators.politeness import schedule_epoch
    from spider_man_spark.operators.session import inject_cookie_header

    frontier = job.frontier()
    sched, _, _ = schedule_epoch(frontier, None, 10**9)
    injected = inject_cookie_header(
        sched, job.store.read_snapshot("session", 2)
    )
    h0 = injected.filter(F.col("host") == "h0.test")
    if h0.count():
        assert all(
            r.options.get("h:cookie") == "sid=h0" for r in h0.collect()
        )


def test_text_only_corpus_no_images(spark):
    """images_per_host=0 builds a text-only corpus: no image rows, no
    <img>/caption markup, null captions — the raw page-index modulo
    used to divide by zero under ANSI mode."""
    c = make_corpus(spark, n_hosts=2, pages_per_host=5, images_per_host=0)
    rows = c.collect()
    assert all("/img/" not in r.url for r in rows)
    pages = [r for r in rows if r.content_type == "text/html"]
    assert pages and all(r.caption is None for r in pages)
    assert all(b"<img" not in bytes(r.body) for r in pages)
