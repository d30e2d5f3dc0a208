"""Ack-path regression tests (round-2 advisories).

Covers: engine-injected option keys on retried rows (map_put, not
map_concat), post-pipeline errors routed through retry/dead-letter,
splash un-wrapping on requeue, robots-disallowed rows dead-lettering so
run_until_zero terminates, and seed-time seen-delta non-inflation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_man_spark.config import CrawlConfig
from spider_man_spark.operators.pipeline import fail_where
from spider_man_spark.plans.job import CrawlJob
from spider_man_spark.sources.corpus import make_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    # hot host 0 gets 10x pages => page 13 exists with status 500
    # (retryable) and page 17 with 404 (see corpus generator docstring)
    return make_corpus(
        spark, n_hosts=2, pages_per_host=8, out_degree=2, images_per_host=2,
        hot_hosts=1, crawl_delays=(0,),
    ).cache()


def _job(spark, tmp_path, corpus, **kw):
    kw.setdefault("tokens_per_epoch", 100)
    kw.setdefault("max_epochs", 40)
    cfg = CrawlConfig(workdir=str(tmp_path / "wd"), **kw)
    return CrawlJob(spark, cfg, corpus=corpus)


def test_retry_with_user_agents_and_cookies(spark, tmp_path, corpus):
    """A retried request carries last epoch's injected h:user-agent /
    h:cookie keys back into the frontier; re-injection next epoch must
    REPLACE them (map_put), not map_concat into DUPLICATED_MAP_KEY."""
    job = _job(
        spark, tmp_path, corpus,
        user_agents=("UA-a", "UA-b"),
        cookies=True,
        dedup=True,
    )
    # p/13 has status 500 (retryable); p/0 sets the session cookie
    job.insert_requests(["http://h0.test/p/0", "http://h0.test/p/13"])
    out = job.run_until_zero()  # would crash at epoch 2/3 pre-fix
    assert out["epochs"] < job.cfg.max_epochs
    dead = {r.url_key: r for r in job.failed().collect()}
    assert "http://h0.test/p/13" in dead
    assert dead["http://h0.test/p/13"].reason == "status_500"
    # the dead row's options still carry exactly one of each injected key
    opts = dead["http://h0.test/p/13"].options
    assert "h:user-agent" in opts and opts["h:user-agent"] in ("UA-a", "UA-b")


def test_post_pipeline_error_enters_ack_path(spark, tmp_path, corpus):
    """A fetched response that errors in a post-pipeline retries
    (retries-1 per epoch) and finally dead-letters with the pipeline
    reason — mirroring downloader pipeline failure semantics."""
    bad = "http://h0.test/p/5"

    def poison(df):
        return fail_where(df, F.col("url") == bad, "post_boom")

    job = _job(
        spark, tmp_path, corpus, post_pipelines=(poison,), max_retries=2,
    )
    job.insert_requests([bad])
    out = job.run_until_zero()
    assert out["epochs"] < job.cfg.max_epochs
    dead = job.failed().collect()
    assert len(dead) == 1
    assert dead[0].url_key == bad
    assert dead[0].reason == "post_boom"
    assert dead[0].component == "downloader"
    assert dead[0].retries == -1  # ref lands at -1 after exhaustion
    # frontier fully drained
    assert job.frontier().count() == 0


def test_splash_retry_not_double_wrapped(spark, tmp_path, corpus):
    """A splash-rewritten request that fails persists back into the
    frontier UN-wrapped, so the next epoch wraps it exactly once."""
    splash = "http://splash:8050/render.html"

    def failing_fetcher(df):
        return df.select(
            "url_key", "url", "host", "depth", "priority", "retries",
            "flag", "options",
            F.lit(500).alias("status"),
            F.lit(None).cast("string").alias("content_type"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit(None).cast("binary").alias("body"),
            F.lit(1).cast("long").alias("fetch_ms"),
        )

    cfg = CrawlConfig(
        workdir=str(tmp_path / "wd"), splash_url=splash,
        tokens_per_epoch=50, max_epochs=10, max_retries=2,
    )
    job = CrawlJob(spark, cfg, fetcher=failing_fetcher)
    orig = "http://h9.test/p/0?b=2&a=1"
    canon = "http://h9.test/p/0?a=1&b=2"
    job.insert_requests([orig])
    job.step()
    # retried row is back with the ORIGINAL (canonical) url — no splash
    front = job.frontier().collect()
    assert [r.url for r in front] == [canon]
    job.step()
    job.step()
    job.step()  # seed retries default 3 (builders) -> dead on epoch 4
    dead = job.failed().collect()
    assert len(dead) == 1
    # the dead letter carries the fetch-side url: wrapped exactly once
    assert dead[0].url.startswith(splash)
    assert dead[0].url.count("url=") == 1
    from urllib.parse import parse_qs, urlsplit

    q = parse_qs(urlsplit(dead[0].url).query)
    assert q["url"] == [canon]


def test_disallowed_rows_dead_letter_and_drain(spark, tmp_path, corpus):
    """A frontier left with only robots-disallowed URLs must drain (no
    max_epochs spin): disallowed rows leave as dead letters."""
    job = _job(spark, tmp_path, corpus, zero_checks=2)
    robots = spark.createDataFrame(
        [("h0.test", 0, 50, 0, ["/p"], 0), ("h1.test", 0, 50, 0, None, 0)],
        "host string, crawl_delay_ms int, tokens_per_epoch int, "
        "next_allowed_ts long, disallow_prefixes array<string>, epoch int",
    )
    job.store.write("robots", robots, 0)
    job.insert_requests(["http://h0.test/p/1", "http://h0.test/p/2"])
    out = job.run_until_zero()
    assert out["epochs"] <= 1 + job.cfg.zero_checks  # no spin
    assert job.frontier().count() == 0
    dead = job.failed().collect()
    assert sorted(r.url_key for r in dead) == [
        "http://h0.test/p/1", "http://h0.test/p/2"
    ]
    assert all(r.reason == "disallowed" for r in dead)


def test_seed_deltas_not_inflated_by_reseeding(spark, tmp_path, corpus):
    """Seeding mid-crawl must not re-copy older seen deltas into the
    current epoch's delta dir."""
    job = _job(spark, tmp_path, corpus, dedup=True)
    job.insert_requests([f"http://h0.test/p/{i}" for i in range(10)])
    job.step()
    seen_after_step = job.store.read_deltas(
        "seen", job.store.last_epoch()
    ).count()
    # seed hosts outside the crawl graph so the BFS can't have
    # admitted them already via cross-host links
    assert job.insert_requests([f"http://zz.test/p/{i}" for i in range(5)]) == 5
    seen = job.store.read_deltas("seen", job.store.last_epoch())
    assert seen.count() == seen_after_step + 5
    # set-semantic: no duplicate keys across delta dirs
    assert seen.select("url_key").distinct().count() == seen.count()


def test_robots_txt_bootstrap_parses_delay_and_disallow(spark, tmp_path, corpus):
    """CrawlJob bootstraps per-host politeness by parsing the corpus's
    /robots.txt documents: crawl-delay matches the generator ground
    truth and host_idx%4==1 hosts carry the /admin disallow, enforced
    end-to-end (seeded /admin URL dead-letters as 'disallowed')."""
    from spider_man_spark.sources.corpus import make_corpus

    c = make_corpus(
        spark, n_hosts=6, pages_per_host=4, out_degree=1, images_per_host=1,
        hot_hosts=0, crawl_delays=(0, 100, 200),
    ).cache()
    job = _job(spark, tmp_path, c)
    robots = {r.host: r for r in job.store.read_snapshot("robots", 0).collect()}
    # crawl-delay round-trips robots.txt text (seconds, fractional)
    assert robots["h0.test"].crawl_delay_ms == 0
    assert robots["h1.test"].crawl_delay_ms == 100
    assert robots["h2.test"].crawl_delay_ms == 200
    # Disallow: /admin present exactly on host_idx % 4 == 1
    assert robots["h1.test"].disallow_prefixes == ["/admin"]
    assert robots["h5.test"].disallow_prefixes == ["/admin"]
    assert robots["h0.test"].disallow_prefixes is None
    # enforced: an /admin URL on a disallowing host dead-letters
    job.insert_requests(["http://h1.test/admin/x", "http://h0.test/p/0"])
    job.step()
    dead = {r.url_key: r.reason for r in job.failed().collect()}
    assert dead.get("http://h1.test/admin/x") == "disallowed"


def test_page_features_table(spark, tmp_path, corpus):
    """page_features=True writes one feature row per fetched page per
    epoch (the crawl -> training-data bridge), consistent with the
    text-feature exprs over the same bodies."""
    from spider_man_spark.functions.text import fingerprint

    job = _job(spark, tmp_path, corpus, page_features=True)
    job.insert_requests(["http://h0.test/p/0", "http://h1.test/p/0"])
    job.run_until_zero()
    pf = job.page_features()
    rows = {r.url_key: r for r in pf.collect()}
    assert rows  # pages were fetched
    # one row per successfully fetched PAGE (images excluded)
    n_ok_pages = job.stats()["downloader"]["success"] - job.items().count()
    assert len(rows) == n_ok_pages
    for r in rows.values():
        assert r.n_chars > 0 and r.n_tokens > 0
        assert 0.0 <= r.quality <= 1.0
        assert r.lang in ("en", "unknown")
        assert r.fingerprint is not None
    # fingerprint matches the expr over the corpus body
    body = corpus.filter(F.col("url") == "http://h0.test/p/0").select(
        fingerprint(F.col("body").cast("string")).alias("fp")
    ).first().fp
    assert rows["http://h0.test/p/0"].fingerprint == body
