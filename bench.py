"""Benchmark driver: crawl-engine throughput + headline queries.

Prints ONE JSON line:
  {"metric": ..., "value": <crawl bench sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {fetched, epochs, fetched_urls_per_sec, epoch_latency_ms}}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_SCALING  "1" -> additionally run the same crawl on 2x4
                       and 8x4 SEPARATE executor JVMs (local-cluster)
                       and report N->4N scaling efficiency + the
                       cross-parallelism schedule digest
                       (the two-cluster-size evidence for BASELINE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "politeness_rank",
    "frontier_dedup",
    "token_count",
    "minhash_lsh_dupes",
    "simhash_dupes",
    "embedding_topk",
    "windowed_throughput",
]

# crawl bench shape: 64 hosts (2 hot at 10x) x 3000 pages ~= 250k pages.
# Sized so executor compute (parse + canonicalize + dedup over ~1M
# candidate URLs/epoch) dominates the driver's fixed per-epoch cost —
# otherwise scaling efficiency measures scheduler overhead, not the
# engine.
CRAWL = dict(n_hosts=64, pages_per_host=10000, out_degree=8,
             images_per_host=64, hot_hosts=2, crawl_delays=(0,))
CRAWL_TOKENS = 8000
CRAWL_EPOCHS = 3
CRAWL_SEEDS_PER_HOST = 10000  # large standing frontier: the metric is
                              # scheduling+fetch throughput, not BFS warmup


def crawl_bench(master: str, cores: int) -> dict:
    """Run a fixed-shape synthetic crawl; returns throughput stats.

    ``master`` may be ``local[N]`` (single JVM) or
    ``local-cluster[N,C,M]`` (separate executor JVMs — the honest
    multi-executor scaling mode).  Shuffle partitions are FIXED so
    both scaling legs run the identical plan; only resources differ.
    """
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    spark = get_spark(
        f"bench-crawl-{cores}", master=master, shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    # pre-partition the corpus by the fetch-join key: the cached
    # partitioning is visible to Catalyst, so the per-epoch fetch join
    # shuffles only the (much smaller) scheduled side
    corpus = make_corpus(spark, **CRAWL).repartition(64, "url").cache()
    corpus.count()
    wd = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        job = CrawlJob(
            spark,
            CrawlConfig(
                workdir=wd, tokens_per_epoch=CRAWL_TOKENS,
                max_epochs=CRAWL_EPOCHS + 1, rank_salts=8,
            ),
            corpus=corpus,
        )
        # distributed seed generation (a 10^10 frontier never transits
        # the driver)
        from pyspark.sql import functions as F

        n_hosts = CRAWL["n_hosts"]
        seeds = spark.range(n_hosts * CRAWL_SEEDS_PER_HOST).select(
            F.format_string(
                "http://h%d.test/p/%d",
                (F.col("id") % n_hosts).cast("int"),
                (F.col("id") / n_hosts).cast("int"),
            ).alias("url")
        )
        job.insert_requests_df(seeds)
        t0 = time.monotonic()
        fetched = 0
        epoch_ms = []
        for _ in range(CRAWL_EPOCHS):
            r = job.step()
            fetched += r.scheduled
            epoch_ms.append(r.durations_ms["epoch"])
        wall = time.monotonic() - t0
        # determinism evidence: order-insensitive distributed digest of
        # the admitted (epoch, url_key) set — must be identical across
        # parallelism levels (never collected to the driver)
        from pyspark.sql import functions as F

        seen = job.store.read_deltas("seen", CRAWL_EPOCHS)
        total = seen.select(
            # decimal accumulator: a raw long sum overflows under ANSI
            F.sum(F.xxhash64("epoch", "url_key").cast("decimal(38,0)")).alias("d")
        ).first().d
        digest = hex(int(total) & 0xFFFFFFFFFFFFFFFF)
        return {
            "master": master,
            "cores": cores,
            "fetched": fetched,
            "epochs": CRAWL_EPOCHS,
            "wall_sec": round(wall, 3),
            "fetched_urls_per_sec": round(fetched / wall, 2),
            "epoch_latency_ms": int(sum(epoch_ms) / len(epoch_ms)),
            "schedule_digest": digest,
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def query_bench(sf_dir: str, cpus: int) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from spider_man_spark.session import get_spark

    spark = get_spark(
        f"bench-queries-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    qs = entrymod.queries()
    try:
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).collect()
            out[name] = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()
    return out


def _crawl_bench_subprocess(master: str, cores: int) -> dict:
    """Run one crawl leg in a FRESH process: a stopped local-mode
    SparkContext leaves its JVM (heap, metaspace, tmpfs scratch)
    attached to the current process, which contaminates a second leg's
    timings — each parallelism level must measure from a cold JVM."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--crawl-leg", master,
         str(cores)],
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "32g")},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # bench corpora are GB-scale cached; size the single local JVM heap
    # accordingly (must be set before the first session starts)
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    if len(sys.argv) == 4 and sys.argv[1] == "--crawl-leg":
        print(json.dumps(crawl_bench(sys.argv[2], int(sys.argv[3]))))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    queries = query_bench(sf_dir, cpus)
    crawl = _crawl_bench_subprocess(f"local[{cpus}]", cpus)

    result = {
        "metric": "crawl_bench_wall_sec",
        "value": crawl["wall_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # N vs 4N EXECUTORS (separate JVMs): 2x4 cores vs 8x4 cores —
        # the north_rule's two-cluster-size criterion, evidenced with
        # real executor processes rather than threads in one JVM
        lo = _crawl_bench_subprocess("local-cluster[2,4,6144]", 8)
        hi = _crawl_bench_subprocess("local-cluster[8,4,6144]", 32)
        eff = (hi["fetched_urls_per_sec"] / lo["fetched_urls_per_sec"]) / 4.0
        result["scaling"] = {
            "executors_2x4": lo,
            "executors_8x4": hi,
            "efficiency_N_to_4N": round(eff, 3),
            "schedule_digest_match": lo["schedule_digest"] == hi["schedule_digest"],
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
