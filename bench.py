"""Benchmark driver: crawl-engine throughput + headline queries.

Prints ONE JSON line:
  {"metric": ..., "value": <crawl bench sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {fetched, epochs, fetched_urls_per_sec, epoch_latency_ms}}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_SCALING  "1" -> additionally run the crawl at local[8]
                       and local[32] and report scaling efficiency
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

# crawl bench shape: 64 hosts (2 hot at 10x) x 1000 pages ~= 80k pages
CRAWL = dict(n_hosts=64, pages_per_host=1000, out_degree=4,
             images_per_host=8, hot_hosts=2)
CRAWL_TOKENS = 300
CRAWL_EPOCHS = 4
CRAWL_SEEDS_PER_HOST = 500  # large standing frontier: the metric is
                            # scheduling+fetch throughput, not BFS warmup


def crawl_bench(cpus: int) -> dict:
    """Run a fixed-shape synthetic crawl; returns throughput stats."""
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    spark = get_spark(
        f"bench-crawl-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = make_corpus(spark, **CRAWL).cache()
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
        seeds = [
            f"http://h{i}.test/p/{j}"
            for i in range(CRAWL["n_hosts"])
            for j in range(CRAWL_SEEDS_PER_HOST)
        ]
        job.insert_requests(seeds)
        t0 = time.monotonic()
        fetched = 0
        epoch_ms = []
        for _ in range(CRAWL_EPOCHS):
            r = job.step()
            fetched += r.scheduled
            epoch_ms.append(r.durations_ms["epoch"])
        wall = time.monotonic() - t0
        return {
            "cpus": cpus,
            "fetched": fetched,
            "epochs": CRAWL_EPOCHS,
            "wall_sec": round(wall, 3),
            "fetched_urls_per_sec": round(fetched / wall, 2),
            "epoch_latency_ms": int(sum(epoch_ms) / len(epoch_ms)),
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    queries = query_bench(sf_dir, cpus)
    crawl = crawl_bench(cpus)

    result = {
        "metric": "crawl_bench_wall_sec",
        "value": crawl["wall_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        lo = crawl_bench(8)
        hi = crawl if cpus == 32 else crawl_bench(32)
        eff = (hi["fetched_urls_per_sec"] / lo["fetched_urls_per_sec"]) / 4.0
        result["scaling"] = {
            "local8": lo,
            "local32": hi,
            "efficiency_8_to_32": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
