"""spark-submit entry point for a crawl job (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Package and run:

    cd /path/to/repo
    zip -qr /tmp/spider_man_spark.zip spider_man_spark
    spark-submit --master <cluster-master> \
        --py-files /tmp/spider_man_spark.zip \
        scripts/submit_crawl.py \
        --workdir /data/crawl1 --corpus /data/corpus.parquet \
        --seeds http://h0.test/p/0 http://h1.test/p/0 \
        --tokens-per-epoch 10000 --max-epochs 100

The session comes from spark-submit (no master set here); every
engine setting that matters at cluster scale (AQE, Arrow, no implicit
broadcasts) is applied via the normal config path.  With --corpus the
fetch is the deterministic corpus join (bench/test mode); without it
the real Arrow-batched HTTP fetcher is used.  Exits 0 and prints one
JSON line of final stats; the workdir is resumable (re-submit with the
same --workdir to continue from the last committed epoch).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description="Run a spider_man_spark crawl")
    ap.add_argument("--workdir", required=True,
                    help="state-table directory (resumable checkpoint)")
    ap.add_argument("--corpus", default=None,
                    help="parquet corpus for the deterministic stub fetch; "
                         "omit for real HTTP fetching")
    ap.add_argument("--seeds", nargs="*", default=[],
                    help="seed URLs (skipped when resuming a non-empty workdir)")
    ap.add_argument("--seeds-parquet", default=None,
                    help="parquet with a `url` column for large seed sets")
    ap.add_argument("--tokens-per-epoch", type=int, default=10)
    ap.add_argument("--max-epochs", type=int, default=1000)
    ap.add_argument("--max-per-epoch", type=int, default=0)
    ap.add_argument("--bloom", action="store_true",
                    help="enable the seen_shards Bloom layer")
    ap.add_argument("--cookies", action="store_true")
    ap.add_argument("--storage", default="table",
                    help="sink spec: table|jsonl|csv:h1,h2|log")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # master/executors come from spark-submit; engine defaults applied
    # on top of the submitted session's conf
    spark = SparkSession.builder.appName("spider_man_spark-crawl").getOrCreate()
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ):
        spark.conf.set(k, v)

    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob

    corpus = spark.read.parquet(args.corpus) if args.corpus else None
    cfg = CrawlConfig(
        workdir=args.workdir,
        tokens_per_epoch=args.tokens_per_epoch,
        max_epochs=args.max_epochs,
        max_per_epoch=args.max_per_epoch,
        bloom_enabled=args.bloom,
        cookies=args.cookies,
        storage=args.storage,
    )
    job = CrawlJob(spark, cfg, corpus=corpus)
    if job.store.last_epoch() < 0:
        if args.seeds:
            job.insert_requests(list(args.seeds))
        if args.seeds_parquet:
            job.insert_requests_df(spark.read.parquet(args.seeds_parquet))
    out = job.run_until_zero()
    stats = job.stats()
    print(json.dumps({
        "epochs": out["epochs"],
        "msec": out["msec"],
        "stats": {k: v for k, v in stats.items() if k != "status"},
        "throughput": job.throughput(),
    }, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
