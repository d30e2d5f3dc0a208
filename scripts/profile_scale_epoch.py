"""Per-phase profiler for the SCALE crawl shape (guide §1.5).

Mirrors bench.py's scale-leg config exactly (disk corpus, DISK_ONLY
fetched cache, 64 shuffle partitions, parallelismFirst) but with Spark
event logging on, then attributes per-job wall to the epoch phase that
submitted it.  Usage:

    python scripts/profile_scale_epoch.py <corpus_path> [master] [epochs]
"""
from __future__ import annotations

import collections
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    SCALE_CRAWL,
    SCALE_SEEDS_PER_HOST,
    SCALE_SHUFFLE_PARTITIONS,
    SCALE_TOKENS,
    _seed_df,
)


def main() -> None:
    corpus_path = sys.argv[1]
    master = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="profile_scale_evlog_")
    spark = get_spark(
        "profile-scale", master=master, shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.locality.wait": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    wd = tempfile.mkdtemp(prefix="profile_scale_crawl_")
    job = CrawlJob(
        spark,
        CrawlConfig(
            workdir=wd, tokens_per_epoch=SCALE_TOKENS,
            max_epochs=epochs + 1, rank_salts=8,
            shuffle_partitions=SCALE_SHUFFLE_PARTITIONS,
            fetched_storage="DISK_ONLY",
        ),
        corpus=corpus,
    )
    job.insert_requests_df(
        _seed_df(spark, SCALE_CRAWL["n_hosts"], SCALE_SEEDS_PER_HOST)
    )
    spark.range(256).repartition(128).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    walls = []
    for _ in range(epochs):
        t0 = time.monotonic()
        r = job.step()
        walls.append(round(time.monotonic() - t0, 3))
        print("epoch durations_ms:", r.durations_ms, flush=True)
    appid = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(evdir, appid)
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "t0": ev["Submission Time"],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stage_info[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0],
                "ms": si.get("Completion Time", 0)
                - si.get("Submission Time", 0),
                "tasks": si.get("Number of Tasks"),
            }
    by_desc = collections.Counter()
    n_by_desc = collections.Counter()
    for j in jobs.values():
        if "t1" not in j:
            continue
        d = j["desc"] or "(none)"
        # collapse per-epoch labels into the phase name
        d = d.split(": ", 1)[-1] if d.startswith("epoch ") else d
        by_desc[d] += j["t1"] - j["t0"]
        n_by_desc[d] += 1
    print("epoch walls:", walls)
    print(json.dumps(
        {
            "job_ms_by_desc": dict(by_desc.most_common()),
            "n_jobs_by_desc": dict(n_by_desc),
        },
        indent=1,
    ))
    top = sorted(stage_info.values(), key=lambda s: -s["ms"])[:25]
    print("top stages:")
    for s in top:
        print(f"  {s['ms']:>7} ms  {s['tasks']:>4} tasks  {s['name'][:100]}")


if __name__ == "__main__":
    main()
