"""Per-phase epoch profiler (guide §1: measure first, label your jobs).

Runs a frontier-leg-shaped crawl (CRAWL corpus, 640k standing frontier,
tokens=1000, mor or full mode) with Spark event logging on, then
attributes per-job wall time to the epoch phase that submitted it using
the job descriptions run_epoch sets.  Prints a JSON breakdown.

Usage: python scripts/profile_epoch.py [mode] [seeds_per_host] [epochs]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CRAWL, _seed_df  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "mor"
    sph = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    evdir = tempfile.mkdtemp(prefix="profile_evlog_")
    spark = get_spark(
        "profile-epoch", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = make_corpus(spark, **CRAWL).repartition(64, "url").cache()
    corpus.count()
    wd = tempfile.mkdtemp(prefix="profile_crawl_")
    job = CrawlJob(
        spark,
        CrawlConfig(
            workdir=wd, tokens_per_epoch=1000, max_epochs=epochs + 2,
            rank_salts=8, frontier_mode=mode,
        ),
        corpus=corpus,
    )
    job.insert_requests_df(_seed_df(spark, CRAWL["n_hosts"], sph))
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

    # parse the event log: job wall per description
    import collections
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
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stage_info[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                "tasks": si.get("Number of Tasks"),
            }
    by_desc = collections.Counter()
    n_by_desc = collections.Counter()
    for j in jobs.values():
        if "t1" not in j:
            continue
        d = j["desc"] or "(none)"
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
