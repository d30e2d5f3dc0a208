"""Capture .explain("formatted") for the 10 bench queries into
plans/r08/<query>_<tag>.txt.  Run from the tree whose plans you want:

    python scripts/capture_plans.py <tag> <outdir> [sf_dir]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from spider_man_spark.session import get_spark

    spark = get_spark(f"plans-{tag}", master="local[8]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}_{tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
