"""Microbench: canonicalize_url / canonicalize_frontier variants.

Measures the admit path's per-row canonicalization cost (guide §1.4:
noop-isolated, §4 boundary-free — all JVM exprs) and A/Bs candidate
restructurings for BIT-IDENTITY against the shipped form before any
swap.  Usage: python scripts/micro_canonicalize.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spider_man_spark.functions.urls import (  # noqa: E402
    canonicalize_frontier,
)
from spider_man_spark.session import get_spark  # noqa: E402


def synth_urls(spark, n):
    """URL mix shaped like the crawl's admit path: hosts with ports,
    queries (unsorted), fragments, relative and non-web schemes."""
    h = F.pmod(F.xxhash64("id"), F.lit(1000))
    path = F.concat(
        F.lit("/p/"), (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000))).cast("string")
    )
    q = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10))
    url = F.concat(
        F.lit("http"),
        F.when(F.pmod(h, F.lit(2)) == 0, F.lit("s")).otherwise(F.lit("")),
        F.lit("://host"),
        h.cast("string"),
        F.when(F.pmod(h, F.lit(7)) == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit(".example.com"),
        path,
        F.when(q < 3, F.concat(F.lit("?b=2&a="), q.cast("string")))
        .otherwise(F.lit("")),
        F.when(F.pmod(h, F.lit(5)) == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return spark.range(n).select(
        url.alias("url"),
        url.alias("url_key"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("priority"),
        F.lit(3).alias("retries"),
        F.lit(None).cast("string").alias("flag"),
        F.lit(None).cast("map<string,string>").alias("options"),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("micro-canon", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = synth_urls(spark, n).cache()
    base.count()

    # warmup
    noop(base)

    t0 = time.monotonic()
    noop(base)
    t_scan = time.monotonic() - t0
    print(f"scan-only: {t_scan:.2f}s")

    for label in ("shipped", "shipped2"):
        out = canonicalize_frontier(base, None, 32)
        t0 = time.monotonic()
        noop(out)
        print(f"canonicalize_frontier[{label}]: {time.monotonic() - t0:.2f}s")

    # digest of the shipped output (compare against any variant)
    d = (
        canonicalize_frontier(base, None, 32)
        .select(
            F.sum(
                F.xxhash64("url", "url_key", "host", "host_salt", "url_hash")
                .cast("decimal(38,0)")
            ).alias("d")
        )
        .first()
        .d
    )
    print(f"digest: {hex(int(d) & 0xFFFFFFFFFFFFFFFF)}")
    spark.stop()


if __name__ == "__main__":
    main()
