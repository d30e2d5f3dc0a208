"""Microbench (guide §1): link-extraction cost over design-point bodies.

Times, over 300k synthetic ~4KB bodies (noop sink):
  A. current extract_requests regexes (href + imgsrc + caption)
  B. split-based extraction (split on literal marker, substring_index)
  C. canonicalize_frontier over the exploded links (regex parser)
and checks B == A row-for-row on this corpus.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

from pyspark.sql import functions as F  # noqa: E402

from bench import SCALE_CRAWL  # noqa: E402
from spider_man_spark.session import get_spark  # noqa: E402
from spider_man_spark.sources.corpus import make_corpus  # noqa: E402
from spider_man_spark.sources.parse import HREF_RE, IMGSRC_RE, CAPTION_RE  # noqa: E402


def main() -> None:
    spark = get_spark("micro-parse", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shape = dict(SCALE_CRAWL)
    shape["n_hosts"] = 16
    shape["pages_per_host"] = 20000
    corpus = (
        make_corpus(spark, **shape)
        .filter(F.col("content_type") == "text/html")
        .select("url", "body")
        .persist()
    )
    n = corpus.count()
    print("bodies:", n)
    body_str = F.col("body").cast("string")

    cur = corpus.select(
        F.regexp_extract_all(body_str, F.lit(HREF_RE), F.lit(1)).alias("hrefs"),
        F.regexp_extract_all(body_str, F.lit(IMGSRC_RE), F.lit(1)).alias("imgs"),
        F.regexp_extract(body_str, CAPTION_RE, 1).alias("caption"),
    )

    # split-based: drop the first split piece (before the first marker),
    # take up to the closing quote of each subsequent piece; filter any
    # piece without a closing quote or with an empty capture (regex
    # [^"]+ requires >=1 char and a closing quote)
    def split_extract(marker: str) -> F.Column:
        parts = F.split(body_str, marker)
        tails = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
        vals = F.transform(
            tails,
            lambda t: F.when(
                F.instr(t, '"') > 1, F.substring_index(t, '"', 1)
            ),
        )
        return F.filter(vals, lambda v: v.isNotNull())

    spl = corpus.select(
        split_extract('href="').alias("hrefs"),
        split_extract('<img src="').alias("imgs"),
        F.when(
            F.instr(body_str, '<p class="caption">') > 0,
            F.substring_index(
                F.substring_index(body_str, '<p class="caption">', -1),
                "</p>", 1,
            ),
        ).otherwise(F.lit("")).alias("caption"),
    )

    def timeit(name, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.monotonic() - t0:.2f}s", flush=True)

    for rep in range(2):
        timeit(f"A regex extract (rep{rep})", cur)
        timeit(f"B split extract (rep{rep})", spl)

    # equality on this corpus
    diff = (
        corpus.select(
            (F.regexp_extract_all(body_str, F.lit(HREF_RE), F.lit(1))
             == split_extract('href="')).alias("e1"),
            (F.regexp_extract_all(body_str, F.lit(IMGSRC_RE), F.lit(1))
             == split_extract('<img src="')).alias("e2"),
        )
        .agg(
            F.sum(F.when(F.col("e1") & F.col("e2"), 0).otherwise(1)).alias("n")
        )
        .first()
    )
    print("rows differing:", diff.n)

    # canonicalize cost over the exploded links
    from spider_man_spark.functions.urls import canonicalize_frontier

    links = corpus.select(
        F.explode(
            F.regexp_extract_all(body_str, F.lit(HREF_RE), F.lit(1))
        ).alias("url")
    ).select(
        F.col("url").alias("url_key"), "url",
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("int").alias("host_salt"),
        F.lit(None).cast("long").alias("url_hash"),
        F.lit(0).alias("depth"), F.lit(0).alias("priority"),
        F.lit(3).alias("retries"),
        F.lit(None).cast("string").alias("flag"),
        F.lit(None).cast("map<string,string>").alias("options"),
    ).persist()
    nl = links.count()
    print("links:", nl)
    for rep in range(2):
        t0 = time.monotonic()
        canonicalize_frontier(links).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"C canonicalize (rep{rep}): {time.monotonic() - t0:.2f}s",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
