"""Microbench (guide §1): HOF aggregate/zip_with dot products vs an
unrolled getItem chain — same fold order, so results are bit-identical;
the question is only whole-stage-codegen speed.

Times, over a 500k x 64-dim synthesized corpus (noop sink):
  A. rp_lsh_bucket via HOF _dot_lit (current)
  B. rp_lsh_bucket via unrolled chain
  C. pairwise cosine_sim_cols HOF on a self-join sample
  D. pairwise cosine via unrolled chain
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spider_man_spark.operators.similarity import (  # noqa: E402
    _dot_lit,
    random_planes,
    rp_lsh_bucket,
    cosine_sim_cols,
    vec_norm,
)
from spider_man_spark.session import get_spark  # noqa: E402

N = 500_000
DIM = 64


def unrolled_dot_lit(vec_col, v):
    acc = F.lit(0.0)
    for i, x in enumerate(v):
        acc = acc + vec_col[i] * F.lit(float(x))
    return acc


def unrolled_bucket(vec_col, planes):
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = (unrolled_dot_lit(vec_col, list(p)) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def unrolled_cos_cols(a, b, dim):
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    dot = F.lit(0.0)
    na = F.lit(0.0)
    nb = F.lit(0.0)
    for i in range(dim):
        dot = dot + a[i] * b[i]
        na = na + a[i] * a[i]
        nb = nb + b[i] * b[i]
    return F.round(dot / (F.sqrt(na) * F.sqrt(nb)), 6)


def main() -> None:
    spark = get_spark("micro-dot", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    planes = random_planes(DIM, n_planes=16)

    def coord(j):
        return (
            F.pmod(F.xxhash64(F.col("id") * DIM + j, F.lit(1)), F.lit(100_000))
            .cast("double") / 50_000.0 - 1.0
        )

    corpus = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), coord).alias(
            "embedding"
        ),
    ).persist()
    corpus.count()

    def timeit(name, df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.monotonic() - t0:.2f}s", flush=True)

    for rep in range(2):
        timeit(
            f"A hof bucket (rep{rep})",
            corpus.select(
                "vec_id", rp_lsh_bucket(F.col("embedding"), planes).alias("b")
            ),
        )
        timeit(
            f"B unrolled bucket (rep{rep})",
            corpus.select(
                "vec_id", unrolled_bucket(F.col("embedding"), planes).alias("b")
            ),
        )

    # pairwise: join on a coarse key to produce ~5M candidate pairs
    a = corpus.withColumn("k", F.col("vec_id") % 50_000).alias("a")
    b = corpus.withColumn("k", F.col("vec_id") % 50_000).alias("b")
    pairs = a.join(b, "k").select(
        F.col("a.embedding").alias("va"), F.col("b.embedding").alias("vb")
    ).persist()
    n = pairs.count()
    print(f"pairs: {n}")
    for rep in range(2):
        timeit(
            f"C hof cosine (rep{rep})",
            pairs.select(cosine_sim_cols(F.col("va"), F.col("vb")).alias("c")),
        )
        timeit(
            f"D unrolled cosine (rep{rep})",
            pairs.select(unrolled_cos_cols(F.col("va"), F.col("vb"), DIM).alias("c")),
        )
    # equality check: results must be bit-identical
    cmp = pairs.select(
        (cosine_sim_cols(F.col("va"), F.col("vb"))
         == unrolled_cos_cols(F.col("va"), F.col("vb"), DIM)).alias("eq")
    ).agg(F.sum(F.when(F.col("eq"), 0).otherwise(1)).alias("n_diff")).first()
    print("cosine n_diff:", cmp.n_diff)
    cmpb = corpus.select(
        (rp_lsh_bucket(F.col("embedding"), planes)
         == unrolled_bucket(F.col("embedding"), planes)).alias("eq")
    ).agg(F.sum(F.when(F.col("eq"), 0).otherwise(1)).alias("n_diff")).first()
    print("bucket n_diff:", cmpb.n_diff)
    spark.stop()


if __name__ == "__main__":
    main()
