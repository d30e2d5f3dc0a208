"""Worked end-to-end example: the training-data half of the engine.

`readme_spider.py` walks the reference's crawl surface; this script
walks the beyond-reference surface a 100 TB training-data pipeline
needs, on a deterministic synthetic corpus (no network, no external
data):

1. **Featurize** every document (`with_text_features`: language,
   quality, token counts, fingerprint) and gate on quality/language —
   the standard pre-training filter pass, all JVM column expressions.
2. **Exact dedup** (`dedupe_exact`: one fingerprint hash-shuffle).
3. **Near dedup** (`minhash_lsh_pairs`: shingle -> minhash -> banded
   LSH self-join -> exact-Jaccard verify; candidates come from bucket
   equi-joins, never an all-pairs product), fold the pairs into
   transitive clusters (`dup_groups_from_pairs`: alternating
   large-star/small-star connected components, O(log n) rounds), and
   keep one canonical doc per cluster (`keep_canonical`).
4. **Embed** the survivors (deterministic hash-derived vectors here;
   swap in a real encoder's output column at scale — the pipeline
   only assumes `array<float>`).
5. **Index** the embeddings with the IVF family
   (`write_ivf_corpus`: k-means fit on a bounded sample, corpus
   written `partitionBy("centroid_id")` so the directory layout IS
   the index) and run a pruned nearest-neighbor query
   (`ann_topk_ivf_partitioned`) that reads only nprobe cells.

Every stage is a DataFrame -> DataFrame step: at scale the same
script runs unchanged with the synthetic corpus swapped for parquet
on object storage.

Run:  PYTHONPATH=. python examples/training_data_pipeline.py
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_man_spark.functions.text import with_text_features
from spider_man_spark.operators.groups import (
    dup_groups_from_pairs,
    keep_canonical,
)
from spider_man_spark.operators.similarity import (
    ann_topk_ivf_partitioned,
    write_ivf_corpus,
)
from spider_man_spark.operators.textdedup import (
    dedupe_exact,
    minhash_lsh_pairs,
)

N_BASE_DOCS = 120
N_EXACT_DUPS = 15
N_NEAR_DUPS = 10
N_JUNK = 8
EMB_DIM = 16


def build_documents(spark: SparkSession) -> DataFrame:
    """A deterministic corpus with planted exact duplicates, near
    duplicates (one word swapped), and junk rows the quality gate
    should drop."""
    topics = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a market update on grain prices shows steady demand for wheat",
        "researchers describe a new method for training compact models",
        "the city council approved funding for the harbor bridge repairs",
        "this recipe combines roasted garlic with slow cooked tomatoes",
    ]
    rows = []
    for i in range(N_BASE_DOCS):
        t = topics[i % len(topics)]
        rows.append((i, f"{t} and the archive entry number {i} "
                        f"records it for the daily report edition {i % 7}"))
    # exact duplicates of docs 0..N_EXACT_DUPS-1
    for j in range(N_EXACT_DUPS):
        rows.append((1000 + j, rows[j][1]))
    # near duplicates: one trailing word changed
    for j in range(N_NEAR_DUPS):
        rows.append((2000 + j, rows[j][1].rsplit(" ", 1)[0] + " revision"))
    # junk: too short / all punctuation — the quality gate's prey
    for j in range(N_JUNK):
        rows.append((3000 + j, "!!! ??? ###" if j % 2 else "ok"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def embed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in encoder: EMB_DIM hash-derived floats per
    document, built entirely JVM-side off the content fingerprint so
    identical texts embed identically.  A real pipeline replaces this
    one projection with its encoder's output column."""
    fp = F.xxhash64(F.col(text_col))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(fp, j), F.lit(10_000)).cast("double")
            / 5_000.0
            - 1.0
        ).cast("float"),
    )
    return df.withColumn("embedding", vec)


def run(spark: SparkSession, workdir: str) -> dict:
    docs = build_documents(spark)

    # 1. featurize + gate (pure column exprs; Catalyst prunes/pushes)
    feat = with_text_features(docs)
    kept = feat.filter(
        (F.col("quality") >= 0.4)
        & (F.col("lang_pred") == "en")
        & (F.col("n_tokens") >= 8)
    )

    # 2. exact dedup: one hash shuffle on the fingerprint
    uniq = dedupe_exact(kept, id_col="doc_id", text_col="text").cache()

    # 3. near dedup: LSH candidates + exact-Jaccard verify, then fold
    # pairs into TRANSITIVE clusters (a~b, b~c groups all three even
    # when (a,c) never collided) and keep one canonical doc per
    # cluster — min doc_id here; pass prefer= to keep e.g. the longest
    near = minhash_lsh_pairs(
        uniq, id_col="doc_id", text_col="text", threshold=0.8
    )
    groups = dup_groups_from_pairs(near, nodes=uniq.select("doc_id"))
    training = keep_canonical(uniq, groups, id_col="doc_id").cache()

    # 4-5. embed + IVF index-as-layout + pruned query
    corpus = embed(training).select("doc_id", "embedding")
    ivf_path = f"{workdir}/ivf_index"
    write_ivf_corpus(
        corpus, ivf_path, n_centroids=8, id_col="doc_id", seed=7,
        fit_sample_rows=10_000,
    )
    probe_doc = training.orderBy("doc_id").first()
    query = [float(x) for x in
             embed(spark.createDataFrame(
                 [(0, probe_doc.text)], "doc_id long, text string"
             )).first().embedding]
    neighbors = ann_topk_ivf_partitioned(
        spark, ivf_path, query, k=3, nprobe=2, id_col="doc_id"
    ).collect()

    return {
        "total_docs": docs.count(),
        "after_quality_gate": kept.count(),
        "after_exact_dedup": uniq.count(),
        "near_dup_pairs": near.count(),
        "training_docs": training.count(),
        "probe_doc_id": int(probe_doc.doc_id),
        "neighbors": [(int(r.doc_id), float(r.cosine)) for r in neighbors],
        "training": training,
    }


if __name__ == "__main__":
    from spider_man_spark.session import get_spark

    spark = get_spark(
        "training-data-pipeline", master="local[4]", shuffle_partitions=8
    )
    out = run(spark, tempfile.mkdtemp())
    for k, v in out.items():
        if k != "training":
            print(f"{k}: {v}")
