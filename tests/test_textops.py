"""Training-data text ops + dedup sketches + similarity search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_man_spark.functions.sketches import (
    jaccard,
    simhash64_of,
    word_shingles,
)
from spider_man_spark.functions.text import with_text_features
from spider_man_spark.operators.similarity import (
    ann_topk_lsh,
    ann_topk_lsh_batch,
    ann_topk_lsh_partitioned,
    brute_force_dup_pairs,
    cosine_topk,
    embedding_dup_pairs,
    random_planes,
    write_bucketed_corpus,
)
from spider_man_spark.operators.textdedup import (
    dedupe_exact,
    exact_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog in the park today"),
    (1, "the quick brown fox jumps over the lazy dog in the park today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat in the park today"),  # near dup
    (3, "completely different content about database query optimization"),
    (4, "spark is a unified analytics engine for large scale data"),
    (5, "The  Quick  Brown  Fox jumps over the lazy dog in the park today"),  # ws/case dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def test_text_features(spark, docs):
    feats = {r.doc_id: r for r in with_text_features(docs).collect()}
    assert feats[0].n_tokens == 13
    assert feats[0].lang_pred == "en"  # 'the'/'in' stopwords present
    assert feats[3].lang_pred == "unknown"
    assert 0 <= feats[0].quality <= 1
    # normalization folds case+whitespace: fingerprints equal
    assert feats[0].fingerprint == feats[5].fingerprint
    assert feats[0].fingerprint != feats[2].fingerprint
    # empty-text edge
    empty = spark.createDataFrame([(9, "")], "doc_id int, text string")
    e = with_text_features(empty).first()
    assert e.n_tokens == 0 and e.n_bpe_tokens == 0 and e.quality is not None


def test_dedupe_exact_and_pairs(spark, docs):
    kept = sorted(r.doc_id for r in dedupe_exact(docs).collect())
    assert kept == [0, 2, 3, 4]  # 1 and 5 are dups of 0
    pairs = sorted(
        (r.id_a, r.id_b) for r in exact_dup_pairs(docs).collect()
    )
    assert pairs == [(0, 1), (0, 5), (1, 5)]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, shingle_k=2, num_perm=64, bands=16, threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got  # exact dup always collides
    assert (0, 2) in got or (1, 2) in got  # near dup (1-word diff)
    assert not any({a, b} == {3, 4} for a, b in got)
    for r in pairs:
        if (r.id_a, r.id_b) == (0, 1):
            assert r.jaccard == 1.0


def test_minhash_jaccard_estimate_accuracy(spark, docs):
    """Signature agreement rate approximates true Jaccard."""
    from spider_man_spark.functions.sketches import minhash_signature

    sk = docs.select(
        "doc_id", word_shingles(F.col("text"), 2).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), 128))
    rows = {r.doc_id: r for r in sk.collect()}
    true_j = (
        docs.alias("a")
        .crossJoin(docs.alias("b"))
        .filter((F.col("a.doc_id") == 0) & (F.col("b.doc_id") == 2))
        .select(
            jaccard(
                word_shingles(F.col("a.text"), 2),
                word_shingles(F.col("b.text"), 2),
            ).alias("j")
        )
        .first()
        .j
    )
    est = np.mean(
        [a == b for a, b in zip(rows[0].sig, rows[2].sig)]
    )
    assert abs(est - true_j) < 0.15


def test_simhash_near_dup(spark, docs):
    d01 = bin(simhash64_of(DOCS[0][1]) ^ simhash64_of(DOCS[2][1])).count("1")
    d03 = bin(simhash64_of(DOCS[0][1]) ^ simhash64_of(DOCS[3][1])).count("1")
    assert d01 < d03  # near-dup closer than unrelated
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(docs, max_hamming=6).collect()
    }
    assert (0, 1) in pairs and (0, 5) in pairs
    assert not any({a, b} == {3, 4} for a, b in pairs)


def test_ngram_jaccard_pairs_exact(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=4, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert not any({a, b} == {3, 4} for (a, b) in pairs)


# ---------------- embeddings / ANN ----------------

@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16)).astype("float32")
    base[7] = base[3] + rng.standard_normal(16).astype("float32") * 0.01  # near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return (
        spark.createDataFrame(rows, "vec_id int, embedding array<float>").cache(),
        base,
    )


def test_cosine_topk_matches_numpy(spark, vectors):
    df, base = vectors
    q = [float(x) for x in base[3]]
    got = [r.vec_id for r in cosine_topk(df, q, k=5).collect()]
    sims = base @ base[3] / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(base[3])
    )
    want = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
    assert got[0] == 3 and got[1] == 7  # self, then the near-dup
    assert set(got) == set(int(i) for i in want)


def test_ann_lsh_recall(spark, vectors):
    df, base = vectors
    q = [float(x) for x in base[3]]
    planes = random_planes(16, n_planes=8)
    got = [r.vec_id for r in ann_topk_lsh(df, q, k=3, planes=planes,
                                          probe_hamming=2).collect()]
    assert 3 in got and 7 in got  # near-identical vectors share buckets


def test_ann_batch_equals_per_query_loop(spark, vectors):
    """ann_topk_lsh_batch(N queries) == N x ann_topk_lsh(one query):
    identical (qid -> [(vec_id, cosine)]) maps — the batch bucket
    equi-join + window rank is a pure re-plan of the per-query
    filter+limit, not a different algorithm."""
    df, base = vectors
    # double everywhere: the per-query path promotes to float64 via
    # its double query literals, so the batch side must match
    df = df.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    planes = random_planes(16, n_planes=8)
    qids = [0, 3, 11, 25]
    queries = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    batch = {}
    for r in ann_topk_lsh_batch(
        queries, df, k=4, planes=planes, probe_hamming=2
    ).collect():
        batch.setdefault(r.qid, []).append((r.vec_id, r.cosine))
    for qid in qids:
        q = [float(x) for x in base[qid]]
        loop = [
            (r.vec_id, r.cosine)
            for r in ann_topk_lsh(
                df, q, k=4, planes=planes, probe_hamming=2
            ).collect()
        ]
        assert batch[qid] == loop, f"qid {qid}"


def test_embedding_dup_pairs_lsh_vs_brute(spark, vectors):
    df, _ = vectors
    brute = {
        (r.id_a, r.id_b) for r in brute_force_dup_pairs(df, 0.99).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(df, 0.99, dim=16).collect()
    }
    assert brute == {(3, 7)}
    assert lsh == brute
def test_ann_partitioned_equals_computed(spark, vectors, tmp_path):
    """A bucket-partitioned corpus (write_bucketed_corpus) answers the
    same top-k as the computed-bucket path with the same planes, AND
    the probe reads only the probed buckets' files (partition pruning
    at file-listing time — the docstring's at-scale latency claim)."""
    import os

    from pyspark.sql import functions as F

    df, base = vectors
    planes = random_planes(16, n_planes=8)
    path = str(tmp_path / "bucketed")
    write_bucketed_corpus(df, path, planes=planes)
    total_files = sum(
        1 for root, _d, files in os.walk(path)
        for f in files if f.endswith(".parquet")
    )
    for qid in (3, 11, 25):
        q = [float(x) for x in base[qid]]
        want = [
            (r.vec_id, r.cosine)
            for r in ann_topk_lsh(
                df, q, k=4, planes=planes, probe_hamming=1
            ).collect()
        ]
        got = [
            (r.vec_id, r.cosine)
            for r in ann_topk_lsh_partitioned(
                spark, path, q, k=4, planes=planes, probe_hamming=1
            ).collect()
        ]
        assert got == want, f"qid {qid}"
    # pruning evidence: the probed scan touches <= 9 bucket files
    # (1 + 8 Hamming-1 probes) out of every written bucket
    import numpy as np

    q = [float(x) for x in base[3]]
    qbits = (planes @ np.asarray(q) > 0).astype(np.int64)
    qbucket = int((qbits << np.arange(len(planes))).sum())
    buckets = [qbucket] + [qbucket ^ (1 << i) for i in range(8)]
    scanned = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert scanned <= 9 < total_files


def test_ann_batch_bucketed_table_equals_plain(spark, vectors):
    """Batch ANN over a Hive-bucketed corpus table == the plain batch
    path (same planes -> identical top-k), with one FEWER exchange in
    the physical plan: the corpus side arrives pre-shuffled from the
    bucketBy layout, so only the query side and the window rank
    shuffle."""
    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import (
        ann_topk_lsh_batch_bucketed,
        save_bucketed_corpus_table,
    )

    df, base = vectors
    df = df.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    planes = random_planes(16, n_planes=8)
    table = "ann_bucketed_test_corpus"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    save_bucketed_corpus_table(df, table, n_buckets=8, planes=planes)
    try:
        queries = df.filter(F.col("vec_id").isin([0, 3, 25])).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        plain = ann_topk_lsh_batch(
            queries, df, k=4, planes=planes, probe_hamming=2
        )
        bucketed = ann_topk_lsh_batch_bucketed(
            spark, table, queries, k=4, planes=planes, probe_hamming=2
        )

        def collect_map(res):
            out = {}
            for r in res.collect():
                out.setdefault(r.qid, []).append((r.vec_id, r.cosine))
            return out

        assert collect_map(bucketed) == collect_map(plain)
        # exchange-count evidence (collect first: AQE finalizes plans)
        def n_exchanges(res):
            plan = res._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange hashpartitioning")

        assert n_exchanges(bucketed) < n_exchanges(plain)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ann_ivf_recall_and_pruning(spark, vectors):
    """IVF index: the nprobe-nearest-cells scan finds the planted
    near-dup pair, full-probe (nprobe = n_centroids) equals brute
    top-k exactly, and the probe touches only a subset of cells."""
    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import ann_topk_ivf, ivf_index

    df, base = vectors
    indexed, centroids = ivf_index(df, n_centroids=8, seed=7)
    indexed = indexed.cache()
    q = [float(x) for x in base[3]]
    got = [r.vec_id for r in ann_topk_ivf(
        indexed, centroids, q, k=3, nprobe=2
    ).collect()]
    assert got[0] == 3 and 7 in got  # self + the planted near-dup
    # full probe == brute-force ordering
    full = [r.vec_id for r in ann_topk_ivf(
        indexed, centroids, q, k=5, nprobe=8
    ).collect()]
    brute = [r.vec_id for r in cosine_topk(df, q, k=5).collect()]
    assert full == brute
    # the nprobe=2 scan actually restricted cells
    assert indexed.select("centroid_id").distinct().count() > 2


def test_ann_ivf_partitioned_equals_computed(spark, vectors, tmp_path):
    """An IVF-partitioned corpus (write_ivf_corpus) answers the same
    top-k as the in-memory indexed path with the same centroids, the
    centroid sidecar round-trips, and the probe reads only the probed
    cells' files (partition pruning at file-listing time — the same
    layout-as-index claim the LSH family proves)."""
    import os

    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_partitioned,
        ivf_index,
        load_ivf_centroids,
        write_ivf_corpus,
    )

    df, base = vectors
    path = str(tmp_path / "ivf")
    centroids = write_ivf_corpus(df, path, n_centroids=8, seed=7)
    assert np.allclose(load_ivf_centroids(spark, path), centroids)
    total_files = sum(
        1 for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and "_ivf_centroids" not in root
    )
    indexed, _ = ivf_index(df, n_centroids=8, seed=7)
    for qid in (3, 11, 25):
        q = [float(x) for x in base[qid]]
        want = [
            (r.vec_id, r.cosine)
            for r in ann_topk_ivf(
                indexed, centroids, q, k=4, nprobe=3
            ).collect()
        ]
        got = [
            (r.vec_id, r.cosine)
            for r in ann_topk_ivf_partitioned(
                spark, path, q, k=4, nprobe=3
            ).collect()
        ]
        assert got == want, f"qid {qid}"
    # pruning evidence: the nprobe=3 scan touches <= 3 cell files out
    # of every written cell
    q = [float(x) for x in base[3]]
    qv = np.asarray(q)
    cn = np.linalg.norm(centroids, axis=1)
    cn[cn == 0] = 1.0
    sims = centroids @ qv / (cn * np.linalg.norm(qv))
    probe = [int(i) for i in np.argsort(-sims)[:3]]
    scanned = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(probe))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert scanned <= 3 < total_files


def test_ivf_sampled_fit_stays_exact_at_full_probe(spark, vectors):
    """With fit_sample_rows below the corpus size the k-means fit runs
    on a seeded sample — centroid quality may shift, but full-probe
    search must STILL equal brute force exactly (the integrity
    invariant: cells partition the corpus, so probing all of them is
    an exact scan regardless of how good the centroids are)."""
    from spider_man_spark.operators.similarity import ann_topk_ivf, ivf_index

    df, base = vectors
    indexed, centroids = ivf_index(
        df, n_centroids=4, seed=7, fit_sample_rows=20
    )
    assert indexed.count() == 40  # assignment is always the full corpus
    q = [float(x) for x in base[11]]
    full = [r.vec_id for r in ann_topk_ivf(
        indexed, centroids, q, k=5, nprobe=4
    ).collect()]
    brute = [r.vec_id for r in cosine_topk(df, q, k=5).collect()]
    assert full == brute


def test_ivf_fit_makes_one_corpus_pass(spark):
    """The k-means FIT path inside ivf_index must stream the corpus
    exactly ONCE (the hash-top-k sample extraction, which KMeans then
    persists) — no separate count() job (the pre-round-7 code paid a
    full count pass just to derive a sample fraction; at 10^9 rows
    that's an extra full scan per index build).  Counted by an
    accumulator on a mapInPandas wrapper so every materialization of
    the corpus is visible, whatever job it belongs to."""
    from spider_man_spark.operators.similarity import ivf_index

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = df.mapInPandas(count_rows, df.schema)
    indexed, centroids = ivf_index(
        instrumented, n_centroids=4, seed=7, fit_sample_rows=20
    )
    fit_rows_streamed = acc.value
    # one pass = 60 corpus rows; the old count() pre-pass made it 120
    assert fit_rows_streamed == 60, fit_rows_streamed
    # assignment still covers the full corpus and fit quality is moot
    # at full probe (integrity covered by the sampled-fit test above)
    assert indexed.count() == 60
    assert len(centroids) == 4


def test_ann_batch_bucketed_custom_corpus_cols(spark, vectors):
    """A corpus table saved under non-default id/vec column names is
    readable by ann_topk_lsh_batch_bucketed via its id_col /
    corpus_vec_col params (output schema stays qid/vec_id/cosine)."""
    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import (
        ann_topk_lsh_batch,
        ann_topk_lsh_batch_bucketed,
        save_bucketed_corpus_table,
    )

    df, base = vectors
    df = df.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    renamed = df.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("emb")
    )
    planes = random_planes(16, n_planes=8)
    table = "ann_bucketed_custom_cols"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    save_bucketed_corpus_table(
        renamed, table, n_buckets=8, id_col="doc_id", vec_col="emb",
        planes=planes,
    )
    try:
        queries = df.filter(F.col("vec_id").isin([0, 25])).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        plain = ann_topk_lsh_batch(
            queries, df, k=4, planes=planes, probe_hamming=2
        )
        bucketed = ann_topk_lsh_batch_bucketed(
            spark, table, queries, k=4, planes=planes, probe_hamming=2,
            id_col="doc_id", corpus_vec_col="emb",
        )

        def collect_map(res):
            out = {}
            for r in res.collect():
                out.setdefault(r.qid, []).append((r.vec_id, r.cosine))
            return out

        assert collect_map(bucketed) == collect_map(plain)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS ann_bucketed_custom_cols")


def test_ann_ivf_batch_full_probe_equals_brute(spark, vectors):
    """Batch IVF at full probe (nprobe = n_centroids) must equal the
    per-query brute-force top-k exactly; at a pruned nprobe it must
    equal the per-query ann_topk_ivf loop over the same index."""
    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_batch,
        ivf_index,
    )

    df, base = vectors
    indexed, centroids = ivf_index(df, n_centroids=8, seed=7)
    indexed = indexed.cache()
    queries = df.filter(F.col("vec_id").isin([0, 3, 25])).select(
        F.col("vec_id").alias("qid"), "embedding"
    )

    def collect_map(res):
        out = {}
        for r in res.collect():
            out.setdefault(r.qid, []).append((r.vec_id, r.cosine))
        return out

    full = collect_map(
        ann_topk_ivf_batch(queries, indexed, centroids, k=4, nprobe=8)
    )
    for qid in (0, 3, 25):
        q = [float(x) for x in base[qid]]
        brute = [(r.vec_id, r.cosine) for r in cosine_topk(df, q, k=4).collect()]
        assert full[qid] == brute, f"qid {qid} full-probe"

    pruned = collect_map(
        ann_topk_ivf_batch(queries, indexed, centroids, k=4, nprobe=2)
    )
    for qid in (0, 3, 25):
        q = [float(x) for x in base[qid]]
        want = [
            (r.vec_id, r.cosine)
            for r in ann_topk_ivf(indexed, centroids, q, k=4, nprobe=2).collect()
        ]
        assert pruned[qid] == want, f"qid {qid} nprobe=2"


def test_ann_ivf_batch_bucketed_table_equals_plain(spark, vectors):
    """Batch IVF over a Hive-bucketed corpus table == the plain batch
    path (same centroids -> identical top-k), with one FEWER exchange
    in the physical plan (corpus side pre-shuffled by the bucketBy
    layout), and the companion centroid table round-trips."""
    import numpy as np
    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import (
        ann_topk_ivf_batch,
        ann_topk_ivf_batch_bucketed,
        ivf_index,
        load_ivf_table_centroids,
        save_ivf_corpus_table,
    )

    df, base = vectors
    table = "ann_ivf_bucketed_test_corpus"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_centroids")
    cents = save_ivf_corpus_table(df, table, n_centroids=8, n_buckets=8,
                                  seed=7)
    try:
        assert np.allclose(load_ivf_table_centroids(spark, table), cents)
        indexed, cents2 = ivf_index(df, n_centroids=8, seed=7)
        assert np.allclose(cents, cents2)  # same seed -> same fit
        queries = df.filter(F.col("vec_id").isin([0, 3, 25])).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        plain = ann_topk_ivf_batch(queries, indexed, cents, k=4, nprobe=3)
        bucketed = ann_topk_ivf_batch_bucketed(
            spark, table, queries, k=4, nprobe=3
        )

        def collect_map(res):
            out = {}
            for r in res.collect():
                out.setdefault(r.qid, []).append((r.vec_id, r.cosine))
            return out

        assert collect_map(bucketed) == collect_map(plain)

        def n_exchanges(res):
            plan = res._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange hashpartitioning")

        assert n_exchanges(bucketed) < n_exchanges(plain)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_centroids")
