"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship smoke; each ``queries()[name]`` runs
at sf=0.01 against the DuckDB ``oracle_sql()[name]`` (row-count +
schema + order-insensitive value-hash).  Every implemented operator
from SURVEY.md §2 that is SQL-expressible gets an oracle; genuinely
non-SQL ops (LSH sketches with engine-specific hashes, ANN probing)
are listed without one (weaker rows-only check, as the driver allows).

Column aliases match between Spark and SQL exactly; aggregates are
cast explicitly on both sides; doubles are rounded to 6 places on both
sides.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_man_spark.functions.text import (
    EN_STOPWORDS,
    bpe_token_estimate,
    fingerprint,
    lang_id,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from spider_man_spark.functions.urls import canonicalize_url, url_host
from spider_man_spark.operators.groups import (
    connected_components,
    dup_groups_from_pairs,
    keep_canonical,
)
from spider_man_spark.operators.politeness import global_cap, rank_per_host
from spider_man_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_dup_pairs,
    cosine_topk,
)
from spider_man_spark.operators.textdedup import (
    dedupe_exact,
    exact_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _gate_scratch(name: str) -> str:
    """Fixed-but-user-scoped scratch path for gates that persist an index
    layout (the returned frame reads it lazily, so it can't be deleted in
    the gate; a fixed path bounds the disk use of repeated runs).  Scoped
    by uid so a shared /tmp on a multi-user host can't collide on
    ownership or clobber another user's in-flight gate run."""
    import os
    import tempfile

    uid = getattr(os, "getuid", lambda: 0)()
    return os.path.join(tempfile.gettempdir(), f"{name}_{uid}", "corpus")


# ---------------------------------------------------------------------------
# frontier synthesis from events (shared by the scheduling queries and
# their oracles — keep the SQL construction in sync)
# ---------------------------------------------------------------------------

def _synth_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.concat(
            F.lit("http://h"), (F.col("user_id") % 20).cast("string"),
            F.lit(".test/p/"), F.col("event_id").cast("string"),
        ).alias("url_key"),
        F.concat(
            F.lit("h"), (F.col("user_id") % 20).cast("string"), F.lit(".test")
        ).alias("host"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("depth"),
    )


_SYNTH_FRONTIER_SQL = (
    "SELECT 'http://h' || CAST(user_id % 20 AS VARCHAR) || '.test/p/' || "
    "CAST(event_id AS VARCHAR) AS url_key, "
    "'h' || CAST(user_id % 20 AS VARCHAR) || '.test' AS host, "
    "0 AS priority, 0 AS depth FROM events"
)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate (partial+final agg, codegen)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k (broadcastable dims, AQE-planned)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # explicit broadcasts (guide §3.1): orders and customer are the
    # 1/4x and 1/40x dimension sides of lineitem at every TPC-H-ish
    # SF; the engine session disables implicit broadcasts (crawl
    # posture), so without hints this planned as two full sort-merge
    # joins shuffling lineitem.  Same rows either way — join strategy
    # does not change results.
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_politeness_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-host politeness top-k (two-phase salted rank) on a
    frontier synthesized from events — validates the scheduler's
    selection against a plain SQL row_number oracle."""
    frontier = _synth_frontier(spark, sf_dir).withColumn(
        "tokens_per_epoch", F.lit(5)
    )
    picked = rank_per_host(frontier, tokens_default=5, rank_salts=4)
    return picked.select("host", "url_key", "host_rank").orderBy(
        "host", "host_rank"
    )


def q_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-epoch dedup: deterministic keep-one per key (ETS set
    semantics with a defined winner)."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    )


def q_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-seen left-anti join (DuplicateFilter analogue)."""
    docs = _t(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return (
        docs.join(seen, "doc_id", "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def q_retry_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status split + retry accounting (ack semantics): per event_type
    success/fail/dead counts under a retries-from-value rule."""
    ev = _t(spark, sf_dir, "events")
    enriched = ev.select(
        "event_type",
        (F.col("value") > 0.2).alias("ok"),
        (F.floor(F.col("value") * 4) % 4).cast("int").alias("retries"),
    )
    return (
        enriched.groupBy("event_type")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("success"),
            F.sum(F.when(~F.col("ok") & (F.col("retries") > 0), 1).otherwise(0))
            .cast("long")
            .alias("retryable"),
            F.sum(F.when(~F.col("ok") & (F.col("retries") <= 0), 1).otherwise(0))
            .cast("long")
            .alias("dead"),
        )
        .orderBy("event_type")
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization contract vs a known-answer oracle: mixed-case
    host, default port, unsorted query, fragment."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTP://Host"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".Example.COM:80/d/"), F.col("doc_id").cast("string"),
        F.lit("?b=2&a=1#frag"),
    )
    return docs.select(
        "doc_id",
        canonicalize_url(raw).alias("canon_url"),
        url_host(canonicalize_url(raw)).alias("host"),
    ).orderBy("doc_id")


def q_host_shard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-salt partitioning balance: rows per host (the politeness/
    salting key) from the synthesized frontier."""
    return (
        _synth_frontier(spark, sf_dir)
        .groupBy("host")
        .agg(F.count("*").alias("n_urls"))
        .orderBy("host")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).cast("int").alias("n_tokens"),
        bpe_token_estimate(t).cast("long").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
    ).orderBy("doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang_pred")
    )


def q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text fingerprint: representative ids."""
    docs = _t(spark, sf_dir, "documents")
    return (
        dedupe_exact(docs)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


def q_exact_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate pairs over docs ∪ shifted copies."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    both = docs.unionByName(copies)
    return exact_dup_pairs(both).orderBy("id_a", "id_b")


def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over doubling chains (doc_id -> 2*doc_id):
    each component is {odd * 2^k}, chains up to 9 hops — exercises the
    alternating large-star/small-star transitive closure, which the
    pair-emitting dedup gates (all equality cliques) never do.  Oracle
    is a DuckDB recursive CTE computing min-reachable-id."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    nodes = docs.select("doc_id")
    edges = docs.filter(
        (F.col("doc_id") >= 1) & (F.col("doc_id") * 2 < 300)
    ).select(
        F.col("doc_id").alias("a"), (F.col("doc_id") * 2).alias("b")
    )
    return (
        connected_components(edges, nodes=nodes)
        .select(F.col("id").alias("doc_id"), "group_id")
        .orderBy("doc_id")
    )


def q_near_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup pipeline shape: MinHash-LSH pairs ->
    connected components -> keep one canonical doc per group (min
    doc_id).  At threshold 0.99 the pair set equals text equality, so
    the kept set equals min-id-per-normalized-text — SQL-mirrorable."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    both = docs.unionByName(copies)
    pairs = minhash_lsh_pairs(
        both, shingle_k=3, num_perm=32, bands=8, threshold=0.99
    )
    groups = dup_groups_from_pairs(pairs, nodes=both.select("doc_id"))
    return (
        keep_canonical(both, groups, id_col="doc_id")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


def q_word_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard >= 0.8 pairs over docs ∪ copies (the
    no-false-negative dedup baseline, SQL-mirrorable)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    both = docs.unionByName(copies).select(
        "doc_id",
        F.array_distinct(F.split(normalize_text(F.col("text")), " ")).alias("ws"),
    )
    a, b = both.alias("a"), both.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws")))
    return (
        a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("id_a", "id_b")
    )


def q_minhash_lsh_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at threshold 0.99 over docs ∪ exact
    copies: identical signatures always collide and the verify step
    computes exact Jaccard, so the result equals the text-equality
    oracle."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    both = docs.unionByName(copies)
    return (
        minhash_lsh_pairs(
            both, shingle_k=3, num_perm=32, bands=8, threshold=0.99
        )
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


def q_simhash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming 0 = exact dups) over docs ∪
    copies — engine-specific token hashing, exactness vs the
    text-equality oracle holds at hamming 0."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    both = docs.unionByName(copies)
    return (
        simhash_pairs(both, max_hamming=0)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-5-gram Jaccard pairs (exact, explode+join) vs a DuckDB
    oracle that derives the same distinct grams via range+substr."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    copies = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    return (
        ngram_jaccard_pairs(docs.unionByName(copies), n=5, threshold=0.99)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs the DuckDB list_cosine_similarity
    oracle (both in float64)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    return cosine_topk(emb, qvec, k=10).orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (multi-probe).  The RP planes are seeded
    (similarity.random_planes, rng(42)), so the bucket bits are plain
    sign(dot) tests expressible in SQL — the oracle rebuilds them with
    literal plane lists + list_dot_product and probes
    bit_count(xor) <= 2, exact cosine top-k on the survivors."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    # Boundary guard (see _ann_lsh_oracle_sql docstring): if any
    # |dot(v, plane)| sits within float summation-order error of the
    # sign boundary, the bucket bit could differ between Spark and
    # DuckDB — fail loudly instead of hash-red silently.
    from spider_man_spark.operators.similarity import _dot_lit, random_planes

    planes = random_planes(len(qvec))
    min_absdot = F.least(
        *[
            F.abs(_dot_lit(F.col("embedding"), list(p)))
            / float(np.linalg.norm(p))
            for p in planes
        ]
    )
    boundary = emb.agg(F.min(min_absdot).alias("m")).first().m
    if boundary is not None and boundary < 1e-9:
        raise RuntimeError(
            f"ann_lsh_topk: a |dot| ({boundary:.3e}) is within float "
            "error of the sign boundary; Spark/DuckDB bucket bits may "
            "diverge on this testdata — gate aborted diagnosably"
        )
    return ann_topk_lsh(emb, qvec, k=10, probe_hamming=2)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the second index family next to
    RP-LSH (operators/similarity.ivf_index / ann_topk_ivf): seeded
    k-means cells, query probes its nprobe nearest cells.  Gated at
    FULL probe (nprobe = n_centroids), where the result must equal
    brute-force cosine top-k exactly — an integrity check that the
    cell assignment loses no rows and the per-cell cosine is exact
    (SQL-expressible, so the oracle is the brute top-k).  The pruned
    nprobe behavior (recall + cell-subset scan) is pytest-covered
    (test_ann_ivf_recall_and_pruning) — k-means itself is not
    SQL-expressible, so a pruned-probe gate would be rows-only."""
    from spider_man_spark.operators.similarity import ann_topk_ivf, ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    indexed, centroids = ivf_index(emb, n_centroids=16, seed=42)
    return ann_topk_ivf(indexed, centroids, qvec, k=10, nprobe=16)


def q_ann_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-PARTITIONED ANN storage (layout-as-index): the corpus is
    written ``partitionBy(bucket)`` (operators/similarity.
    write_bucketed_corpus) and the probe becomes a literal
    bucket-IN-list that Catalyst prunes at file-listing time — the
    at-scale single-query path where latency is O(probed buckets),
    not O(corpus).  Same planes + Hamming<=2 probe set as
    ann_lsh_topk, so the result — and the DuckDB oracle — are
    identical by construction (pytest proves the equivalence; this
    gate proves it against DuckDB end-to-end).  The bucketed copy
    lands at a FIXED scratch path overwritten per call (the returned
    frame reads it lazily, so it can't be deleted here; a fixed
    uid-scoped path bounds the disk use of repeated gate runs)."""
    from spider_man_spark.operators.similarity import (
        ann_topk_lsh_partitioned,
        random_planes,
        write_bucketed_corpus,
    )

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    planes = random_planes(len(qvec))
    path = _gate_scratch("ann_part_gate")
    write_bucketed_corpus(emb, path, planes=planes)
    return ann_topk_lsh_partitioned(
        spark, path, qvec, k=10, planes=planes, probe_hamming=2
    )


def q_ann_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF layout-as-index (operators/similarity.write_ivf_corpus /
    ann_topk_ivf_partitioned): the corpus written
    ``partitionBy(centroid_id)`` with its centroid sidecar, queried
    through the partition-pruned reader at FULL probe (nprobe =
    n_centroids) — where the answer must equal brute-force cosine
    top-k exactly, whatever the (sampled) k-means fit produced.  The
    pruned-nprobe scan fraction is pytest- and bench-covered
    (test_ann_ivf_partitioned_equals_computed, BENCH ann.ivf); this
    gate proves the persisted layout loses no rows against DuckDB.
    The index lands at a FIXED uid-scoped scratch path overwritten per
    call (bounds the disk use of repeated gate runs)."""
    from spider_man_spark.operators.similarity import (
        ann_topk_ivf_partitioned,
        write_ivf_corpus,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    path = _gate_scratch("ann_ivf_gate")
    write_ivf_corpus(
        emb.select("vec_id", "embedding"), path, n_centroids=16, seed=42
    )
    return ann_topk_ivf_partitioned(spark, path, qvec, k=10, nprobe=16)


def q_ann_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF ANN (operators/similarity.ann_topk_ivf_batch): cell
    assignment via a broadcast centroid table, candidates via a
    centroid_id equi-join, per-query window top-k.  Gated at FULL
    probe (nprobe = n_centroids) where the answer must equal the
    brute-force batch top-k — same integrity contract as
    ann_ivf_topk, proven on the N x M plan shape; pruned-nprobe
    equivalence to the per-query loop is pytest-covered
    (test_ann_ivf_batch_full_probe_equals_brute)."""
    from spider_man_spark.operators.similarity import (
        ann_topk_ivf_batch,
        ivf_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    indexed, centroids = ivf_index(emb, n_centroids=16, seed=42)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ann_topk_ivf_batch(
        queries, indexed, centroids, k=5, nprobe=16
    ).orderBy("qid", F.col("cosine").desc(), "vec_id")


def _ann_lsh_oracle_sql(dim: int = 64, n_planes: int = 12) -> str:
    """DuckDB mirror of q_ann_lsh_topk: the seeded planes are embedded
    as literal DOUBLE[] lists (repr() round-trips exactly), bucket bit i
    = sign(list_dot_product(v, plane_i)), multi-probe Hamming <= 2.

    ASSUMPTION: sign(dot) agrees bit-for-bit between Spark's
    literal-chain summation and DuckDB's list_dot_product.  A |dot|
    within float summation-order error of 0 could flip a bucket bit
    between engines and break the exact gate nondeterministically on a
    testdata refresh.  queries()['ann_lsh_topk'] therefore asserts at
    build time that no |dot| over the corpus falls below 1e-9 of the
    plane norm; if one ever does, it raises so the gate reads as an
    explicit error (diagnosable) instead of a silent hash-red."""
    from spider_man_spark.operators.similarity import random_planes

    planes = random_planes(dim, n_planes=n_planes)

    def lits(p) -> str:
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    row_bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lits(p)}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    q_bits = " + ".join(
        f"(CASE WHEN list_dot_product(qv, {lits(p)}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id = 0),
        qb AS (SELECT CAST({q_bits} AS BIGINT) AS qbucket FROM q),
        bb AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      CAST({row_bits} AS BIGINT) AS bucket
               FROM embeddings)
        SELECT bb.vec_id,
               round(list_cosine_similarity(bb.v, q.qv), 6) AS cosine
        FROM bb, qb, q
        WHERE bit_count(xor(bb.bucket, qb.qbucket)) <= 2
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """


def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN (N queries x M corpus in one plan): multi-probe
    bucket equi-join + per-query window top-k
    (operators/similarity.ann_topk_lsh_batch).  Same seeded planes and
    sign(dot) bit-agreement assumption as ann_lsh_topk (the boundary
    guard there covers this gate's corpus too)."""
    from spider_man_spark.operators.similarity import (
        ann_topk_lsh_batch,
        random_planes,
    )

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ann_topk_lsh_batch(
        queries, emb, k=5, planes=random_planes(64), probe_hamming=2
    ).orderBy("qid", F.col("cosine").desc(), "vec_id")


def _ann_batch_oracle_sql(dim: int = 64, n_planes: int = 12) -> str:
    """DuckDB mirror of q_ann_batch_topk: same literal planes; the
    multi-probe mask explosion collapses to bit_count(xor) <= h, and
    per-query top-k is a QUALIFY window."""
    from spider_man_spark.operators.similarity import random_planes

    planes = random_planes(dim, n_planes=n_planes)

    def lits(p) -> str:
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    row_bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lits(p)}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
        WITH bb AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           CAST({row_bits} AS BIGINT) AS bucket
                    FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket
              FROM bb WHERE vec_id < 3)
        SELECT q.qid, bb.vec_id,
               round(list_cosine_similarity(bb.v, q.qv), 6) AS cosine
        FROM q JOIN bb ON bit_count(xor(bb.bucket, q.qbucket)) <= 2
        QUALIFY row_number() OVER (
            PARTITION BY q.qid ORDER BY cosine DESC, bb.vec_id ASC
        ) <= 5
        ORDER BY qid, cosine DESC, vec_id
    """


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (exact cosine >= threshold) vs DuckDB
    list_cosine_similarity — validates the cosine/pair machinery the
    LSH-bucketed variant verifies with."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    emb = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return brute_force_dup_pairs(emb, threshold=0.3).orderBy("id_a", "id_b")


def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The max_per_epoch global cap (salted two-phase top-k, no
    single-partition window) vs a plain ORDER BY ... LIMIT oracle."""
    frontier = _synth_frontier(spark, sf_dir)
    capped, _over = global_cap(frontier, 200)
    return capped.select("url_key", "host").orderBy("url_key")


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norms — vectorized array agg entirely in
    exprs (posexplode + groupBy)."""
    emb = _t(spark, sf_dir, "embeddings")
    per_dim = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    cent = per_dim.groupBy("label", "dim").agg(F.avg("x").alias("m"))
    return (
        cent.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm"))
        .orderBy("label")
    )


def q_session_cookies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/uniq-union analogue (SetCookie): sorted distinct
    event types per user as a '; ' string."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), "; ").alias(
                "types_str"
            )
        )
        .orderBy("user_id")
    )


def q_windowed_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event counts (streaming-style agg in batch):
    per (hour, event_type) totals + tps."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("total"),
            F.round(F.count("*") / 3600.0, 6).alias("tps"),
        )
        .orderBy("hour", "event_type")
    )


def q_metrics_tps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-fold analogue: success/(duration_ms/1000) per component
    (= event_type), duration from value.  tps is emitted as micro-tps
    BIGINT (success*1e9 div duration_ms): exact integer arithmetic on
    both sides — a double tps is a bit-level rounding coin-flip between
    engines on inexact quotients."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("value") > 0.5, 1).otherwise(0))
            .cast("long")
            .alias("success"),
            # floor() BEFORE the cast: Spark's double->long cast truncates
            # toward zero while DuckDB's CAST(.. AS BIGINT) rounds half-even;
            # an explicit floor on both engines makes the per-row integer
            # identical (value >= 0 here, so floor == trunc too).
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "duration_ms"
            ),
        )
        .withColumn(
            "tps_micro",
            F.expr("success * CAST(1000000000 AS BIGINT) div duration_ms"),
        )
        .orderBy("event_type")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the politeness scheduler over a frontier synthesized
    from sf0.001 events — the engine's core custom operator."""
    return q_politeness_rank(spark, "/root/testdata/sf0.001")


# Deterministic planted-dup phash derivation shared by the Spark gate
# query and its DuckDB oracle (both dialects compute it with exact
# int64 arithmetic): docs < 400 fall into 40 groups of 10; each group
# gets a multiplicative-scramble 40-bit base hash; every non-first
# member flips one distinct bit, and every doc_id % 3 == 0 member
# flips a second — so within-group Hamming distances span 1..4 and
# the max_hamming=3 filter is genuinely exercised.
_PHASH_EXPR_SPARK = (
    "((doc_id % 40) * 2654435761L % 1099511627776L)"
    " ^ (CASE WHEN doc_id >= 40"
    "     THEN shiftleft(1L, CAST(doc_id % 37 AS INT)) ELSE 0L END)"
    " ^ (CASE WHEN doc_id % 3 = 0"
    "     THEN shiftleft(1L, CAST(doc_id * 7 % 29 AS INT)) ELSE 0L END)"
)
_PHASH_EXPR_DUCK = (
    "xor(xor((doc_id % 40) * 2654435761 % 1099511627776,"
    " CASE WHEN doc_id >= 40"
    "  THEN (CAST(1 AS BIGINT) << CAST(doc_id % 37 AS INT)) ELSE 0 END),"
    " CASE WHEN doc_id % 3 = 0"
    "  THEN (CAST(1 AS BIGINT) << CAST(doc_id * 7 % 29 AS INT)) ELSE 0 END)"
)


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs via the banded-Hamming bucket
    join (operators/imagededup.hamming_neardup_pairs — the production
    shape: never all-pairs) on a deterministic planted-dup phash table
    derived from documents; the DuckDB oracle brute-forces
    bit_count(xor) <= 3 over the identical derivation."""
    from spider_man_spark.operators.imagededup import phash_neardup_pairs

    imgs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .selectExpr(
            "doc_id AS image_id", f"{_PHASH_EXPR_SPARK} AS phash"
        )
    )
    return (
        phash_neardup_pairs(imgs, max_hamming=3)
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "politeness_rank": q_politeness_rank,
        "frontier_dedup": q_frontier_dedup,
        "seen_anti_join": q_seen_anti_join,
        "retry_split": q_retry_split,
        "url_canonicalize": q_url_canonicalize,
        "host_shard_counts": q_host_shard_counts,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint_dedup": q_fingerprint_dedup,
        "exact_dup_pairs": q_exact_dup_pairs,
        "word_jaccard_pairs": q_word_jaccard_pairs,
        "dup_groups": q_dup_groups,
        "near_dedup_keep": q_near_dedup_keep,
        "minhash_lsh_dupes": q_minhash_lsh_dupes,
        "simhash_dupes": q_simhash_dupes,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_topk": q_embedding_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_partitioned_topk": q_ann_partitioned_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_partitioned": q_ann_ivf_partitioned,
        "ann_ivf_batch": q_ann_ivf_batch,
        "ann_batch_topk": q_ann_batch_topk,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "global_topk": q_global_topk,
        "embedding_centroids": q_embedding_centroids,
        "session_cookies": q_session_cookies,
        "windowed_throughput": q_windowed_throughput,
        "metrics_tps": q_metrics_tps,
        "phash_neardup": q_phash_neardup,
    }


_STOP_SQL = "(" + ",".join(f"'{w}'" for w in EN_STOPWORDS) + ")"

# normalized text in DuckDB (mirror of functions/text.normalize_text)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"
_NTOK = (
    f"CASE WHEN {_NORM} = '' THEN 0 ELSE len({_WORDS}) END"
)
_STOPHITS = (
    f"len(list_filter({_WORDS}, w -> list_contains({list(EN_STOPWORDS)!r}, w)))"
)


def oracle_sql() -> dict[str, str]:
    copies_docs = (
        "SELECT doc_id + 1000 AS doc_id, text FROM documents WHERE doc_id < {n}"
    )
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT o_orderkey, c_mktsegment,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY o_orderkey, c_mktsegment
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 20
        """,
        "politeness_rank": f"""
            WITH frontier AS ({_SYNTH_FRONTIER_SQL})
            SELECT host, url_key, host_rank FROM (
                SELECT host, url_key,
                       row_number() OVER (
                           PARTITION BY host
                           ORDER BY priority, depth, url_key
                       ) AS host_rank
                FROM frontier
            ) WHERE host_rank <= 5
            ORDER BY host, host_rank
        """,
        "frontier_dedup": """
            SELECT user_id, event_type, event_id FROM (
                SELECT user_id, event_type, event_id,
                       row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts ASC, event_id ASC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
            ORDER BY user_id, event_type
        """,
        "seen_anti_join": """
            SELECT doc_id, source FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM documents s
                WHERE s.doc_id % 7 = 0 AND s.doc_id = d.doc_id
            )
            ORDER BY doc_id
        """,
        "retry_split": """
            SELECT event_type,
                   count(*) AS total,
                   CAST(sum(CASE WHEN value > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS success,
                   CAST(sum(CASE WHEN value <= 0.2
                                 AND (CAST(floor(value * 4) AS INTEGER) % 4) > 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS retryable,
                   CAST(sum(CASE WHEN value <= 0.2
                                 AND (CAST(floor(value * 4) AS INTEGER) % 4) <= 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS dead
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "url_canonicalize": """
            SELECT doc_id,
                   'http://host' || CAST(doc_id % 5 AS VARCHAR)
                   || '.example.com/d/' || CAST(doc_id AS VARCHAR)
                   || '?a=1&b=2' AS canon_url,
                   'host' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host
            FROM documents
            ORDER BY doc_id
        """,
        "host_shard_counts": f"""
            WITH frontier AS ({_SYNTH_FRONTIER_SQL})
            SELECT host, count(*) AS n_urls FROM frontier
            GROUP BY host ORDER BY host
        """,
        "token_count": f"""
            SELECT doc_id,
                   CAST({_NTOK} AS INTEGER) AS n_tokens,
                   CAST(CASE WHEN {_NORM} = '' THEN 0 ELSE
                       list_sum(list_transform({_WORDS},
                                w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))
                   END AS BIGINT) AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "text_quality": f"""
            SELECT doc_id,
                   round(CASE WHEN length(text) = 0 THEN 0.0
                         ELSE len(regexp_extract_all(text, '[.,!?;:]'))
                              / CAST(length(text) AS DOUBLE) END, 6)
                       AS punct_ratio,
                   round(CASE WHEN {_NTOK} <= 0 THEN 0.0
                         ELSE {_STOPHITS} / CAST({_NTOK} AS DOUBLE) END, 6)
                       AS stopword_ratio,
                   round(
                     least({_NTOK} / 150.0, 1.0) * 0.6
                     + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
                          ELSE len(regexp_extract_all(text, '[.,!?;:]'))
                               / CAST(length(text) AS DOUBLE) END) * 10, 1.0)) * 0.2
                     + least((CASE WHEN {_NTOK} <= 0 THEN 0.0
                          ELSE {_STOPHITS} / CAST({_NTOK} AS DOUBLE) END) * 5, 1.0) * 0.2
                   , 6) AS quality
            FROM documents ORDER BY doc_id
        """,
        "lang_id": f"""
            SELECT CASE WHEN (CASE WHEN {_NTOK} <= 0 THEN 0.0
                        ELSE {_STOPHITS} / CAST({_NTOK} AS DOUBLE) END) >= 0.03
                   THEN 'en' ELSE 'unknown' END AS lang_pred,
                   count(*) AS n
            FROM documents GROUP BY 1 ORDER BY lang_pred
        """,
        "fingerprint_dedup": f"""
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id IN (
                SELECT min(doc_id) FROM documents GROUP BY {_NORM}
            )
            ORDER BY doc_id
        """,
        "exact_dup_pairs": f"""
            WITH docs2 AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 50
                UNION ALL {copies_docs.format(n=50)}
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM docs2 a JOIN docs2 b
              ON {_NORM.replace('text', 'a.text')} = {_NORM.replace('text', 'b.text')}
            WHERE a.doc_id < b.doc_id
            ORDER BY id_a, id_b
        """,
        "dup_groups": """
            WITH RECURSIVE nodes AS (
                SELECT doc_id AS id FROM documents WHERE doc_id < 300
            ), edges AS (
                SELECT doc_id AS a, doc_id * 2 AS b FROM documents
                WHERE doc_id >= 1 AND doc_id * 2 < 300
            ), sym AS (
                SELECT a, b FROM edges UNION SELECT b, a FROM edges
            ), reach(id, r) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
            )
            SELECT id AS doc_id, MIN(r) AS group_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        "near_dedup_keep": f"""
            WITH docs2 AS (
                SELECT doc_id, text, n_chars FROM documents WHERE doc_id < 60
                UNION ALL
                SELECT doc_id + 1000 AS doc_id, text, n_chars
                FROM documents WHERE doc_id < 60
            )
            SELECT doc_id, n_chars FROM docs2
            WHERE doc_id IN (
                SELECT min(doc_id) FROM docs2 GROUP BY {_NORM}
            )
            ORDER BY doc_id
        """,
        "word_jaccard_pairs": f"""
            WITH docs2 AS (
                SELECT doc_id,
                       list_distinct(string_split({_NORM}, ' ')) AS ws
                FROM (
                    SELECT doc_id, text FROM documents WHERE doc_id < 40
                    UNION ALL {copies_docs.format(n=40)}
                )
            )
            SELECT id_a, id_b, jaccard FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       round(len(list_intersect(a.ws, b.ws))
                             / CAST(len(list_distinct(list_concat(a.ws, b.ws)))
                                    AS DOUBLE), 6) AS jaccard
                FROM docs2 a, docs2 b
                WHERE a.doc_id < b.doc_id
            ) WHERE jaccard >= 0.8
            ORDER BY id_a, id_b
        """,
        "minhash_lsh_dupes": f"""
            WITH docs2 AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 60
                UNION ALL {copies_docs.format(n=60)}
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM docs2 a JOIN docs2 b
              ON {_NORM.replace('text', 'a.text')} = {_NORM.replace('text', 'b.text')}
            WHERE a.doc_id < b.doc_id
            ORDER BY id_a, id_b
        """,
        "simhash_dupes": f"""
            WITH docs2 AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 60
                UNION ALL {copies_docs.format(n=60)}
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM docs2 a JOIN docs2 b
              ON {_NORM.replace('text', 'a.text')} = {_NORM.replace('text', 'b.text')}
            WHERE a.doc_id < b.doc_id
            ORDER BY id_a, id_b
        """,
        "ngram_jaccard": f"""
            WITH docs2 AS (
                SELECT doc_id, {_NORM} AS t FROM (
                    SELECT doc_id, text FROM documents WHERE doc_id < 40
                    UNION ALL {copies_docs.format(n=40)}
                )
            ), grams AS (
                SELECT doc_id,
                       list_distinct(CASE WHEN length(t) >= 5
                           THEN list_transform(range(1, length(t) - 3),
                                               i -> substr(t, CAST(i AS INTEGER), 5))
                           ELSE [t] END) AS gs
                FROM docs2
            )
            SELECT id_a, id_b, jaccard FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       round(len(list_intersect(a.gs, b.gs))
                             / CAST(len(a.gs) + len(b.gs)
                                    - len(list_intersect(a.gs, b.gs))
                                    AS DOUBLE), 6) AS jaccard
                FROM grams a, grams b
                WHERE a.doc_id < b.doc_id
            ) WHERE jaccard >= 0.99
            ORDER BY id_a, id_b
        """,
        "ann_lsh_topk": _ann_lsh_oracle_sql(),
        # identical semantics and probe set as ann_lsh_topk —
        # the partitioned layout must not change the answer
        "ann_partitioned_topk": _ann_lsh_oracle_sql(),
        # full-probe IVF == brute cosine top-k (cell assignment must
        # lose no rows); pruned-probe recall is pytest-only
        "ann_ivf_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        # the persisted centroid_id-partitioned layout + sidecar must
        # not change the full-probe answer
        "ann_ivf_partitioned": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        # full-probe batch IVF == brute-force batch top-k (N x M)
        "ann_ivf_batch": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3)
            SELECT q.qid, e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine
            FROM q JOIN embeddings e ON TRUE
            QUALIFY row_number() OVER (
                PARTITION BY q.qid ORDER BY cosine DESC, e.vec_id ASC
            ) <= 5
            ORDER BY qid, cosine DESC, vec_id
        """,
        "ann_batch_topk": _ann_batch_oracle_sql(),
        "embedding_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < 300 AND b.vec_id < 300
              AND a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) >= 0.3
            ORDER BY id_a, id_b
        """,
        "global_topk": f"""
            WITH frontier AS ({_SYNTH_FRONTIER_SQL})
            SELECT url_key, host FROM frontier
            ORDER BY priority, depth, url_key
            LIMIT 200
        """,
        "embedding_centroids": """
            SELECT label,
                   round(sqrt(sum(m * m)), 6) AS centroid_norm
            FROM (
                SELECT label, dim, avg(x) AS m
                FROM (
                    SELECT label,
                           generate_subscripts(embedding, 1) - 1 AS dim,
                           unnest(embedding) AS x
                    FROM embeddings
                )
                GROUP BY label, dim
            )
            GROUP BY label ORDER BY label
        """,
        "session_cookies": """
            SELECT user_id,
                   string_agg(DISTINCT event_type, '; ' ORDER BY event_type)
                       AS types_str
            FROM events WHERE user_id < 50
            GROUP BY user_id ORDER BY user_id
        """,
        "windowed_throughput": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS total,
                   round(count(*) / 3600.0, 6) AS tps
            FROM events
            GROUP BY 1, 2 ORDER BY hour, event_type
        """,
        "metrics_tps": """
            SELECT event_type, total, success, duration_ms,
                   CAST((success * CAST(1000000000 AS BIGINT)) // duration_ms
                        AS BIGINT) AS tps_micro
            FROM (
                SELECT event_type,
                       count(*) AS total,
                       CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                           AS success,
                       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                           AS duration_ms
                FROM events GROUP BY event_type
            ) ORDER BY event_type
        """,
        "phash_neardup": f"""
            WITH t AS (
                SELECT doc_id AS image_id,
                       {_PHASH_EXPR_DUCK} AS phash
                FROM documents WHERE doc_id < 400
            )
            SELECT a.image_id AS id_a, b.image_id AS id_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
                       AS hamming
            FROM t a JOIN t b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 3
            ORDER BY id_a, id_b
        """,
    }
