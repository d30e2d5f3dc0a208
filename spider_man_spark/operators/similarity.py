"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force cosine top-k, fully JVM-side
  (``zip_with``/``aggregate`` dot products inside codegen) — the
  correctness baseline; O(N) scan per query, embarrassingly parallel.
* :func:`rp_lsh_bucket` / :func:`ann_topk_lsh` — random-hyperplane
  LSH: seeded projection planes folded into column expressions; the
  scan touches only the query's bucket (and optionally its Hamming-1
  neighbors) — the 100 TB path: bucket is a partition key, so a query
  prunes to a handful of partitions.
* :func:`embedding_dup_pairs` — near-dup detection by cosine over
  LSH buckets (bucket equi-join, never a cross join).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_lit(vec_col: Column, v: list[float]) -> Column:
    """dot(embedding, literal query) as a codegen expression.

    Unrolled getItem chain rather than aggregate/zip_with: the
    higher-order functions are CodegenFallback (interpreted per row),
    and the flat scalar chain measured 6x faster at 1M x 64-dim x 16
    planes (scripts/micro_hof_vs_unrolled.py) with bit-identical
    results — the accumulation order (((0 + a0*b0) + a1*b1) + ...)
    is exactly the fold order of the HOF form, so every gate hash is
    unchanged."""
    acc: Column = F.lit(0.0)
    for i, x in enumerate(v):
        acc = acc + vec_col[i] * F.lit(float(x))
    return acc


def vec_norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _norm_unrolled(vec_col: Column, dim: int) -> Column:
    """vec_norm with a known dim: same fold order as the HOF form
    (acc + v[i]*v[i], left to right — bit-identical), flat codegen."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + vec_col[i] * vec_col[i]
    return F.sqrt(acc)


def cosine_sim_lit(vec_col: Column, query: list[float]) -> Column:
    qn = float(np.linalg.norm(query)) or 1.0
    return F.round(
        _dot_lit(vec_col, query)
        / (_norm_unrolled(vec_col, len(query)) * qn),
        6,
    )


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: one projection + global top-k (Spark
    implements orderBy+limit as per-partition top-k + merge — no full
    sort at scale)."""
    scored = df.select(
        F.col(id_col), cosine_sim_lit(F.col(vec_col), query).alias("cosine")
    )
    return scored.orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    ).limit(k)


def random_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane bucket id: bit i = sign(dot(v, plane_i)) —
    built as n_planes literal-dot expressions, all codegen."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = (_dot_lit(vec_col, list(p)) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: scan only rows whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe), then
    exact cosine on the survivors.  At scale the table is written
    partitioned by bucket -> partition pruning makes this a
    few-partition scan."""
    if planes is None:
        planes = random_planes(len(query))
    qbits = (planes @ np.asarray(query) > 0).astype(np.int64)
    qbucket = int((qbits << np.arange(len(planes))).sum())
    bucketed = df.withColumn("__bucket", rp_lsh_bucket(F.col(vec_col), planes))
    probe = F.bit_count(
        F.col("__bucket").bitwiseXOR(F.lit(qbucket))
    ) <= probe_hamming
    return (
        bucketed.filter(probe)
        .select(F.col(id_col), cosine_sim_lit(F.col(vec_col), query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def write_bucketed_corpus(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    dim: int | None = None,
) -> None:
    """Persist an embedded corpus PARTITIONED BY its LSH bucket — the
    directory layout becomes the ANN index.  A probe then reads only
    the probed buckets' partitions: Catalyst turns the bucket-IN-list
    filter into PartitionFilters, so the scan lists and reads
    O(probe-set) files instead of O(corpus) (the claim
    :func:`ann_topk_lsh`'s docstring makes; this is the path that
    delivers it).  One shuffle on bucket before the write keeps it to
    one file per bucket."""
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = random_planes(dim)
    out = df.select(
        F.col(id_col),
        F.col(vec_col),
        rp_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    out.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path)


def ann_topk_lsh_partitioned(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    probe_hamming: int = 1,
) -> DataFrame:
    """Single-query ANN top-k over a :func:`write_bucketed_corpus`
    table: the probe set is a literal bucket-IN-list, pruned to those
    partitions at file-listing time — per-query latency is O(probed
    buckets), independent of corpus size.  Same semantics as
    :func:`ann_topk_lsh` with the same planes (identical candidates,
    identical top-k)."""
    if planes is None:
        planes = random_planes(len(query))
    qbits = (planes @ np.asarray(query) > 0).astype(np.int64)
    qbucket = int((qbits << np.arange(len(planes))).sum())
    buckets = [
        qbucket ^ m for m in _probe_masks(len(planes), probe_hamming)
    ]
    df = _read_partition_subset(spark, path, "bucket", buckets)
    return (
        df.select(
            F.col(id_col),
            cosine_sim_lit(F.col(vec_col), query).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _read_partition_subset(
    spark, path: str, part_col: str, values: list[int]
):
    """Read only the ``part_col=v`` subdirectories of a
    partitionBy-written table.  Equivalent to
    ``spark.read.parquet(path).filter(col(part_col).isin(values))`` —
    partition pruning discards the same files — but the driver lists
    O(probe-set) directories instead of the WHOLE table (1024 bucket
    dirs at the bench shape), which dominated per-query latency.
    Falls back to the full-listing filter form when the path is not a
    visible local directory (e.g. an object-store URI)."""
    import os

    if not os.path.isdir(path):
        return spark.read.parquet(path).filter(
            F.col(part_col).isin(list(values))
        )
    subs = [
        os.path.join(path, f"{part_col}={v}")
        for v in values
        if os.path.isdir(os.path.join(path, f"{part_col}={v}"))
    ]
    if not subs:
        # no probed partition exists: preserve the empty-result (and
        # schema) semantics of the pruned full read
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.option("basePath", path).parquet(*subs)


def cosine_sim_cols(a: Column, b: Column) -> Column:
    """cosine(a, b) between two array columns — codegen end-to-end.
    Inputs are cast to double so per-element multiplies accumulate in
    float64 like the literal-query path (array<float> inputs would
    otherwise multiply in float32 and disagree at the 6dp round)."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(dot / (vec_norm(a) * vec_norm(b)), 6)


def _cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine with PRE-COMPUTED side norms: same expressions, same
    order (dot / (norm_a * norm_b), rounded 6) as
    :func:`cosine_sim_cols`, so values are bit-identical — but the
    norms cross the candidate join as one double per side instead of
    being recomputed per pair."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(dot / (na * nb), 6)


def _probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """All XOR masks within ``probe_hamming`` bits over ``n_planes``
    bucket bits (multi-probe expansion; 1 + C(n,1) + ... terms)."""
    from itertools import combinations

    masks = []
    for h in range(probe_hamming + 1):
        for bits in combinations(range(n_planes), h):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def ann_topk_lsh_batch(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    probe_hamming: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Batch ANN: top-k corpus neighbors for EVERY query row — the
    training-data shape (dedup a new batch of N embeddings against an
    M-row embedded corpus) the single-query :func:`ann_topk_lsh` loop
    can't serve at N x M scale.

    Plan shape (never all-pairs): both sides bucket via the same
    seeded planes; each query explodes to its multi-probe bucket set
    (a STATIC literal mask list — probing is a bucket equi-join, so a
    (query, corpus) pair meets exactly once and needs no dedup); exact
    cosine on candidates; per-query top-k via a window rank.  Two
    shuffles total (join on bucket, rank on qid) regardless of M."""
    if planes is None:
        if dim is None:
            dim = len(queries.select(vec_col).first()[0])
        planes = random_planes(dim)
    masks = _probe_masks(len(planes), probe_hamming)
    # per-SIDE norms are computed once per row BEFORE the join and
    # carried as one extra double — the per-candidate-pair work is
    # then a single dot instead of dot + two norms (the norms are the
    # same expressions, so every cosine is bit-identical; guide §2.3:
    # move per-pair work to per-row where the algebra allows)
    qb = queries.select(
        F.col(q_id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col).cast("array<double>")).alias("__qn"),
        rp_lsh_bucket(F.col(vec_col), planes).alias("__qbucket"),
    ).withColumn(
        # generators must be top-level in a projection: explode the
        # mask list first, XOR in a second projection
        "__mask",
        F.explode(F.array(*[F.lit(int(m)).cast("long") for m in masks])),
    ).withColumn(
        "__bucket", F.col("__mask").bitwiseXOR(F.col("__qbucket"))
    ).drop("__mask", "__qbucket")
    cb = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col).cast("array<double>")).alias("__cn"),
        rp_lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        qb.join(cb, "__bucket")
        .select(
            "qid",
            "vec_id",
            _cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def save_bucketed_corpus_table(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    dim: int | None = None,
) -> None:
    """Persist the corpus as a HIVE-BUCKETED table hashed on its LSH
    bucket column (``bucketBy(n_buckets, "bucket")``): the table
    metadata records the hash-partitioning, so every future batch-ANN
    bucket equi-join reads the M-row corpus PRE-SHUFFLED — the
    planner elides the corpus-side exchange and shuffles only the
    (much smaller) query side into the matching layout.  At
    M = 10^9+ this removes the join's dominant shuffle from every
    batch; the one corpus shuffle is paid once, at write time.
    Complements :func:`write_bucketed_corpus` (partition-pruned
    single-query latency) — same layout-as-index idea, applied to the
    batch join's exchange instead of the scan."""
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = random_planes(dim)
    keyed = df.select(
        F.col(id_col),
        F.col(vec_col),
        rp_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    (
        keyed.write.mode("overwrite")
        .bucketBy(n_buckets, "bucket")
        .saveAsTable(table)
    )


def ann_topk_lsh_batch_bucketed(
    spark,
    table: str,
    queries: DataFrame,
    k: int = 10,
    q_id_col: str = "qid",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    probe_hamming: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    corpus_vec_col: str | None = None,
) -> DataFrame:
    """:func:`ann_topk_lsh_batch` over a
    :func:`save_bucketed_corpus_table` corpus: identical semantics
    and output (same planes -> same candidates -> same top-k), but
    the corpus side of the bucket equi-join arrives pre-shuffled from
    the bucketed table layout, so the plan carries ONE exchange fewer
    — the M-row one (pytest asserts both the equivalence and the
    exchange count).  ``id_col``/``corpus_vec_col`` name the STORED
    corpus columns, mirroring :func:`save_bucketed_corpus_table`'s
    signature (``corpus_vec_col`` defaults to ``vec_col``).

    Migration note (round 6): the stored corpus columns were previously
    hard-coded ``vec_id``/``embedding``.  A caller whose QUERIES use a
    non-default ``vec_col`` against a table stored under the default
    names must now pass ``corpus_vec_col="embedding"`` explicitly —
    ``corpus_vec_col`` follows ``vec_col`` when omitted."""
    if planes is None:
        if dim is None:
            dim = len(queries.select(vec_col).first()[0])
        planes = random_planes(dim)
    masks = _probe_masks(len(planes), probe_hamming)
    qb = queries.select(
        F.col(q_id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col).cast("array<double>")).alias("__qn"),
        rp_lsh_bucket(F.col(vec_col), planes).alias("__qbucket"),
    ).withColumn(
        "__mask",
        F.explode(F.array(*[F.lit(int(m)).cast("long") for m in masks])),
    ).withColumn(
        "bucket", F.col("__mask").bitwiseXOR(F.col("__qbucket"))
    ).drop("__mask", "__qbucket")
    # select the STORED bucket column — recomputing it would discard
    # the table's hash-partitioning metadata and bring the shuffle back
    cb = spark.table(table).select(
        F.col(id_col).alias("vec_id"),
        F.col(corpus_vec_col or vec_col).alias("cv"),
        vec_norm(
            F.col(corpus_vec_col or vec_col).cast("array<double>")
        ).alias("__cn"),
        "bucket",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        qb.join(cb, "bucket")
        .select(
            "qid",
            "vec_id",
            _cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate (id_a, id_b, cosine) pairs: LSH-bucket equi-join
    candidates, exact cosine verify.  High thresholds want near-equal
    sign patterns, so same-bucket candidates capture them."""
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = random_planes(dim)
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        # per-row norm, carried through the bucket join — the per-pair
        # work is then one dot (same exprs, bit-identical cosines)
        vec_norm(F.col(vec_col)).alias("__n"),
        rp_lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("a.__n") * F.col("b.__n")), 6)
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .distinct()
        .filter(F.col("cosine") >= threshold)
    )


def ivf_index(
    df: DataFrame,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    fit_sample_rows: int = 100_000,
) -> tuple[DataFrame, np.ndarray]:
    """IVF (inverted-file) coarse quantizer — the second index family
    next to RP-LSH: seeded k-means picks ``n_centroids`` cell
    centers; every corpus row is assigned to its nearest center.
    Returns (indexed_df with a ``centroid_id`` int column, centroids
    ndarray).  The indexed table is the scale artifact: written
    ``partitionBy("centroid_id")`` (see :func:`write_ivf_corpus`), a
    query scans only its ``nprobe`` nearest cells.

    The k-means FIT is bounded: it runs on the ``fit_sample_rows``
    rows with the smallest seeded xxhash64 of their vector — a
    uniform pseudo-random subset taken as a map-side top-k
    (TakeOrderedAndProject: per-partition heap, single bounded
    reduce), so extracting the fit set costs ONE corpus pass and NO
    separate ``count()`` job (coarse-quantizer quality needs
    O(centroids x constant) points, not the corpus — at 10^9+ rows an
    unsampled fit would iterate ``max_iter`` full scans).  ASSIGNMENT
    is always the full corpus: one KMeansModel transform (JVM-side).
    Deterministic under a fixed seed regardless of the input
    partitioning (the hash order is a property of the values, unlike
    ``DataFrame.sample``'s per-partition draw)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__f"),
    )
    # persist the bounded fit set across the fit: KMeans.fit runs
    # several actions (summary, k-means|| init, train) and its internal
    # persist does not shield the SOURCE lineage — uncached, each one
    # would re-stream the whole corpus (measured 3 extra passes)
    # repartition AFTER the top-k: orderBy().limit() plans as a global
    # TakeOrderedAndProject whose merge lands the whole fit set in ONE
    # partition — without the spread, the KMeans fit (several actions
    # over fit_df) would run serially on a single task (round-7 advice)
    fit_df = (
        feat.select(
            "__f", F.xxhash64(F.col(vec_col), F.lit(seed)).alias("__h")
        )
        .orderBy("__h")
        .limit(fit_sample_rows)
        .select("__f")
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .persist()
    )
    try:
        model = KMeans(
            k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="__f",
            predictionCol="centroid_id",
        ).fit(fit_df)
    finally:
        fit_df.unpersist()
    indexed = model.transform(feat).drop("__f")
    centroids = np.asarray([np.asarray(c) for c in model.clusterCenters()])
    return indexed, centroids


def write_ivf_corpus(
    df: DataFrame,
    path: str,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    fit_sample_rows: int = 100_000,
    precomputed: tuple[DataFrame, np.ndarray] | None = None,
) -> np.ndarray:
    """Persist an embedded corpus PARTITIONED BY its IVF cell — the
    directory layout becomes the index, exactly like
    :func:`write_bucketed_corpus` for the LSH family: a probe's
    literal ``centroid_id`` IN-list becomes PartitionFilters, so the
    scan lists and reads O(nprobe) cells instead of O(corpus).  One
    shuffle on centroid_id before the write keeps it to one file per
    cell.  The centroids (the only state a reader needs) are written
    beside the data as an ``_ivf_centroids`` parquet subdir — an
    underscore-prefixed name, so Spark's reader ignores it like
    ``_spark_metadata``, and the write goes through Spark's FS layer
    so the same code works on s3a/hdfs/local paths.  Returns the
    centroids ndarray.  ``precomputed`` takes an existing
    :func:`ivf_index` result so several layouts can share one fit."""
    indexed, centroids = precomputed or ivf_index(
        df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
        seed=seed, max_iter=max_iter, fit_sample_rows=fit_sample_rows,
    )
    (
        indexed.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    spark = df.sparkSession
    (
        spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
            "centroid_id int, cvec array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_ivf_centroids")
    )
    return centroids


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    """Read back the centroid sidecar a :func:`write_ivf_corpus` table
    carries (tiny: n_centroids rows)."""
    rows = (
        spark.read.parquet(f"{path}/_ivf_centroids")
        .orderBy("centroid_id")
        .collect()
    )
    return np.asarray([list(r.cvec) for r in rows], dtype=np.float64)


def ann_topk_ivf_partitioned(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Single-query ANN top-k over a :func:`write_ivf_corpus` table:
    cells are ranked by centroid cosine driver-side (O(n_centroids)
    numpy), the ``nprobe`` nearest become a literal IN-list pruned to
    those partitions at file-listing time — per-query latency is
    O(probed cells), independent of corpus size.  Same semantics as
    :func:`ann_topk_ivf` over the same index (identical candidates,
    identical top-k)."""
    if centroids is None:
        centroids = load_ivf_centroids(spark, path)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    cn = np.linalg.norm(centroids, axis=1)
    cn[cn == 0] = 1.0
    sims = centroids @ q / (cn * qn)
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]
    df = _read_partition_subset(spark, path, "centroid_id", probe)
    return (
        df.select(
            F.col(id_col),
            cosine_sim_lit(
                F.col(vec_col).cast("array<double>"), [float(x) for x in q]
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_topk_ivf(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over an :func:`ivf_index` table: rank cells by
    centroid cosine DRIVER-side (centroids are tiny — O(n_centroids)
    numpy), then exact cosine over only the ``nprobe`` nearest cells'
    rows.  The cell filter is a literal IN-list, so a
    centroid-partitioned table prunes to nprobe partitions exactly
    like the LSH bucket layout."""
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    cn = np.linalg.norm(centroids, axis=1)
    cn[cn == 0] = 1.0
    sims = centroids @ q / (cn * qn)
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]
    return (
        indexed.filter(F.col("centroid_id").isin(probe))
        .select(
            F.col(id_col),
            cosine_sim_lit(
                F.col(vec_col).cast("array<double>"), [float(x) for x in q]
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _ivf_probe_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    q_id_col: str,
    vec_col: str,
) -> DataFrame:
    """(qid, qv, centroid_id) probe rows: every query scores every
    centroid against a BROADCAST literal centroid table (no shuffle —
    centroids are tiny by construction) and keeps its ``nprobe``
    nearest via a window rank.  The centroid cosine is UNROUNDED
    (internal cell ordering only)."""
    from pyspark.sql import Window

    spark = queries.sparkSession
    cent = F.broadcast(
        spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
            "centroid_id int, cvec array<double>",
        )
    )
    qv = F.col("qv").cast("array<double>")

    def _safe(n: Column) -> Column:
        # zero-norm -> 1.0, matching the numpy paths' `or 1.0` /
        # `cn[cn == 0] = 1.0` guards (degenerate vectors score 0.0,
        # never NULL, so batch == per-query on them too)
        return F.when(n == 0, F.lit(1.0)).otherwise(n)

    csim = F.aggregate(
        F.zip_with(qv, F.col("cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (_safe(vec_norm(qv)) * _safe(vec_norm(F.col("cvec"))))
    wq = Window.partitionBy("qid").orderBy(
        F.col("__csim").desc(), F.col("centroid_id").asc()
    )
    return (
        queries.select(
            F.col(q_id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            # query norm computed ONCE per query here and carried to
            # the candidate join — _batch_topk then skips the per-pair
            # norm recompute (same expression, bit-identical values)
            vec_norm(F.col(vec_col).cast("array<double>")).alias("__qn"),
        )
        .crossJoin(cent)
        .withColumn("__csim", csim)
        .withColumn("__crk", F.row_number().over(wq))
        .filter(F.col("__crk") <= nprobe)
        .select("qid", "qv", "__qn", "centroid_id")
    )


def _batch_topk(cand: DataFrame, k: int) -> DataFrame:
    """Exact cosine + per-query window top-k over (qid, qv, vec_id,
    cv) candidate rows.  The query norm is zero-guarded exactly like
    :func:`cosine_sim_lit`'s driver-side ``or 1.0`` so the batch and
    per-query paths agree on degenerate query vectors.  When the
    caller carried per-side norms (``__qn``/``__cn`` — the same
    expressions, evaluated once per row before the join), they are
    used instead of per-pair recomputes; the cosines are
    bit-identical either way."""
    from pyspark.sql import Window

    a = F.col("qv").cast("array<double>")
    b = F.col("cv").cast("array<double>")
    qn = F.col("__qn") if "__qn" in cand.columns else vec_norm(a)
    cn = F.col("__cn") if "__cn" in cand.columns else vec_norm(b)
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(
        dot / (F.when(qn == 0, F.lit(1.0)).otherwise(qn) * cn), 6
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.select("qid", "vec_id", cos.alias("cosine"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def ann_topk_ivf_batch(
    queries: DataFrame,
    indexed: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    q_id_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch ANN over an :func:`ivf_index` — the training-data N x M
    shape for the centroid family, mirroring
    :func:`ann_topk_lsh_batch`'s plan discipline (candidates from an
    equi-join, never all-pairs):

    1. cell assignment: each query scores every centroid against a
       BROADCAST literal centroid table (n_q x n_centroids rows, no
       shuffle — centroids are tiny by construction) and keeps its
       ``nprobe`` nearest via a window rank;
    2. candidate generation: a ``centroid_id`` equi-join with the
       indexed corpus;
    3. exact cosine + per-query window top-k on the candidates.

    Three shuffles (cell rank on qid, join on centroid_id, final
    top-k on qid) regardless of M.  At full probe
    (nprobe = n_centroids) the result equals brute-force batch top-k
    exactly — cells partition the corpus."""
    probes = _ivf_probe_cells(queries, centroids, nprobe, q_id_col, vec_col)
    cand = probes.join(
        indexed.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
            vec_norm(F.col(vec_col).cast("array<double>")).alias("__cn"),
            "centroid_id",
        ),
        "centroid_id",
    )
    return _batch_topk(cand, k)


def save_ivf_corpus_table(
    df: DataFrame,
    table: str,
    n_centroids: int = 256,
    n_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    fit_sample_rows: int = 100_000,
    precomputed: tuple[DataFrame, np.ndarray] | None = None,
) -> np.ndarray:
    """Persist an IVF-indexed corpus as a HIVE-BUCKETED table hashed
    on ``centroid_id`` — the IVF counterpart of
    :func:`save_bucketed_corpus_table`: the batch join's M-row
    corpus-side exchange is paid once at write time and elided from
    every subsequent :func:`ann_topk_ivf_batch_bucketed` call (the
    planner shuffles only the much smaller probe side into the
    matching layout).  The centroids land in a companion table
    ``{table}_centroids`` so a reader needs no side channel.  Returns
    the centroids ndarray.  ``precomputed`` takes an existing
    :func:`ivf_index` result so several layouts can share one fit."""
    indexed, centroids = precomputed or ivf_index(
        df, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
        seed=seed, max_iter=max_iter, fit_sample_rows=fit_sample_rows,
    )
    (
        indexed.write.mode("overwrite")
        .bucketBy(n_buckets, "centroid_id")
        .saveAsTable(table)
    )
    spark = df.sparkSession
    (
        spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
            "centroid_id int, cvec array<double>",
        )
        .write.mode("overwrite")
        .saveAsTable(f"{table}_centroids")
    )
    return centroids


def load_ivf_table_centroids(spark, table: str) -> np.ndarray:
    """Read back the companion centroid table a
    :func:`save_ivf_corpus_table` corpus carries."""
    rows = spark.table(f"{table}_centroids").orderBy("centroid_id").collect()
    return np.asarray([list(r.cvec) for r in rows], dtype=np.float64)


def ann_topk_ivf_batch_bucketed(
    spark,
    table: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    q_id_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    corpus_vec_col: str | None = None,
) -> DataFrame:
    """:func:`ann_topk_ivf_batch` over a :func:`save_ivf_corpus_table`
    corpus: identical semantics and output (same centroids -> same
    cells -> same top-k), but the corpus side of the centroid_id
    equi-join arrives pre-shuffled from the bucketed table layout, so
    the plan carries ONE exchange fewer — the M-row one (pytest
    asserts both the equivalence and the exchange count).
    ``id_col``/``corpus_vec_col`` name the STORED corpus columns,
    mirroring :func:`save_ivf_corpus_table`'s signature
    (``corpus_vec_col`` defaults to ``vec_col``)."""
    if centroids is None:
        centroids = load_ivf_table_centroids(spark, table)
    probes = _ivf_probe_cells(queries, centroids, nprobe, q_id_col, vec_col)
    # select the STORED centroid_id column — recomputing the
    # assignment would discard the table's hash-partitioning metadata
    # and bring the corpus shuffle back
    cb = spark.table(table).select(
        F.col(id_col).alias("vec_id"),
        F.col(corpus_vec_col or vec_col).alias("cv"),
        vec_norm(
            F.col(corpus_vec_col or vec_col).cast("array<double>")
        ).alias("__cn"),
        "centroid_id",
    )
    return _batch_topk(probes.join(cb, "centroid_id"), k)


def brute_force_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine (oracle for tests; O(N^2) — small N only)."""
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = keyed.alias("a"), keyed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (vec_norm(F.col("a.v")) * vec_norm(F.col("b.v"))), 6)
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
