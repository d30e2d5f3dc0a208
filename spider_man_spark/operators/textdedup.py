"""Document deduplication at training-data scale.

Five strategies over a ``documents``-shaped table, each a composition
of built-in DataFrame ops (the LSH family's only Python is the SimHash
sketch UDF):

* exact        — hash-groupBy on the normalized text fingerprint
* minhash_lsh  — shingle -> minhash (exprs) -> band -> bucket self-join
                 -> exact-Jaccard verify
* simhash      — 64-bit sketch -> chunk banding -> Hamming verify
* ngram_jaccard— exact char-ngram Jaccard via explode + equi-join
                 (the no-false-negative baseline for small corpora)
* embedding    — cosine near-dup over a vector column (see
                 operators/similarity.py for the LSH-bucketed variant)

Scale notes: every candidate-pair generator is a *bucket equi-join*
(shuffle on band/bucket key) — never a cross join.  Bucket skew (a
degenerate band value catching everything) is the classic LSH failure;
AQE skew-join splitting handles moderate cases and `max_bucket` guards
pathological ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_man_spark.functions.sketches import (
    char_ngrams,
    hamming64,
    jaccard,
    lsh_band_hashes,
    minhash_signature,
    simhash64,
    simhash_chunks,
    word_shingles,
)
from spider_man_spark.functions.text import fingerprint, normalize_text


def dedupe_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the min-id representative per normalized-text
    fingerprint (one hash-shuffle, no sort)."""
    keyed = df.withColumn("__fp", fingerprint(F.col(text_col)))
    reps = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return keyed.join(reps, [ "__fp", id_col], "inner").drop("__fp")


def exact_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_a, id_b) pairs of exact duplicates (a < b)."""
    keyed = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fp")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, "__fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH with exact-Jaccard verification.

    Pipeline: shingles + signature + band hashes (all codegen exprs)
    -> explode bands -> self-join on (band_idx, band_hash) -> distinct
    candidate pairs -> verify jaccard >= threshold on the (re-derived)
    shingle sets.  ``max_bucket`` drops degenerate buckets.
    """
    rows_per_band = num_perm // bands
    sketched = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_perm))
    banded = sketched.select(
        "id",
        F.posexplode(lsh_band_hashes(F.col("sig"), bands, rows_per_band)).alias(
            "band", "bh"
        ),
    )
    # guard degenerate buckets before the self-join: anti-join the
    # OVERSIZED bucket list (bounded by N/max_bucket rows at any scale
    # — broadcastable by construction) rather than inner-joining the
    # whitelist; one broadcast anti-join replaces a full-width
    # sort-merge join of the banded rows, results identical
    sizes = banded.groupBy("band", "bh").agg(F.count("*").alias("__n"))
    banded = banded.join(
        F.broadcast(
            sizes.filter(F.col("__n") > max_bucket).select("band", "bh")
        ),
        ["band", "bh"],
        "left_anti",
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = sketched.select("id", "sh")
    verified = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs via 64-bit SimHash: chunk banding generates
    candidates (pigeonhole: dist <= chunks-1 collides somewhere),
    exact Hamming verifies."""
    sk = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    )
    banded = sk.select(
        "id", "sim", F.posexplode(simhash_chunks(F.col("sim"), chunks)).alias("ci", "chunk")
    )
    # same oversized-bucket broadcast anti-join guard as
    # minhash_lsh_pairs (see comment there)
    sizes = banded.groupBy("ci", "chunk").agg(F.count("*").alias("__n"))
    banded = banded.join(
        F.broadcast(
            sizes.filter(F.col("__n") > max_bucket).select("ci", "chunk")
        ),
        ["ci", "chunk"],
        "left_anti",
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["ci", "chunk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (a < b) — explode the
    distinct grams, equi-join on gram, count intersections, derive
    |union| = |A|+|B|-|inter|.  No approximation: the ground-truth
    oracle for the LSH variants at small scale."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_ngrams(F.col(text_col), n))).alias("g"),
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, F.col("a.g") == F.col("b.g"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedupe_near(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    prefer=None,
    cc_stats: dict | None = None,
) -> DataFrame:
    """The full near-dedup pass: :func:`minhash_lsh_pairs` ->
    transitive clusters (large-star/small-star connected components,
    ``operators/groups.py``) -> one kept row per cluster (min id, or
    the ``prefer`` minimizer — e.g. longest doc).  The text-side twin
    of ``operators/imagededup.image_dedup_keep``; run
    :func:`dedupe_exact` first so exact-copy multiplicity never
    reaches the LSH bucket join."""
    from spider_man_spark.operators.groups import (
        connected_components,
        keep_canonical,
    )

    pairs = minhash_lsh_pairs(
        df, id_col=id_col, text_col=text_col, threshold=threshold,
        shingle_k=shingle_k, num_perm=num_perm, bands=bands,
    )
    groups = connected_components(
        pairs, a_col="id_a", b_col="id_b",
        nodes=df.select(id_col), stats=cc_stats,
    )
    return keep_canonical(df, groups, id_col=id_col, prefer=prefer)
