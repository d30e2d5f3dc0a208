"""Image near-duplicate detection over 64-bit perceptual hashes.

The reference stores fetched images verbatim (SaveToFile,
lib/spider_man/pipeline/save_to_file.ex:32-49) and leaves dedup to the
consumer; a training-data pipeline over the same payloads needs it
first-class.  The rebuild's items table already carries a ``phash``
column (computed once, inside the crawl's Arrow-batched decode pass —
sources/parse.py), so image dedup is a *sketch-column* problem, the
same shape as SimHash text dedup:

  banded candidate generation (pigeonhole-exact: any pair within
  ``chunks - 1`` Hamming bits shares at least one identical chunk)
  -> equi-join per (chunk_idx, chunk_value) bucket
  -> exact Hamming verify on the full 64 bits.

Never all-pairs: the only joins are bucket equi-joins, so the plan
survives 10^10 images the same way the MinHash/SimHash paths survive
10^10 documents.  ``max_bucket`` drops degenerate buckets (e.g. the
all-black-thumbnail phash) the way the LSH paths do; at the default
none are dropped and the result is exactly brute force (pytest-proven
equivalence in tests/test_imagededup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_man_spark.functions.sketches import hamming64, simhash_chunks

_CHUNK_CHOICES = (2, 4, 8, 16, 32)


def _chunks_for(max_hamming: int) -> int:
    """Smallest 64-divisor band count that keeps banding exact
    (chunks > max_hamming => complete recall by pigeonhole)."""
    for c in _CHUNK_CHOICES:
        if c > max_hamming:
            return c
    raise ValueError(f"max_hamming {max_hamming} too large for 64-bit banding")


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str,
    sketch_col: str,
    *,
    max_hamming: int = 3,
    chunks: int | None = None,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming) over any int64 sketch
    column — phash, SimHash, sign-sketch — via banded bucket joins.

    With the default ``chunks`` (smallest 64-divisor > max_hamming)
    and no bucket overflow, the result equals the O(N^2) brute-force
    pair scan exactly; only the *algorithm* is scale-shaped.
    """
    chunks = chunks or _chunks_for(max_hamming)
    if 64 % chunks or chunks <= max_hamming:
        raise ValueError(
            f"chunks={chunks} must divide 64 and exceed max_hamming={max_hamming}"
        )
    sk = df.select(
        F.col(id_col).alias("id"), F.col(sketch_col).cast("long").alias("sk")
    ).filter(F.col("sk").isNotNull())
    banded = sk.select(
        "id", "sk", F.posexplode(simhash_chunks(F.col("sk"), chunks)).alias("ci", "chunk")
    )
    # guard degenerate buckets by ANTI-joining the OVERSIZED bucket
    # list (usually empty, bounded by N/max_bucket at any scale — the
    # broadcastable side by construction) instead of inner-joining the
    # small-bucket whitelist: one broadcast anti-join replaces a
    # full-width sort-merge join of the banded rows (−1 exchange, −2
    # sorts; results identical — every banded bucket appears in sizes)
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
            hamming64(F.col("a.sk"), F.col("b.sk")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_neardup_pairs(
    items: DataFrame, *, max_hamming: int = 3, max_bucket: int = 100_000
) -> DataFrame:
    """Perceptual near-dup image pairs over an items-like DataFrame
    (``image_id``, ``phash``) — the input_hint table shape.  Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    return hamming_neardup_pairs(
        items, "image_id", "phash", max_hamming=max_hamming, max_bucket=max_bucket
    )


def exact_dup_images(items: DataFrame) -> DataFrame:
    """Byte-identical duplicate groups: (content_key, n_copies, keep_id)
    keeping the lexicographically-first image_id per group — the exact
    tier that runs before any perceptual pass (identical bytes never
    need a Hamming verify).  One hash-aggregate, map-side combined."""
    return (
        items.select("image_id", F.xxhash64("bytes").alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("image_id").alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def brute_force_hamming_pairs(
    df: DataFrame, id_col: str, sketch_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """O(N^2) cross-join oracle for :func:`hamming_neardup_pairs` —
    tests/small-N only (the banded path is the production shape)."""
    sk = df.select(
        F.col(id_col).alias("id"), F.col(sketch_col).cast("long").alias("sk")
    ).filter(F.col("sk").isNotNull())
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sk"), F.col("b.sk")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def image_dedup_keep(
    items: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket: int = 100_000,
    prefer=None,
    cc_stats: dict | None = None,
) -> DataFrame:
    """One kept image per duplicate CLUSTER (exact ∪ perceptual,
    transitively closed): the full dedup pass, returning the surviving
    rows of ``items``.

    Two-tier pair generation keeps the plan linear in copy counts:

    1. byte-exact groups collapse first — each member pairs with its
       group's min id (``c`` copies -> ``c-1`` pairs, never the
       ``c(c-1)/2`` a bucket self-join would emit for a viral
       exact-duplicate image);
    2. :func:`phash_neardup_pairs` runs over one REPRESENTATIVE per
       distinct byte content only (identical bytes have identical
       phash, so the perceptual tier loses nothing and its bucket
       join never sees exact-copy multiplicity).

    The union of both pair sets is folded into components
    (``operators/groups.py`` large-star/small-star, O(log n) rounds)
    and :func:`~spider_man_spark.operators.groups.keep_canonical`
    keeps the min ``image_id`` per cluster (or the ``prefer``
    minimizer, e.g. highest resolution)."""
    from spider_man_spark.operators.groups import (
        connected_components,
        keep_canonical,
    )

    # (hash, length) composite content key (round-7 advice): a bare
    # 64-bit xxhash64 has birthday collisions in the millions at the
    # 10^10-image design point, and a collision HERE feeds
    # keep_canonical — it would silently delete a distinct image.
    # The length component makes an undetected collision require both
    # an equal hash and an equal byte length (~2^-80-ish combined),
    # at zero extra shuffle width (two longs vs one).
    keyed = items.select(
        "image_id",
        F.struct(
            F.xxhash64("bytes").alias("h"),
            F.length("bytes").alias("n"),
        ).alias("__ck"),
    )
    reps = keyed.groupBy("__ck").agg(F.min("image_id").alias("__rep"))
    with_rep = keyed.join(reps, "__ck")
    exact_pairs = with_rep.filter(
        F.col("image_id") != F.col("__rep")
    ).select(F.col("__rep").alias("id_a"), F.col("image_id").alias("id_b"))
    # the perceptual tier needs only (image_id, phash) — project BEFORE
    # the representative semi-join so the image BYTES never enter this
    # branch's exchanges (guide §2.3/§8: shuffle proxies, not payloads)
    rep_items = items.select("image_id", "phash").join(
        reps.select(F.col("__rep").alias("image_id")), "image_id", "left_semi"
    )
    near_pairs = phash_neardup_pairs(
        rep_items, max_hamming=max_hamming, max_bucket=max_bucket
    ).select("id_a", "id_b")
    groups = connected_components(
        exact_pairs.unionByName(near_pairs),
        a_col="id_a",
        b_col="id_b",
        nodes=items.select("image_id"),
        stats=cc_stats,
    )
    return keep_canonical(items, groups, id_col="image_id", prefer=prefer)
