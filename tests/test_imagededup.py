"""Image perceptual/exact dedup: banded-Hamming phash pairs over the
input_hint-shaped image+caption table.

Reference parity: the reference stores image payloads verbatim
(save_to_file.ex:32-49) with no dedup stage — these operators are the
training-data extension over the same payload schema, so the tests
anchor on the planted ground truth of :func:`make_image_table`
(per 10 ids: slot 8 byte-identical to slot 0, slot 9 a perturbed
near dup) and on banded == brute-force equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_man_spark.functions.images import decode_items
from spider_man_spark.operators.imagededup import (
    brute_force_hamming_pairs,
    exact_dup_images,
    hamming_neardup_pairs,
    phash_neardup_pairs,
)
from spider_man_spark.sources.corpus import make_image_table

N = 120  # 12 dup groups


@pytest.fixture(scope="module")
def image_table(spark):
    df = make_image_table(spark, N).cache()
    df.count()
    yield df
    df.unpersist()


def test_image_table_is_input_hint_shaped_and_deterministic(spark, image_table):
    assert [(f.name, f.dataType.simpleString()) for f in image_table.schema.fields] == [
        ("image_id", "string"),
        ("bytes", "binary"),
        ("w", "int"),
        ("h", "int"),
        ("fmt", "string"),
        ("caption", "string"),
        ("phash", "bigint"),
    ]
    assert image_table.count() == N
    digest = F.sum(
        # decimal accumulator: a raw long sum overflows under ANSI
        F.xxhash64("image_id", "bytes", "phash").cast("decimal(38,0)")
    ).alias("d")
    agg = image_table.agg(digest).first()
    agg2 = make_image_table(spark, N).agg(digest).first()
    assert agg.d == agg2.d  # regeneration is byte/deterministic


def test_stored_phash_matches_decode_pass(image_table):
    """The stored phash column IS what the decode pipeline computes —
    the per-row invariant a 100 TB load enforces on every row."""
    dec = decode_items(image_table.select("image_id", "bytes"))
    joined = dec.join(
        image_table.select(
            "image_id", F.col("phash").alias("phash_stored")
        ),
        "image_id",
    )
    n_bad = joined.filter(
        (~F.col("decode_ok")) | (F.col("phash") != F.col("phash_stored"))
    ).count()
    assert n_bad == 0


def test_banded_equals_brute_force(image_table):
    banded = phash_neardup_pairs(image_table, max_hamming=3)
    brute = brute_force_hamming_pairs(
        image_table, "image_id", "phash", max_hamming=3
    )
    assert sorted(map(tuple, banded.collect())) == sorted(
        map(tuple, brute.collect())
    )


def test_banded_equals_brute_force_wider_radius(image_table):
    # h=6 forces 8-bit banding (chunks=8); still exact by pigeonhole
    banded = phash_neardup_pairs(image_table, max_hamming=6)
    brute = brute_force_hamming_pairs(
        image_table, "image_id", "phash", max_hamming=6
    )
    assert sorted(map(tuple, banded.collect())) == sorted(
        map(tuple, brute.collect())
    )


def test_planted_dups_are_found(image_table):
    pairs = phash_neardup_pairs(image_table, max_hamming=3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # every exact dup (slot 8) has phash == slot 0's -> hamming 0
    for g in range(N // 10):
        a, b = f"img{g * 10:09d}", f"img{g * 10 + 8:09d}"
        assert (a, b) in found
    ham0 = {(r.id_a, r.id_b) for r in pairs if r.hamming == 0}
    assert all(
        (f"img{g * 10:09d}", f"img{g * 10 + 8:09d}") in ham0
        for g in range(N // 10)
    )
    # the perturbed near dups (slot 9) land within the radius too
    near = sum(
        1
        for g in range(N // 10)
        if (f"img{g * 10:09d}", f"img{g * 10 + 9:09d}") in found
    )
    assert near >= (N // 10) * 2 // 3  # most perturbations stay <= 3 bits


def test_exact_dup_groups(image_table):
    groups = exact_dup_images(image_table).collect()
    assert len(groups) == N // 10
    assert all(g.n_copies == 2 for g in groups)
    assert {g.keep_id for g in groups} == {
        f"img{g * 10:09d}" for g in range(N // 10)
    }


def test_bucket_cap_drops_degenerate_buckets(spark):
    # 50 identical sketches + 2 distinct: with max_bucket < 50 the
    # degenerate bucket is dropped entirely (the documented guard),
    # the distinct pair is unaffected
    rows = [(f"a{i:02d}", 7) for i in range(50)] + [("z0", 1), ("z1", 1)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = hamming_neardup_pairs(
        df, "image_id", "phash", max_hamming=3, max_bucket=10
    ).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert ("z0", "z1") in ids
    assert not any(a.startswith("a") for a, _ in ids)


def test_chunks_validation(spark):
    df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "image_id", "phash", max_hamming=3, chunks=3)
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "image_id", "phash", max_hamming=8, chunks=8)


def test_image_dedup_keep_matches_union_find_oracle(spark, image_table):
    """image_dedup_keep == min-id per transitive cluster of the brute
    Hamming<=3 relation (exact pairs are its hamming-0 subset, so the
    two-tier pair generation must reproduce the one-tier closure)."""
    from spider_man_spark.operators.imagededup import image_dedup_keep

    ids = [r.image_id for r in image_table.select("image_id").collect()]
    brute = brute_force_hamming_pairs(
        image_table, "image_id", "phash", max_hamming=3
    ).collect()
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in brute:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted({find(i) for i in ids})

    kept = image_dedup_keep(image_table, max_hamming=3)
    got = sorted(r.image_id for r in kept.select("image_id").collect())
    assert got == want
    # planted structure: slots 8 (exact) and 9 (near) fold into slot 0,
    # so no kept id may be a planted-duplicate slot
    assert all(int(i[3:]) % 10 not in (8, 9) for i in got)
