"""Deterministic synthetic web corpus — the Requester.JustReturn analogue.

The reference stubs the network in tests with a requester returning
``{:ok, %Tesla.Env{url: url}}`` (test/support/just_return.ex:4-8); the
rebuild's stub fetch is a *join against this corpus table*, which also
carries image payloads for the SaveToFile path (save_to_file.ex:32-49)
per the input_hint schema.

Page rows are generated **distributed and JVM-side** (spark.range +
column exprs — no Python in the generator hot path) so a 10^8-page
corpus is as cheap as a 10^3-page one per-core; image rows are
generated distributed too (Arrow-batched numpy encode, crc32-seeded
so driver/executor placement can't change the pixels).

Graph shape (all arithmetic, fully deterministic):
  host i => ``http://h{i}.test/p/{j}`` for j < pages(i); the first
  ``hot_hosts`` hosts get 10x pages (hot-domain skew on purpose).
  Page j links to ``out_degree`` same-host pages ((j*7+k+1) mod P) and,
  when j%5==0, one cross-host page — so a BFS from page 0 expands.
  Every page embeds one image tag + a caption paragraph.
  status: 200 except j%37==13 -> 500 (retryable) and j%41==17 -> 404.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_man_spark.functions.images import (
    make_image,
    phash64,
    png_encode,
    qimg_encode,
)
from spider_man_spark.schemas import CORPUS_SCHEMA


def host_name(i: int) -> str:
    return f"h{i}.test"


def page_url(host_idx: int, page_idx: int) -> str:
    return f"http://h{host_idx}.test/p/{page_idx}"


def image_url(host_idx: int, img_idx: int) -> str:
    return f"http://h{host_idx}.test/img/{img_idx}"


def image_id_of(host_idx: int, img_idx: int) -> str:
    return f"h{host_idx}-img{img_idx}"


def caption_of(host_idx: int, img_idx: int) -> str:
    return f"caption-{image_id_of(host_idx, img_idx)}"


def make_corpus(
    spark: SparkSession,
    n_hosts: int = 4,
    pages_per_host: int = 25,
    out_degree: int = 3,
    images_per_host: int = 4,
    hot_hosts: int = 1,
    seed: int = 42,
    image_fmt: str = "png",
    crawl_delays: tuple[int, ...] = (0, 100, 200),
    body_filler_bytes: int = 0,
) -> DataFrame:
    """Build the corpus DataFrame (CORPUS_SCHEMA).

    ``body_filler_bytes`` pads each page body with deterministic
    md5-chain hex (compression-resistant, regex-inert) — the scaling
    bench uses it to give pages design-point weight (~KBs) instead of
    ~300 bytes, so per-row fetch/parse compute dominates fixed stage
    latency."""
    # --- per-host page counts (hot hosts get 10x) ---
    hosts = spark.createDataFrame(
        [
            (i, host_name(i), pages_per_host * (10 if i < hot_hosts else 1),
             crawl_delays[i % len(crawl_delays)])
            for i in range(n_hosts)
        ],
        "host_idx int, host string, n_pages int, crawl_delay_ms int",
    )

    pages = hosts.select(
        "host_idx",
        "host",
        "n_pages",
        "crawl_delay_ms",
        F.explode(F.sequence(F.lit(0), F.col("n_pages") - 1)).alias("page_idx"),
    )

    j = F.col("page_idx")
    hi = F.col("host_idx")
    np_ = F.col("n_pages")

    same_host_links = F.transform(
        F.sequence(F.lit(0), F.lit(out_degree - 1)),
        lambda k: F.format_string(
            "http://h%d.test/p/%d", hi, (j * 7 + k + 1) % np_
        ),
    )
    cross_link = F.format_string(
        "http://h%d.test/p/%d",
        (hi + j + 1) % F.lit(n_hosts),
        j % F.lit(pages_per_host),
    )
    links = F.when(
        j % 5 == 0, F.concat(same_host_links, F.array(cross_link))
    ).otherwise(same_host_links)

    # images_per_host == 0: a text-only corpus — pages carry no <img>
    # tag (and no caption) and the image-row leg is skipped entirely;
    # the raw modulo would divide by zero under ANSI mode
    img_idx = j % F.lit(max(images_per_host, 1))
    img_src = F.format_string("http://h%d.test/img/%d", hi, img_idx)
    caption = (
        F.format_string("caption-h%d-img%d", hi, img_idx)
        if images_per_host > 0
        else F.lit(None).cast("string")
    )

    anchors = F.aggregate(
        links,
        F.lit(""),
        lambda acc, u: F.concat(acc, F.lit('<a href="'), u, F.lit('">l</a>')),
    )
    filler = F.lit("")
    if body_filler_bytes > 0:
        # 16 hex chars per xxhash64 chunk — deterministic per
        # (host, page, i), hash-uniform (compression-resistant like
        # the previous md5 chain at ~10x less generation CPU), and
        # marker-free so the parser is unaffected
        n_chunks = (body_filler_bytes + 15) // 16
        filler = F.concat(
            F.lit("<p>"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_chunks)),
                    lambda i: F.lpad(
                        F.hex(F.xxhash64(hi, j, i)), 16, "0"
                    ),
                ),
                "",
            ),
            F.lit("</p>"),
        )
    img_part = (
        F.concat(
            F.lit('<img src="'),
            img_src,
            F.lit('"/><p class="caption">'),
            caption,
            F.lit("</p>"),
        )
        if images_per_host > 0
        else F.lit("")
    )
    body = F.concat(
        F.lit("<html><body>"),
        anchors,
        img_part,
        filler,
        F.lit("</body></html>"),
    )

    status = (
        F.when(j % 37 == 13, F.lit(500))
        .when(j % 41 == 17, F.lit(404))
        .otherwise(F.lit(200))
    )

    page_rows = pages.select(
        F.format_string("http://h%d.test/p/%d", hi, j).alias("url"),
        F.col("host"),
        status.alias("status"),
        F.lit("text/html").alias("content_type"),
        body.cast("binary").alias("body"),
        links.alias("links"),
        caption.alias("caption"),
        F.col("crawl_delay_ms"),
        F.when(j == 0, F.format_string("sid=h%d", hi)).otherwise(
            F.lit(None)
        ).alias("set_cookie"),
    )

    # --- image rows: real encoded payloads, generated DISTRIBUTED
    # (mapInPandas over a range — the generator itself must scale;
    # determinism comes from crc32-seeded make_image, not process
    # state) ---
    n_images = n_hosts * images_per_host
    ndelays = len(crawl_delays)
    delay_arr = list(crawl_delays)

    def _gen_images(batches):
        for pdf in batches:
            rows = []
            for gid in pdf["id"].values:
                i, k = int(gid) // images_per_host, int(gid) % images_per_host
                iid = image_id_of(i, k)
                px = make_image(iid, 32 + 8 * (k % 4), 32 + 8 * (i % 3), seed)
                enc = png_encode if image_fmt == "png" else qimg_encode
                rows.append(
                    {
                        "url": image_url(i, k),
                        "host": host_name(i),
                        "status": 200,
                        "content_type": f"image/{image_fmt}",
                        "body": enc(px),
                        "links": [],
                        "caption": caption_of(i, k),
                        "crawl_delay_ms": delay_arr[i % ndelays],
                        "set_cookie": None,
                    }
                )
            yield pd.DataFrame(rows)

    parallelism = max(spark.sparkContext.defaultParallelism, 1)
    images = spark.range(n_images).repartition(
        min(parallelism, max(n_images // 32, 1))
    ).mapInPandas(_gen_images, schema=CORPUS_SCHEMA)

    # --- robots.txt per host: the ground truth the engine's politeness
    # bootstrap PARSES (crawl-delay in seconds, fractional ok; /admin
    # is disallowed everywhere — no such pages exist, so it exercises
    # the disallow path without changing the reachable graph) ---
    robots_body = F.concat(
        F.lit("User-agent: *\n"),
        F.when(
            F.col("crawl_delay_ms") > 0,
            F.concat(
                F.lit("Crawl-delay: "),
                (F.col("crawl_delay_ms") / 1000.0).cast("string"),
                F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("host_idx") % 4 == 1, F.lit("Disallow: /admin\n")
        ).otherwise(F.lit("")),
    )
    robots_rows = hosts.select(
        F.format_string("http://h%d.test/robots.txt", F.col("host_idx")).alias(
            "url"
        ),
        F.col("host"),
        F.lit(200).alias("status"),
        F.lit("text/plain").alias("content_type"),
        robots_body.cast("binary").alias("body"),
        F.lit(None).cast("array<string>").alias("links"),
        F.lit(None).cast("string").alias("caption"),
        F.col("crawl_delay_ms"),
        F.lit(None).cast("string").alias("set_cookie"),
    )
    return page_rows.unionByName(images).unionByName(robots_rows)


def expected_image_phash(host_idx: int, img_idx: int, seed: int = 42) -> int:
    """Oracle helper for tests: the phash the crawl must produce."""
    iid = image_id_of(host_idx, img_idx)
    px = make_image(iid, 32 + 8 * (img_idx % 4), 32 + 8 * (host_idx % 3), seed)
    return phash64(px)


# ---------------------------------------------------------------------------
# Standalone image+caption table (the input_hint shape)
# ---------------------------------------------------------------------------

IMAGE_TABLE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

_IMG_DUP_PERIOD = 10  # per 10 images: 8 unique, 1 exact dup, 1 near dup


def make_image_table(
    spark: SparkSession,
    n_images: int,
    *,
    size: int = 64,
    seed: int = 42,
    fmts: tuple[str, ...] = ("png", "qimg"),
) -> DataFrame:
    """Deterministic image+caption table with exactly the input_hint
    columns ``(image_id, bytes, w, h, fmt, caption, phash)``.

    Generated DISTRIBUTED (mapInPandas over a range; pixels are
    crc32-seeded so executor placement can't change them).  Every
    group of 10 consecutive ids plants one EXACT duplicate (slot 8:
    byte-identical to slot 0, shared caption) and one NEAR duplicate
    (slot 9: slot 0's pixels with a +6 bump to the top-left 8x8-grid
    cell — moves one phash block mean, so Hamming(phash) stays small
    but nonzero in general) — ground truth for the exact and
    perceptual dedup tiers.  ``phash`` is computed from the encode ->
    decode round trip, so it is definitionally the value
    :func:`spider_man_spark.functions.images.decode_items` reproduces
    (for lossy ``qimg`` that means post-quantization pixels).
    """
    from spider_man_spark.functions.images import decode_image

    def _gen(batches):
        for pdf in batches:
            rows = []
            for gid in pdf["id"].values:
                i = int(gid)
                slot = i % _IMG_DUP_PERIOD
                base = i - slot if slot >= 8 else i
                iid = f"img{i:09d}"
                fmt = fmts[base % len(fmts)]
                px = make_image(f"img{base:09d}", size, size, seed)
                if slot == 9:
                    px = px.copy()
                    c = size // 8
                    px[:c, :c] = (
                        px[:c, :c].astype("int16") + 6
                    ).clip(0, 255).astype("uint8")
                enc = png_encode if fmt == "png" else qimg_encode
                data = enc(px)
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": data,
                        "w": size,
                        "h": size,
                        "fmt": fmt,
                        "caption": f"caption for image group {base:09d}",
                        "phash": phash64(decode_image(data, fmt)),
                    }
                )
            yield pd.DataFrame(rows)

    parallelism = max(spark.sparkContext.defaultParallelism, 1)
    return (
        spark.range(n_images)
        .repartition(min(parallelism, max(n_images // 64, 1)))
        .mapInPandas(_gen, schema=IMAGE_TABLE_SCHEMA)
    )
