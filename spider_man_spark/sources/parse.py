"""Parse stage — the Spider/handle_response analogue.

The reference's spider callback maps one Response to
``%{requests: [...], items: [...]}`` (component/spider.ex:45-82);
requests flow *backwards* into the frontier (the feedback edge,
spider.ex:70), items flow to the item-processor.  Here the default
parse is **pure column expressions** (regexp link extraction +
explode) plus one Arrow-batched decode pass for image payloads; a user
``handle_response`` callback can replace it as a ``mapInPandas``
function emitting the same union schema.

Image semantics mirror Pipeline.SaveToFile (save_to_file.ex:32-49):
responses flagged ``save2file``/``save2file_and_skip`` (or with an
``image/*`` content type) become item rows carrying the raw bytes;
``_and_skip`` additionally keeps the response out of link extraction.
The caption round-trips from the *linking page* through the image
request's ``options`` map — the reference's request-options metadata
channel (component.ex:45-48).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_man_spark.functions.images import decode_image, image_format, phash64
from spider_man_spark.schemas import DEFAULT_ITEM_RETRIES, DEFAULT_REQUEST_RETRIES

HREF_RE = r'href="([^"]+)"'
IMGSRC_RE = r'<img src="([^"]+)"'
CAPTION_RE = r'<p class="caption">([^<]*)</p>'

# Union output schema for custom handle_response callbacks.
PARSE_OUT_SCHEMA = (
    "kind string, url string, depth int, priority int, flag string, "
    "options map<string,string>, image_id string, bytes binary, "
    "caption string"
)


def split_images(fetched_ok: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(pages, images): images = save2file-flagged or image/* responses."""
    # coalesce: NULL flag/content_type must read as "not an image",
    # not SQL-NULL (which a filter would silently drop on both sides)
    is_image = F.coalesce(
        F.col("flag").isin("save2file", "save2file_and_skip"), F.lit(False)
    ) | F.coalesce(F.col("content_type").startswith("image/"), F.lit(False))
    return fetched_ok.filter(~is_image), fetched_ok.filter(is_image)


def extract_requests(pages: DataFrame) -> DataFrame:
    """Link extraction as JVM exprs -> new frontier candidate rows.

    Page links become plain requests (depth+1); ``<img src>`` targets
    become ``save2file``-flagged requests carrying the page caption in
    options (consumed by :func:`items_from_images` after their fetch).
    """
    body_str = F.col("body").cast("string")
    base = pages.select(
        "url",
        (F.col("depth") + 1).alias("depth"),
        F.col("priority"),
        F.regexp_extract_all(body_str, F.lit(HREF_RE), F.lit(1)).alias("hrefs"),
        F.regexp_extract_all(body_str, F.lit(IMGSRC_RE), F.lit(1)).alias("imgs"),
        F.regexp_extract(body_str, CAPTION_RE, 1).alias("caption"),
    )
    page_reqs = base.select(
        F.explode("hrefs").alias("url"),
        "depth",
        "priority",
        F.lit(None).cast("string").alias("flag"),
        F.lit(None).cast("map<string,string>").alias("options"),
    )
    img_reqs = base.select(
        F.explode("imgs").alias("url"),
        "depth",
        "priority",
        F.lit("save2file").alias("flag"),
        F.create_map(F.lit("caption"), F.col("caption")).alias("options"),
    )
    out = page_reqs.unionByName(img_reqs)
    return out.select(
        F.col("url").alias("url_key"),
        "url",
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("int").alias("host_salt"),
        F.lit(None).cast("long").alias("url_hash"),
        "depth",
        "priority",
        F.lit(DEFAULT_REQUEST_RETRIES).alias("retries"),
        "flag",
        "options",
    )


def items_from_images(images: DataFrame, epoch: int) -> DataFrame:
    """Decode fetched image bytes into typed item rows (ITEMS_SCHEMA).

    Arrow-batched; per-buffer decode is inherent to image codecs, the
    Spark boundary stays vectorized.  Caption comes from the request's
    options (round-tripped from the linking page).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ws, hs, ph = [0] * n, [0] * n, [0] * n
            fmts: list[str | None] = [None] * n
            ok = [False] * n
            for i, data in enumerate(pdf["body"].values):
                if data is None:
                    continue
                data = bytes(data)
                fmts[i] = image_format(data)
                try:
                    px = decode_image(data, fmts[i])
                except (NotImplementedError, ValueError):
                    continue
                hs[i], ws[i] = px.shape[:2]
                ph[i] = phash64(px)
                ok[i] = True
            captions = [
                (o or {}).get("caption") for o in pdf["options"].values
            ]
            yield pd.DataFrame(
                {
                    "image_id": pdf["url_key"].values,
                    "bytes": pdf["body"].values,
                    "w": pd.array(ws, dtype="int32"),
                    "h": pd.array(hs, dtype="int32"),
                    "fmt": fmts,
                    "caption": captions,
                    "phash": pd.array(ph, dtype="int64"),
                    "decode_ok": ok,
                }
            )

    decoded = images.select("url_key", "body", "options").mapInPandas(
        _decode,
        schema=(
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long, decode_ok boolean"
        ),
    )
    return decoded.filter("decode_ok").select(
        "image_id",
        "bytes",
        "w",
        "h",
        "fmt",
        "caption",
        "phash",
        F.lit(DEFAULT_ITEM_RETRIES).alias("retries"),
        F.lit(epoch).cast("int").alias("epoch"),
    )


def saved_url(url_key, save_dir: str):
    """The storage-path URL a stored save2file response continues
    with (save_to_file.ex:40-44 rewrites env.url to ``dir/key``; here
    the 'file' is the items-table row keyed by url_key)."""
    return F.concat(F.lit(save_dir.rstrip("/") + "/"), url_key)


def page_features(fetched_ok: DataFrame, epoch: int) -> DataFrame:
    """Per-fetched-page text features (PAGE_FEATURES_SCHEMA) — the
    bridge from the crawl into a training-data pipeline: a
    quality-filtered corpus is this table joined back to bodies with a
    quality/lang predicate.  Pure column exprs, computed in the same
    pass that already holds the body (no extra scan of the fetched
    cache beyond this projection)."""
    from spider_man_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    pages, _images = split_images(fetched_ok)
    t = F.col("body").cast("string")
    return pages.select(
        "url_key",
        "host",
        F.length(t).cast("int").alias("n_chars"),
        token_count(t).cast("int").alias("n_tokens"),
        lang_id(t).alias("lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
        F.lit(epoch).cast("int").alias("epoch"),
    )


def default_parse(
    fetched_ok: DataFrame, epoch: int, save_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(new_requests, items) from successful fetches.

    ``save2file_and_skip`` images still produce items but (like the
    reference's ``:skiped``) nothing is forwarded for link extraction
    — for pages, the flag drops them entirely.  When ``save_dir`` is
    set, plain ``save2file`` responses additionally *continue to the
    spider* with their url rewritten to the storage path
    (save_to_file.ex:40-44 non-skip semantics).
    """
    pages, images = split_images(fetched_ok)
    pages = pages.filter(
        (F.col("flag").isNull()) | (F.col("flag") != "save2file_and_skip")
    )
    if save_dir:
        forwarded = images.filter(F.col("flag") == "save2file").withColumn(
            "url", saved_url(F.col("url_key"), save_dir)
        )
        pages = pages.unionByName(forwarded)
    return extract_requests(pages), items_from_images(images, epoch)


def custom_parse(
    fetched_ok: DataFrame,
    handle_response: Callable[[pd.DataFrame], pd.DataFrame],
    epoch: int,
) -> tuple[DataFrame, DataFrame]:
    """Run a user handle_response (pandas-batch in, PARSE_OUT_SCHEMA
    out with kind in {'request','item'}) and split the union."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = handle_response(pdf)
            yield out

    union = fetched_ok.mapInPandas(_run, schema=PARSE_OUT_SCHEMA)
    reqs = union.filter(F.col("kind") == "request").select(
        F.col("url").alias("url_key"),
        "url",
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("int").alias("host_salt"),
        F.lit(None).cast("long").alias("url_hash"),
        F.coalesce("depth", F.lit(0)).alias("depth"),
        F.coalesce("priority", F.lit(0)).alias("priority"),
        F.lit(DEFAULT_REQUEST_RETRIES).alias("retries"),
        "flag",
        "options",
    )
    items = union.filter(F.col("kind") == "item").select(
        F.coalesce("image_id", "url").alias("image_id"),
        "bytes",
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit(None).cast("string").alias("fmt"),
        "caption",
        F.lit(None).cast("long").alias("phash"),
        F.lit(DEFAULT_ITEM_RETRIES).alias("retries"),
        F.lit(epoch).cast("int").alias("epoch"),
    )
    return reqs, items
