"""Row builders — the ``SpiderMan.Utils`` analogues.

The reference imports ``build_request/1-3``, ``build_requests``,
``build_item/2-4``, ``set_key/2``, ``set_flag/2`` into every spider
(``lib/spider_man/utils.ex:11-42``, via ``use SpiderMan``,
``lib/spider_man.ex:64-85``).  Defaults preserved exactly:
Request.key = url, Request.retries = 3, Item.retries = 1.

These build plain dicts matching ``schemas.FRONTIER_SCHEMA`` /
``ITEMS_SCHEMA``; ``rows -> spark.createDataFrame(rows, schema)``.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from spider_man_spark.schemas import (
    DEFAULT_ITEM_RETRIES,
    DEFAULT_REQUEST_RETRIES,
)


def build_request(
    url: str,
    options: dict[str, str] | None = None,
    retries: int = DEFAULT_REQUEST_RETRIES,
    *,
    key: str | None = None,
    flag: str | None = None,
    depth: int = 0,
    priority: int = 0,
) -> dict[str, Any]:
    """Frontier row; key defaults to url (utils.ex:19-21)."""
    opts = {"method": "get"}
    if options:
        opts.update(options)
    return {
        "url_key": key if key is not None else url,
        "url": url,
        "host": None,  # derived by canonicalize_frontier
        "host_salt": None,
        "url_hash": None,
        "depth": depth,
        "priority": priority,
        "retries": retries,
        "flag": flag,
        "options": opts,
    }


def build_requests(
    urls: Iterable[str],
    options: dict[str, str] | None = None,
    retries: int = DEFAULT_REQUEST_RETRIES,
    **kw: Any,
) -> list[dict[str, Any]]:
    return [build_request(u, options, retries, **kw) for u in urls]


def build_item(
    key: str,
    value: dict[str, Any] | None = None,
    options: dict[str, str] | None = None,
    retries: int = DEFAULT_ITEM_RETRIES,
) -> dict[str, Any]:
    """Items row (utils.ex:31-33: retries default 1).

    ``value`` maps onto the typed item columns from input_hint; any of
    bytes/w/h/fmt/caption/phash may be present.
    """
    value = value or {}
    return {
        "image_id": key,
        "bytes": value.get("bytes"),
        "w": value.get("w"),
        "h": value.get("h"),
        "fmt": value.get("fmt"),
        "caption": value.get("caption"),
        "phash": value.get("phash"),
        "epoch": value.get("epoch"),
        "_retries": retries,
        "_options": options or {},
    }


def build_items(pairs: Iterable[tuple[str, dict[str, Any]]]) -> list[dict[str, Any]]:
    return [build_item(k, v) for k, v in pairs]


def set_key(row: dict[str, Any], key: str) -> dict[str, Any]:
    out = dict(row)
    out["url_key" if "url_key" in out else "image_id"] = key
    return out


def set_flag(row: dict[str, Any], flag: str) -> dict[str, Any]:
    out = dict(row)
    out["flag"] = flag
    return out
