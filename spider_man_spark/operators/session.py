"""Session/cookie state — the Pipeline.SetCookie analogue.

Reference semantics (pipeline/set_cookie.ex): on a *Response*, harvest
``set-cookie`` headers and uniq-union them into shared state
(set_cookie.ex:36-45,78-87); on a *Request*, inject the accumulated
``cookie`` header (set_cookie.ex:22-34).  The reference jar is a
global singleton; the rebuild keys it per host (the reference is the
one-host special case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_put(options: Column, key: str, value: Column) -> Column:
    """Set ``options[key] = value``, *replacing* any existing entry.

    Engine-injected keys (h:cookie, h:user-agent) survive on rows that
    come back through the retry path; a plain ``map_concat`` would then
    hit Spark's default ``spark.sql.mapKeyDedupPolicy=EXCEPTION``
    (DUPLICATED_MAP_KEY) on re-injection — strip the key first."""
    base = F.coalesce(options, F.from_json(F.lit("{}"), "map<string,string>"))
    cleaned = F.map_filter(base, lambda k, _v: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), value))


def harvest_cookies(responses: DataFrame, epoch: int) -> DataFrame:
    """Aggregate set-cookie headers per host (SESSION_SCHEMA delta)."""
    got = responses.select(
        "host", F.col("headers").getItem("set-cookie").alias("c")
    ).filter(F.col("c").isNotNull())
    # one set-cookie header may carry a single pair; split defensively
    pairs = got.select("host", F.explode(F.split("c", ";\\s*")).alias("cookie"))
    agg = pairs.groupBy("host").agg(
        F.array_sort(F.collect_set("cookie")).alias("cookies")
    )
    return agg.select(
        "host",
        "cookies",
        F.array_join("cookies", "; ").alias("cookies_str"),
        F.lit(epoch).cast("int").alias("epoch"),
    )


def merge_sessions(prev: DataFrame | None, new: DataFrame, epoch: int) -> DataFrame:
    """Uniq-union per host (set_cookie.ex:82-86), sorted for
    deterministic cookies_str."""
    if prev is None:
        return new
    both = prev.select("host", "cookies").unionByName(
        new.select("host", "cookies")
    )
    merged = (
        both.select("host", F.explode("cookies").alias("cookie"))
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("cookie")).alias("cookies"))
    )
    return merged.select(
        "host",
        "cookies",
        F.array_join("cookies", "; ").alias("cookies_str"),
        F.lit(epoch).cast("int").alias("epoch"),
    )


def inject_cookie_header(requests: DataFrame, session: DataFrame | None) -> DataFrame:
    """Attach the per-host cookie string into request options
    (broadcast join — session state is per-host, tiny vs frontier)."""
    if session is None:
        return requests
    s = session.select("host", "cookies_str")
    joined = requests.join(F.broadcast(s), "host", "left")
    opts = F.when(
        F.col("cookies_str").isNotNull(),
        map_put(F.col("options"), "h:cookie", F.col("cookies_str")),
    ).otherwise(F.col("options"))
    return joined.withColumn("options", opts).drop("cookies_str")
