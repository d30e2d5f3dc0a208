"""Politeness scheduler — per-host token budget + crawl-delay +
deterministic priority queue.

The reference rate-limits globally: 10 messages / 1000 ms on the
downloader producer (configuration.ex:8, producer/producer.ex:37-44),
and its within-budget *order* is undefined ETS hash order.  The
rebuild generalizes to **per-host** tokens and crawl-delay windows
(robots table) with a **defined ordering contract**
``(priority, depth, url_key)`` — global rate limiting is the one-host
special case, so reference semantics are preserved.

Scale design: a naive ``Window.partitionBy(host)`` rank sorts every
candidate of a hot host in one task.  Instead the rank is two-phase
("salted top-k"): phase 1 ranks within ``(host, salt)`` — ``rank_salts``
way fan-out bounds any task to ~|host|/salts rows — and keeps at most
``tokens`` per salted group; phase 2 re-ranks the surviving
``<= tokens * rank_salts`` rows per host exactly.  Phase 2's winners
are provably identical to a single global per-host rank: any row in
the true top-``tokens`` of a host is in the top-``tokens`` of its
salted subgroup, so it survives phase 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spider_man_spark.schemas import DEFAULT_TOKENS_PER_EPOCH

def order_cols() -> list:
    """Deterministic ordering contract (lazy: needs active session)."""
    return [F.col("priority").asc(), F.col("depth").asc(), F.col("url_key").asc()]


def parse_robots_bodies(
    robots_pages: DataFrame,
    tokens_default: int = DEFAULT_TOKENS_PER_EPOCH,
    epoch: int = 0,
) -> DataFrame:
    """Parse fetched ``/robots.txt`` bodies into ROBOTS_SCHEMA rows —
    pure column exprs (north_rule: per-host crawl-delay windows and
    disallow rules come from robots.txt state).

    Input needs (host, body) for status-200 robots responses.  Parsed:
    ``Crawl-delay: <seconds>`` (fractional allowed -> ms) and every
    ``Disallow: <prefix>`` under any user-agent section (conservative:
    a prefix disallowed for anyone is honored; empty ``Disallow:``
    lines — allow-all markers — are dropped)."""
    body_str = F.col("body").cast("string")
    delay_s = F.regexp_extract(
        body_str, r"(?i)crawl-delay:\s*([0-9]*\.?[0-9]+)", 1
    )
    prefixes = F.array_remove(
        F.transform(
            F.regexp_extract_all(
                body_str, F.lit(r"(?i)disallow:[ \t]*(\S*)"), F.lit(1)
            ),
            lambda p: F.trim(p),
        ),
        "",
    )
    return robots_pages.select(
        "host",
        F.when(delay_s == "", F.lit(0))
        .otherwise(F.round(delay_s.cast("double") * 1000).cast("int"))
        .alias("crawl_delay_ms"),
        F.lit(tokens_default).alias("tokens_per_epoch"),
        F.lit(0).cast("long").alias("next_allowed_ts"),
        F.when(F.size(prefixes) > 0, prefixes)
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("disallow_prefixes"),
        F.lit(epoch).cast("int").alias("epoch"),
    )


def join_robots(frontier: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Attach per-host politeness state (left join; hosts without a
    robots row get defaults).  robots is per-host — small relative to
    the frontier — so it is broadcast explicitly."""
    if robots is None:
        return (
            frontier.withColumn("crawl_delay_ms", F.lit(0))
            .withColumn("tokens_per_epoch", F.lit(None).cast("int"))
            .withColumn("next_allowed_ts", F.lit(0).cast("long"))
            .withColumn("disallow_prefixes", F.lit(None).cast("array<string>"))
        )
    r = robots.select(
        "host", "crawl_delay_ms", "tokens_per_epoch", "next_allowed_ts",
        "disallow_prefixes",
    )
    joined = frontier.join(F.broadcast(r), "host", "left")
    return (
        joined.withColumn("crawl_delay_ms", F.coalesce("crawl_delay_ms", F.lit(0)))
        .withColumn("next_allowed_ts", F.coalesce("next_allowed_ts", F.lit(0)))
    )


def disallow_pred() -> Column:
    """The robots disallow predicate over an enriched (join_robots)
    frame — a pure column expression, shared by robots_filter and the
    anti-join frontier commit so both sides classify identically."""
    path = F.regexp_extract(F.col("url"), r"^[a-z]+://[^/?#]*([^?#]*)", 1)
    return F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))


def robots_filter(
    df: DataFrame, epoch_ts: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(eligible, delayed, disallowed).

    ``delayed`` rows (crawl-delay window not yet open) go back to the
    frontier — time unblocks them.  ``disallowed`` rows can *never*
    become eligible: they must leave the frontier (dead-letter), or a
    frontier holding only disallowed URLs keeps ``frontier_size > 0``
    forever and run_until_zero spins through max_epochs no-op epochs."""
    disallowed = disallow_pred()
    too_early = F.col("next_allowed_ts") > F.lit(epoch_ts)
    return (
        df.filter(~disallowed & ~too_early),
        df.filter(~disallowed & too_early),
        df.filter(disallowed),
    )


def frontier_keep_rows(
    frontier: DataFrame,
    robots: DataFrame | None,
    leave_keys: DataFrame,
    has_disallow: bool = True,
    broadcast_hint: bool = True,
) -> DataFrame:
    """The frontier rows that STAY after an epoch, computed WITHOUT
    ranking: drop robots-disallowed rows (pure predicate — the caller
    dead-letters that branch) and anti-join out the scheduled
    ``url_key``s.  The leave set is budget-bounded (<= tokens x
    scheduled hosts), so the anti-join usually broadcasts — the whole
    keep branch is one map-side scan-filter-join with NO
    full-frontier window, sort, exchange, or persist.

    Row-identical to the legacy ``deferred = rank-losers ∪ delayed``
    side outputs because {scheduled, losers, delayed, disallowed}
    partitions the frontier: keep = NOT disallowed MINUS scheduled.
    REQUIRES unique url_keys (cfg.dedup — the caller falls back to
    the rank commit otherwise): with duplicates in the frontier, the
    anti-join removes every copy of a scheduled key while the rank
    kept the unscheduled copies as losers.  This is the
    frontier-commit shape that survives 10^9-row frontiers — the
    rank touches only WindowGroupLimit-pruned winners, and the
    unscheduled majority streams through untouched.

    ``broadcast_hint=False`` (the caller's known O(1) bound on the
    leave set exceeds the broadcast budget — mirrors the MOR read
    path's _MOR_BROADCAST_MAX_KEYS guard): no forced hint; AQE's
    runtime stats still convert the join to broadcast when the
    actual leave set turns out small.

    ``has_disallow=False`` (observed on the robots write): skips the
    robots join and predicate entirely — the clean-crawl fast path is
    a bare anti-join over the frontier scan."""
    cols = frontier.columns
    if has_disallow and robots is not None:
        kept = join_robots(frontier, robots).filter(
            ~disallow_pred()
        ).select(*cols)
    else:
        kept = frontier
    keys = leave_keys.select("url_key")
    if broadcast_hint:
        keys = F.broadcast(keys)
    return kept.join(keys, "url_key", "left_anti")


def rank_per_host(
    df: DataFrame,
    tokens_default: int = DEFAULT_TOKENS_PER_EPOCH,
    rank_salts: int = 8,
) -> DataFrame:
    """Two-phase deterministic per-host top-``tokens`` selection.
    Requires a ``tokens_per_epoch`` column (nullable -> default)."""
    picked, _ = rank_split_per_host(df, tokens_default, rank_salts)
    return picked


def rank_split_per_host(
    df: DataFrame,
    tokens_default: int = DEFAULT_TOKENS_PER_EPOCH,
    rank_salts: int = 8,
    caches: list[DataFrame] | None = None,
    need_losers: bool = True,
    tokens_cap: int | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """(picked, losers): the two-phase top-``tokens`` with the
    non-picked rows returned as a side output instead of requiring the
    caller to anti-join them back out (saves a full-frontier shuffle
    per epoch).  losers = phase-1 losers (rank > tokens within their
    (host, salt) group) ∪ phase-2 losers (≤ tokens x (salts-1) rows
    per host).

    ``caches``: when given, the phase-1 ranked frontier (the expensive
    full-frontier window both outputs branch from) is persisted and
    appended for the caller to unpersist at epoch end — otherwise the
    picked branch materializes during the fetch while the losers
    branch RERUNS the whole rank at the frontier write (measured 5-16 s
    per epoch at the bench shapes, the single largest epoch fixed
    cost).

    ``need_losers=False`` (the merge-on-read commit regime, where the
    unscheduled majority is never written): the losers branch is not
    built, the full ranked frontier is NOT persisted, and — when
    ``tokens_cap`` (a literal upper bound on every host's tokens) is
    given — the survivor filters carry a LITERAL rank bound next to
    the per-host column bound, which lets Spark's WindowGroupLimit
    rule prune each window group to its top-``cap`` rows map-side
    BEFORE the rank exchange.  At a 10^10-row frontier with a bounded
    budget this shrinks the rank shuffle from O(|eligible|) rows to
    O(cap x groups): the dual-output (losers) contract is exactly
    what blocks that pushdown, and MOR is the mode that doesn't need
    it.  Returns (picked, None) in that regime; ``picked`` is
    row-identical to the need_losers path (the literal cap is >= the
    column bound everywhere, so it never cuts a survivor)."""
    tokens = F.coalesce(F.col("tokens_per_epoch"), F.lit(tokens_default))

    def keep(rank_col: Column) -> Column:
        cond = rank_col <= tokens
        if not need_losers and tokens_cap is not None:
            # literal bound FIRST: WindowGroupLimit matches a literal
            # limit directly above the window and prunes map-side
            cond = (rank_col <= F.lit(int(tokens_cap))) & cond
        return cond

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64("url_key"), F.lit(rank_salts))
    )
    w1 = Window.partitionBy("host", "__salt").orderBy(*order_cols())
    ranked1 = salted.withColumn("__r1", F.row_number().over(w1))
    if need_losers and caches is not None:
        from pyspark import StorageLevel

        ranked1 = ranked1.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(ranked1)
    survivors = ranked1.filter(keep(F.col("__r1"))).drop("__r1", "__salt")
    w2 = Window.partitionBy("host").orderBy(*order_cols())
    ranked2 = survivors.withColumn("host_rank", F.row_number().over(w2))
    picked = ranked2.filter(keep(F.col("host_rank")))
    if not need_losers:
        return picked, None
    losers1 = ranked1.filter(F.col("__r1") > tokens).drop("__r1", "__salt")
    losers2 = ranked2.filter(F.col("host_rank") > tokens).drop("host_rank")
    return picked, losers1.unionByName(losers2)


def global_cap(
    picked: DataFrame, max_per_epoch: int, cap_salts: int = 16
) -> tuple[DataFrame, DataFrame]:
    """(capped, over): deterministic global top-``max_per_epoch`` by
    (priority, depth, url_key) across hosts — the GenStage demand
    analogue — WITHOUT a single-partition global Window.

    Phase 1 ranks within ``cap_salts`` hash groups and keeps at most
    ``max_per_epoch`` per group (provably a superset of the true
    top-k: a row in the global top-k is in the top-k of its group).
    Phase 2 takes the exact top-k of the <= salts x k survivors via
    sort+limit — Catalyst plans TakeOrderedAndProject (per-partition
    bounded heaps, no SinglePartition exchange)."""
    salted = picked.withColumn(
        "__gsalt", F.pmod(F.xxhash64("url_key"), F.lit(cap_salts))
    )
    w = Window.partitionBy("__gsalt").orderBy(*order_cols())
    ranked = salted.withColumn("__gr", F.row_number().over(w))
    pre_losers = ranked.filter(F.col("__gr") > max_per_epoch).drop(
        "__gsalt", "__gr"
    )
    survivors = ranked.filter(F.col("__gr") <= max_per_epoch).drop(
        "__gsalt", "__gr"
    )
    capped = survivors.orderBy(*order_cols()).limit(max_per_epoch)
    # survivors is small (<= salts x k): the anti-join shuffles only it
    over = survivors.join(capped.select("url_key"), "url_key", "left_anti")
    return capped, pre_losers.unionByName(over)


def schedule_epoch(
    frontier: DataFrame,
    robots: DataFrame | None,
    epoch_ts: int,
    *,
    tokens_default: int = DEFAULT_TOKENS_PER_EPOCH,
    rank_salts: int = 8,
    max_per_epoch: int = 0,
    caches: list[DataFrame] | None = None,
    need_losers: bool = True,
    tokens_cap: int | None = None,
) -> tuple[DataFrame, DataFrame | None, DataFrame]:
    """(scheduled, deferred, disallowed) for one epoch.

    scheduled: per-host top-``tokens`` eligible rows in contract order,
    optionally globally capped at ``max_per_epoch`` (deterministic:
    ordered by (priority, depth, url_key) across hosts).
    deferred: rank losers ∪ crawl-delay-blocked rows — stay in the
    frontier for the next epoch (the reference leaves un-pulled rows in
    the ETS table).
    disallowed: robots-disallowed rows — permanently ineligible; the
    caller dead-letters them (reason 'disallowed') so the frontier can
    drain.

    ``need_losers=False`` (merge-on-read commits): the un-scheduled
    rows are never written — they stay in the frontier implicitly (no
    leave tombstone), so ``deferred`` is returned as ``None``, the
    rank skips its full-frontier persist, and a literal per-host
    token cap (max over the robots table — one tiny driver-side agg)
    turns the rank into a WindowGroupLimit plan that prunes map-side
    before the exchange.  Identical scheduled set either way."""
    politeness_cols = [
        "crawl_delay_ms", "tokens_per_epoch", "next_allowed_ts",
        "disallow_prefixes",
    ]
    enriched = join_robots(frontier, robots)
    eligible, delayed, disallowed = robots_filter(enriched, epoch_ts)
    if need_losers:
        tokens_cap = None
    elif tokens_cap is None:
        # caller didn't carry a cap (first epoch / legacy checkpoint):
        # one tiny agg job derives it; steady-state callers pass the
        # cap observed on the PREVIOUS robots write (run_epoch rides it
        # through the manifest), saving this per-epoch job
        cap = tokens_default
        if robots is not None:
            row = robots.agg(F.max("tokens_per_epoch").alias("m")).first()
            if row is not None and row.m is not None:
                cap = max(cap, int(row.m))
        tokens_cap = cap
    else:
        tokens_cap = max(int(tokens_cap), tokens_default)
    picked, losers = rank_split_per_host(
        eligible, tokens_default, rank_salts, caches=caches,
        need_losers=need_losers, tokens_cap=tokens_cap,
    )
    if max_per_epoch > 0:
        picked, over_cap = global_cap(picked.drop("host_rank"), max_per_epoch)
        if need_losers:
            losers = losers.unionByName(over_cap)
        scheduled = picked.drop(*politeness_cols)
    else:
        scheduled = picked.drop(*politeness_cols, "host_rank")
    if not need_losers:
        return scheduled, None, disallowed.drop(*politeness_cols)
    # deferred = rank losers ∪ delay-blocked rows — derived as side
    # outputs of the same lineage, NOT an anti-join against the full
    # frontier (that join was a second full-frontier shuffle per epoch)
    deferred = losers.unionByName(delayed).drop(*politeness_cols)
    return scheduled, deferred, disallowed.drop(*politeness_cols)


def advance_robots(
    robots: DataFrame | None,
    scheduled: DataFrame,
    epoch_ts: int,
    epoch: int,
    tokens_default: int = DEFAULT_TOKENS_PER_EPOCH,
) -> DataFrame:
    """Persist the politeness clock (north_rule: next_allowed_ts lives
    in the robots table, not executor memory): each host's window
    advances by crawl_delay_ms x (urls scheduled this epoch)."""
    counts = scheduled.groupBy("host").agg(F.count("*").alias("__n"))
    if robots is None:
        return counts.select(
            "host",
            F.lit(0).alias("crawl_delay_ms"),
            F.lit(tokens_default).alias("tokens_per_epoch"),
            F.lit(epoch_ts).cast("long").alias("next_allowed_ts"),
            F.lit(None).cast("array<string>").alias("disallow_prefixes"),
            F.lit(epoch).cast("int").alias("epoch"),
        )
    merged = robots.join(counts, "host", "full_outer")
    return merged.select(
        "host",
        F.coalesce("crawl_delay_ms", F.lit(0)).alias("crawl_delay_ms"),
        F.coalesce("tokens_per_epoch", F.lit(tokens_default)).alias(
            "tokens_per_epoch"
        ),
        F.when(
            F.col("__n").isNotNull(),
            F.lit(epoch_ts)
            + F.coalesce("crawl_delay_ms", F.lit(0)).cast("long") * F.col("__n"),
        )
        .otherwise(F.coalesce("next_allowed_ts", F.lit(0)))
        .cast("long")
        .alias("next_allowed_ts"),
        "disallow_prefixes",
        F.lit(epoch).cast("int").alias("epoch"),
    )
