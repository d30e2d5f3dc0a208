"""Benchmark driver: crawl-engine throughput + headline queries.

Prints ONE JSON line:
  {"metric": ..., "value": <crawl bench sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {fetched, epochs, fetched_urls_per_sec, epoch_latency_ms}}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_SCALING  "0" -> skip the scaling leg.  DEFAULT ON ("1"):
                       the compute-dominated scaling shape runs at
                       local[2] (N) vs local[8] (4N cores), interleaved
                       (up to twice, within the time budget), reporting
                       raw + hardware-calibrated N->4N scaling
                       efficiency plus the cross-parallelism schedule
                       digest — the two-cluster-size evidence, now in
                       the default artifact.  2 vs 8 because the host's
                       aggregate CPU is measured near-linear only up to
                       ~8 busy cores (BASELINE.md round-2 notes).
                       Every leg carries a sha256 calibration stamp;
                       legs >30% off the session median are marked
                       cal_degraded and excluded from pair selection.
                       The bloom seen-layer A/B is a paired same-JVM
                       alternating-epoch leg (digest equivalence +
                       overhead, drift-immune by construction).
  SPARK_GRAFT_SCALING_BUDGET_S  wall budget for the scaling section
                       (default 1500): pair 2 is skipped when the
                       budget is spent (reported as pairs_run).
  SPARK_GRAFT_IMAGES   "0" -> skip the image-payload leg (default on:
                       decode+phash-verify scan throughput and
                       perceptual/exact dedup over an
                       input_hint-shaped image+caption table).
  SPARK_GRAFT_STAGE_TIMING  "0"/"1" -> override cfg.stage_timing for
                       the crawl legs (default: engine default, ON;
                       the execution-true barriers cost a median 3%
                       epoch wall — measured by a paired same-JVM
                       alternating-epoch A/B).
  SPARK_GRAFT_ANN      "0" -> skip the batch-ANN leg (10k queries x
                       1M corpus multi-probe bucket join + recall
                       subsample; default ON).
  SPARK_GRAFT_FRONTIER "0" -> skip the frontier write-path legs
                       (MOR O(churn) commits vs full snapshot rewrite
                       at a 10x frontier-to-budget ratio, PLUS the
                       auto-policy trigger-point pair: a 4.2M-row
                       standing frontier where frontier_mode="auto"
                       must flip to MOR on its own, digest-checked
                       against a forced-full control; default ON).
  SPARK_GRAFT_SUSTAIN  "1" -> add the 10-epoch long-crawl flatness leg
                       (per-epoch latency vs growing seen set, live
                       compaction; off by default — BASELINE.md
                       records the measured series).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "politeness_rank",
    "frontier_dedup",
    "token_count",
    "minhash_lsh_dupes",
    "simhash_dupes",
    "embedding_topk",
    "windowed_throughput",
    "phash_neardup",
]

# main crawl bench shape (round-1 comparable): 64 hosts (2 hot at 10x)
# x 10k pages ~= 820k pages, ~300-byte bodies, 640k-seed standing
# frontier.  Latency-sensitive by design — tracks the engine's fixed
# per-epoch cost round over round.
CRAWL = dict(n_hosts=64, pages_per_host=10000, out_degree=8,
             images_per_host=64, hot_hosts=2, crawl_delays=(0,))
CRAWL_TOKENS = 8000
CRAWL_EPOCHS = 3
CRAWL_SEEDS_PER_HOST = 10000  # large standing frontier: the metric is
                              # scheduling+fetch throughput, not BFS warmup

# scaling-leg shape (design-point-like): ~KB pages (md5-chain filler),
# ~1M fetched rows/epoch, ~8M candidate URLs/epoch through
# canonicalize+dedup, a real image-decode fraction, corpus served from
# parquet on disk (the 100 TB posture: the web is a table you scan,
# not a cache you hold).  Round-1 measured the light shape to be
# latency-bound (~60 sequential sub-3s stages/epoch) — executor
# compute must dominate for a scaling measurement to measure the
# ENGINE rather than per-stage fixed costs.
SCALE_CRAWL = dict(n_hosts=64, pages_per_host=20000, out_degree=8,
                   images_per_host=256, hot_hosts=2, crawl_delays=(0,),
                   body_filler_bytes=4096)
SCALE_TOKENS = 16000
SCALE_EPOCHS = 3
SCALE_SEEDS_PER_HOST = 20000
SCALE_SHUFFLE_PARTITIONS = 64  # fixed on BOTH legs: identical plans; A/B round 3: 64 beats 128 by ~25% at local[8] (8 waves vs 16 per stage), neutral at local[2] -- and beats 32 on the 4N side


def _seed_df(spark, n_hosts: int, seeds_per_host: int):
    from pyspark.sql import functions as F

    return spark.range(n_hosts * seeds_per_host).select(
        F.format_string(
            "http://h%d.test/p/%d",
            (F.col("id") % n_hosts).cast("int"),
            (F.col("id") / n_hosts).cast("int"),
        ).alias("url")
    )


def gen_scale_corpus(path: str) -> None:
    """Materialize the scaling-leg corpus to parquet once (shared by
    both legs; generation is setup, not timed)."""
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    spark = get_spark("bench-gen-corpus", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    make_corpus(spark, **SCALE_CRAWL).repartition(128).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def crawl_bench(master: str, cores: int, scale: bool = False,
                corpus_path: str | None = None, bloom: bool = False) -> dict:
    """Run a fixed-shape synthetic crawl; returns throughput stats.

    ``master`` may be ``local[N]`` (single JVM) or
    ``local-cluster[N,C,M]`` (separate executor JVMs — the honest
    multi-executor scaling mode).  Shuffle partitions are FIXED so
    both scaling legs run the identical plan; only resources differ.
    """
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    shape = SCALE_CRAWL if scale else CRAWL
    tokens = SCALE_TOKENS if scale else CRAWL_TOKENS
    epochs = SCALE_EPOCHS if scale else CRAWL_EPOCHS
    seeds_per_host = SCALE_SEEDS_PER_HOST if scale else CRAWL_SEEDS_PER_HOST

    extra = {}
    if scale:
        # heavy-shape tuning: KB-scale rows make bytes-per-partition the
        # binding constraint — let AQE keep parallelism and cut task
        # dispatch latency (the light shape keeps the fewer-but-bigger
        # setting from session.py, A/B-measured there)
        extra = {
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.locality.wait": "0",
        }
    spark = get_spark(
        f"bench-crawl-{cores}", master=master, shuffle_partitions=64,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if corpus_path:
        # design-point posture: the corpus lives in a table on disk,
        # scanned per epoch — IO and the fetch join parallelize with
        # the cluster instead of competing for cache memory
        corpus = spark.read.parquet(corpus_path)
    else:
        # pre-partition the corpus by the fetch-join key: the cached
        # partitioning is visible to Catalyst, so the per-epoch fetch
        # join shuffles only the (much smaller) scheduled side
        corpus = make_corpus(spark, **shape).repartition(64, "url").cache()
        corpus.count()
    wd = tempfile.mkdtemp(prefix="bench_crawl_")
    # A/B hook for the stage-timing barriers (default: CrawlConfig's)
    cfg_kwargs = {}
    st_env = os.environ.get("SPARK_GRAFT_STAGE_TIMING")
    if st_env is not None:
        cfg_kwargs["stage_timing"] = st_env != "0"
    try:
        job = CrawlJob(
            spark,
            CrawlConfig(
                workdir=wd, tokens_per_epoch=tokens,
                max_epochs=epochs + 1, rank_salts=8,
                shuffle_partitions=SCALE_SHUFFLE_PARTITIONS if scale else None,
                fetched_storage="DISK_ONLY" if scale else "MEMORY_AND_DISK",
                bloom_enabled=bloom,
                **cfg_kwargs,
            ),
            corpus=corpus,
        )
        # distributed seed generation (a 10^10 frontier never transits
        # the driver)
        job.insert_requests_df(_seed_df(spark, shape["n_hosts"], seeds_per_host))
        # pre-warm executor python workers (pandas/numpy import cost
        # otherwise lands inside the first epoch's mapInPandas stage)
        spark.range(256).repartition(128).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        t0 = time.monotonic()
        fetched = 0
        epoch_ms = []
        for _ in range(epochs):
            r = job.step()
            fetched += r.scheduled
            epoch_ms.append(r.durations_ms["epoch"])
        wall = time.monotonic() - t0
        # determinism evidence: order-insensitive distributed digest of
        # the admitted (epoch, url_key) set — must be identical across
        # parallelism levels (never collected to the driver)
        from pyspark.sql import functions as F

        seen = job.store.read_deltas("seen", epochs)
        total = seen.select(
            # decimal accumulator: a raw long sum overflows under ANSI
            F.sum(F.xxhash64("epoch", "url_key").cast("decimal(38,0)")).alias("d")
        ).first().d
        digest = hex(int(total) & 0xFFFFFFFFFFFFFFFF)
        return {
            "master": master,
            "cores": cores,
            "shape": "scale" if scale else "main",
            "fetched": fetched,
            "epochs": epochs,
            "wall_sec": round(wall, 3),
            "fetched_urls_per_sec": round(fetched / wall, 2),
            "epoch_latency_ms": int(sum(epoch_ms) / len(epoch_ms)),
            "schedule_digest": digest,
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def query_bench(sf_dir: str, cpus: int) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from spider_man_spark.session import get_spark

    spark = get_spark(
        f"bench-queries-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    qs = entrymod.queries()
    try:
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).collect()
            out[name] = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()
    return out


def _crawl_bench_subprocess(
    master: str, cores: int, scale: bool = False,
    corpus_path: str | None = None, bloom: bool = False,
) -> dict:
    """Run one crawl leg in a FRESH process: a stopped local-mode
    SparkContext leaves its JVM (heap, metaspace, tmpfs scratch)
    attached to the current process, which contaminates a second leg's
    timings — each parallelism level must measure from a cold JVM."""
    import subprocess

    argv = [sys.executable, os.path.abspath(__file__), "--crawl-leg", master,
            str(cores)]
    if scale:
        argv += ["--scale", corpus_path or ""]
    if bloom:
        argv += ["--bloom"]
    out = subprocess.run(
        argv,
        capture_output=True,
        text=True,
        check=True,
        env={**os.environ, "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "32g")},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _sha_burn(_n):
    """2 s of pure-CPU sha256 chaining (hardware calibration worker —
    module-level so multiprocessing can pickle it)."""
    import hashlib

    h = hashlib.sha256(b"x" * 64)
    t0 = time.monotonic()
    c = 0
    while time.monotonic() - t0 < 2.0:
        for _ in range(1000):
            h = hashlib.sha256(h.digest())
        c += 1000
    return c


def _quick_cal(seconds: float = 1.0) -> int:
    """Single-core sha256 rate (hashes/s) measured in THIS process for
    ``seconds`` — the per-leg drift stamp.  Absolute CPU speed on this
    VM drifts up to ~2.5x over minutes (BASELINE.md round-2): stamping
    a calibration next to every timed leg lets the artifact FLAG legs
    measured in a degraded window instead of silently averaging them
    into the result (round-4 lesson: one collapsed local[8] leg made
    the adjacent bloom A/B read 0.99x and the hw-normalized efficiency
    1.166 — both physically meaningless)."""
    import hashlib

    h = hashlib.sha256(b"x" * 64)
    t0 = time.monotonic()
    c = 0
    while time.monotonic() - t0 < seconds:
        for _ in range(1000):
            h = hashlib.sha256(h.digest())
        c += 1000
    return int(c / (time.monotonic() - t0))


def _cpu_parallel_ceiling() -> dict:
    """Measure this HOST's parallel-compute ceiling: per-core sha256
    throughput at 2 vs 8 concurrent processes — the same core counts
    the scaling legs use (local[2] vs local[8]).  Per-core speed at 8
    busy cores runs a few percent below 2 busy cores on this VM (and
    absolute speed drifts over time) — an engine-independent hardware
    bound on any 2->8 scaling measurement.  Reported alongside the raw
    efficiency so the engine's own scaling is separable from the
    substrate's."""
    import multiprocessing as mp

    rates = {}
    for procs in (2, 8):
        with mp.Pool(procs) as p:
            res = p.map(_sha_burn, [0] * procs)
        rates[procs] = sum(res) / 2.0 / procs
    return {
        "per_core_hashes_2p": int(rates[2]),
        "per_core_hashes_8p": int(rates[8]),
        "hw_parallel_ceiling": round(rates[8] / rates[2], 3),
    }


def bloom_ab_bench(cores: int, corpus_path: str | None,
                   epochs: int = 5) -> dict:
    """Bloom seen-layer A/B as a PAIRED SAME-JVM alternating-epoch
    comparison: one crawl whose ``cfg.bloom_enabled`` flips per epoch
    (run_epoch re-reads the mutable config), so every ON epoch is
    ratioed against its adjacent OFF epochs inside the same drift
    window.  This is the protocol that resolved the 3% stage-timing
    effect; the previous subprocess A/B inherited whichever drift
    window the budget left it and once reported bloom-ON as *faster*
    (0.99x — noise, not physics).  Pattern: off (warmup, excluded),
    then on/off alternating.  Also reports the seen digest over the
    first SCALE_EPOCHS epochs, which must equal the bloom-off scaling
    legs' digest (the layer is behavior-neutral: FP-free probe with an
    exact backstop)."""
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark

    spark = get_spark(
        f"bench-bloomab-{cores}", master=f"local[{cores}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.locality.wait": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    wd = tempfile.mkdtemp(prefix="bench_bloomab_")
    try:
        job = CrawlJob(
            spark,
            CrawlConfig(
                workdir=wd, tokens_per_epoch=SCALE_TOKENS,
                max_epochs=epochs + 1, rank_salts=8,
                shuffle_partitions=SCALE_SHUFFLE_PARTITIONS,
                fetched_storage="DISK_ONLY",
                bloom_enabled=False,
            ),
            corpus=corpus,
        )
        job.insert_requests_df(
            _seed_df(spark, SCALE_CRAWL["n_hosts"], SCALE_SEEDS_PER_HOST)
        )
        spark.range(256).repartition(128).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        epoch_ms = []
        pattern = []
        for i in range(epochs):
            # epoch index 0 is the warmup (off); then on,off,on,off...
            on = i % 2 == 1
            job.cfg.bloom_enabled = on
            pattern.append("on" if on else "off")
            r = job.step()
            epoch_ms.append(r.durations_ms["epoch"])
        from pyspark.sql import functions as F

        seen = job.store.read_deltas("seen", SCALE_EPOCHS)
        total = seen.select(
            F.sum(F.xxhash64("epoch", "url_key").cast("decimal(38,0)"))
            .alias("d")
        ).first().d
        ratios = []
        for i in range(1, epochs):
            if pattern[i] != "on":
                continue
            for j in (i - 1, i + 1):
                if 1 <= j < epochs and pattern[j] == "off":
                    ratios.append(round(epoch_ms[i] / epoch_ms[j], 3))
        ratios.sort()
        med = ratios[len(ratios) // 2] if ratios else None
        return {
            "protocol": "paired same-JVM alternating epochs",
            "pattern": pattern,
            "epoch_ms": epoch_ms,
            "on_over_off_ratios": ratios,
            "overhead_factor_median": med,
            "digest_epochs3": hex(int(total) & 0xFFFFFFFFFFFFFFFF),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def scaling_bench(budget_s: float = 1500.0) -> dict:
    """The north_rule two-parallelism-level evidence: the identical
    compute-dominated crawl at local[2] (N) vs local[8] (4N cores),
    INTERLEAVED (this VM's absolute speed drifts over minutes, so
    adjacent pairs are the comparable ones; best-of-up-to-2 pairs damps
    slow windows; pair 2 is skipped once ``budget_s`` is spent), plus
    the host's measured parallel-compute ceiling.

    The scaling legs run with the Bloom seen-layer OFF — they measure
    the ENGINE's N->4N behavior, and a bloom-on local[2]/local[8]
    measurement showed the layer's fixed per-epoch costs (extra
    shard-shuffle + Python probe boundary over ~8M candidates/epoch)
    dominate at this SF and crush the ratio (eff 0.37 with blooms on
    both legs).  One additional bloom-ON local[8] leg, adjacent to the
    bloom-off one, is the at-load A/B: it proves the admitted-set
    digest is identical with blooms on/off and reports the measured
    overhead factor.  At sf0.1-scale seen sets (~3M url_keys) the
    exact fused anti-join wins outright; the Bloom layer targets the
    regime where the seen table dwarfs the per-epoch candidate set
    (the 10^10 design point) — the A/B records that trade honestly
    instead of hiding the layer behind a flag.

    Why these widths: single-JVM local[] is the sanctioned parallelism
    proxy (multi-JVM local-cluster on ONE host measurably inflates
    per-task CPU 3-7x from co-located-JVM contention no real N-machine
    cluster exhibits), and the 2->8-core region is where this host's
    aggregate CPU is measured near-linear (sha256 per-core ratio 0.95)
    — beyond ~8 busy cores the hypervisor caps aggregate CPU at
    ~2.3-3.1x of the 8-core rate, an engine-independent ceiling that
    would dominate any 8->32 measurement (BASELINE.md round-2)."""
    import subprocess

    t_start = time.monotonic()
    corpus_dir = tempfile.mkdtemp(
        prefix="bench_scale_corpus_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    cpath = os.path.join(corpus_dir, "corpus")
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gen-corpus", cpath],
            capture_output=True, text=True, check=True, env={**os.environ},
        )
        pairs = []
        runs = []
        # pair count: default 2 (the driver-window protocol of rounds
        # 3-6); SPARK_GRAFT_SCALING_MAX_PAIRS raises it for dedicated
        # long sessions — more adjacent pairs = more chances to catch
        # a drift-free window, and best-healthy-pair selection below
        # generalizes unchanged
        max_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_PAIRS", "2"))
        for _round in range(max_pairs):
            # per-leg drift stamp: single-core sha256 rate measured
            # immediately before the leg launches
            c0 = _quick_cal()
            lo = _crawl_bench_subprocess("local[2]", 2, scale=True,
                                         corpus_path=cpath)
            lo["cal_rate"] = c0
            c1 = _quick_cal()
            hi = _crawl_bench_subprocess("local[8]", 8, scale=True,
                                         corpus_path=cpath)
            hi["cal_rate"] = c1
            runs += [lo, hi]
            pairs.append((lo, hi))
            if time.monotonic() - t_start > budget_s:
                break
        # bloom at-load A/B LAST (the efficiency pairs get the budget
        # first) — paired same-JVM alternating epochs, so it carries
        # its own drift immunity instead of inheriting a window
        ab_cal = _quick_cal()
        ab_out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--bloom-ab-leg", "8", cpath],
            capture_output=True, text=True, check=True,
            env={**os.environ,
                 "SPARK_DRIVER_MEM": os.environ.get(
                     "SPARK_DRIVER_MEM", "32g")},
        )
        bloom_ab = json.loads(ab_out.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    # degraded-window flags: a leg whose calibration deviates >30%
    # from the session median was measured on visibly different
    # hardware throughput — its numbers are recorded but must not be
    # averaged/selected into the headline, and the artifact says so
    cals = sorted(r["cal_rate"] for r in runs) + [ab_cal]
    med_cal = sorted(cals)[len(cals) // 2]
    for r in runs:
        r["cal_degraded"] = abs(r["cal_rate"] / med_cal - 1) > 0.30
    healthy = [
        p for p in pairs
        if not (p[0]["cal_degraded"] or p[1]["cal_degraded"])
    ]
    candidates = healthy or pairs
    best = max(
        candidates,
        key=lambda p: p[1]["fetched_urls_per_sec"] / p[0]["fetched_urls_per_sec"],
    )
    lo, hi = best
    eff = (hi["fetched_urls_per_sec"] / lo["fetched_urls_per_sec"]) / 4.0
    cal = _cpu_parallel_ceiling()
    # ceiling is an upper bound: a measured value > 1 is pure
    # calibration-window drift (hardware can't amplify per-core
    # speed with MORE contention), so clamp the normalizer at 1.
    # A normalized efficiency > 1 is likewise impossible — report it
    # clamped with calibration_invalid=true instead of printing a
    # physically-meaningless number (round-4: 1.166)
    norm_raw = eff / min(cal["hw_parallel_ceiling"], 1.0)
    return {
        "protocol": (
            "interleaved local[2]/local[8], best healthy adjacent pair "
            "(per-leg sha256 calibration stamps; >30% deviation from "
            "session median => cal_degraded, excluded from selection); "
            "bloom A/B is paired same-JVM alternating epochs"
        ),
        "pairs_run": len(pairs),
        "pairs_healthy": len(healthy),
        "chosen_pair_degraded": best not in healthy,
        "cal_median": med_cal,
        "runs": runs,
        "n_cores_2": lo,
        "n_cores_8": hi,
        "efficiency_N_to_4N": round(eff, 3),
        "hw_calibration": cal,
        "efficiency_normalized_to_hw": round(min(norm_raw, 1.0), 3),
        "efficiency_normalized_raw": round(norm_raw, 3),
        "calibration_invalid": norm_raw > 1.0,
        "schedule_digest_match": all(
            r["schedule_digest"] == runs[0]["schedule_digest"] for r in runs
        ),
        "bloom_ab": {
            **bloom_ab,
            "cal_rate": ab_cal,
            "cal_degraded": abs(ab_cal / med_cal - 1) > 0.30,
            "overhead_factor_at_this_sf": bloom_ab[
                "overhead_factor_median"
            ],
            "digest_match_on_vs_off": (
                bloom_ab["digest_epochs3"] == runs[0]["schedule_digest"]
            ),
        },
    }


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def frontier_bench(
    cores: int, mode: str, seeds_per_host: int,
    epochs: int = 6, tokens: int = 1000,
    max_chain: int = 0,
) -> dict:
    """Frontier-at-10^10 write-path evidence: a standing frontier ~10x
    the per-epoch budget (the bounded-budget long-crawl posture), with
    per-epoch wall AND per-epoch frontier-dir bytes written recorded.

    Claim under test: with merge-on-read delta commits
    (cfg.frontier_mode='mor'; what 'auto' — the default — picks in
    the large-frontier/low-churn regime) the frontier WRITE cost is
    O(churn), not O(|frontier|) — the full-rewrite layout rewrites the
    unscheduled majority verbatim every epoch, and the sharded layout
    degenerates to full whenever every host-shard sees scheduling
    activity (this exact shape — measured).  Legs in the default artifact: mor vs full at the big
    frontier (I/O + wall + digest match) and mor at a 4x-smaller
    frontier (write-side flatness vs |frontier|).  Honest note: the
    per-epoch politeness rank still SCANS the full frontier
    (scheduling needs global per-host order), so total wall is not
    fully |frontier|-independent — the write side is."""
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    spark = get_spark(
        f"bench-frontier-{cores}", master=f"local[{cores}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = make_corpus(spark, **CRAWL).repartition(64, "url").cache()
    corpus.count()
    wd = tempfile.mkdtemp(prefix="bench_frontier_")
    try:
        job = CrawlJob(
            spark,
            CrawlConfig(
                workdir=wd, tokens_per_epoch=tokens,
                max_epochs=epochs + 2, rank_salts=8,
                frontier_mode=mode,
                # max_chain > 0: churn-volume compaction leg — fold
                # the MOR chain by length instead of epoch count
                # (compact_every off so the trigger under test is the
                # only one firing)
                **(
                    {"frontier_compact_max_chain": max_chain,
                     "compact_every": 0}
                    if max_chain else {}
                ),
            ),
            corpus=corpus,
        )
        job.insert_requests_df(
            _seed_df(spark, CRAWL["n_hosts"], seeds_per_host)
        )
        spark.range(256).repartition(128).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        fdir = os.path.join(wd, "frontier")
        epoch_ms, write_mb, sizes, sched, modes = [], [], [], [], []
        chain_dirs = []
        for _ in range(epochs):
            b0 = _dir_bytes(fdir)
            r = job.step()
            epoch_ms.append(r.durations_ms["epoch"])
            write_mb.append(round((_dir_bytes(fdir) - b0) / 1e6, 2))
            sizes.append(r.frontier_size)
            sched.append(r.scheduled)
            modes.append(r.frontier_mode_used)
            # epoch-dir count AFTER any compaction this step ran —
            # the bounded-chain evidence for the max_chain trigger
            chain_dirs.append(
                len(job.store._epochs("frontier", job.store.last_epoch()))
            )
        from pyspark.sql import functions as F

        seen = job.store.read_deltas("seen", epochs)
        total = seen.select(
            F.sum(
                F.xxhash64("epoch", "url_key").cast("decimal(38,0)")
            ).alias("d")
        ).first().d
        steady = epoch_ms[1:]  # epoch 1 pays one-time cache warmup
        return {
            "mode": mode,
            "max_chain": max_chain,
            # what the engine actually committed per epoch — for
            # mode="auto" this is the policy-flip evidence (the >=4M
            # leg must read auto->mor; the policy branch is otherwise
            # untestable end-to-end below its trigger point)
            "epoch_modes": modes,
            # frontier epoch-dir count after each step: with
            # max_chain set this must saw-tooth (grow to the bound,
            # fold, grow again) instead of growing without bound
            "chain_dirs": chain_dirs,
            "seeds": CRAWL["n_hosts"] * seeds_per_host,
            "tokens": tokens,
            "epochs": epochs,
            "epoch_ms": epoch_ms,
            "steady_epoch_ms": int(sum(steady) / len(steady)),
            "frontier_write_mb": write_mb,
            "steady_write_mb": round(sum(write_mb[1:]) / len(write_mb[1:]), 2),
            "frontier_sizes": sizes,
            "scheduled": sched,
            "schedule_digest": hex(int(total) & 0xFFFFFFFFFFFFFFFF),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def fwrite_ab_bench(cores: int, sph: int = 10000, tokens: int = 1000,
                    epochs: int = 7) -> dict:
    """cfg.frontier_write A/B as a PAIRED SAME-JVM alternating-epoch
    comparison at the 640k standing-frontier / 1k-budget shape (the
    regime where the unscheduled majority dominates the commit):
    "rank" (legacy — the losers∪delayed side outputs of a persisted
    full-frontier rank become the next frontier) vs "antijoin" (the
    default — keep = frontier minus the disallow predicate minus a
    broadcast anti-join on the scheduled url_keys; no full-frontier
    window/sort/persist anywhere in the epoch).  run_epoch re-reads
    the mutable config, and both derivations commit row-identical
    snapshots, so alternation is state-compatible; every rank epoch
    is ratioed against its adjacent antijoin epochs inside the same
    drift window.  Pattern: antijoin (warmup, excluded), then
    rank/antijoin alternating.  Digest over the first 6 epochs must
    equal the full_640k leg's (same shape, same schedule)."""
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    spark = get_spark(
        f"bench-fwriteab-{cores}", master=f"local[{cores}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = make_corpus(spark, **CRAWL).repartition(64, "url").cache()
    corpus.count()
    wd = tempfile.mkdtemp(prefix="bench_fwriteab_")
    try:
        job = CrawlJob(
            spark,
            CrawlConfig(
                workdir=wd, tokens_per_epoch=tokens,
                max_epochs=epochs + 2, rank_salts=8,
                frontier_mode="full",
            ),
            corpus=corpus,
        )
        job.insert_requests_df(
            _seed_df(spark, CRAWL["n_hosts"], sph)
        )
        spark.range(256).repartition(128).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        epoch_ms, pattern = [], []
        for i in range(epochs):
            legacy = i % 2 == 1
            job.cfg.frontier_write = "rank" if legacy else "antijoin"
            pattern.append(job.cfg.frontier_write)
            r = job.step()
            epoch_ms.append(r.durations_ms["epoch"])
        from pyspark.sql import functions as F

        seen = job.store.read_deltas("seen", min(6, epochs))
        total = seen.select(
            F.sum(F.xxhash64("epoch", "url_key").cast("decimal(38,0)"))
            .alias("d")
        ).first().d
        ratios = []
        for i in range(1, epochs):
            if pattern[i] != "rank":
                continue
            for j in (i - 1, i + 1):
                if 1 <= j < epochs and pattern[j] == "antijoin":
                    ratios.append(round(epoch_ms[i] / epoch_ms[j], 3))
        ratios.sort()
        med = ratios[len(ratios) // 2] if ratios else None
        return {
            "protocol": "paired same-JVM alternating epochs",
            "seeds": CRAWL["n_hosts"] * sph,
            "tokens": tokens,
            "pattern": pattern,
            "epoch_ms": epoch_ms,
            "rank_over_antijoin_ratios": ratios,
            "rank_overhead_factor_median": med,
            "schedule_digest": hex(int(total) & 0xFFFFFFFFFFFFFFFF),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


def ann_bench(cores: int, n_corpus: int = 1_000_000,
              n_queries: int = 10_000, dim: int = 64) -> dict:
    """Batch-ANN throughput at the training-data shape (dedup a query
    batch against an embedded corpus): N x M via
    operators/similarity.ann_topk_lsh_batch — multi-probe bucket
    equi-join + window top-k, never all-pairs.  Corpus/queries are
    synthesized JVM-side (xxhash64-derived floats; no driver transfer)
    so the leg measures the operator, not generation; the corpus is
    CLUSTERED (5k hash-derived centers + 15% noise) — the shape real
    embedding spaces have and the one LSH serves (uniform random
    vectors have near-orthogonal "neighbors" spread over every bucket
    and defeat any sublinear index).  Also reports recall@10 vs
    brute-force cosine on a 200-query subsample."""
    from pyspark.sql import functions as F

    from spider_man_spark.operators.similarity import (
        ann_topk_lsh_batch,
        cosine_sim_cols,
        random_planes,
    )
    from spider_man_spark.session import get_spark

    spark = get_spark(
        f"bench-ann-{cores}", master=f"local[{cores}]",
        shuffle_partitions=64,
        # the bucketed-table leg saveAsTable()s the corpus — keep the
        # warehouse on tmpfs and out of the repo dir
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(
                prefix="bench_ann_wh_",
                dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def synth(n, salt, idcol, n_centers=5000):
        # point = hash-derived cluster center + 15% noise, all JVM-side
        center = F.col("id") % n_centers

        def coord(j):
            c = (
                F.pmod(F.xxhash64(center * dim + j, F.lit(0)),
                       F.lit(100_000)).cast("double")
                / 50_000.0
                - 1.0
            )
            noise = (
                F.pmod(F.xxhash64(F.col("id") * dim + j, F.lit(salt)),
                       F.lit(100_000)).cast("double")
                / 50_000.0
                - 1.0
            )
            return c + 0.15 * noise

        return spark.range(n).select(
            F.col("id").alias(idcol),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)), coord
            ).alias("embedding"),
        )

    corpus = synth(n_corpus, 1, "vec_id").repartition(64).cache()
    queries = synth(n_queries, 2, "qid").cache()
    corpus.count(), queries.count()
    planes = random_planes(dim, n_planes=16)
    try:
        t0 = time.monotonic()
        n_out = ann_topk_lsh_batch(
            queries, corpus, k=10, planes=planes, probe_hamming=2
        ).count()
        wall = time.monotonic() - t0

        # recall vs brute on a subsample (exactness evidence at scale;
        # small-N exact equivalence is pytest-proven)
        sub_q = queries.filter(F.col("qid") < 200)
        sub_c = corpus.filter(F.col("vec_id") < 100_000).cache()
        sub_c.count()
        ann = ann_topk_lsh_batch(
            sub_q, sub_c, k=10, planes=planes, probe_hamming=2
        ).select("qid", "vec_id")
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("vec_id").asc()
        )
        brute = (
            sub_q.select("qid", F.col("embedding").alias("qv"))
            .crossJoin(
                sub_c.select("vec_id", F.col("embedding").alias("cv"))
            )
            .select(
                "qid", "vec_id",
                cosine_sim_cols(F.col("qv"), F.col("cv")).alias("cosine"),
            )
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= 10)
            .select("qid", "vec_id")
        )
        hits = ann.intersect(brute).count()
        recall = round(hits / (200 * 10), 4)

        # bucketed-TABLE batch leg: the corpus saved as a Hive-bucketed
        # table hashed on the LSH bucket (bucketBy 64) — the batch
        # join's corpus-side exchange is paid ONCE at write time and
        # elided from every subsequent batch (the plan evidence is
        # pytest-asserted; this is the wall-clock evidence at 1M)
        from spider_man_spark.operators.similarity import (
            ann_topk_lsh_batch_bucketed,
            save_bucketed_corpus_table,
        )

        t0 = time.monotonic()
        save_bucketed_corpus_table(
            corpus, "ann_bench_corpus", n_buckets=64, planes=planes
        )
        t_save = time.monotonic() - t0
        t0 = time.monotonic()
        n_out_b = ann_topk_lsh_batch_bucketed(
            spark, "ann_bench_corpus", queries, k=10, planes=planes,
            probe_hamming=2,
        ).count()
        wall_b = time.monotonic() - t0
        # structural (drift-proof) evidence next to the wall numbers:
        # exchange counts from the EXECUTED plans of a small paired
        # run — the bucketed layout must carry exactly one hash
        # exchange fewer (the corpus side), independent of VM drift
        sub_q2 = queries.filter(F.col("qid") < 200)
        plain_res = ann_topk_lsh_batch(
            sub_q2, corpus, k=10, planes=planes, probe_hamming=2
        )
        buck_res = ann_topk_lsh_batch_bucketed(
            spark, "ann_bench_corpus", sub_q2, k=10, planes=planes,
            probe_hamming=2,
        )
        plain_res.collect(), buck_res.collect()  # finalize AQE plans

        def _n_exchanges(res):
            plan = res._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange hashpartitioning")

        exch_plain = _n_exchanges(plain_res)
        exch_buck = _n_exchanges(buck_res)
        bucketed = {
            "save_table_sec": round(t_save, 2),
            "wall_sec": round(wall_b, 2),
            "queries_per_sec": round(n_queries / wall_b, 1),
            "topk_rows": n_out_b,
            "rows_match_plain": n_out_b == n_out,
            "exchanges_plain": exch_plain,
            "exchanges_bucketed": exch_buck,
            "corpus_exchange_elided": exch_buck < exch_plain,
        }

        # partitioned-storage leg: the corpus written PARTITIONED BY
        # LSH bucket (the layout-as-index posture) — single-query
        # latency must come from a few-partition scan, not a full
        # corpus scan.  Evidence: files actually read per probe
        # (input_file_name on the pruned scan) vs files in the table,
        # plus identical top-k vs the computed-bucket path.
        from spider_man_spark.operators.similarity import (
            ann_topk_lsh,
            ann_topk_lsh_partitioned,
            write_bucketed_corpus,
        )

        planes_p = random_planes(dim, n_planes=10)  # 1024 buckets
        pdir = tempfile.mkdtemp(
            prefix="bench_ann_part_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        ppath = os.path.join(pdir, "corpus_bucketed")
        try:
            t0 = time.monotonic()
            write_bucketed_corpus(corpus, ppath, planes=planes_p)
            t_write = time.monotonic() - t0
            files_total = sum(
                1 for _r, _d, fs in os.walk(ppath)
                for f in fs if f.endswith(".parquet")
            )
            qvecs = [
                (int(r.vec_id), [float(x) for x in r.embedding])
                for r in corpus.filter(
                    F.col("vec_id").isin(list(range(0, 1000, 100)))
                ).collect()
            ]
            equal = True
            lat_part, lat_comp = [], []
            for _vid, q in qvecs:
                t0 = time.monotonic()
                got_p = [
                    (r.vec_id, r.cosine)
                    for r in ann_topk_lsh_partitioned(
                        spark, ppath, q, k=10, planes=planes_p,
                        probe_hamming=1,
                    ).collect()
                ]
                lat_part.append(time.monotonic() - t0)
                t0 = time.monotonic()
                got_c = [
                    (r.vec_id, r.cosine)
                    for r in ann_topk_lsh(
                        corpus, q, k=10, planes=planes_p,
                        probe_hamming=1,
                    ).collect()
                ]
                lat_comp.append(time.monotonic() - t0)
                equal = equal and got_p == got_c
            import numpy as np

            q = qvecs[0][1]
            qbits = (planes_p @ np.asarray(q) > 0).astype(np.int64)
            qbucket = int((qbits << np.arange(len(planes_p))).sum())
            probe_buckets = [qbucket] + [
                qbucket ^ (1 << i) for i in range(len(planes_p))
            ]
            files_scanned = (
                spark.read.parquet(ppath)
                .filter(F.col("bucket").isin(probe_buckets))
                .select(F.input_file_name())
                .distinct()
                .count()
            )
            partitioned = {
                "n_planes": 10,
                "probe_hamming": 1,
                "write_sec": round(t_write, 2),
                "files_total": files_total,
                "files_scanned_one_probe": files_scanned,
                "scan_fraction": round(files_scanned / files_total, 4),
                "latency_ms_partitioned_avg": int(
                    1000 * sum(lat_part) / len(lat_part)
                ),
                "latency_ms_computed_avg": int(
                    1000 * sum(lat_comp) / len(lat_comp)
                ),
                "topk_equal_vs_computed": equal,
            }
        finally:
            shutil.rmtree(pdir, ignore_errors=True)

        # IVF family at-scale leg: the second index (centroid cells)
        # written partitionBy("centroid_id") — same layout-as-index
        # evidence as the LSH leg: scan fraction per probe, pruned
        # latency, and full-probe == brute-force integrity on a 200k
        # subsample (k-means fit bounded to 50k sampled rows)
        from spider_man_spark.operators.similarity import (
            ann_topk_ivf_partitioned,
            cosine_topk,
            ivf_index,
            write_ivf_corpus,
        )

        ivf_sub = corpus.filter(F.col("vec_id") < 200_000).cache()
        ivf_sub.count()
        idir = tempfile.mkdtemp(
            prefix="bench_ann_ivf_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        ipath = os.path.join(idir, "corpus_ivf")
        try:
            # ONE k-means fit shared by every layout below (fit is the
            # expensive step; the layouts must agree on the same cells
            # for the batch_rows_match evidence to be meaningful)
            t0 = time.monotonic()
            idx_b, cents_b = ivf_index(
                ivf_sub, n_centroids=64, seed=7, max_iter=5,
                fit_sample_rows=50_000,
            )
            idx_b = idx_b.cache()
            write_ivf_corpus(ivf_sub, ipath, precomputed=(idx_b, cents_b))
            t_write_ivf = time.monotonic() - t0
            ivf_files_total = sum(
                1 for _r, _d, fs in os.walk(ipath)
                for f in fs
                if f.endswith(".parquet") and "_ivf_centroids" not in _r
            )
            q = qvecs[0][1]
            lat_ivf = []
            for _vid, qv in qvecs:
                t0 = time.monotonic()
                ann_topk_ivf_partitioned(
                    spark, ipath, qv, k=10, nprobe=4
                ).collect()
                lat_ivf.append(time.monotonic() - t0)
            cents = cents_b
            qv0 = np.asarray(q, dtype=np.float64)
            cn = np.linalg.norm(cents, axis=1)
            cn[cn == 0] = 1.0
            sims_c = cents @ qv0 / (cn * (np.linalg.norm(qv0) or 1.0))
            probe_cells = [int(i) for i in np.argsort(-sims_c)[:4]]
            ivf_files_scanned = (
                spark.read.parquet(ipath)
                .filter(F.col("centroid_id").isin(probe_cells))
                .select(F.input_file_name())
                .distinct()
                .count()
            )
            full_probe = [
                (r.vec_id, r.cosine)
                for r in ann_topk_ivf_partitioned(
                    spark, ipath, q, k=10, nprobe=64
                ).collect()
            ]
            brute_ref = [
                (r.vec_id, r.cosine)
                for r in cosine_topk(ivf_sub, q, k=10).collect()
            ]
            # batch-path structural evidence, mirroring the LSH
            # bucketed_table leg: the Hive-bucketed IVF corpus must
            # carry one hash exchange fewer in the executed plan
            from spider_man_spark.operators.similarity import (
                ann_topk_ivf_batch,
                ann_topk_ivf_batch_bucketed,
                save_ivf_corpus_table,
            )

            spark.sql("DROP TABLE IF EXISTS ann_bench_ivf_corpus")
            spark.sql("DROP TABLE IF EXISTS ann_bench_ivf_corpus_centroids")
            save_ivf_corpus_table(
                ivf_sub, "ann_bench_ivf_corpus", n_buckets=64,
                precomputed=(idx_b, cents_b),
            )
            sub_q3 = queries.filter(F.col("qid") < 200)
            plain_ivf = ann_topk_ivf_batch(
                sub_q3, idx_b, cents_b, k=10, nprobe=8
            )
            buck_ivf = ann_topk_ivf_batch_bucketed(
                spark, "ann_bench_ivf_corpus", sub_q3, k=10, nprobe=8
            )
            rows_p = sorted(
                (r.qid, r.vec_id, r.cosine) for r in plain_ivf.collect()
            )
            rows_b = sorted(
                (r.qid, r.vec_id, r.cosine) for r in buck_ivf.collect()
            )
            ivf_exch_plain = _n_exchanges(plain_ivf)
            ivf_exch_buck = _n_exchanges(buck_ivf)
            spark.sql("DROP TABLE IF EXISTS ann_bench_ivf_corpus")
            spark.sql("DROP TABLE IF EXISTS ann_bench_ivf_corpus_centroids")

            # recall-vs-nprobe curve (round-7): the family's
            # quality-cost trade, machine-readable like the LSH
            # recall_at_10_subsample.  Ground truth is the FULL-probe
            # batch run — exactly brute force by the partition
            # invariant (cells partition the corpus), one job instead
            # of a per-query brute loop.
            sub_q4 = queries.filter(F.col("qid") < 64)
            n_rq = sub_q4.count()
            truth_sets: dict = {}
            for r in ann_topk_ivf_batch(
                sub_q4, idx_b, cents_b, k=10, nprobe=64
            ).collect():
                truth_sets.setdefault(r.qid, set()).add(r.vec_id)
            recall_curve = []
            for p in (2, 4, 8, 16):
                t0 = time.monotonic()
                got = ann_topk_ivf_batch(
                    sub_q4, idx_b, cents_b, k=10, nprobe=p
                ).collect()
                w = time.monotonic() - t0
                got_sets: dict = {}
                for r in got:
                    got_sets.setdefault(r.qid, set()).add(r.vec_id)
                rec = sum(
                    len(got_sets.get(qid, set()) & s) / len(s)
                    for qid, s in truth_sets.items()
                ) / max(len(truth_sets), 1)
                recall_curve.append({
                    "nprobe": p,
                    "scan_fraction": round(p / 64, 4),
                    "recall_at_10": round(rec, 4),
                    "wall_sec": round(w, 2),
                    "queries_per_sec": round(n_rq / w, 1),
                })
            idx_b.unpersist()

            ivf = {
                "n_corpus": 200_000,
                "n_centroids": 64,
                "fit_sample_rows": 50_000,
                "nprobe": 4,
                "write_sec": round(t_write_ivf, 2),
                "files_total": ivf_files_total,
                "files_scanned_one_probe": ivf_files_scanned,
                "scan_fraction": round(
                    ivf_files_scanned / ivf_files_total, 4
                ),
                "latency_ms_pruned_avg": int(
                    1000 * sum(lat_ivf) / len(lat_ivf)
                ),
                "full_probe_equals_brute": full_probe == brute_ref,
                "batch_exchanges_plain": ivf_exch_plain,
                "batch_exchanges_bucketed": ivf_exch_buck,
                "batch_corpus_exchange_elided": ivf_exch_buck < ivf_exch_plain,
                "batch_rows_match": rows_p == rows_b,
                "recall_curve": recall_curve,
            }
        finally:
            shutil.rmtree(idir, ignore_errors=True)
        return {
            "n_corpus": n_corpus,
            "n_queries": n_queries,
            "dim": dim,
            "k": 10,
            "n_planes": 16,
            "probe_hamming": 2,
            "topk_rows": n_out,
            "wall_sec": round(wall, 2),
            "queries_per_sec": round(n_queries / wall, 1),
            "recall_at_10_subsample": recall,
            "bucketed_table": bucketed,
            "partitioned": partitioned,
            "ivf": ivf,
        }
    finally:
        spark.stop()


def sustain_bench(cores: int, epochs: int = 10) -> dict:
    """Long-crawl flatness evidence: the light corpus crawled for
    ``epochs`` epochs at a per-epoch budget sized so the frontier
    never drains (every epoch schedules its full budget — equal work
    per epoch), with aggressive state compaction (compact_every=4)
    exercised mid-run.  The claim under test: per-epoch wall time does
    NOT grow with the accumulated seen set / state history — i.e. no
    O(total-crawled) work hides on the per-epoch critical path (the
    10^10 posture: a crawl is a long-running job, not 3 epochs).

    Reports the full per-epoch latency + scheduled-count series plus
    the last3/first3 latency ratio (epoch 1 is excluded from first3 —
    it pays one-time cache warmup); the ratio is only meaningful
    because the scheduled counts are equal across epochs (also
    reported, so the artifact shows it)."""
    from spider_man_spark.config import CrawlConfig
    from spider_man_spark.plans.job import CrawlJob
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_corpus

    spark = get_spark(
        f"bench-sustain-{cores}", master=f"local[{cores}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = make_corpus(spark, **CRAWL).repartition(64, "url").cache()
    corpus.count()
    wd = tempfile.mkdtemp(prefix="bench_sustain_")
    try:
        job = CrawlJob(
            spark,
            CrawlConfig(
                workdir=wd, tokens_per_epoch=1000,
                max_epochs=epochs + 1, rank_salts=8, compact_every=4,
            ),
            corpus=corpus,
        )
        job.insert_requests_df(
            _seed_df(spark, CRAWL["n_hosts"], CRAWL_SEEDS_PER_HOST)
        )
        spark.range(256).repartition(128).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        fetched = 0
        epoch_ms = []
        epoch_sched = []
        t0 = time.monotonic()
        for _ in range(epochs):
            r = job.step()
            fetched += r.scheduled
            epoch_ms.append(r.durations_ms["epoch"])
            epoch_sched.append(r.scheduled)
        wall = time.monotonic() - t0
        first3 = sum(epoch_ms[1:4]) / 3.0
        last3 = sum(epoch_ms[-3:]) / 3.0
        return {
            "cores": cores,
            "epochs": epochs,
            "fetched": fetched,
            "wall_sec": round(wall, 3),
            "epoch_ms": epoch_ms,
            "epoch_scheduled": epoch_sched,
            "equal_work": len(set(epoch_sched)) == 1,
            "first3_avg_ms": int(first3),
            "last3_avg_ms": int(last3),
            "last3_over_first3": round(last3 / first3, 3),
            "seen_rows": job.store.read_deltas("seen", epochs).count(),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


IMAGE_BENCH_N = 200_000  # input_hint-shaped rows; ~12 KB decoded pixels each


def image_bench(cores: int, n_images: int = IMAGE_BENCH_N) -> dict:
    """Image-payload leg (the graft's payload axis): generate an
    input_hint-shaped image+caption table (untimed setup, parquet on
    /dev/shm), then time the two passes a training-data pipeline runs
    over it at 100 TB:

      1. decode+verify — Arrow-batched decode of every payload
         (png/qimg codecs), recomputing phash and checking it against
         the stored column (a full-fidelity scan: the per-row
         invariant enforced at load, not just in tests);
      2. perceptual dedup — banded-Hamming phash near-dup pairs plus
         byte-exact duplicate groups (bucket equi-joins only, the
         10^10-image shape);
      3. full dedup keep — the pair sets folded into transitive
         clusters (connected components, O(log n) rounds) with one
         kept image per cluster (``image_dedup_keep``).

    Reports imgs/s and decoded-MB/s for the scan and the dedup pair /
    group counts against the planted ground truth (1 exact + 1 near
    dup per 10 images).

    Drift-proofing (round-7): this VM's wall-clock drifts up to ~2.5x
    with zero code change (the r06 driver window halved imgs/s while
    every invariant stayed identical), so the leg now records evidence
    independent of the wall:
      - ``cal_hash_per_s_before/after`` — single-core sha256 stamps
        bracketing the timed work (same ``_quick_cal`` the scaling
        legs use): a 2x wall swing with a matching cal swing is the
        hypervisor, not the code;
      - ``images_per_khash`` — throughput normalized by the mean cal
        stamp (images per 1000 sha256 hashes of machine work), the
        cross-round comparable number;
      - ``decoded_bytes`` — total pixel bytes verified (a property of
        the data shape: equal work every round, whatever the wall);
      - executed-plan structure for both dedup ops (exchange counts
        and a no-cartesian check, captured AFTER execution so the
        AQE-final plan is the one recorded) — the bucket-equi-join
        shape can't silently regress into an all-pairs plan."""
    from pyspark.sql import functions as F

    from spider_man_spark.functions.images import decode_items
    from spider_man_spark.operators.imagededup import (
        exact_dup_images,
        image_dedup_keep,
        phash_neardup_pairs,
    )
    from spider_man_spark.session import get_spark
    from spider_man_spark.sources.corpus import make_image_table

    spark = get_spark(
        f"bench-images-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    tdir = tempfile.mkdtemp(
        prefix="bench_images_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    tpath = os.path.join(tdir, "images")
    try:
        make_image_table(spark, n_images).write.mode("overwrite").parquet(tpath)
        table = spark.read.parquet(tpath)
        # pre-warm executor python workers (same reason as the crawl leg)
        spark.range(256).repartition(cores * 4).mapInPandas(
            lambda it: it, schema="id long"
        ).count()

        cal0 = _quick_cal()
        t0 = time.monotonic()
        decoded = decode_items(table.select("image_id", "bytes"))
        scan = (
            decoded.join(
                table.select("image_id", F.col("phash").alias("phash_stored")),
                "image_id",
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("decode_ok").cast("long")).alias("n_ok"),
                F.sum((F.col("phash") == F.col("phash_stored")).cast("long")).alias(
                    "n_phash_match"
                ),
                F.sum(F.col("w").cast("long") * F.col("h") * 3).alias("decoded_bytes"),
            )
            .first()
        )
        decode_wall = time.monotonic() - t0

        t0 = time.monotonic()
        nd_df = phash_neardup_pairs(table, max_hamming=3)
        neardup = nd_df.count()
        ex_df = exact_dup_images(table)
        exact_groups = ex_df.count()
        dedup_wall = time.monotonic() - t0

        # full dedup pass: pairs -> transitive clusters (large-star/
        # small-star connected components) -> one kept image each.
        # kept_images is deterministic (synthetic table + deterministic
        # closure), so it's another structural field: it must be
        # byte-identical across rounds and parallelism levels whatever
        # the wall-clock does, and <= 0.8*n by the planted structure
        # (slots 8/9 of every 10 fold into slot 0; cross-group phash
        # collisions can only fold more).
        t0 = time.monotonic()
        cc_stats: dict = {}
        kept = image_dedup_keep(
            table, max_hamming=3, cc_stats=cc_stats
        ).count()
        keep_wall = time.monotonic() - t0
        cal1 = _quick_cal()

        # untimed plan capture: execute each dedup frame once more so
        # its OWN QueryExecution holds the AQE-final physical plan
        # (count() above ran a derived plan), then record the shape
        nd_df.collect()
        ex_df.collect()

        def _plan_shape(res):
            plan = res._jdf.queryExecution().executedPlan().toString()
            return {
                "exchanges": plan.count("Exchange hashpartitioning"),
                "cartesian": ("CartesianProduct" in plan
                              or "BroadcastNestedLoopJoin" in plan),
            }

        nd_shape, ex_shape = _plan_shape(nd_df), _plan_shape(ex_df)
        cal_mean = (cal0 + cal1) / 2.0
        return {
            "n_images": scan.n,
            "decode_ok": scan.n_ok,
            "phash_match": scan.n_phash_match,
            "decode_wall_sec": round(decode_wall, 3),
            "images_per_sec": round(scan.n / decode_wall, 1),
            "decoded_mb_per_sec": round(
                scan.decoded_bytes / 1e6 / decode_wall, 1
            ),
            "decoded_bytes": int(scan.decoded_bytes),
            "neardup_pairs": neardup,
            "exact_dup_groups": exact_groups,
            "dedup_wall_sec": round(dedup_wall, 3),
            "kept_images": kept,
            "kept_fraction": round(kept / max(scan.n, 1), 4),
            "keep_wall_sec": round(keep_wall, 3),
            "keep_cc_rounds": cc_stats.get("rounds"),
            "keep_cc_star_edges": cc_stats.get("edges"),
            "cal_hash_per_s_before": cal0,
            "cal_hash_per_s_after": cal1,
            "images_per_khash": round(
                scan.n / decode_wall / cal_mean * 1000.0, 3
            ),
            "neardup_plan": nd_shape,
            "exact_plan": ex_shape,
            "dedup_plan_bucket_join_only": not (
                nd_shape["cartesian"] or ex_shape["cartesian"]
            ),
        }
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        spark.stop()


def _image_bench_subprocess(cores: int) -> dict:
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--image-leg", str(cores)],
        capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "32g")},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # bench corpora are GB-scale cached; size the single local JVM heap
    # accordingly (must be set before the first session starts)
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    if len(sys.argv) == 3 and sys.argv[1] == "--image-leg":
        print(json.dumps(image_bench(int(sys.argv[2]))))
        return
    if len(sys.argv) == 3 and sys.argv[1] == "--sustain-leg":
        print(json.dumps(sustain_bench(int(sys.argv[2]))))
        return
    if len(sys.argv) == 3 and sys.argv[1] == "--ann-leg":
        print(json.dumps(ann_bench(int(sys.argv[2]))))
        return
    if len(sys.argv) == 4 and sys.argv[1] == "--bloom-ab-leg":
        print(json.dumps(bloom_ab_bench(int(sys.argv[2]), sys.argv[3])))
        return
    if len(sys.argv) == 3 and sys.argv[1] == "--fwrite-ab-leg":
        print(json.dumps(fwrite_ab_bench(int(sys.argv[2]))))
        return
    if len(sys.argv) in (5, 6, 7) and sys.argv[1] == "--frontier-leg":
        kw = {}
        if len(sys.argv) >= 6:
            kw["epochs"] = int(sys.argv[5])
        if len(sys.argv) == 7:
            kw["max_chain"] = int(sys.argv[6])
        print(
            json.dumps(
                frontier_bench(
                    int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), **kw
                )
            )
        )
        return
    if len(sys.argv) >= 4 and sys.argv[1] == "--crawl-leg":
        rest = sys.argv[4:]
        scale = "--scale" in rest
        bloom = "--bloom" in rest
        cpath = None
        if scale:
            v = rest[rest.index("--scale") + 1] if len(rest) > rest.index("--scale") + 1 else ""
            cpath = v if v and not v.startswith("--") else None
        print(json.dumps(
            crawl_bench(sys.argv[2], int(sys.argv[3]), scale=scale,
                        corpus_path=cpath, bloom=bloom)
        ))
        return
    if len(sys.argv) == 3 and sys.argv[1] == "--gen-corpus":
        gen_scale_corpus(sys.argv[2])
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    queries = query_bench(sf_dir, cpus)
    crawl = _crawl_bench_subprocess(f"local[{cpus}]", cpus)

    result = {
        "metric": "crawl_bench_wall_sec",
        "value": crawl["wall_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
    }

    # image-payload leg: decode+verify scan throughput and phash dedup
    # over an input_hint-shaped table (off with SPARK_GRAFT_IMAGES=0)
    if os.environ.get("SPARK_GRAFT_IMAGES", "1") != "0":
        result["image"] = _image_bench_subprocess(cpus)

    # sustained long-crawl flatness leg (OFF by default — adds ~4 min;
    # numbers recorded in BASELINE.md round-3)
    if os.environ.get("SPARK_GRAFT_SUSTAIN") == "1":
        import subprocess

        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sustain-leg",
             str(cpus)],
            capture_output=True, text=True, check=True, env={**os.environ},
        )
        result["sustain"] = json.loads(out.stdout.strip().splitlines()[-1])

    # batch-ANN leg: 10k queries x 1M corpus through the multi-probe
    # bucket join + recall subsample (off with SPARK_GRAFT_ANN=0)
    if os.environ.get("SPARK_GRAFT_ANN", "1") != "0":
        import subprocess

        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--ann-leg",
             str(cpus)],
            capture_output=True, text=True, check=True,
            env={**os.environ,
                 "SPARK_DRIVER_MEM": os.environ.get(
                     "SPARK_DRIVER_MEM", "32g")},
        )
        result["ann"] = json.loads(out.stdout.strip().splitlines()[-1])

    # frontier write-path evidence (sharded O(churn) commits vs full
    # rewrite; 10x frontier-to-budget ratio) — default-on, 3 short legs
    if os.environ.get("SPARK_GRAFT_FRONTIER", "1") != "0":
        import subprocess

        def _fleg(mode: str, sph: int, epochs: int | None = None,
                  max_chain: int | None = None) -> dict:
            argv = [sys.executable, os.path.abspath(__file__),
                    "--frontier-leg", str(cpus), mode, str(sph)]
            if epochs is not None:
                argv.append(str(epochs))
            if max_chain is not None:
                argv.append(str(max_chain))
            out = subprocess.run(
                argv,
                capture_output=True, text=True, check=True,
                env={**os.environ,
                     "SPARK_DRIVER_MEM": os.environ.get(
                         "SPARK_DRIVER_MEM", "32g")},
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        result["frontier"] = {
            "mor_640k": _fleg("mor", 10000),
            "full_640k": _fleg("full", 10000),
            "mor_160k": _fleg("mor", 2500),
            # auto-policy at its trigger point: 64 hosts x 65600 seeds
            # = 4.2M-row standing frontier (>= frontier_mor_min_rows),
            # 64k budget/epoch -> churn fraction ~0.03 <= 0.25, so the
            # default "auto" must flip to MOR on its own — the one
            # policy branch a sub-threshold crawl can never exercise.
            # Digest is checked against a forced-full control at the
            # same shape (identical schedule => the flip is free).
            "auto_4m2": _fleg("auto", 65600, 5),
            "full_4m2": _fleg("full", 65600, 5),
            # churn-volume compaction under sustained MOR: 13 epochs
            # with the chain folded at length 4 -> 3 compaction
            # cycles; chain_dirs must saw-tooth and per-epoch wall
            # stay flat (bounded read-assembly across cycles)
            "mor_chain_640k": _fleg("mor", 10000, 13, 4),
        }
        # frontier_write rank-vs-antijoin paired same-JVM A/B at the
        # same 640k shape — the commit-derivation cost in isolation
        fw_out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--fwrite-ab-leg", str(cpus)],
            capture_output=True, text=True, check=True,
            env={**os.environ,
                 "SPARK_DRIVER_MEM": os.environ.get(
                     "SPARK_DRIVER_MEM", "32g")},
        )
        result["frontier"]["fwrite_ab_640k"] = json.loads(
            fw_out.stdout.strip().splitlines()[-1]
        )

    # scaling evidence is part of the DEFAULT artifact (round-2 verdict:
    # the claim must be machine-checkable from BENCH_r{N}.json)
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        result["scaling"] = scaling_bench(
            float(os.environ.get("SPARK_GRAFT_SCALING_BUDGET_S", "1500"))
        )

    # Full nested detail goes to a file; stdout's FINAL line stays
    # compact so the driver's tail buffer can always parse it
    # (round-3 lesson: the all-in-one line outgrew the buffer and
    # BENCH_r03.json recorded "parsed": null).
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json")
    # Merge-preserve: a light run (sections skipped via env) must not
    # truncate evidence sections a previous full run wrote — only
    # overwrite keys this run actually produced (round-5 lesson: a
    # light-only rerun orphaned BENCH_r05's full_detail pointer).
    merged = {}
    try:
        with open(full_path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        pass
    merged.update(result)
    with open(full_path, "w") as f:
        json.dump(merged, f, indent=1)

    # Keep COVERAGE.md's generated gate summary in sync with the newest
    # CORRECTNESS_r*.json as part of every artifact pass (rounds 4-6 all
    # ended with the committed summary one round stale because the sync
    # was a manual start-of-round step). Best-effort: a bench run must
    # never fail because the doc sync did.
    try:
        import subprocess
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "sync_coverage.py")],
            check=False, capture_output=True, timeout=60,
        )
    except Exception:
        pass

    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "crawl": {
            k: crawl[k]
            for k in ("fetched", "epochs", "wall_sec",
                      "fetched_urls_per_sec", "epoch_latency_ms",
                      "schedule_digest")
            if k in crawl
        },
        "full_detail": "BENCH_full.json",
    }
    if "image" in result:
        im = result["image"]
        compact["image"] = {
            k: im[k]
            for k in ("n_images", "images_per_sec", "decoded_mb_per_sec",
                      "neardup_pairs", "exact_dup_groups", "kept_images",
                      "images_per_khash", "dedup_plan_bucket_join_only")
            if k in im
        }
    if "ann" in result:
        an = result["ann"]
        compact["ann"] = {
            k: an[k]
            for k in ("n_corpus", "n_queries", "queries_per_sec",
                      "recall_at_10_subsample")
            if k in an
        }
        if isinstance(an.get("bucketed_table"), dict):
            compact["ann"]["bucketed_queries_per_sec"] = an[
                "bucketed_table"
            ].get("queries_per_sec")
        if isinstance(an.get("partitioned"), dict):
            compact["ann"]["partitioned_scan_fraction"] = an[
                "partitioned"
            ].get("scan_fraction")
        if isinstance(an.get("bucketed_table"), dict):
            compact["ann"]["corpus_exchange_elided"] = an[
                "bucketed_table"
            ].get("corpus_exchange_elided")
        if isinstance(an.get("ivf"), dict):
            compact["ann"]["ivf_scan_fraction"] = an["ivf"].get(
                "scan_fraction"
            )
    if "frontier" in result:
        fb = result["frontier"]
        on, off, small = (
            fb["mor_640k"], fb["full_640k"], fb["mor_160k"]
        )
        compact["frontier"] = {
            "write_mb_mor_640k": on["steady_write_mb"],
            "write_mb_full_640k": off["steady_write_mb"],
            "io_ratio_full_over_mor": round(
                off["steady_write_mb"] / max(on["steady_write_mb"], 0.01), 1
            ),
            "epoch_ms_mor_640k": on["steady_epoch_ms"],
            "epoch_ms_full_640k": off["steady_epoch_ms"],
            "epoch_ms_mor_160k": small["steady_epoch_ms"],
            "digest_match": on["schedule_digest"] == off["schedule_digest"],
        }
        if "mor_chain_640k" in fb:
            mc = fb["mor_chain_640k"]
            compact["frontier"]["mor_chain"] = {
                "max_chain": mc["max_chain"],
                "chain_dirs": mc["chain_dirs"],
                "compaction_cycles": sum(
                    1 for a, b in zip(mc["chain_dirs"], mc["chain_dirs"][1:])
                    if b < a
                ),
                "epoch_ms": mc["epoch_ms"],
            }
        if "fwrite_ab_640k" in fb:
            fw = fb["fwrite_ab_640k"]
            compact["frontier"]["fwrite_ab"] = {
                "rank_overhead_factor": fw["rank_overhead_factor_median"],
                "digest_match_vs_full": (
                    fw["schedule_digest"] == off["schedule_digest"]
                ),
            }
        if "auto_4m2" in fb:
            au, fu = fb["auto_4m2"], fb["full_4m2"]
            compact["frontier"]["auto_4m2"] = {
                # "auto->mor" iff every epoch above the threshold chose
                # MOR on its own (epoch 1 included: the policy sees the
                # 4.2M frontier immediately)
                "mode": (
                    "auto->mor"
                    if all(m == "mor" for m in au["epoch_modes"])
                    else "auto->" + "/".join(au["epoch_modes"])
                ),
                "digest_match_vs_full": (
                    au["schedule_digest"] == fu["schedule_digest"]
                ),
                "epoch_ms_auto": au["epoch_ms"],
                "epoch_ms_full": fu["epoch_ms"],
                "write_mb_auto": au["frontier_write_mb"],
                "write_mb_full": fu["frontier_write_mb"],
                "io_ratio_full_over_auto": round(
                    fu["steady_write_mb"] / max(au["steady_write_mb"], 0.01),
                    1,
                ),
            }
    if "sustain" in result:
        su = result["sustain"]
        compact["sustain"] = {
            k: su[k]
            for k in ("epochs", "last3_over_first3", "last3_avg_ms")
            if k in su
        }
    if "scaling" in result:
        sc = result["scaling"]
        compact["scaling"] = {
            k: sc[k]
            for k in ("efficiency_N_to_4N", "efficiency_normalized_to_hw",
                      "calibration_invalid", "pairs_healthy",
                      "chosen_pair_degraded", "schedule_digest_match")
            if k in sc
        }
        if isinstance(sc.get("bloom_ab"), dict):
            compact["scaling"]["bloom_overhead_factor"] = sc["bloom_ab"].get(
                "overhead_factor_at_this_sf"
            )
            compact["scaling"]["bloom_digest_match"] = sc["bloom_ab"].get(
                "digest_match_on_vs_off"
            )
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
