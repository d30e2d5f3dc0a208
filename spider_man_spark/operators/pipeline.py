"""Pipeline engine — ordered transform chain with short-circuit.

The reference folds each event through a stage list where a stage may
pass, return ``:skiped`` (drop, no retry), or error (fail, retryable);
exceptions are caught into ``{:error, reason}``
(pipeline/pipeline.ex:15-38).  Stage forms: module | {m,arg} |
fun/1 | {fun/2, arg} (pipeline.ex:19-24,40-70).

Rebuild: stages are DataFrame transforms; per-row short-circuit is a
``_status``/``_reason`` column pair — a stage only sees rows still
``ok`` and whole-stage codegen fuses the chain.  A stage that *raises*
at plan time marks the entire remaining flow failed with the exception
text (the catch-all of pipeline.ex:30-38).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS, REASON = "_status", "_reason"
OK, SKIPPED, ERROR = "ok", "skiped", "error"  # 'skiped' [sic] per reference


def ensure_status(df: DataFrame) -> DataFrame:
    if STATUS in df.columns:
        return df
    return df.withColumn(STATUS, F.lit(OK)).withColumn(
        REASON, F.lit(None).cast("string")
    )


def mark_where(df: DataFrame, cond: Column, status: str, reason: str) -> DataFrame:
    """Stage helper: set status/reason where cond holds (only rows
    still ok are eligible — short-circuit)."""
    df = ensure_status(df)
    hit = (F.col(STATUS) == OK) & cond
    return df.withColumn(
        REASON, F.when(hit, F.lit(reason)).otherwise(F.col(REASON))
    ).withColumn(STATUS, F.when(hit, F.lit(status)).otherwise(F.col(STATUS)))


def skip_where(df: DataFrame, cond: Column, reason: str = "skiped") -> DataFrame:
    return mark_where(df, cond, SKIPPED, reason)


def fail_where(df: DataFrame, cond: Column, reason: str) -> DataFrame:
    return mark_where(df, cond, ERROR, reason)


def json_encode_stage(columns: Sequence[str] | None = None):
    """P4 Pipeline.JsonEncode analogue (json_encode.ex:18-20): replace
    the event payload with its JSON encoding (adds a ``json`` column
    from the selected struct)."""

    def _stage(df: DataFrame) -> DataFrame:
        cols = [c for c in (columns or df.columns) if not c.startswith("_")]
        return df.withColumn("json", F.to_json(F.struct(*cols)))

    return _stage


Stage = Callable[..., DataFrame]


def run_pipeline(
    df: DataFrame, stages: Sequence[Stage | tuple[Stage, Any]]
) -> DataFrame:
    """Fold ``df`` through stages; each stage is ``fn(df)`` or the
    ``(fn, arg)`` form ``fn(df, arg)``.  Raising stages convert to
    per-row ERROR status for all still-ok rows (exception catch-all).
    """
    out = ensure_status(df)
    for stage in stages:
        fn, arg = (stage if isinstance(stage, tuple) else (stage, None))
        try:
            out = ensure_status(fn(out) if arg is None else fn(out, arg))
        except Exception as e:  # noqa: BLE001 - mirrors the ref catch-all
            out = fail_where(out, F.lit(True), f"{type(e).__name__}: {e}")
            break
    return out


def split_statuses(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(ok, skipped, errored) with status columns dropped from ok."""
    df = ensure_status(df)
    ok = df.filter(F.col(STATUS) == OK).drop(STATUS, REASON)
    skipped = df.filter(F.col(STATUS) == SKIPPED)
    errored = df.filter(F.col(STATUS) == ERROR)
    return ok, skipped, errored
