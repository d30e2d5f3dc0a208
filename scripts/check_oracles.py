"""Cross-check queries() vs oracle_sql() the way the driver does:
row-count + schema-shape + order-insensitive value comparison at a
given SF.  Usage: python scripts/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(
        drop=True
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as em
    from spider_man_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = em.queries(), em.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rowcount spark={len(got)} oracle={len(want)}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(
                f"FAIL  {name}: columns spark={sorted(got.columns)} "
                f"oracle={sorted(want.columns)}"
            )
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        # The driver's value hash is dtype-sensitive: an int64 Spark column
        # vs a float64 oracle column hashes differently even when every
        # value is numerically equal (the live metrics_tps failure — DuckDB
        # sum(BIGINT) -> HUGEINT -> pandas float64).  Surface that locally.
        dtype_mismatch = [
            c for c in g.columns
            if (str(g[c].dtype).startswith("int"))
            != (str(w[c].dtype).startswith("int"))
        ]
        if dtype_mismatch:
            print(
                f"FAIL  {name}: int/float dtype divergence on "
                f"{dtype_mismatch} "
                f"(spark={[str(g[c].dtype) for c in dtype_mismatch]}, "
                f"oracle={[str(w[c].dtype) for c in dtype_mismatch]}) — "
                f"driver hash would mismatch"
            )
            failures += 1
            continue
        try:
            # Integer/string columns compare EXACTLY — the driver hashes raw
            # values, and a tolerant rtol here hid a +-30 duration_ms integer
            # drift for two rounds (metrics_tps). Only float columns get the
            # round-trip tolerance (they're pre-rounded to 6dp by normalize).
            int_cols = [
                c
                for c in g.columns
                if not str(g[c].dtype).startswith("float")
            ]
            float_cols = [c for c in g.columns if c not in int_cols]
            if int_cols:
                pd.testing.assert_frame_equal(
                    g[int_cols], w[int_cols], check_dtype=False,
                    check_exact=True,
                )
            if float_cols:
                pd.testing.assert_frame_equal(
                    g[float_cols], w[float_cols], check_dtype=False,
                    check_exact=False, rtol=1e-6, atol=1e-9,
                )
            print(f"OK    {name}: {len(got)} rows")
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch\n{str(e)[:600]}")
            diff = g.compare(w) if g.shape == w.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
