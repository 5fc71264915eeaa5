"""Local replica of the correctness driver's pandas-based gate.

Runs EVERY registry entry at sf0.01 in a bare SparkSession (no session.py
factory — exactly the driver's posture), executes the DuckDB oracle beside
it, and compares the way the driver does: pandas frames, columns sorted by
name, rows sorted by all columns, values string-rendered WITH their dtype
visible (so long 2 vs double 2.0 mismatches, and an unhashable list cell
fails loudly). Prints one line per query and a failing-count exit code.

Usage: python tools/driver_gate.py [sf_dir] [--rotate i/n] [query ...]

``--rotate i/n`` runs slice ``i`` of the registry (queries whose index
in sorted-name order is congruent to i mod n) — the INCREMENTAL gate
mode (round-12 verdict #8): the full three-SF registry sweep costs ~3x
a full gate per round and grows with the registry, so the per-round
standard is (a) every NEW or CHANGED query explicitly at all three SFs,
plus (b) one rotating 1/n slice of the stable set (i = round mod n,
n=3), so every stable query re-verifies at least every n rounds.
Explicit query names compose with --rotate: named queries run even if
outside the slice.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def render(v) -> str:
    """Value rendering calibrated to the observed driver behavior in
    CORRECTNESS_r01: int-kind vs float-kind MISMATCH (math_funcs failed on
    long 2 vs double 2.0) while Decimal-vs-float and date-vs-midnight-
    timestamp representational differences PASS (pricing_summary /
    monthly_order_gapfill were green with exactly those cross-engine
    pairs)."""
    if isinstance(v, (list, tuple, np.ndarray)):
        # driver canonicalizer dies on unhashable cells — surface it
        raise TypeError(f"unhashable cell: {type(v).__name__}")
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, decimal.Decimal):
        return "∅" if v.is_nan() else f"f:{float(v)!r}"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v)!r}"
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        iso = v.isoformat()
        return f"t:{iso[:-9]}" if iso.endswith("T00:00:00") else f"t:{iso}"
    if isinstance(v, dt.date):
        return f"t:{v.isoformat()}"
    return f"s:{v!s}"


def canon(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    if df.empty:
        return []
    rendered = df.apply(lambda col: [render(v) for v in col])
    return sorted("|".join(row) for row in rendered.itertuples(index=False))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # unify representational noise the driver also normalizes away by virtue
    # of arrow->pandas conversion: numpy scalars render with the same repr
    # for identical dtypes, so nothing to do beyond tz-naive timestamps
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
    return df


def main() -> int:
    args = sys.argv[1:]
    rotate = None
    if "--rotate" in args:
        i = args.index("--rotate")
        num, den = args[i + 1].split("/")
        rotate = (int(num), int(den))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("driver-gate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    # the single source of truth for the registry size (round-9 verdict
    # task #5): prose counts in COVERAGE.md et al. cite this line
    print(f"registry: {len(qs)} queries, {len(osql)} oracles")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    names = sorted(qs)
    for idx, name in enumerate(names):
        in_slice = rotate is not None and idx % rotate[1] == rotate[0]
        if rotate is not None or only:
            if not in_slice and name not in only:
                continue
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pd = norm(sdf.toPandas())
            if name not in osql:
                print(f"{name}: ROWS_ONLY rows={len(spark_pd)}")
                continue
            duck_pd = norm(con.execute(osql[name]).fetchdf())
            cols_ok = sorted(spark_pd.columns) == sorted(duck_pd.columns)
            rows_ok = len(spark_pd) == len(duck_pd)
            if not cols_ok or not rows_ok:
                n_fail += 1
                print(f"{name}: FAIL cols_ok={cols_ok} rows {len(spark_pd)} vs {len(duck_pd)}")
                continue
            s_fp, d_fp = canon(spark_pd), canon(duck_pd)
            bad = [(a, b) for a, b in zip(s_fp, d_fp) if a != b]
            if bad:
                n_fail += 1
                print(f"{name}: FAIL {len(bad)} row mismatches; first: {bad[0]}")
            else:
                print(f"{name}: OK rows={len(s_fp)}")
        except Exception as exc:  # driver records the traceback as err
            n_fail += 1
            print(f"{name}: ERR {type(exc).__name__}: {exc}")

    print(f"\nfailures: {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
