"""Subprocess body for the cross-process versioned-table race tests.

Each invocation is a REAL separate process with its own JVM — the
deployment shape of concurrent writers (two Spark jobs on one table),
which the in-process threaded race (tests/test_versioned.py) cannot
represent: os.link atomicity, log re-reads, and CAS retries all cross a
process boundary here.

Usage: python tests/race_worker.py <role> <table> <arg...>
  append <table> <writer_tag> <n_commits> <key_base>
      n_commits single-row appends (key_base+i, "<writer_tag>:<i>")
  merge <table> <n_keys>
      one pruned MERGE setting keys 0..n_keys-1 to v='merged'
  read <table> <n_iters>
      n_iters latest-snapshot reads; prints row counts; exits nonzero
      on any error or on a count that went BACKWARD (torn/lost data)
"""

from __future__ import annotations

import sys


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1g")
        .appName(f"race-worker-{'-'.join(sys.argv[1:3])}")
        .getOrCreate()
    )


def main() -> int:
    role, table = sys.argv[1], sys.argv[2]
    from covid_19_data_engineering_spark.sources.versioned import (
        merge_versioned,
        read_versioned,
        write_versioned,
    )

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if role == "append":
            tag, n, key_base = sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
            for i in range(n):
                df = spark.createDataFrame(
                    [(key_base + i, f"{tag}:{i}")], "k long, v string")
                write_versioned(df, table, mode="append", max_retries=100)
            return 0
        if role == "merge":
            n_keys = int(sys.argv[3])
            updates = spark.createDataFrame(
                [(k, "merged") for k in range(n_keys)], "k long, v string")
            merge_versioned(spark, table, updates, key="k", max_retries=100)
            return 0
        if role == "read":
            n_iters = int(sys.argv[3])
            last = -1
            for _ in range(n_iters):
                n = read_versioned(spark, table).count()
                print(f"count={n}", flush=True)
                if n < last:
                    print(f"COUNT WENT BACKWARD: {last} -> {n}", flush=True)
                    return 2
                last = n
            return 0
        print(f"unknown role {role!r}", flush=True)
        return 3
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
