"""Bloom-filter semi-join pruning — the scan-reduction primitive for
fact⋈fact semi-joins at 100 TB.

The reference's warehouses answered "rows of urgent orders" with a plain SQL
semi-join on the server (/root/reference/load_tables_daily.py emits only
count(*)-style SQL; joins were the warehouse's job). A Spark engine that owns
execution should NOT shuffle a 100 TB fact table to semi-join a small key
set: it builds a compact Bloom bitmask over the build-side keys, broadcasts
O(m/8) bytes to every executor, and filters the fact MAP-ONLY; the exact
join (if one is still needed) then runs on the tiny surviving fraction.
Spark's own runtime row-group filtering (spark.sql.optimizer.runtime.
bloomFilter.enabled) applies the same idea inside Catalyst; this operator
makes the trade *measurable* — it reports the false-positive rate actually
achieved so a pipeline can audit the pruning before relying on it.

Everything is deterministic and engine-replayable: k=4 hash probes derived
from md5 (no library bloom, no rand()), and the filter is sized from the
build-side cardinality inside the same plan (16 bits/key => ~0.24% FP at
k=4), so the identical draw replays in any IEEE/md5-capable engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

_K = 4  # hash probes per key
_BITS_PER_KEY = 16  # m = 16 * n_build_keys => FP ~ (1 - e^-k/16)^k ~ 0.24%


def _probe_positions(key: Column, m_bits: Column) -> list[Column]:
    """k deterministic bit positions for ``key`` in an m-bit filter: the
    leading 32 bits of md5(j ':' key) mod m, for j = 1..k."""
    out = []
    for j in range(1, _K + 1):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(j)), F.lit(":"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        out.append(h % m_bits)
    return out


def bloom_semi_join_stats(build_keys: DataFrame, probe: DataFrame,
                          build_key: str, probe_key: str) -> DataFrame:
    """Build a size-derived Bloom filter over ``build_keys[build_key]``, probe every
    ``probe`` row map-only, and report the measured pruning quality.

    Plan shape (the part that matters at scale):
      1. build side: distinct keys -> k bit positions each -> per-word
         ``bit_or`` bitmask -> ONE row holding {n, m_bits, word map}. All
         O(build) work; the bitmask is at most m/64 longs (16 bits/key
         => 2 B/key broadcast payload).
      2. probe side: crossJoin(broadcast(one-row bitmask)) then a pure
         codegen expression tests all k bits per row — the probe table is
         scanned ONCE and NEVER shuffled.
      3. ground truth for the audit: a broadcast left-semi-style marker join
         against the same small key set, in the same single pass.
    The output is one row of counters + the achieved false-positive rate.
    """
    keys = build_keys.select(F.col(build_key).alias("k")).distinct()
    n_keys = keys.agg(
        F.count(F.lit(1)).alias("n_build_keys"),
        (F.count(F.lit(1)) * _BITS_PER_KEY).alias("m_bits"),
    )
    # k positions per key -> set bits, packed into 64-bit words
    pos = (
        keys.crossJoin(F.broadcast(n_keys))
        .select(
            F.explode(F.array(*_probe_positions(F.col("k"), F.col("m_bits")))).alias("p")
        )
        .distinct()
    )
    words = pos.select(
        F.expr("p DIV 64").alias("w"),
        F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("m"),
    ).groupBy("w").agg(F.expr("bit_or(m)").alias("mask"))
    # Dense bitmask ARRAY (index = word), built ONCE in the 1-row build
    # plan: map_from_entries element_at is an O(words) scan per lookup, so
    # probing through the map made the per-row test O(words) — measurably
    # super-linear at 3x corpus (ratio 3.7). Array element_at is O(1).
    bloom = (
        n_keys.crossJoin(words.agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "mask"))
            ).alias("_wm")
        ))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.expr("(m_bits + 63) DIV 64 - 1")),
                lambda i: F.coalesce(
                    F.element_at(F.col("_wm"), i), F.lit(0).cast("long")
                ),
            ).alias("bloom_arr")
        )
    )

    marked = (
        probe.select(F.col(probe_key).alias("pk"))
        .crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(bloom))
        .join(
            F.broadcast(keys.withColumn("is_true", F.lit(1))),
            F.col("pk") == F.col("k"),
            "left",
        )
    )
    bit_tests = [
        F.expr(
            f"(shiftright(element_at(bloom_arr, CAST(_p{j} DIV 64 AS INT) + 1),"
            f" CAST(_p{j} % 64 AS INT)) & 1) = 1"
        )
        for j in range(_K)
    ]
    with_pos = marked.select(
        "*",
        *[
            p.alias(f"_p{j}")
            for j, p in enumerate(_probe_positions(F.col("pk"), F.col("m_bits")))
        ],
    )
    flagged = with_pos.select(
        F.col("n_build_keys"),
        F.col("m_bits"),
        F.when(bit_tests[0] & bit_tests[1] & bit_tests[2] & bit_tests[3], 1)
        .otherwise(0)
        .alias("pass"),
        F.coalesce(F.col("is_true"), F.lit(0)).alias("tru"),
    )
    return (
        flagged.groupBy("n_build_keys", "m_bits")
        .agg(
            F.count(F.lit(1)).alias("n_probe_rows"),
            F.sum("pass").alias("n_bloom_pass"),
            F.sum("tru").alias("n_true_match"),
            (F.sum("pass") - F.sum("tru")).alias("n_false_pos"),
            F.round(
                (F.sum("pass") - F.sum("tru")).cast("double")
                / F.nullif(F.count(F.lit(1)) - F.sum("tru"), F.lit(0)),
                6,
            ).alias("fp_rate"),
        )
    )


@register(
    "bloom_semi_join_stats",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    cnt AS (
      SELECT COUNT(*) AS n, COUNT(*) * {_BITS_PER_KEY} AS m FROM build
    ),
    pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(t.j || ':' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
               % (SELECT m FROM cnt) AS p
      FROM build, (VALUES ('1'), ('2'), ('3'), ('4')) t(j)
    ),
    probe_keys AS (SELECT DISTINCT l_orderkey AS pk FROM lineitem),
    key_flags AS (
      SELECT pk,
             (SUM(CASE WHEN p IN (SELECT p FROM pos) THEN 1 ELSE 0 END)
              = {_K}) AS pass,
             MAX(CASE WHEN pk IN (SELECT k FROM build) THEN 1 ELSE 0 END) AS tru
      FROM (
        SELECT pk,
               ('0x' || substr(md5(t.j || ':' || CAST(pk AS VARCHAR)), 1, 8))::BIGINT
                 % (SELECT m FROM cnt) AS p
        FROM probe_keys, (VALUES ('1'), ('2'), ('3'), ('4')) t(j)
      ) JOIN probe_keys USING (pk)
      GROUP BY pk
    )
    SELECT CAST((SELECT n FROM cnt) AS BIGINT) AS n_build_keys,
           CAST((SELECT m FROM cnt) AS BIGINT) AS m_bits,
           CAST(COUNT(*) AS BIGINT) AS n_probe_rows,
           CAST(SUM(CASE WHEN f.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(f.tru) AS BIGINT) AS n_true_match,
           CAST(SUM(CASE WHEN f.pass THEN 1 ELSE 0 END) - SUM(f.tru) AS BIGINT)
             AS n_false_pos,
           ROUND(CAST(SUM(CASE WHEN f.pass THEN 1 ELSE 0 END) - SUM(f.tru) AS DOUBLE)
                 / NULLIF(COUNT(*) - SUM(f.tru), 0), 6) AS fp_rate
    FROM lineitem l JOIN key_flags f ON l.l_orderkey = f.pk
    """,
    doc="Bloom-filter semi-join audit: size-derived (16 bits/key, k=4) "
    "deterministic Bloom filter over urgent-order keys, probed MAP-ONLY "
    "against every lineitem row, reporting rows passed, true matches, and "
    "the measured false-positive rate. The 100 TB pattern: broadcast "
    "O(2 bytes/build-key) instead of shuffling the fact for a semi-join; "
    "the exact join then touches only the surviving fraction. Oracle "
    "replays the identical md5-derived filter at key level.",
)
def bloom_semi_join_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = load_table(spark, "lineitem", sf_dir)
    return bloom_semi_join_stats(orders, lineitem, "o_orderkey", "l_orderkey")
