"""Sequential pattern mining over user event histories (PrefixSpan-class
support counting, bounded to the patterns that matter at 100 TB).

Classic sequence mining asks: which ordered patterns of actions occur in
many users' histories — gap-INSENSITIVE containment (a ... b), unlike the
adjacent-step Markov transition matrix (event_transition_matrix) or the
prefix-path rollup (event_top_paths). Support(pattern) = number of users
whose history contains the pattern as a subsequence.

Spark-first shape, no sequence explosion:
- Length-2 containment (a before b) is decidable from per-(user, type)
  FIRST/LAST timestamps alone: exists a-then-b iff min_ts(a) < max_ts(b).
  One groupBy(user, type), then an alphabet-bounded per-user self-join —
  |types|^2 rows per user, and |types| is a domain constant (5 here), not
  a data-scale variable.
- Length-3 (a, b, c) additionally needs SOME b occurrence strictly inside
  the (first a, last c) window: join each user's raw b-occurrences to the
  alphabet-bounded (a, c) candidate grid and reduce with an EXISTS-style
  aggregate — O(events x |types|^2) map-side work, one user-keyed shuffle,
  never a history x history join and never a per-user window sort.

The full general-length PrefixSpan recursion explodes the pattern lattice
and is the wrong operator at corpus scale; production sequence analytics
(funnels, attribution, this module) bound pattern length up front.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


def sequence_pattern_support(events: DataFrame,
                             seq_col: str = "user_id",
                             type_col: str = "event_type",
                             ts_col: str = "ts") -> DataFrame:
    """Support counts for all length-2 and length-3 event-type patterns.

    Returns (pattern_len, a, b, c, support) with c NULL for length-2 —
    support = distinct sequences containing the pattern as a (gap-
    insensitive, strictly time-ordered) subsequence.
    """
    stats = (
        events.groupBy(F.col(seq_col).alias("uid"),
                       F.col(type_col).alias("t"))
        .agg(F.min(ts_col).alias("tmin"), F.max(ts_col).alias("tmax"))
    )
    a, b, c = stats.alias("a"), stats.alias("b"), stats.alias("c")
    sup2 = (
        a.join(b, (F.col("a.uid") == F.col("b.uid"))
               & (F.col("a.tmin") < F.col("b.tmax")))
        .groupBy(F.col("a.t").alias("a"), F.col("b.t").alias("b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .select(F.lit(2).alias("pattern_len"), "a", "b",
                F.lit(None).cast("string").alias("c"), "support")
    )
    occ = events.select(F.col(seq_col).alias("uid"),
                        F.col(type_col).alias("bt"),
                        F.col(ts_col).alias("bts"))
    sup3 = (
        a.join(c, (F.col("a.uid") == F.col("c.uid"))
               & (F.col("a.tmin") < F.col("c.tmax")))
        .select(F.col("a.uid").alias("uid"), F.col("a.t").alias("at"),
                F.col("a.tmin").alias("atmin"),
                F.col("c.t").alias("ct"), F.col("c.tmax").alias("ctmax"))
        .join(occ, "uid")
        .where((F.col("bts") > F.col("atmin")) & (F.col("bts") < F.col("ctmax")))
        .select("uid", "at", "bt", "ct").distinct()
        .groupBy(F.col("at").alias("a"), F.col("bt").alias("b"),
                 F.col("ct").alias("c"))
        .agg(F.count(F.lit(1)).alias("support"))
        .select(F.lit(3).alias("pattern_len"), "a", "b", "c", "support")
    )
    return sup2.unionByName(sup3)


@register(
    "event_sequence_patterns",
    oracle="""
    WITH stats AS (
      SELECT user_id AS uid, event_type AS t,
             MIN(CAST(ts AS TIMESTAMP)) AS tmin,
             MAX(CAST(ts AS TIMESTAMP)) AS tmax
      FROM events GROUP BY 1, 2
    ),
    sup2 AS (
      SELECT 2 AS pattern_len, a.t AS a, b.t AS b,
             CAST(NULL AS VARCHAR) AS c, COUNT(*) AS support
      FROM stats a JOIN stats b
        ON a.uid = b.uid AND a.tmin < b.tmax
      GROUP BY a.t, b.t
    ),
    cand AS (
      SELECT a.uid, a.t AS at, a.tmin AS atmin, c.t AS ct, c.tmax AS ctmax
      FROM stats a JOIN stats c
        ON a.uid = c.uid AND a.tmin < c.tmax
    ),
    hit3 AS (
      SELECT DISTINCT cand.uid, cand.at, e.event_type AS bt, cand.ct
      FROM cand JOIN events e
        ON e.user_id = cand.uid
       AND CAST(e.ts AS TIMESTAMP) > cand.atmin
       AND CAST(e.ts AS TIMESTAMP) < cand.ctmax
    ),
    sup3 AS (
      SELECT 3 AS pattern_len, at AS a, bt AS b, ct AS c,
             COUNT(*) AS support
      FROM hit3 GROUP BY at, bt, ct
    )
    SELECT * FROM sup2
    UNION ALL
    SELECT * FROM sup3
    ORDER BY pattern_len, a, b, c
    """,
    doc="Sequential pattern support counting (PrefixSpan-class, bounded "
    "to lengths 2-3): support = users whose history contains the "
    "pattern as a time-ordered subsequence. Length-2 decided from "
    "per-(user,type) first/last timestamps alone; length-3 joins raw "
    "occurrences to the alphabet-bounded candidate grid with an "
    "EXISTS-reduce. O(events x |alphabet|^2), never a history x "
    "history join.",
)
def event_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return sequence_pattern_support(events).orderBy(
        "pattern_len", "a", "b", "c")
