"""Blocked fuzzy self-join (entity resolution) over part names.

The remaining dedup modality the engine lacked: EDIT-DISTANCE matching,
the workhorse of entity resolution (catalog reconciliation, supplier /
customer master-data dedup) where token-set methods (ngram Jaccard,
MinHash — operators/dedup.py) miss single-character variants.

Spark-first shape, the standard ER pipeline:

1. **collapse to distinct names first** — entity resolution compares
   NAMES, not rows; the distinct projection turns an O(rows^2) problem
   into O(names^2) before any join (2000 parts -> 64 names here; at 100 TB
   catalog scale the same collapse is the difference between infeasible
   and routine);
2. **block on a cheap deterministic key** (the trailing token — the noun
   for product names; soundex/prefix in other domains) so the self-join
   is equi-keyed: one shuffle per side on the block key, candidates only
   within blocks, never all-pairs;
3. **exact Levenshtein re-rank** on the candidates, JVM-side
   (``levenshtein`` is a Catalyst expression; DuckDB's ``levenshtein`` is
   the same unit-cost edit distance, so the oracle reproduces it
   bit-for-bit).

The blocking is recall-lossy by construction (a typo in the NOUN moves
the name to another block) — standard ER practice is a second pass with a
different key; the multi-key union is the same plan shape and is pinned
in tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

FUZZY_MAX_DIST = 4


def fuzzy_name_pairs(df: DataFrame, name_col: str, id_col: str,
                     max_dist: int = FUZZY_MAX_DIST,
                     blocks: tuple[str, ...] = ("last",)) -> DataFrame:
    """Distinct-name fuzzy match pairs. Output: name_a, name_b (a < b),
    lev_dist, rows_a, rows_b (how many source rows carry each name).

    ``blocks`` selects one or more blocking keys ("last" / "first" token);
    multi-key runs are unioned then de-duplicated on the pair — the
    standard recall-recovery second pass (a typo in one key's token still
    collides under the other key)."""
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count("*").alias("n_rows"))
    key = {
        "last": F.element_at(F.split(F.col("name"), " "), -1),
        "first": F.element_at(F.split(F.col("name"), " "), 1),
    }
    out = None
    for blk in blocks:
        keyed = names.withColumn("blk", key[blk])
        a = keyed.select(F.col("name").alias("name_a"),
                         F.col("n_rows").alias("rows_a"),
                         F.col("blk").alias("blk_a"))
        b = keyed.select(F.col("name").alias("name_b"),
                         F.col("n_rows").alias("rows_b"),
                         F.col("blk").alias("blk_b"))
        pass_pairs = (
            a.join(b, (F.col("blk_a") == F.col("blk_b"))
                   & (F.col("name_a") < F.col("name_b")))
            .select(
                "name_a", "name_b",
                F.levenshtein("name_a", "name_b").alias("lev_dist"),
                "rows_a", "rows_b",
            )
            .where(F.col("lev_dist") <= max_dist)
        )
        out = pass_pairs if out is None else out.unionAll(pass_pairs)
    # a pair can collide under several keys — keep it once
    return out.dropDuplicates(["name_a", "name_b"]) if len(blocks) > 1 else out


@register(
    "fuzzy_part_name_matches",
    oracle=f"""
    WITH names AS (
      SELECT p_name AS name, COUNT(*) AS n_rows,
             string_split(p_name, ' ')[-1] AS blk
      FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS lev_dist,
           a.n_rows AS rows_a, b.n_rows AS rows_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    ORDER BY name_a, name_b
    """,
    doc=f"Entity-resolution fuzzy join: distinct part names blocked on the "
    f"trailing noun, exact Levenshtein <= {FUZZY_MAX_DIST} re-rank. "
    "Collapse-to-names + equi-keyed blocking keeps the candidate space "
    "O(names-per-block^2), never all-pairs over rows.",
)
def fuzzy_part_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return fuzzy_name_pairs(part, "p_name", "p_partkey").orderBy("name_a", "name_b")
