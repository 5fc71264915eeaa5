"""Probabilistic record linkage (Fellegi-Sunter) over the part catalog.

The classic data-engineering operator the dedup family doesn't cover:
instead of asking "are these two records byte-identical / near-identical
text", FS scores candidate pairs by a log-likelihood-ratio weight built
from per-field agreement probabilities — m_k = P(field k agrees | pair is
a true match) and u_k = P(field k agrees | pair is random). Pairs whose
summed weight clears a threshold are links (Fellegi & Sunter 1969; the
Splink/RecordLinkage toolkits industrialize exactly this shape).

Spark-first plan, 100 TB posture:
- **Blocking bounds the pair space — with an honest caveat.** Candidate
  pairs come only from equal (name noun, brand) blocks. The KEY's domain
  is fixed (vocabulary x brand catalog), which means block sizes grow
  LINEARLY with the catalog and per-block C(n,2) grows QUADRATICALLY —
  fine at gate scale (max block 123 rows at sf0.1, ~1M pairs), but at a
  100 TB catalog the key must gain a third component (the size band, a
  sorted-neighborhood window, or an LSH bucket) to re-bound the blocks;
  blocking-key refinement, not algorithm change, is the standard
  production dial. The pytest gate pins the measured candidate volume to
  the exact per-block formula so any key change re-opening a blowup
  fails loudly.
- **u-probabilities are exact one-pass aggregates**, not samples: the
  chance two RANDOM records agree on field k is sum_v (n_v/N)^2, computed
  from the field histogram (map-side combined, tiny domains). The
  size-band u self-joins the 50-row size histogram under a broadcast.
- **m-priors are fixed literature constants** (no labeled pairs exist in
  the catalog); they are declared once in the one-row weights frame that
  broadcasts into the pair join, so swapping in EM-estimated m's later
  touches one select.
- The pair scorer is a single equi-keyed self-join on the block key plus
  a broadcast of the one-row weight table — no cartesian, no UDF, and
  per-field agreement weights are ROUND()ed to 6 decimals before the sum
  (cross-engine libm doctrine, see lm_bigram_perplexity).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table

# m-priors: P(field agrees | true match). Fixed documented constants —
# the no-labeled-data posture; see module docstring.
M_NAME = 0.9   # adjective token survives a true re-listing
M_TYPE = 0.85  # type string survives
M_SIZE = 0.95  # size stays within +/-2 units
SIZE_BAND = 2


def _compare_frame(parts: DataFrame) -> DataFrame:
    tok = F.split(F.col("p_name"), " ")
    return parts.select(
        F.col("p_partkey").alias("pk"),
        tok.getItem(0).alias("tok0"),
        tok.getItem(1).alias("tok1"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("size"),
    )


def fs_weight_table(parts: DataFrame) -> DataFrame:
    """One-row frame of per-field agreement/disagreement weights.

    u_k from exact field histograms; w_agree = log2(m/u),
    w_disagree = log2((1-m)/(1-u)), each rounded to 6 decimals so the
    downstream sum is a sum of identical doubles on any engine.
    """
    f = _compare_frame(parts)
    n = f.agg(F.count(F.lit(1)).alias("n"))
    u_tok0 = (
        f.groupBy("tok0").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("ss_tok0"))
    )
    u_type = (
        f.groupBy("ptype").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("ss_type"))
    )
    hist = f.groupBy("size").agg(F.count(F.lit(1)).alias("c"))
    u_size = (
        hist.alias("a")
        .join(
            F.broadcast(hist.alias("b")),
            F.abs(F.col("a.size") - F.col("b.size")) <= SIZE_BAND,
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("ss_size"))
    )
    nn = F.col("n").cast("double") * F.col("n")

    def w(m: float, ss: str):
        u = F.col(ss).cast("double") / nn
        return (
            F.round(F.log2(F.lit(m) / u), 6),
            F.round(F.log2(F.lit(1.0 - m) / (1.0 - u)), 6),
        )

    out = (
        n.crossJoin(F.broadcast(u_tok0))
        .crossJoin(F.broadcast(u_type))
        .crossJoin(F.broadcast(u_size))
    )
    wa0, wd0 = w(M_NAME, "ss_tok0")
    wa1, wd1 = w(M_TYPE, "ss_type")
    wa2, wd2 = w(M_SIZE, "ss_size")
    return out.select(
        wa0.alias("wa_name"), wd0.alias("wd_name"),
        wa1.alias("wa_type"), wd1.alias("wd_type"),
        wa2.alias("wa_size"), wd2.alias("wd_size"),
    )


def fs_candidate_pairs(parts: DataFrame) -> DataFrame:
    """Blocked candidate pairs with agreement flags and the FS weight.

    Block key = (name noun, brand); pair order pinned a.pk < b.pk. One
    shuffle on the block key; weights arrive as a one-row broadcast.
    """
    f = _compare_frame(parts)
    a, b = f.alias("a"), f.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tok1") == F.col("b.tok1"))
        & (F.col("a.brand") == F.col("b.brand"))
        & (F.col("a.pk") < F.col("b.pk")),
    ).select(
        F.col("a.pk").alias("a_key"),
        F.col("b.pk").alias("b_key"),
        (F.col("a.tok0") == F.col("b.tok0")).cast("int").alias("agree_name"),
        (F.col("a.ptype") == F.col("b.ptype")).cast("int").alias("agree_type"),
        (F.abs(F.col("a.size") - F.col("b.size")) <= SIZE_BAND)
        .cast("int").alias("agree_size"),
    )
    weights = fs_weight_table(parts)
    term = lambda flag, wa, wd: F.when(F.col(flag) == 1, F.col(wa)).otherwise(F.col(wd))  # noqa: E731
    return pairs.crossJoin(F.broadcast(weights)).select(
        "a_key", "b_key", "agree_name", "agree_type", "agree_size",
        F.round(
            term("agree_name", "wa_name", "wd_name")
            + term("agree_type", "wa_type", "wd_type")
            + term("agree_size", "wa_size", "wd_size"),
            4,
        ).alias("fs_weight"),
    )


_FS_ORACLE_CORE = f"""
    WITH f AS (
      SELECT p_partkey AS pk,
             split_part(p_name, ' ', 1) AS tok0,
             split_part(p_name, ' ', 2) AS tok1,
             p_brand AS brand, p_type AS ptype, p_size AS size
      FROM part
    ),
    n AS (SELECT COUNT(*) AS n FROM f),
    u0 AS (SELECT SUM(c * c) AS ss_tok0
           FROM (SELECT COUNT(*) AS c FROM f GROUP BY tok0)),
    u1 AS (SELECT SUM(c * c) AS ss_type
           FROM (SELECT COUNT(*) AS c FROM f GROUP BY ptype)),
    hist AS (SELECT size, COUNT(*) AS c FROM f GROUP BY size),
    u2 AS (SELECT SUM(a.c * b.c) AS ss_size
           FROM hist a JOIN hist b ON abs(a.size - b.size) <= {SIZE_BAND}),
    weights AS (
      SELECT
        ROUND(log2({M_NAME}e0 / (CAST(ss_tok0 AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS wa_name,
        ROUND(log2({1.0 - M_NAME}e0 / (1.0e0 - CAST(ss_tok0 AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS wd_name,
        ROUND(log2({M_TYPE}e0 / (CAST(ss_type AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS wa_type,
        ROUND(log2({round(1.0 - M_TYPE, 10)}e0 / (1.0e0 - CAST(ss_type AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS wd_type,
        ROUND(log2({M_SIZE}e0 / (CAST(ss_size AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS wa_size,
        ROUND(log2({round(1.0 - M_SIZE, 10)}e0 / (1.0e0 - CAST(ss_size AS DOUBLE) / (CAST(n AS DOUBLE) * n))), 6) AS wd_size
      FROM n CROSS JOIN u0 CROSS JOIN u1 CROSS JOIN u2
    ),
    pairs AS (
      SELECT a.pk AS a_key, b.pk AS b_key,
             CAST(a.tok0 = b.tok0 AS INT) AS agree_name,
             CAST(a.ptype = b.ptype AS INT) AS agree_type,
             CAST(abs(a.size - b.size) <= {SIZE_BAND} AS INT) AS agree_size
      FROM f a JOIN f b
        ON a.tok1 = b.tok1 AND a.brand = b.brand AND a.pk < b.pk
    ),
    scored AS (
      SELECT a_key, b_key, agree_name, agree_type, agree_size,
             ROUND(
               (CASE WHEN agree_name = 1 THEN wa_name ELSE wd_name END)
               + (CASE WHEN agree_type = 1 THEN wa_type ELSE wd_type END)
               + (CASE WHEN agree_size = 1 THEN wa_size ELSE wd_size END),
               4) AS fs_weight
      FROM pairs CROSS JOIN weights
    )
"""


@register(
    "record_linkage_fs_topk",
    oracle=_FS_ORACLE_CORE + """
    SELECT a_key, b_key, agree_name, agree_type, agree_size, fs_weight
    FROM scored
    ORDER BY fs_weight DESC, a_key, b_key
    LIMIT 100
    """,
    doc="Fellegi-Sunter probabilistic record linkage: (noun, brand)-blocked "
    "candidate pairs scored by summed log2(m/u) agreement weights with "
    "exact histogram-derived u-probabilities; top-100 link candidates. "
    "One block-key shuffle + a one-row weight broadcast; pair volume "
    "bounded by the blocking domain, pytest-gated.",
)
def record_linkage_fs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, "part", sf_dir)
    return (
        fs_candidate_pairs(parts)
        .orderBy(F.desc("fs_weight"), "a_key", "b_key")
        .limit(100)
    )


@register(
    "record_linkage_pattern_profile",
    oracle=_FS_ORACLE_CORE + """
    SELECT agree_name, agree_type, agree_size,
           COUNT(*) AS n_pairs, fs_weight
    FROM scored
    GROUP BY agree_name, agree_type, agree_size, fs_weight
    ORDER BY agree_name, agree_type, agree_size
    """,
    doc="The FS agreement-pattern histogram: pair counts per 3-bit "
    "agreement vector with the pattern's weight — the table a linkage "
    "analyst reads to place the match/non-match thresholds (at 100 TB "
    "this aggregate is what you look at, not the pair list).",
)
def record_linkage_pattern_profile(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    parts = load_table(spark, "part", sf_dir)
    return (
        fs_candidate_pairs(parts)
        .groupBy("agree_name", "agree_type", "agree_size", "fs_weight")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("agree_name", "agree_type", "agree_size",
                "n_pairs", "fs_weight")
        .orderBy("agree_name", "agree_type", "agree_size")
    )


# --- golden records: the survivorship stage of entity resolution ------------
# block -> score -> threshold -> cluster -> SURVIVE: FS pairs above the
# match threshold close transitively into entities (the same distributed
# CC machinery the dedup family runs), then one canonical "golden" record
# per entity is assembled by per-attribute survivorship rules — the last
# mile every MDM / entity-resolution pipeline ships. Because candidate
# edges exist only within a block, every cluster inherits the block's
# (noun, brand) constants; the free attributes survive by rule: type =
# mode (lexicographic min on ties), size = min, price = max.

FS_MATCH_THRESHOLD = 3.0  # accepts the (name+size) and full-agreement
                          # patterns; disagreeing-name patterns score < 2.6


def golden_records(parts: DataFrame) -> DataFrame:
    """One survived record per linked entity (clusters of size >= 2).

    Scale shape: edges are the already-blocked FS pairs (volume gated in
    tests); clustering is the O(log^2 n)-round distributed CC; the
    survivorship readout is two shuffles on the cluster key (attribute
    mode needs a (cluster, value) count then a window pick).
    """
    from pyspark.sql import Window

    from covid_19_data_engineering_spark.operators.clustering import (
        connected_components,
    )

    links = fs_candidate_pairs(parts).where(
        F.col("fs_weight") >= FS_MATCH_THRESHOLD)
    # algorithm="star" (round 14, guide §1.2): FS links chain through the
    # blocking key, so the graph does NOT converge inside auto's 6-round
    # min-label budget (measured: changed > 0 at every budget round) and
    # auto paid 6 wasted full-edge label rounds BEFORE running star
    # anyway. Straight star finishes in 4 rounds; labels are identical
    # by construction (both compute min-id components) and were verified
    # equal at sf0.1. 4.7 s -> 3.1 s here, and 6 fewer edge-table
    # shuffles at any scale.
    comps = connected_components(links, src="a_key", dst="b_key",
                                 algorithm="star")
    f = _compare_frame(parts)
    members = comps.join(f, comps.node == f.pk).select(
        "component", "pk", "tok0", "tok1", "brand", "ptype", "size")
    base = members.groupBy("component").agg(
        F.min("pk").alias("golden_id"),
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("tok1").alias("noun"),        # block constant
        F.min("brand").alias("brand"),      # block constant
        F.min("size").alias("min_size"),
    )
    type_counts = members.groupBy("component", "ptype").agg(
        F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("component").orderBy(F.desc("c"), "ptype")
    canon_type = (
        type_counts.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("component", F.col("ptype").alias("canonical_type"))
    )
    price = (
        parts.join(comps, parts.p_partkey == comps.node)
        .groupBy("component")
        .agg(F.round(F.max("p_retailprice"), 2).alias("max_price"))
    )
    return (
        base.join(canon_type, "component").join(price, "component")
        .where(F.col("cluster_size") >= 2)
        .select("golden_id", "cluster_size", "noun", "brand",
                "canonical_type", "min_size", "max_price")
        .orderBy("golden_id")
    )


@register(
    "record_linkage_golden",
    # the transitive closure is a recursive CTE: promote the shared WITH
    oracle=_FS_ORACLE_CORE.replace("WITH f AS", "WITH RECURSIVE f AS", 1)
    + f""",
    links AS (
      SELECT a_key, b_key FROM scored
      WHERE fs_weight >= {FS_MATCH_THRESHOLD}
    ),
    sym AS (
      SELECT a_key AS u, b_key AS v FROM links
      UNION SELECT b_key, a_key FROM links
    ),
    reach(node, comp) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.comp FROM sym s JOIN reach r ON s.v = r.node
    ),
    comps AS (
      SELECT node, MIN(comp) AS component FROM reach GROUP BY node
    ),
    members AS (
      SELECT c.component, f.pk, f.tok0, f.tok1, f.brand, f.ptype, f.size
      FROM comps c JOIN f ON f.pk = c.node
    ),
    base AS (
      SELECT component,
             MIN(pk) AS golden_id,
             COUNT(*) AS cluster_size,
             MIN(tok1) AS noun,
             MIN(brand) AS brand,
             MIN(size) AS min_size
      FROM members GROUP BY component
    ),
    tc AS (
      SELECT component, ptype, COUNT(*) AS c FROM members GROUP BY 1, 2
    ),
    canon AS (
      SELECT component, ptype AS canonical_type
      FROM (SELECT component, ptype,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY c DESC, ptype) AS r
            FROM tc)
      WHERE r = 1
    ),
    price AS (
      SELECT c.component, ROUND(MAX(p.p_retailprice), 2) AS max_price
      FROM comps c JOIN part p ON p.p_partkey = c.node
      GROUP BY c.component
    )
    SELECT b.golden_id, b.cluster_size, b.noun, b.brand,
           cn.canonical_type, b.min_size, pr.max_price
    FROM base b JOIN canon cn USING (component)
    JOIN price pr USING (component)
    WHERE b.cluster_size >= 2
    ORDER BY b.golden_id
    """,
    doc="Golden-record survivorship over FS match links: pairs above the "
    "match threshold close transitively (distributed CC; oracle replays "
    "with a recursive-CTE closure), then one canonical record per "
    "entity — type by mode (lexicographic tiebreak), size by min, price "
    "by max, block constants carried. The MDM last mile on top of "
    "record_linkage_fs_topk.",
)
def record_linkage_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, "part", sf_dir)
    return golden_records(parts)
