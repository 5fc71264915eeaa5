"""User-defined function surface: scalar Pandas UDF, grouped-agg Pandas UDF
(UDAF), and a Spark-SQL-registered function.

The engine's stance (README, SURVEY §2 negative inventory): built-in JVM
expressions everywhere a built-in exists; the UDF surface exists for the
cases that genuinely need Python — and when it's used, it's Arrow-batched
(pandas_udf), never row-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from covid_19_data_engineering_spark.plans.registry import register
from covid_19_data_engineering_spark.sources.tables import load_table


# pandas_udf decoration parses the DDL return type against the ACTIVE session,
# so the udfs are built lazily — module import must not require Spark.


def vector_l2_norm():
    """Scalar Pandas UDF: L2 norm of an array<float> column. Arrow delivers
    each batch as a Series of numpy arrays; one vectorized reduction per
    batch, no per-row Python calls."""

    @pandas_udf("double")
    def _norm(emb: pd.Series) -> pd.Series:
        return emb.map(lambda v: float(np.sqrt(np.dot(v, v))))

    return _norm


def geometric_mean():
    """Grouped-agg Pandas UDF (UDAF): geometric mean of a positive measure.
    Spark has no built-in; log-space mean is the numerically stable form."""

    @pandas_udf("double")
    def _geo(v: pd.Series) -> float:
        return float(np.exp(np.log(v[v > 0]).mean()))

    return _geo


@register(
    "udaf_geometric_mean_price",
    oracle="""
    SELECT o_orderpriority,
           ROUND(EXP(AVG(LN(o_totalprice))), 2) AS geo_mean_price,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice > 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Grouped-agg Pandas UDAF: per-priority geometric mean of order price "
    "(log-space, Arrow-batched).",
)
def udaf_geometric_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") > 0)
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count comes from a second agg
    # joined on the (5-row) group key
    geo = o.groupBy("o_orderpriority").agg(
        F.round(geometric_mean()("o_totalprice"), 2).alias("geo_mean_price")
    )
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    return geo.join(counts, "o_orderpriority").orderBy("o_orderpriority")


@register(
    "udf_embedding_norms",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                    x -> x * x), 'sum')), 4) AS l2_norm
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
    doc="Scalar Pandas UDF over array<float>: per-vector L2 norm "
    "(Arrow-batched; the JVM zip_with twin lives in operators/similarity.py).",
)
def udf_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < 50)
    return (
        em.select("vec_id", F.round(vector_l2_norm()("embedding"), 4).alias("l2_norm"))
        .orderBy("vec_id")
    )


@register(
    "sql_entry_orders_by_year",
    oracle="""
    SELECT year(o_orderdate) AS order_year,
           o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_year, o_orderstatus
    """,
    doc="Spark SQL entry point: identical text runs via spark.sql over temp "
    "views (the engine's SQL surface, same Catalyst plan as the DataFrame twin).",
)
def sql_entry_orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS order_year,
               o_orderstatus,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1, 2
        ORDER BY order_year, o_orderstatus
        """
    )


def sentence_split_udtf():
    """Python UDTF (table function): one input row -> one row per sentence.
    The lateral-join surface for generative row expansion; Arrow-batched by
    the engine. Built lazily like the pandas UDFs above."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_no int, sentence string, sent_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s, len(s)

    return SentenceSplit


@register(
    "udtf_sentence_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, '. ')) AS n_sentences,
           list_max(list_transform(string_split(text, '. '), s -> length(s)))
             AS max_sent_chars
    FROM documents
    ORDER BY doc_id
    """,
    doc="Python UDTF row expansion (sentence split) aggregated back to "
    "per-document stats; registered + driven through a SQL LATERAL join.",
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("split_sentences", sentence_split_udtf())
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT doc_id,
               COUNT(*) AS n_sentences,
               MAX(sent_chars) AS max_sent_chars
        FROM documents_v, LATERAL split_sentences(text)
        GROUP BY doc_id
        ORDER BY doc_id
        """
    )


def grouped_zscore_fn():
    """Grouped-map kernel for ``applyInPandas``: the whole group arrives as
    one pandas frame, so cross-row statistics (here: per-source z-scores of
    n_chars) are plain columnar math.

    Determinism contract with the DuckDB oracle: mean and variance derive
    from EXACT integer sums (sum, sum-of-squares over int64), so both
    engines execute the identical correctly-rounded double ops
    (div/sub/sqrt) — no float-accumulation order to disagree on.
    """

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        x = pdf["n_chars"].astype("int64")
        s = int(x.sum())
        ss = int((x * x).sum())
        mean = s / float(n)
        if n > 1:
            var = (ss - s * s / float(n)) / float(n - 1)
        else:
            var = 0.0
        std = float(np.sqrt(var))
        z = (x - mean) / std if std > 0 else x * 0.0
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_chars": x,
                "z": z.round(4),
            }
        )

    return _z


@register(
    "grouped_map_source_zscore",
    oracle="""
    WITH stats AS (
      SELECT source, COUNT(*) AS n,
             SUM(n_chars) AS s, SUM(n_chars * n_chars) AS ss
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           -- degenerate-group guard mirrors the kernel exactly: z = 0.0 when
           -- the group is a singleton (n=1) or the sample variance is not
           -- strictly positive (constant n_chars); the kernel's std>0 check
           -- is var>0 on the identical double expression, so both engines
           -- branch on the same bit pattern
           CASE WHEN n > 1
                 AND (ss - s * s / CAST(n AS DOUBLE)) / (n - 1) > 0
                THEN ROUND((d.n_chars - s / CAST(n AS DOUBLE))
                           / sqrt((ss - s * s / CAST(n AS DOUBLE)) / (n - 1)), 4)
                ELSE 0.0 END AS z
    FROM documents d JOIN stats USING (source)
    ORDER BY d.doc_id
    """,
    doc="Grouped-map applyInPandas seam: per-source z-score of document "
    "length, each group processed as one Arrow-delivered pandas frame. "
    "NOTE the JVM-native twin is a Window (avg/stddev over partition) — "
    "this query exists to pin the grouped-map path the engine offers for "
    "logic SQL can't express; groups must fit an executor (per-source "
    "groups do; salt or fall back to the window form when one doesn't).",
)
def grouped_map_source_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    out = docs.groupBy("source").applyInPandas(
        grouped_zscore_fn(), "doc_id bigint, source string, n_chars bigint, z double"
    )
    return out.orderBy("doc_id")
