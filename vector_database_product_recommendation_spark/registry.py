"""Query registry: every implemented operator exposed as (spark, sf_dir) ->
DataFrame, plus its DuckDB oracle SQL for the driver's correctness gate.

Column names are aliased identically on both sides (driver hash compares
sorted-by-name columns). Scores are computed in float64 and rounded to 6
decimals on BOTH engines before ranking, with (score DESC, id ASC) tie
breaks, per FIXTURES.md oracle notes.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from vector_database_product_recommendation_spark.operators import relational as R
from vector_database_product_recommendation_spark.operators.centroids import group_centroids_long
from vector_database_product_recommendation_spark.operators.knn import (
    exact_knn,
    item_to_item,
    pairwise_similarity,
)
from vector_database_product_recommendation_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Relational shapes (SURVEY.md section 2.2/2.4/2.5)
# ---------------------------------------------------------------------------

register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)(R.q1_pricing_summary)

register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)(R.q3_shipping_priority)

register(
    "two_stage_retrieval",
    """
    WITH stats AS (
      SELECT l_partkey,
             count(*) AS n_lines,
             avg(l_quantity) AS avg_qty,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, p_brand, p_size, n_lines, avg_qty, revenue
    FROM part LEFT JOIN stats ON p_partkey = l_partkey
    WHERE lower(p_brand) = lower('Brand#3')
      AND coalesce(avg_qty, -1.0) >= 10.0
      AND coalesce(n_lines, 0) >= 5
    ORDER BY revenue DESC, p_partkey
    LIMIT 20
    """,
)(R.two_stage_retrieval)

register(
    "brand_domain",
    """
    SELECT DISTINCT lower(coalesce(p_brand, 'unknown')) AS brand
    FROM part ORDER BY brand
    """,
)(R.brand_domain)

register(
    "minmax_rescale",
    """
    WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
    SELECT o_orderkey,
           round((o_totalprice - mn) / (mx - mn + 1e-12), 6) AS price_scaled
    FROM orders, b
    ORDER BY o_orderkey
    """,
)(R.minmax_rescale)


# ---------------------------------------------------------------------------
# Vector kernels (SURVEY.md sections 2.3 J4/J5, 2.5 K1-K3, 2.4 A-g4)
# ---------------------------------------------------------------------------

_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 8
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
pairs AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_inner_product(q.qv, c.cv), 6) AS score
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, score, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@register("knn_exact_batch", _KNN_ORACLE)
def _knn_exact_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return exact_knn(emb, q, 5)


_ITEM_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id = 7
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
pairs AS (
  SELECT q.query_id, c.neighbor_id,
         round(list_inner_product(q.qv, c.cv), 6) AS score
  FROM q CROSS JOIN c
  WHERE c.neighbor_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, score, rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


@register("knn_item_to_item", _ITEM_ORACLE)
def _knn_item_to_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return item_to_item(emb, 7, 10)


_PAIRWISE_ORACLE = """
WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 4)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_inner_product(a.v, b.v), 6) AS score
FROM s a CROSS JOIN s b
ORDER BY id_a, id_b
"""


@register("pairwise_similarity", _PAIRWISE_ORACLE)
def _pairwise_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pairwise_similarity(emb.filter(F.col("vec_id") < 4))


_CENTROID_ORACLE = """
WITH ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings
),
m AS (
  SELECT label, pos, avg(val) AS m FROM ex GROUP BY label, pos
),
n AS (
  SELECT label, pos,
         m / (sqrt(sum(m * m) OVER (PARTITION BY label)) + 1e-12) AS val
  FROM m
)
SELECT label, pos, round(val, 6) AS val
FROM n ORDER BY label, pos
"""


@register("centroid_by_label", _CENTROID_ORACLE)
def _centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return group_centroids_long(emb, "label")
