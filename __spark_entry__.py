"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship two-stage retrieval query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md section 2 with its DuckDB oracle. Implementation lives in the
``vector_database_product_recommendation_spark`` package; this file is only the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_database_product_recommendation_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from vector_database_product_recommendation_spark.operators.relational import two_stage_retrieval

    return two_stage_retrieval(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (where
    SQL-expressible; non-SQL ops are omitted -> rows-only check)."""
    return registry.oracle_sql()
