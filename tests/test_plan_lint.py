"""Registry-wide physical-plan lint.

Builds the plan of EVERY registered query at sf0.001 (no execution) and
asserts the scale invariants the oracle can't see: no unbounded cartesian
products, and core fact-table queries keep their filters pushed into the
parquet scans. Also a free analysis-error smoke test for all queries.
"""

from __future__ import annotations

import pytest

from vector_database_product_recommendation_spark.plans import audit
from vector_database_product_recommendation_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"

# Queries whose plan legitimately materializes work at build time or runs
# driver-side loops (timed sweeps); they're exercised by their own tests.
_SKIP = {"ann_tradeoff"}


@pytest.fixture(scope="module")
def built_plans(spark):
    plans = {}
    for name, fn in queries().items():
        if name in _SKIP:
            continue
        plans[name] = fn(spark, SF_DIR)
    return plans


def test_every_query_analyzes(built_plans):
    # fn(spark, sf) + plan build == analysis passed for every query
    assert len(built_plans) >= 80


def test_no_cartesian_products_anywhere(built_plans):
    offenders = [n for n, df in built_plans.items() if audit.has_cartesian(df)]
    assert offenders == [], f"non-broadcast cartesian in: {offenders}"


def test_fact_filters_reach_the_scan(built_plans):
    # canary set: scan-heavy queries whose predicate MUST prune the scan
    for name in ["q1_pricing_summary", "q6_forecast_revenue", "q14_promo_revenue"]:
        pushed = audit.pushed_filters(built_plans[name])
        assert any("l_shipdate" in p for p in pushed), (name, pushed)


def test_star_joins_broadcast_dims(built_plans):
    for name in ["q5_regional_revenue", "q7_volume_shipping", "q9_profit_by_nation_year"]:
        assert audit.count_broadcast_joins(built_plans[name]) >= 1, name
