"""Round-2 relational breadth: multi-way star join, grouped top-k, CUBE,
running totals, approximate distinct.

Correctness of values is driver-checked against DuckDB (registry oracles);
these tests pin the physical-plan and sketch-accuracy properties the
oracle can't see.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_database_product_recommendation_spark.operators import relational as R
from vector_database_product_recommendation_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


def test_q5_broadcasts_dims(spark):
    plan = R.q5_regional_revenue(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # region/nation never shuffle the facts


def test_top_parts_per_brand_bounded_per_group(spark):
    rows = R.top_parts_per_brand(spark, SF_DIR).collect()
    assert rows
    per_brand: dict[str, list] = {}
    for r in rows:
        per_brand.setdefault(r["p_brand"], []).append(r)
    for brand, rs in per_brand.items():
        assert all(r["rk"] <= 3 for r in rs)
        revs = [r["revenue"] for r in rs]
        assert revs == sorted(revs, reverse=True)


def test_cube_total_row_is_global_sum(spark):
    out = {(r["nation"], r["priority"]): r for r in R.nation_revenue_cube(spark, SF_DIR).collect()}
    total = out[("ALL", "ALL")]
    # grand total == sum of the per-nation subtotals
    per_nation = [v for (n, p), v in out.items() if p == "ALL" and n != "ALL"]
    assert total["n_orders"] == sum(v["n_orders"] for v in per_nation)
    assert abs(total["total_price"] - sum(v["total_price"] for v in per_nation)) < 1e-4


def test_approx_uniques_error_bound(spark):
    rows = queries()["events_approx_uniques"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        exact = r["exact_users"]
        assert exact > 0
        rel_err = abs(r["approx_users"] - exact) / exact
        assert rel_err < 0.15, (r["event_type"], r["approx_users"], exact)


def test_running_total_matches_driver_side_accumulation(spark):
    out = queries()["events_user_running_total"](spark, SF_DIR)
    rows = out.filter(F.col("user_id") == 3).collect()
    if not rows:  # tiny SF may not have user 3
        return
    # delta_1 = v_1 (lag coalesced to 0), delta_i = v_i - v_{i-1}:
    # values are recoverable from the deltas, and cumsum(values) must
    # reproduce running_value row by row.
    v_prev, acc = 0.0, 0.0
    for r in rows:
        v = r["delta_value"] + v_prev
        acc += v
        assert abs(acc - r["running_value"]) < 1e-4
        v_prev = v
