from __future__ import annotations

import pyspark.sql.functions as F

from vector_database_product_recommendation_spark.operators import relational as R


def test_q1_pricing_summary(spark, sf_dir):
    out = R.q1_pricing_summary(spark, sf_dir).collect()
    assert len(out) >= 4  # returnflag x linestatus combos
    for r in out:
        assert r["count_order"] > 0
        assert r["sum_disc_price"] <= r["sum_base_price"]


def test_q3_top10(spark, sf_dir):
    out = R.q3_shipping_priority(spark, sf_dir).collect()
    assert 0 < len(out) <= 10
    revs = [r["revenue"] for r in out]
    assert revs == sorted(revs, reverse=True)


def test_two_stage_retrieval(spark, sf_dir):
    df = R.two_stage_retrieval(spark, sf_dir)
    out = df.collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert r["p_brand"].lower() == "brand#3"
        assert r["avg_qty"] >= 10.0
        assert r["n_lines"] >= 5


def test_brand_domain_sorted_distinct(spark, sf_dir):
    out = [r["brand"] for r in R.brand_domain(spark, sf_dir).collect()]
    assert out == sorted(set(out))
    assert all(b == b.lower() for b in out)


def test_minmax_rescale_bounds(spark, sf_dir):
    out = R.minmax_rescale(spark, sf_dir)
    row = out.agg(
        F.min("price_scaled").alias("mn"), F.max("price_scaled").alias("mx")
    ).collect()[0]
    assert 0.0 <= row["mn"] <= row["mx"] <= 1.0
    assert row["mx"] > 0.99  # max maps to ~1
