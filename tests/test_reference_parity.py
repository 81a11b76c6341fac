"""Parity against the reference's own artifacts: our operators applied to
reviews.csv must reproduce products.csv, combined_text, and
product_embeddings.npy — the four [verified] lineage facts of SURVEY.md
sections 1.1/1.2 replayed through this engine.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not present"
)


@pytest.fixture(scope="module")
def reviews(spark):
    from vector_database_product_recommendation_spark.sources.reference import load_reviews

    return load_reviews(spark, f"{REF}/reviews.csv").cache()


def test_combined_text_identity(reviews):
    from vector_database_product_recommendation_spark.sources.reference import with_combined_text

    df = with_combined_text(reviews)
    bad = df.filter(df.combined_text != df.combined_text_rebuilt).count()
    assert bad == 0


def test_rebuild_products_matches_reference(reviews):
    from vector_database_product_recommendation_spark.sources.reference import rebuild_products

    ours = rebuild_products(reviews).toPandas().set_index("id").sort_index()
    theirs = pd.read_csv(f"{REF}/products.csv").set_index("id").sort_index()
    assert len(ours) == len(theirs) == 66

    for col in ("brand", "categories", "asins", "example_text"):
        assert (ours[col] == theirs[col]).all(), col
    assert (ours["n_reviews"] == theirs["n_reviews"]).all()
    for a, b in zip(ours["avg_rating"], theirs["avg_rating"]):
        if math.isnan(b):
            assert a is None or math.isnan(a)
        else:
            assert abs(a - b) < 1e-9


def test_rebuild_product_embeddings_matches_reference(spark, reviews):
    from vector_database_product_recommendation_spark.sources.reference import (
        load_embeddings_npy,
        rebuild_product_embeddings,
    )

    emb = load_embeddings_npy(spark, f"{REF}/review_embeddings.npy")
    ours = {
        r["id"]: np.array(r["vector"])
        for r in rebuild_product_embeddings(reviews, emb).collect()
    }
    theirs = np.load(f"{REF}/product_embeddings.npy").astype(np.float64)
    prod_ids = pd.read_csv(f"{REF}/products.csv")["id"]
    assert len(ours) == 66
    for i, pid in enumerate(prod_ids):
        cos = float(np.dot(ours[pid], theirs[i]) / (np.linalg.norm(theirs[i]) + 1e-12))
        assert cos > 1.0 - 1e-9, (pid, cos)


def test_review_embeddings_unit_norm(spark):
    from vector_database_product_recommendation_spark.sources.reference import load_embeddings_npy

    emb = load_embeddings_npy(spark, f"{REF}/review_embeddings.npy")
    import pyspark.sql.functions as F

    from vector_database_product_recommendation_spark.functions.vectors import norm2

    rows = emb.select(norm2("embedding").alias("n")).agg(
        F.min("n"), F.max("n")
    ).first()
    assert abs(rows[0] - 1.0) < 1e-3 and abs(rows[1] - 1.0) < 1e-3


def test_category_multivalue_filter(reviews):
    from vector_database_product_recommendation_spark.sources.reference import (
        filter_by_category,
        rebuild_products,
    )

    products = rebuild_products(reviews).cache()
    got = {r["id"] for r in filter_by_category(products, "Kindle Store").select("id").collect()}
    # python-side oracle over the same rows
    expect = {
        r["id"]
        for r in products.select("id", "categories").collect()
        if "Kindle Store" in [c.strip() for c in (r["categories"] or "").split(",")]
    }
    assert got == expect and got  # non-empty: the category exists in the corpus
