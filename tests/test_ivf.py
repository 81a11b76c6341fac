"""IVF / free-text metamorphic tests (SURVEY.md section 5.2-5.3).

The exactness anchor: IVF with nprobe == nlist scans every inverted list,
so it must return EXACTLY the exact-KNN result (same ids, same scores,
same ranks) — the reference's own ground-truth construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_database_product_recommendation_spark.functions.embed import free_text_search
from vector_database_product_recommendation_spark.operators.eval import ann_tradeoff
from vector_database_product_recommendation_spark.operators.ivf import (
    assign_clusters,
    ivf_knn,
    knn,
    train_kmeans_centroids,
)
from vector_database_product_recommendation_spark.operators.knn import exact_knn
from vector_database_product_recommendation_spark.sources.tables import load_table

NLIST = 7


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def ivf_parts(emb):
    cents = train_kmeans_centroids(emb, NLIST, seed=42)
    assigned = assign_clusters(emb, cents).cache()
    return cents, assigned


def _queries(emb, n=6):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_full_probe_equals_exact(emb, ivf_parts):
    cents, assigned = ivf_parts
    q = _queries(emb)
    exact = exact_knn(emb, q, 5).collect()
    full = ivf_knn(assigned, cents, q, 5, nprobe=NLIST).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in exact]


def test_ivf_partial_probe_subset_of_corpus_and_sane(emb, ivf_parts):
    cents, assigned = ivf_parts
    q = _queries(emb)
    part = ivf_knn(assigned, cents, q, 5, nprobe=2)
    rows = part.collect()
    assert len(rows) == 6 * 5
    assert all(-1.0001 <= r["score"] <= 1.0001 for r in rows)
    # recall vs exact should be decent even at nprobe=2
    exact = exact_knn(emb, q, 5)
    hit = part.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    assert hit / (6 * 5) >= 0.3


def test_assign_clusters_covers_corpus(emb, ivf_parts):
    _, assigned = ivf_parts
    assert assigned.count() == emb.count()
    n_clusters = assigned.select("cluster_id").distinct().count()
    assert 1 < n_clusters <= NLIST


def test_knn_auto_picks_exact_for_small_corpus(emb):
    q = _queries(emb)
    auto = knn(emb, q, 5, method="auto")
    exact = exact_knn(emb, q, 5)
    assert [tuple(r) for r in auto.collect()] == [tuple(r) for r in exact.collect()]


def test_ann_tradeoff_shape_and_monotonicity(emb):
    rows = ann_tradeoff(emb, n_queries=8, k=5, nprobes=(1, NLIST), nlist=NLIST).collect()
    assert [r["nprobe"] for r in rows] == [1, NLIST]
    for r in rows:
        assert 0.0 <= r["precision_at_k"] <= 1.0
        assert 0.0 <= r["mrr"] <= 1.0
    # full probe == exact -> perfect precision and MRR
    assert rows[-1]["precision_at_k"] == 1.0
    assert rows[-1]["mrr"] == 1.0
    assert rows[0]["precision_at_k"] <= rows[-1]["precision_at_k"]


def test_free_text_self_retrieval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    qtext = docs.filter(F.col("doc_id") == 5).select("text").first()[0]
    top = free_text_search(qtext, docs, k=3).collect()
    assert top[0]["neighbor_id"] == 5
    assert abs(top[0]["score"] - 1.0) < 1e-4


def test_ann_tradeoff_exact_at_full_probe(spark, sf_dir):
    """nprobe == nlist scans every inverted list, so the harness must
    report precision == MRR == 1.0 — the eval-harness self-consistency
    pin (the reference's own ground-truth discipline, SURVEY.md §5)."""
    from vector_database_product_recommendation_spark.operators.eval import ann_tradeoff
    from vector_database_product_recommendation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    nlist = 8
    out = {
        r["nprobe"]: r
        for r in ann_tradeoff(
            emb, n_queries=16, k=5, nprobes=(1, nlist), nlist=nlist
        ).collect()
    }
    assert out[nlist]["precision_at_k"] == 1.0
    assert out[nlist]["mrr"] == 1.0
    assert out[1]["precision_at_k"] <= 1.0
