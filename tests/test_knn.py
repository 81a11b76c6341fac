from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from vector_database_product_recommendation_spark.operators.centroids import group_centroids, group_centroids_long
from vector_database_product_recommendation_spark.operators.knn import (
    exact_knn,
    exact_knn_expr,
    item_to_item,
    pairwise_similarity,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    return df


def _queries(emb, n=5):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_exact_knn_matches_numpy(spark, emb):
    k = 5
    out = exact_knn(emb, _queries(emb), k).collect()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["score"]))
    for qid in range(5):
        qv = mat[ids == qid][0]
        s = np.round(mat @ qv, 6)
        order = np.lexsort((ids, -s))[:k]
        expected = [(int(ids[i]), float(s[i])) for i in order]
        assert got[qid] == expected


def test_exact_knn_expr_agrees_with_kernel(spark, emb):
    k = 4
    a = exact_knn(emb, _queries(emb, 3), k).collect()
    b = exact_knn_expr(emb, _queries(emb, 3), k).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_item_to_item_excludes_self(spark, emb):
    out = item_to_item(emb, 7, 10).collect()
    assert len(out) == 10
    assert all(r["neighbor_id"] != 7 for r in out)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_pairwise_similarity_diagonal_is_one(spark, emb):
    sel = emb.filter(F.col("vec_id") < 4)
    out = pairwise_similarity(sel).collect()
    assert len(out) == 16
    m = {(r["id_a"], r["id_b"]): r["score"] for r in out}
    for i in range(4):
        assert abs(m[(i, i)] - 1.0) < 1e-5  # unit vectors
    for i in range(4):
        for j in range(4):
            assert m[(i, j)] == m[(j, i)]


def test_group_centroids_unit_norm_and_mean(spark, emb):
    out = group_centroids(emb, "label").collect()
    assert len(out) == emb.select("label").distinct().count()
    rows = emb.select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(np.asarray(r["embedding"], dtype=np.float64))
    for r in out:
        v = np.asarray(r["vector"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        m = np.mean(np.stack(by_label[r["label"]]), axis=0)
        m = m / (np.linalg.norm(m) + 1e-12)
        assert np.allclose(v, m, atol=1e-9)


def test_group_centroids_long_shape(spark, emb):
    dim = len(emb.select("embedding").first()[0])
    out = group_centroids_long(emb, "label")
    n_labels = emb.select("label").distinct().count()
    assert out.count() == n_labels * dim


def test_exact_scores_full_matrix_no_selection(spark, emb):
    """exact_scores = the exact_knn kernel minus top-k: every corpus row
    scored per query, values identical to the numpy product."""
    from vector_database_product_recommendation_spark.operators.knn import exact_scores

    out = exact_scores(emb, _queries(emb, 3)).collect()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    n = len(ids)
    assert len(out) == 3 * n
    got = {(r["query_id"], r["neighbor_id"]): r["score"] for r in out}
    for qid in range(3):
        s = np.round(mat @ mat[ids == qid][0], 6)
        for i, nid in enumerate(ids):
            assert got[(qid, int(nid))] == float(s[i])


def test_exact_scores_exclude_self(spark, emb):
    from vector_database_product_recommendation_spark.operators.knn import exact_scores

    out = exact_scores(emb, _queries(emb, 2), exclude_self=True).collect()
    n = emb.count()
    assert len(out) == 2 * (n - 1)
    assert all(r["neighbor_id"] != r["query_id"] for r in out)
