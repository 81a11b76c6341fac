"""Product quantization: lossless-regime exactness, recall with refine,
compression plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_database_product_recommendation_spark.operators.knn import exact_knn
from vector_database_product_recommendation_spark.operators.pq import encode_pq, pq_knn, train_pq
from vector_database_product_recommendation_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _queries(emb, n=8):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_pq_lossless_regime_equals_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    books = train_pq(emb, m=8, ksub=n + 10)  # every subvector its own centroid
    codes = encode_pq(emb, books)
    got = pq_knn(codes, books, _queries(emb), 10)
    want = exact_knn(emb, _queries(emb), 10)
    g = {(r["query_id"], r["neighbor_id"], r["score"], r["rank"]) for r in got.collect()}
    w = {(r["query_id"], r["neighbor_id"], r["score"], r["rank"]) for r in want.collect()}
    assert g == w


def test_pq_refine_recall_bound(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq(emb, m=8, ksub=16)
    codes = encode_pq(emb, books)
    got = pq_knn(codes, books, _queries(emb), 10, emb=emb, refine_factor=8)
    want = exact_knn(emb, _queries(emb), 10)
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    w = {(r["query_id"], r["neighbor_id"]) for r in want.collect()}
    assert len(g & w) / len(w) >= 0.5  # coarse codebooks + refine
    # refined scores are EXACT dots: self-match scores 1.0 on unit vectors
    self_scores = [r["score"] for r in got.collect() if r["query_id"] == r["neighbor_id"]]
    assert self_scores and all(abs(s - 1.0) < 1e-6 for s in self_scores)


def test_pq_codes_compress_and_bound(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq(emb, m=8, ksub=16)
    codes = encode_pq(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


def test_sq8_knn_matches_exact_top1(spark, sf_dir):
    # SQ8 with refine: after exact rescoring the top hit must equal the
    # exact KNN top hit whenever it survives the candidate stage (it does
    # at refine_factor=4 on smooth unit vectors).
    import pyspark.sql.functions as F

    from vector_database_product_recommendation_spark.operators.knn import item_to_item
    from vector_database_product_recommendation_spark.operators.sq import sq8_knn
    from vector_database_product_recommendation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sq = sq8_knn(emb, query_id=7, k=5).collect()
    assert len(sq) == 5
    assert all(-1.000001 <= r["score"] <= 1.000001 for r in sq)  # unit vectors
    assert all(abs(r["score"] - r["approx_score"]) < 0.05 for r in sq)
    exact = item_to_item(emb, 7, k=5)
    top_exact = exact.orderBy(F.desc("score"), F.asc("neighbor_id")).first()
    assert sq[0]["vec_id"] == top_exact["neighbor_id"]
