"""The reference app's serving surface as a typed API — a user of the
reference (app.py's Streamlit widgets) switches to these five calls:

    engine = ProductSearchEngine.from_reference_dir(spark, "/path/to/ref")
    engine.search_products("kindle for reading", brand="amazon", k=5)   # E1
    engine.search_products(..., mode="hybrid", alpha=0.7)               # E1 hybrid
    engine.search_by_product_id("B00ZV9PXP2", k=5)                      # E2
    engine.compare_products(["B00ZV9PXP2", "B00QJDU3KY"])               # J5
    engine.ann_review_search(q_idx=7, k=5, nprobe=5)                    # E3
    engine.ann_tradeoff_table()                                         # AN5

Parameter semantics match the widgets exactly (SURVEY.md section 3):
brand "All" sentinel = no filter (app.py:158-159), min_rating compares
against coalesce(avg_rating, -1) (app.py:160-161), min_reviews against
coalesce(n_reviews, 0) (app.py:162-163), hybrid blends
alpha*dense + (1-alpha)*minmax(tfidf) with the dense side raw
(app.py:206-210, quirks 2.9.2-3 preserved).

The encoder is pluggable: hash_embedder by default (deterministic,
oracle-checkable), sentence_encoder(SBERT) when installed — matching the
reference's all-MiniLM-L6-v2 (app.py:84). NB: with the default hash
encoder, free-text scores differ from the reference's SBERT scores by
design; item-to-item / compare / ANN paths use the corpus vectors and
match the reference bit-for-bit (tests/test_reference_retrieval.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from vector_database_product_recommendation_spark.functions.embed import hash_embed_py
from vector_database_product_recommendation_spark.functions.text import STOPWORDS_EN
from vector_database_product_recommendation_spark.operators.knn import (
    exact_knn,
    exact_scores,
    pairwise_similarity,
)


class ProductSearchEngine:
    """Serving engine over (products, product_embeddings) with optional
    (reviews, review_embeddings) for the ANN demo paths."""

    def __init__(
        self,
        products: DataFrame,
        product_emb: DataFrame,
        *,
        reviews: DataFrame | None = None,
        review_emb: DataFrame | None = None,
        text_col: str = "example_text",
        encoder=None,
        stopwords: tuple[str, ...] = STOPWORDS_EN,
        embedding_dim: int | None = None,
    ):
        self.products = products
        self.product_emb = product_emb  # (id, embedding) unit vectors
        self.reviews = reviews
        self.review_emb = review_emb  # (review_idx, embedding)
        self.text_col = text_col
        self.encoder = encoder  # None -> driver-side hash_embed_py
        self.stopwords = stopwords
        self.embedding_dim = embedding_dim  # lazily probed once if None
        self._tfidf = None

    # -- construction -----------------------------------------------------

    @classmethod
    def from_reference_dir(cls, spark: SparkSession, ref_dir: str, **kw):
        """Build from the reference's shipped artifacts: reviews.csv +
        review_embeddings.npy, products/product-vectors REBUILT through
        this engine's lineage operators (proved identical in
        tests/test_reference_parity.py)."""
        from vector_database_product_recommendation_spark.sources.reference import (
            load_embeddings_npy,
            load_reviews,
            rebuild_product_embeddings,
            rebuild_products,
        )

        # no .cache() here: load_reviews already persists the (expensive,
        # unsplittable multiLine) CSV parse; the returned frame only adds a
        # map lookup + cast on top of that cache, and re-caching it would
        # pin a second, redundant copy of every row
        reviews = load_reviews(spark, f"{ref_dir}/reviews.csv")
        review_emb = load_embeddings_npy(
            spark, f"{ref_dir}/review_embeddings.npy"
        ).cache()
        products = rebuild_products(reviews).cache()
        product_emb = rebuild_product_embeddings(reviews, review_emb).select(
            "id", F.col("vector").alias("embedding")
        )
        return cls(
            products,
            product_emb.cache(),
            reviews=reviews,
            review_emb=review_emb,
            **kw,
        )

    # -- stage 1: metadata prefilter (P1-P4) ------------------------------

    def candidate_products(
        self,
        *,
        brand: str = "All",
        min_rating: float = 0.0,
        min_reviews: int = 0,
    ) -> DataFrame:
        """Conjunctive metadata filter with the app's exact null handling."""
        out = self.products
        if brand != "All":
            out = out.filter(F.lower(F.col("brand")) == F.lit(brand.lower()))
        out = out.filter(
            F.coalesce(F.col("avg_rating"), F.lit(-1.0)) >= F.lit(float(min_rating))
        )
        return out.filter(
            F.coalesce(F.col("n_reviews"), F.lit(0)) >= F.lit(int(min_reviews))
        )

    # -- E1: free-text search (vector / hybrid) ---------------------------

    def _encode_query(self, query_text: str) -> list[float]:
        if self.encoder is not None:
            return self.encoder(query_text)
        if self.embedding_dim is None:
            # probed ONCE and memoized — the encode hot path must not run a
            # Spark job per free-text query (pass embedding_dim at
            # construction to avoid even this first probe)
            self.embedding_dim = len(self.product_emb.select("embedding").first()[0])
        return hash_embed_py(query_text, self.embedding_dim)

    def search_products(
        self,
        query_text: str,
        *,
        k: int = 5,
        brand: str = "All",
        min_rating: float = 0.0,
        min_reviews: int = 0,
        mode: str = "vector",
        alpha: float = 0.7,
    ) -> DataFrame:
        """E1 (app.py:281-303): filter -> score -> top-k -> gather."""
        spark = self.products.sparkSession
        cand = self.candidate_products(
            brand=brand, min_rating=min_rating, min_reviews=min_reviews
        )
        cand_emb = self.product_emb.join(cand.select("id"), "id")
        qv = self._encode_query(query_text)
        q = spark.createDataFrame([(0, qv)], "query_id int, query_vec array<double>")

        if mode == "vector":
            hits = exact_knn(cand_emb, q, k, corpus_id="id").select(
                F.col("neighbor_id").alias("id"), "score", "rank"
            )
        elif mode == "hybrid":
            # The blend needs every candidate's dense score, not a ranking:
            # exact_scores is the same BLAS kernel minus top-k selection, so
            # no O(N) rows ever cross the single-partition rank window
            # (the old k=10**9 sentinel did exactly that).
            dense = exact_scores(cand_emb, q, corpus_id="id").select(
                F.col("neighbor_id").alias("id"), "score"
            )
            hits = self._blend_hybrid(query_text, cand, dense, alpha, k)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return (
            hits.join(self.products, "id")
            .select("rank", "id", "score", "brand", "n_reviews", "avg_rating")
            .orderBy("rank")
        )

    def _tfidf_model(self):
        from vector_database_product_recommendation_spark.operators.tfidf import TfidfModel

        if self._tfidf is None:
            self._tfidf = TfidfModel(
                self.products, "id", self.text_col, self.stopwords
            )
        return self._tfidf

    def _blend_hybrid(
        self, query_text: str, cand: DataFrame, dense: DataFrame, alpha: float, k: int
    ) -> DataFrame:
        """F2-F4 with the reference's quirks: TF-IDF cosine over the WHOLE
        corpus, min-max over the CANDIDATE set, dense side raw
        (app.py:202-210)."""
        model = self._tfidf_model()
        w = model.weights(round_decimals=12)
        qw = model.transform_query(query_text)
        sparse = (
            w.join(F.broadcast(qw), "term")
            .groupBy("doc_id")
            .agg(F.sum(F.col("weight") * F.col("qw")).alias("ts"))
        )
        sparse = (
            cand.select(F.col("id").alias("doc_id"))
            .join(sparse, "doc_id", "left")
            .select("doc_id", F.coalesce("ts", F.lit(0.0)).alias("ts"))
        )
        bounds = sparse.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        scaled = sparse.crossJoin(F.broadcast(bounds)).select(
            F.col("doc_id").alias("id"),
            F.when(
                F.col("mx") > F.col("mn"),
                (F.col("ts") - F.col("mn")) / (F.col("mx") - F.col("mn") + F.lit(1e-12)),
            )
            .otherwise(F.col("ts"))
            .alias("ts_scaled"),
        )
        from pyspark.sql import Window

        blended = dense.join(scaled, "id").select(
            "id",
            F.round(
                F.lit(alpha) * F.col("score") + F.lit(1.0 - alpha) * F.col("ts_scaled"),
                6,
            ).alias("score"),
        )
        # Select first (TakeOrderedAndProject: partition-local heaps, no
        # full-set shuffle), THEN mint ranks — the row_number window only
        # ever sees k rows.
        top = blended.orderBy(F.desc("score"), F.asc("id")).limit(k)
        wk = Window.orderBy(F.desc("score"), F.asc("id"))
        return top.withColumn("rank", F.row_number().over(wk))

    # -- E2: item-to-item -------------------------------------------------

    def search_by_product_id(self, pid, k: int = 5) -> DataFrame:
        """E2 (app.py:221-241): the query vector comes FROM the corpus."""
        from vector_database_product_recommendation_spark.operators.knn import item_to_item

        hits = item_to_item(self.product_emb, pid, k, corpus_id="id")
        return (
            hits.select(F.col("neighbor_id").alias("id"), "score", "rank")
            .join(self.products, "id")
            .select("rank", "id", "score", "brand", "n_reviews", "avg_rating")
            .orderBy("rank")
        )

    # -- J5: pairwise compare ---------------------------------------------

    def compare_products(self, pids: list) -> DataFrame:
        """J5 (app.py:348-354): pairwise similarity of 2-4 selected
        products, long form (id_a, id_b, score)."""
        sel = self.product_emb.filter(F.col("id").isin(list(pids)))
        return pairwise_similarity(sel, id_col="id")

    # -- E3: ANN demo -----------------------------------------------------

    def ann_review_search(
        self, q_idx: int, *, k: int = 5, nprobe: int = 5, nlist: int | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """E3 (app.py:360-440): (exact, ivf) hit lists for one review
        query — the side-by-side demo. Requires review_emb."""
        from vector_database_product_recommendation_spark.operators.ivf import (
            assign_clusters,
            ivf_knn,
            train_kmeans_centroids,
        )

        emb = self.review_emb.select(
            F.col("review_idx").alias("vec_id"), "embedding"
        )
        q = emb.filter(F.col("vec_id") == q_idx).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        exact = exact_knn(emb, q, k, exclude_self=True)
        n = emb.count()
        eff = nlist or max(2, int(n**0.5))
        cents = train_kmeans_centroids(emb, eff)
        assigned = assign_clusters(emb, cents)
        ivf = ivf_knn(assigned, cents, q, k, nprobe, exclude_self=True)
        return exact, ivf

    def ann_tradeoff_table(self, **kw) -> DataFrame:
        """AN5: regenerate the reference's nprobe trade-off table on the
        review corpus (ann_tradeoff_table.csv lineage)."""
        from vector_database_product_recommendation_spark.operators.eval import ann_tradeoff

        emb = self.review_emb.select(
            F.col("review_idx").alias("vec_id"), "embedding"
        )
        return ann_tradeoff(emb, **kw)
