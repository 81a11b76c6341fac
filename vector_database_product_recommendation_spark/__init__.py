"""vector_database_product_recommendation_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference system ``shabnomm/Vector-Database-Product-Recommendation``
(a Streamlit + pandas/NumPy/FAISS/sklearn vector-recommendation app),
re-expressed Spark-first:

- group-by feature-engineering lineage (reviews -> products) as DataFrame aggs
- exact KNN as a broadcast scored join with partition-local top-k
- IVF ANN as MLlib KMeans + cluster-partition pruning
- TF-IDF + hybrid dense/sparse scoring as a DataFrame-native pipeline
- plus the large-scale training-data-pipeline operators the reference lacks:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  text analysis (lang-id, quality, tokens, fingerprints), multimodal binary
  columns, and Structured Streaming event rollups.

Everything is public PySpark DataFrame/SQL/MLlib API; no custom Catalyst
rules are needed (SURVEY.md section 4).
"""

__version__ = "0.1.0"
