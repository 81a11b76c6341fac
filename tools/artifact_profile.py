"""Time each component of bench.py's artifact-build phase in isolation."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from vector_database_product_recommendation_spark.session import get_spark
from vector_database_product_recommendation_spark import artifacts

spark = get_spark("artifact-profile")
spark.range(1).count()

def t(label, fn):
    t0 = time.time()
    fn()
    print(f"{label:35s} {time.time()-t0:7.2f}s")

t("fit tfidf (construct)", lambda: artifacts.fitted_tfidf(spark, SF_DIR))
m = artifacts.fitted_tfidf(spark, SF_DIR)
t("weights(6) materialize", lambda: m.weights(6).count())
t("weights(12) materialize", lambda: m.weights(12).count())
t("tfidf max_features=20 w(6)", lambda: artifacts.fitted_tfidf(spark, SF_DIR, max_features=20).weights(6).count())
t("ivf_index (train+assign+persist)", lambda: artifacts.ivf_index(spark, SF_DIR))
t("ivf_store (write+reopen)", lambda: artifacts.ivf_store(spark, SF_DIR))
t("encoded_documents", lambda: artifacts.encoded_documents(spark, SF_DIR))
t("pq_index", lambda: artifacts.pq_index(spark, SF_DIR))
spark.stop()
