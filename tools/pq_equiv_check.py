"""Old-vs-new pq_knn equivalence: run the r21 (HEAD) pq_knn and the working-tree
pq_knn on the same trained artifacts at a given SF; compare collected rows."""
import os, subprocess, sys, types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

old_src = subprocess.check_output(
    ["git", "-C", REPO, "show", "HEAD:vector_database_product_recommendation_spark/operators/pq.py"],
    text=True,
)
old_mod = types.ModuleType("pq_old")
exec(compile(old_src, "pq_old.py", "exec"), old_mod.__dict__)

from vector_database_product_recommendation_spark.session import get_spark
from vector_database_product_recommendation_spark.operators import pq as new_mod
from vector_database_product_recommendation_spark.sources.tables import load_table
import pyspark.sql.functions as F

spark = get_spark("pq-equiv")
emb = load_table(spark, SF_DIR, "embeddings")
books = new_mod.train_pq(emb)
codes = new_mod.encode_pq(emb, books).persist()
codes.count()
q = emb.filter(F.col("vec_id") < 8).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
)
for label, kw in [("refined", dict(emb=emb, refine_factor=8)),
                  ("exactrefine", dict(emb=emb, refine_factor=10**6)),
                  ("norefine", dict())]:
    old = old_mod.pq_knn(codes, books, q, 5, **kw).collect()
    new = new_mod.pq_knn(codes, books, q, 5, **kw).collect()
    same = [tuple(r) for r in old] == [tuple(r) for r in new]
    print(f"{label}: old={len(old)} new={len(new)} identical={same}")
    if not same:
        so, sn = set(map(tuple, old)), set(map(tuple, new))
        print("  only-old:", sorted(so - sn)[:10])
        print("  only-new:", sorted(sn - so)[:10])
# multi-partition vs single-partition determinism of the NEW impl
codes4 = codes.repartition(4).persist(); codes4.count()
for label, kw in [("refined", dict(emb=emb, refine_factor=8)), ("norefine", dict())]:
    one = new_mod.pq_knn(codes, books, q, 5, **kw).collect()
    four = new_mod.pq_knn(codes4, books, q, 5, **kw).collect()
    print(f"new {label} 1-part == 4-part: {[tuple(r) for r in one] == [tuple(r) for r in four]}")
print("codes partitions:", codes.rdd.getNumPartitions())
spark.stop()
