"""CSV / JSON round-trip fidelity and partitioned-sink pruning.

Aggregate correctness is driver-checked (registry oracles); these tests
pin row-level fidelity and the physical pruning behavior."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_database_product_recommendation_spark.sources import formats as FMT
from vector_database_product_recommendation_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_csv_roundtrip_is_row_identical(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_csv")
    FMT.write_csv(docs, path)
    back = FMT.read_csv(spark, path, docs.schema)
    assert back.count() == docs.count()
    # text survives quoting/newlines byte-for-byte: anti-joins are empty
    assert back.exceptAll(docs).isEmpty()
    assert docs.exceptAll(back).isEmpty()


def test_json_roundtrip_keeps_micros(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_json")
    FMT.write_json(events, path)
    back = FMT.read_json(spark, path, events.schema)
    assert back.exceptAll(events).isEmpty()
    assert events.exceptAll(back).isEmpty()


def test_partitioned_scan_prunes_directories(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_part")
    FMT.write_partitioned(orders, path, "o_orderstatus")
    back = FMT.read_partitioned(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "o_orderstatus" in seg  # predicate became directory pruning
    # and the pruned read still returns exactly the F rows
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_csv_reader_needs_no_inference_job(spark, tmp_path):
    # schema-on-read: reading with an explicit StructType plans a single
    # FileScan csv without an inference pass (no sampling job is triggered
    # at plan time — constructing the DataFrame runs zero jobs)
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_csv2")
    FMT.write_csv(docs, path)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = FMT.read_csv(spark, path, docs.schema)
    _ = df.schema  # resolve analysis
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_orc_roundtrip_row_identity(spark, sf_dir):
    from vector_database_product_recommendation_spark.sources import formats as FMT
    from vector_database_product_recommendation_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path, done = FMT._mirror_dir("orc_emb_identity", sf_dir)
    if not done:
        FMT.write_orc(emb, path)
    back = FMT.read_orc(spark, path)
    assert back.schema == emb.schema
    assert back.count() == emb.count()
    assert back.exceptAll(emb).count() == 0 and emb.exceptAll(back).count() == 0
