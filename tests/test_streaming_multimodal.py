"""Structured Streaming equivalence + multimodal plumbing tests.

Streaming strategy (SURVEY.md section 2.8): the same logical plan runs in
batch and streaming; correctness = streaming(availableNow) over the same
parquet produces exactly the batch result.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_database_product_recommendation_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    fake_feature_decoder,
    frame_sample,
)
from vector_database_product_recommendation_spark.sources.tables import load_table
from vector_database_product_recommendation_spark.streaming.events import (
    stream_windowed_counts,
    windowed_event_agg,
)


def test_stream_equals_batch_windowed_agg(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_agg(events).drop("n_users").collect()
    }

    # FileStreamSource wants a directory; stage the (read-only) file into
    # one via symlink, and hand over the RAW schema (ts as nanos-long).
    stage = tmp_path / "events_stream"
    stage.mkdir()
    (stage / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    agg = stream_windowed_counts(spark, str(stage), schema=raw_schema)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert stream == batch


def test_multimodal_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct")

    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])

    # determinism: python reference == distributed result
    one = docs.filter(F.col("doc_id") == 0).select("text").first()[0]
    expect = fake_feature_decoder(one.encode()).tolist()
    got = {r["doc_id"]: r["features"] for r in rows}[0]
    assert got == expect


def test_multimodal_metadata_pushdown_filter(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    small = media.filter(F.col("meta.n_bytes") < 200)
    assert 0 < small.count() < media.count()


def test_frame_sample(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    sampled = frame_sample(media, every_n=10)
    ids = [r["doc_id"] for r in sampled.select("doc_id").collect()]
    assert ids and all(i % 10 == 0 for i in ids)


def test_stateful_running_totals_equals_batch(spark, sf_dir, tmp_path):
    from vector_database_product_recommendation_spark.streaming.events import (
        user_running_totals_stream,
    )

    events = load_table(spark, sf_dir, "events")
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    stage = tmp_path / "events_stateful"
    stage.mkdir()
    (stage / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    q = (
        user_running_totals_stream(spark, str(stage), schema=raw_schema)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }
    assert set(got) == set(batch)
    for uid, (n, s) in batch.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - s) < 1e-6


def test_stream_static_join_equals_batch(spark, sf_dir, tmp_path):
    from vector_database_product_recommendation_spark.streaming.events import (
        enriched_segment_counts,
        stream_enriched_segment_counts,
    )

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    batch = {
        (r["window_start"], r["c_mktsegment"]): (r["n_events"], r["sum_value"])
        for r in enriched_segment_counts(events, customer).collect()
    }
    assert batch  # the join must land for the equivalence to mean anything

    stage = tmp_path / "events_enrich"
    stage.mkdir()
    (stage / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    q = (
        stream_enriched_segment_counts(spark, str(stage), customer, schema=raw_schema)
        .writeStream.format("memory")
        .queryName("enriched_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    stream = {
        (r["window_start"], r["c_mktsegment"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM enriched_counts").collect()
    }
    assert stream == batch


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    from vector_database_product_recommendation_spark.streaming.events import (
        stream_dedup_events,
    )

    # stage the SAME file twice -> every event_id arrives duplicated
    stage = tmp_path / "events_dup"
    stage.mkdir()
    (stage / "a.parquet").symlink_to(f"{sf_dir}/events.parquet")
    (stage / "b.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    q = (
        stream_dedup_events(spark, str(stage), schema=raw_schema)
        .writeStream.format("memory")
        .queryName("deduped_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM deduped_events"
    ).first()
    expect = load_table(spark, sf_dir, "events").count()
    assert got["n"] == got["d"] == expect


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    from vector_database_product_recommendation_spark.streaming.events import (
        click_purchase_attribution,
        stream_click_purchase_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r["purchase_id"], r["click_id"]): (r["purchase_ts"], r["click_ts"], r["purchase_value"])
        for r in click_purchase_attribution(events).collect()
    }

    stage = tmp_path / "events_ss"
    stage.mkdir()
    (stage / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    joined = stream_click_purchase_attribution(spark, str(stage), schema=raw_schema)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    q.awaitTermination(120)
    stream = {
        (r["purchase_id"], r["click_id"]): (r["purchase_ts"], r["click_ts"], r["purchase_value"])
        for r in spark.sql("SELECT * FROM ss_attrib").collect()
    }
    assert stream == batch
    assert batch  # non-vacuous: the join produces rows at this SF


def test_resize_payload_truncates_and_pads(spark, sf_dir):
    from vector_database_product_recommendation_spark.operators.multimodal import resize_payload

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    out = {r["doc_id"]: r for r in resize_payload(media, target_bytes=64).collect()}
    src = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(out) == set(src)
    for i, r in out.items():
        got = bytes(r["payload"])
        assert len(got) == 64 and r["meta"]["n_bytes"] == 64
        assert r["meta"]["orig_bytes"] == len(src[i])
        expect = src[i][:64].ljust(64, b"\x00")
        assert got == expect


def test_audio_frames_cover_payload(spark, sf_dir):
    from vector_database_product_recommendation_spark.operators.multimodal import (
        audio_frame_windows,
    )

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    frames = audio_frame_windows(media, frame_bytes=100, hop_bytes=50).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    sizes = {r["doc_id"]: r["meta"]["n_bytes"] for r in media.collect()}
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["frame_start"])
        assert rs[0]["frame_start"] == 0
        # hop coverage: consecutive frames overlap by frame-hop bytes
        for a, b in zip(rs, rs[1:]):
            assert b["frame_start"] - a["frame_start"] == 50
        # librosa-style framing: last full frame starts at <= n-100, the
        # dropped tail is shorter than one hop
        n = sizes[doc]
        assert rs[-1]["frame_end"] <= n
        if n >= 100:
            assert n - (rs[-1]["frame_start"] + 100) < 50
            for r in rs:
                assert len(bytes(r["frame_payload"])) == 100
        else:  # payload shorter than one frame -> single clamped frame
            assert len(rs) == 1 and rs[0]["frame_end"] == n
