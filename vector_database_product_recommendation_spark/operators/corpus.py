"""Corpus-preparation pipeline: the composite training-data job that
chains the text-analysis operators end to end —

    profile (lang-id, quality, token count, fingerprint)
      -> language + quality gate
      -> exact near-dup removal (fingerprint, keep lowest doc_id)
      -> per-stage funnel statistics

This is the canonical 100 TB pre-training data shape (cf. the C4 /
RefinedWeb / FineWeb pipelines: language filter -> quality heuristics ->
dedup). Everything is a single-pass column expression except the dedup,
which is one hash shuffle on the fingerprint; the funnel summary is three
tiny aggregates over the same persisted profile.

Scale notes: the profile projection is pure whole-stage-codegen (no UDF,
no Python); the gate is a pushed-down filter; fingerprint dedup shuffles
only (fingerprint, doc_id, n_tokens) — never the text payload. At 100 TB
the win of profiling BEFORE shuffling is the whole game: survivors of the
gate are typically a small fraction of input, so the dedup shuffle moves
a fraction of the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from vector_database_product_recommendation_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count_ws,
)
from vector_database_product_recommendation_spark.sources.tables import load_table


def corpus_prep_pipeline(
    spark: SparkSession,
    sf_dir: str,
    *,
    lang: str = "en",
    min_quality: float = 0.75,
) -> DataFrame:
    """Returns the funnel: (stage, n_docs, total_tokens) for the raw
    corpus, the post-gate corpus, and the post-dedup corpus."""
    docs = load_table(spark, sf_dir, "documents")
    prof = docs.select(
        "doc_id",
        lang_id("text").alias("lang"),
        quality_score("text").alias("quality"),
        token_count_ws("text").alias("n_tokens"),
        doc_fingerprint("text").alias("fingerprint"),
    )

    gated = prof.filter(
        (F.col("lang") == F.lit(lang)) & (F.col("quality") >= F.lit(min_quality))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )

    return (
        stage(prof, "raw")
        .unionByName(stage(gated, "lang_quality_gate"))
        .unionByName(stage(deduped, "fingerprint_dedup"))
    )
