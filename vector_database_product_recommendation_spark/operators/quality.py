"""Repetition-based quality signals for pretraining-corpus filtering.

The Gopher/MassiveText filtering rules (Rae et al. 2021, arXiv:2112.11446,
table A1) keep documents whose repetition stays under thresholds: fraction
of tokens taken by the single most frequent token, fraction of n-gram
occurrences that are repeats, distinct-token ratio. The reference app has
no corpus filtering at all (its corpus is pre-cleaned, SURVEY.md S9) —
this module is part of the training-data-pipeline extension layer and
composes with corpus_prep_pipeline's lang/quality gate.

Scale shape: token and bigram counts are hash aggregates keyed by
(doc_id, gram) with map-side combine, re-aggregated per doc_id — two
fine-grained shuffles that move (id, gram, count) triples, never text.
Deliberately NOT the row-local expression form: counting gram
multiplicities inside an array column is O(len * distinct) per row, which
goes quadratic on long documents; grouped counts stay linear and spill
cleanly at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from vector_database_product_recommendation_spark.functions.text import tokens_ws


def repetition_signals(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_decimals: int = 6,
) -> DataFrame:
    """Per-document repetition metrics:

    - n_tokens:           whitespace token count
    - unique_token_ratio: distinct tokens / tokens
    - top_token_frac:     occurrences of the modal token / tokens
    - dup_bigram_frac:    bigram occurrences whose bigram appears more
                          than once / total bigram occurrences (0.0 when
                          the doc has fewer than 2 tokens)

    Returns one row per input doc, sorted by doc_id.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_ws(text_col).alias("toks")
    ).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tokens"),
        F.when(
            F.size("toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bigrams"),
    )

    tok_counts = base.select("doc_id", F.explode("toks").alias("g")).groupBy(
        "doc_id", "g"
    ).agg(F.count(F.lit(1)).alias("c"))
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("n_tok"),
    )

    bg_counts = base.select("doc_id", F.explode("bigrams").alias("g")).groupBy(
        "doc_id", "g"
    ).agg(F.count(F.lit(1)).alias("c"))
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_occ"),
        F.sum("c").alias("n_bg"),
    )

    return (
        base.select("doc_id", "n_tokens")
        .join(tok_stats, "doc_id", "left")
        .join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.when(F.col("n_tok") > 0, F.col("n_distinct") / F.col("n_tok")).otherwise(0.0),
                round_decimals,
            ).alias("unique_token_ratio"),
            F.round(
                F.when(F.col("n_tok") > 0, F.col("top_c") / F.col("n_tok")).otherwise(0.0),
                round_decimals,
            ).alias("top_token_frac"),
            F.round(
                F.when(F.col("n_bg") > 0, F.col("dup_occ") / F.col("n_bg")).otherwise(0.0),
                round_decimals,
            ).alias("dup_bigram_frac"),
        )
        .orderBy("doc_id")
    )
