"""Ingest the reference's own artifacts (SURVEY.md section 1) and rebuild
its derived tables with this engine's operators — the direct parity proof:
running OUR lineage pipeline on THEIR reviews.csv must reproduce THEIR
products.csv and product_embeddings.npy bit-for-bit (modulo float32).

Reference layout (all [verified] in SURVEY.md):
- reviews.csv: 1578 rows, positional identity (no review-level key) ->
  we mint `review_idx` at ingest (section 1.5 hard-part i).
- combined_text = lower(title || ' ' || text || ' ' || brand)  (P10)
- products.csv = group-by derivation of reviews (section 1.1)
- product_embeddings.npy = l2-normalized per-product MEAN of
  review_embeddings.npy rows (A-g4)
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

REVIEWS_SCHEMA = (
    "`id` string, `asins` string, `brand` string, `categories` string, "
    "`reviews.title` string, `reviews.text` string, "
    "`reviews.rating` double, `combined_text` string"
)


def load_reviews(spark: SparkSession, csv_path: str) -> DataFrame:
    """reviews.csv with an explicit minted row index.

    multiLine + escape handle quoted review bodies with embedded newlines.

    review_idx = (lexicographic file order, row order within file) — the
    deterministic, distributed mint (SURVEY.md section 1.5 hard-part i):

    - within a file: multiLine CSV is unsplittable, so each file is parsed
      start-to-finish by exactly one task and monotonically_increasing_id
      is monotone in file order there; `row_number` over a PER-FILE window
      turns it into a dense local rank. The window shuffles keyed by file
      path — parallelism = #files, never the old 1-task global window that
      both collapsed ingest and silently mis-ordered multi-file input.
    - across files: per-file counts (one tiny agg, #files rows) become
      cumulative offsets on the driver in lexicographic path order —
      sharded exports (part-00000, part-00001, ...) sort correctly.

    The id is minted ONCE at ingest and is a real column from then on.
    """
    df = spark.read.csv(
        csv_path, header=True, multiLine=True, escape='"', schema=REVIEWS_SCHEMA
    )
    df = df.withColumn("_file", F.input_file_name()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("_file").orderBy("_mid")
    # persist BEFORE the counts action: multiLine CSV is expensive to parse
    # (unsplittable, quote-scanning) and without the persist both the counts
    # agg and every downstream consumer would re-parse the files from scratch.
    # Lifetime contract: this cache IS the reviews cache — the frame this
    # function returns derives from it with a map lookup + cast only, so
    # callers must NOT re-cache the result (that pins a redundant copy);
    # it lives for the session, like the reference's @st.cache_resource.
    df = df.withColumn("_local", F.row_number().over(w) - 1).persist()
    counts = {r["_file"]: r["cnt"] for r in df.groupBy("_file").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, running = {}, 0
    for path in sorted(counts):
        offsets[path] = running
        running += counts[path]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    # long, not int: a 100-TB reviews corpus passes 2^31 rows and an int
    # cast would silently wrap the minted id.
    return (
        df.withColumn("review_idx", (off[F.col("_file")] + F.col("_local")).cast("long"))
        .drop("_file", "_mid", "_local")
    )


def load_embeddings_npy(spark: SparkSession, npy_path: str) -> DataFrame:
    """A dense .npy matrix as (review_idx, embedding) — the positional-
    alignment invariant made explicit (S4)."""
    mat = np.load(npy_path).astype(np.float64)
    rows = [(i, row.tolist()) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "review_idx int, embedding array<double>")


def with_combined_text(reviews: DataFrame) -> DataFrame:
    """P10 [verified]: lower(title || ' ' || text || ' ' || brand).

    NB: concat (not concat_ws) semantics — the reference joins with single
    spaces even when a part is empty, which concat_ws would collapse — and
    whitespace runs are collapsed to single spaces afterwards (3 of 1578
    rows carry multi-space runs in the raw fields that the shipped
    combined_text does not: the offline pipeline normalized whitespace).
    """
    joined = F.concat(
        F.coalesce(F.col("`reviews.title`"), F.lit("")),
        F.lit(" "),
        F.coalesce(F.col("`reviews.text`"), F.lit("")),
        F.lit(" "),
        F.coalesce(F.col("brand"), F.lit("")),
    )
    return reviews.withColumn(
        "combined_text_rebuilt",
        F.trim(F.regexp_replace(F.lower(joined), r"\s+", " ")),
    )


def rebuild_products(reviews: DataFrame) -> DataFrame:
    """products.csv derivation (section 1.1, all columns [verified]):
    count-all, null-skipping mean, first-row-in-file-order fields."""
    return (
        reviews.groupBy("id")
        .agg(
            F.min_by("brand", "review_idx").alias("brand"),
            F.min_by("categories", "review_idx").alias("categories"),
            F.min_by("asins", "review_idx").alias("asins"),
            F.count(F.lit(1)).alias("n_reviews"),
            F.min_by("combined_text", "review_idx").alias("example_text"),
            F.avg("`reviews.rating`").alias("avg_rating"),
        )
        .orderBy("id")
    )


def rebuild_product_embeddings(reviews: DataFrame, emb: DataFrame) -> DataFrame:
    """product vector = l2-normalized element-wise mean of the product's
    review vectors (A-g4 [verified], cos == 1.0 vs the shipped .npy)."""
    from vector_database_product_recommendation_spark.operators.centroids import (
        group_centroids,
    )

    joined = reviews.select("id", "review_idx").join(emb, "review_idx")
    return group_centroids(joined, "id", "embedding")


def filter_by_category(products: DataFrame, category: str) -> DataFrame:
    """P12 (SURVEY.md section 2.2): the reference stores `categories` /
    `asins` as comma-separated multi-value cells and only ever compares
    them as opaque strings (products.csv:1); the Spark-native form splits
    to ArrayType once and filters with array_contains — sargable, and the
    split array is reusable for explode/facet queries."""
    cats = F.split(F.col("categories"), ",")
    return products.filter(F.array_contains(F.transform(cats, F.trim), category))
