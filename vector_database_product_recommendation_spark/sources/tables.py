"""Parquet sources for the synthetic star schema + document/embedding corpora.

Mirrors the reference's sources (SURVEY.md section 2.1, S1-S4): the reference
loads CSV tables + dense .npy matrices aligned by row position; here every
table is columnar Parquet and the embedding matrix is a first-class table
with an explicit key (``vec_id``) — the positional-identity fix required by
Spark's lack of a stable implicit row order (SURVEY.md section 1.5).

Scale notes: parquet scans get predicate pushdown + column pruning from
Catalyst for free as long as callers express filters/projections on the
DataFrame before any UDF barrier. Never collect these tables; embeddings are
only ever collected when they are a *query batch* (small by construction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to plain TIMESTAMP (LTZ) no matter
    how the parquet writer typed it:

    - TIMESTAMP(NANOS) read via the legacy nanosAsLong conf -> bigint:
      floor-divide to micros (the same truncation DuckDB applies).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ: cast to
      TIMESTAMP. The session timezone is pinned to UTC (session.py), so the
      cast is a pure re-tag — wall-clock values are unchanged and match
      DuckDB's naive reading. Downstream consumers (unix_micros, watermarks,
      window()) all require TIMESTAMP, so this is the single point where
      every writer flavor converges.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. ``name`` must be in TABLES.

    The events table's ts has shipped as TIMESTAMP(NANOS) and as
    TIMESTAMP_NTZ micros across testdata generations; normalize_event_ts
    folds both into plain TIMESTAMP here, the single load point.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several tables at once; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so spark.sql(...) can address the tables by name."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    *,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and sorted) by the join key — the 100-TB
    co-located-join layout: two tables bucketed the same way join with NO
    exchange (each task zips bucket i with bucket i), eliminating the
    dominant shuffle of large fact-fact joins. External table at `path`
    so no Hive metastore/warehouse dir is involved."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table_name)
    )
