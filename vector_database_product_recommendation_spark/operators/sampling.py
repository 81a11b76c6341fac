"""Sampling operators for training-data pipelines: seeded uniform and
stratified (per-class) downsampling.

At 100 TB, sampling is how class balance, eval holdouts, and codebook
training sets are produced. Both forms are scan-local (Bernoulli draw per
row, seeded) — no shuffle, no collect; the output is a DataFrame that
composes with everything downstream. Exact row membership is
RNG-dependent, so these are property-tested (fraction tolerance,
subset-of-source, determinism under a fixed seed) rather than
oracle-hashed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def uniform_sample(df: DataFrame, fraction: float, *, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample of ~fraction of rows."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, *, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (class rebalancing): each key in
    ``fractions`` keeps ~that share of its rows; absent keys keep 0."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def downsample_majority(
    df: DataFrame, label_col: str, *, target: int, seed: int = 42
) -> DataFrame:
    """Cap every class at ~``target`` rows: compute per-class counts (one
    tiny aggregate), derive per-class fractions, sampleBy. The count
    aggregate is the only extra pass; the sample itself stays scan-local.
    """
    counts = {
        r[label_col]: r["n"]
        for r in df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fractions = {k: min(1.0, target / n) for k, n in counts.items()}
    return df.sampleBy(label_col, fractions, seed=seed)
