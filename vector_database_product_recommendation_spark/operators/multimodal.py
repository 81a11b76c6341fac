"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted executor-side in Arrow batches.

The container ships no image/audio libraries, so real decoders are STUBS
behind import-tries (`pil_image_decoder` raises NotImplementedError when
Pillow is absent). What IS real — and tested — is everything Spark-side:
the (id, payload binary, meta struct) schema, the mapInPandas batch shape,
partition-preserving feature extraction, and downstream composability
(features -> KNN / dedup operate unchanged).

`fake_feature_decoder` is the deterministic test double: an md5-derived
8-dim feature vector whose arithmetic is mirrored in the DuckDB oracle
(registry: multimodal_features), so even the UDF plumbing is value-checked
cross-engine.

Scale notes: payloads never shuffle (feature extraction is row-local);
features are small arrays; metadata predicates (format/width filters)
stay Column expressions so they push down to the parquet scan and prune
row groups BEFORE any Python worker sees a payload.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_DIM = 8


def attach_payload(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    (doc_id, payload binary, meta struct<format,n_bytes>). Stands in for
    an image/audio table; the payload is the UTF-8 text bytes."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def fake_feature_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    feature[j] = (hash60(md5hex(payload) || '|' || j) % 1e6) / 1e6.
    Mirrored exactly by the SQL oracle."""
    hx = hashlib.md5(payload).hexdigest()
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    for j in range(FEATURE_DIM):
        h = int(hashlib.md5(f"{hx}|{j}".encode()).hexdigest()[:15], 16)
        out[j] = (h % 1_000_000) / 1_000_000.0
    return out


def pil_image_decoder(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Real image decode -> mean-pooled pixel features. STUB: the container
    has no Pillow; raises NotImplementedError until one is available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "use fake_feature_decoder for plumbing tests"
        ) from e
    raise NotImplementedError("wire the real decoder here when PIL exists")


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_feature_decoder,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """mapInPandas feature extraction: (doc_id, features array<double>).

    One Arrow batch in, one out; payload bytes stay inside the task. The
    decoder is a plain bytes->ndarray callable so real decoders drop in
    without touching the Spark plumbing.
    """
    out_schema = f"{id_col} {media.schema[id_col].dataType.simpleString()}, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decoder(bytes(p)).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return media.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample(
    media: DataFrame,
    every_n: int = 10,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-style frame sampling stub: keeps every n-th row by id — the
    partition-local sampling shape (no shuffle); a real video table would
    sample frames inside the decoder instead."""
    return media.filter((F.col(id_col) % every_n) == 0)


def resize_payload(
    media: DataFrame,
    *,
    target_bytes: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image-resize-shaped op: payload -> fixed-size payload + updated meta.

    The stand-in transform truncates/zero-pads to ``target_bytes`` (a real
    resize is also bytes -> smaller bytes, row-local); meta records both
    the original and new size, the shape a real thumbnailing pipeline
    carries. Pure mapInPandas — payloads never leave the task, output
    partitioning == input partitioning.
    """
    meta_t = media.schema[
        "meta"
    ].dataType.simpleString() if "meta" in media.columns else None
    out_schema = (
        f"{id_col} {media.schema[id_col].dataType.simpleString()}, "
        f"payload binary, meta struct<format:string,n_bytes:int,orig_bytes:int>"
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            resized, metas = [], []
            for p in pdf[payload_col]:
                b = bytes(p)
                out = b[:target_bytes].ljust(target_bytes, b"\x00")
                resized.append(out)
                metas.append(
                    {"format": "text/plain", "n_bytes": len(out), "orig_bytes": len(b)}
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": resized, "meta": metas})

    _ = meta_t  # original meta is recomputed, not propagated
    return media.select(id_col, payload_col).mapInPandas(run, out_schema)


def audio_frame_windows(
    media: DataFrame,
    *,
    frame_bytes: int = 100,
    hop_bytes: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio-framing-shaped op: one row per (doc, frame) with byte offsets.

    Overlapping frame boundaries come from `sequence` + explode — pure
    Column expressions, no UDF, so the frame fan-out happens JVM-side and
    the payload column is sliced with `substring` (binary-safe) only for
    frames that survive any upstream filter. The real audio version swaps
    byte offsets for sample offsets; the plan shape is identical.
    """
    n = F.col("meta.n_bytes")
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - F.lit(frame_bytes), F.lit(0)),
        F.lit(hop_bytes),
    )
    return (
        media.withColumn("frame_start", F.explode(starts))
        .select(
            id_col,
            "frame_start",
            F.least(F.col("frame_start") + frame_bytes, n).alias("frame_end"),
            F.expr(
                f"substring(payload, frame_start + 1, {frame_bytes})"
            ).alias("frame_payload"),
        )
    )
