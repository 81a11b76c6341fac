"""Exact KNN as a broadcast scored join — the engine's central kernel.

Reference semantics (SURVEY.md sections 2.3 J4, 2.5 K1-K3, 3 E1/E2):
score = inner product of a query vector against every corpus vector
(app.py:181,199,234 — NumPy `emb @ qv`; app.py:394 — FAISS IndexFlatIP),
then top-k by score with self-exclusion for item-to-item (app.py:227-228).

Spark-first physical shape (SURVEY.md section 4, "100-TB-safe"):
- the CORPUS NEVER SHUFFLES. Queries are a small batch by construction
  (the reference's widest workload is 400 query vectors); we collect them
  to the driver and ship them to every task via closure broadcast.
- scoring is a NumPy matmul inside mapInPandas (Arrow batches -> BLAS),
  the distributed analog of the reference's `emb @ qv` hot loop.
- each task emits only its LOCAL top-k per query (k rows per query per
  Arrow batch), so the single shuffle that remains — the per-query global
  top-k window — moves O(q * k * n_batches) rows, not O(q * N).
- ties break by (score desc, neighbor id asc) with scores rounded in
  float64 BEFORE selection, so results are deterministic and engine-
  independent (FIXTURES.md oracle notes).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from vector_database_product_recommendation_spark.functions.vectors import dot


def _collect_queries(
    queries: DataFrame, query_id: str, query_vec: str
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side gather of the query batch (small by contract)."""
    rows = queries.select(query_id, query_vec).collect()
    if not rows:
        raise ValueError("empty query batch")
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return ids, mat


def exact_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
    round_decimals: int = 6,
    query_rows: list | None = None,
) -> DataFrame:
    """Batch exact KNN: for every query row, the top-k corpus rows by dot.

    Returns (query_id, neighbor_id, score, rank), rank 1..k per query.
    `exclude_self` drops corpus rows whose id equals the query id — the
    reference's item-to-item self-exclusion (app.py:227-228) done as a
    filter BEFORE the limit (SURVEY.md section 2.9.4), not a k+1 overfetch.

    ``query_rows``: pre-collected (query_id, query_vec) rows — callers
    reusing one query batch across calls (the serving loop; the reference
    encodes its query batch once, app.py:169-171) pass them to skip the
    per-call collect job, exactly like ivf_knn.
    """
    if query_rows is not None:
        if not query_rows:
            raise ValueError("empty query batch")
        q_ids = np.array([r[0] for r in query_rows])
        q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in query_rows])
    else:
        q_ids, q_mat = _collect_queries(queries, query_id, query_vec)

    qid_dtype = queries.schema[query_id].dataType.simpleString()
    nid_dtype = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = (
        f"query_id {qid_dtype}, neighbor_id {nid_dtype}, score double, rank int"
    )
    k_local = k
    excl = exclude_self
    dec = round_decimals

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm = q_mat.T  # (d, q)
        nq = q_mat.shape[0]
        # Accumulate an exact-superset candidate pool across the task's
        # Arrow batches, then rank ONCE per task. Per batch we keep every
        # row whose score ties-or-beats the kk-th largest for its query
        # (np.partition threshold) — a provable superset of the true
        # (score desc, id asc) top-k, selected with no per-query Python
        # loop. SCALE.md "Bulk-KNN floor" has the measured breakdown of
        # where this kernel's milliseconds go (selection dominates the
        # matmul ~20:1 at reference shapes; both are dwarfed by fixed
        # job dispatch + Arrow at small corpora).
        cand_q: list[np.ndarray] = []
        cand_n: list[np.ndarray] = []
        cand_s: list[np.ndarray] = []
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.stack(pdf[corpus_vec].to_numpy()).astype(np.float64)  # (n, d)
            ids = pdf[corpus_id].to_numpy()
            scores = cmat @ qm  # (n, q) float64
            np.round(scores, dec, out=scores)  # rounded pre-selection
            n = len(ids)
            if excl:
                invalid = ids[:, None] == q_ids[None, :]  # (n, q)
                scores[invalid] = -np.inf
            kk = min(k_local, n)
            if n > kk:
                thr = np.partition(scores, n - kk, axis=0)[n - kk]  # (q,)
                keep = scores >= thr
            else:
                keep = np.ones((n, nq), dtype=bool)
            if excl:
                keep &= ~invalid
            rows, cols = np.nonzero(keep)
            cand_q.append(cols)
            cand_n.append(ids[rows])
            cand_s.append(scores[rows, cols])
        if not cand_q:
            return
        cq = np.concatenate(cand_q)
        cn = np.concatenate(cand_n)
        cs = np.concatenate(cand_s)
        # one exact task-level ordering: (query, score desc, neighbor asc)
        order = np.lexsort((cn, -cs, cq))
        cq, cn, cs = cq[order], cn[order], cs[order]
        uniq, counts = np.unique(cq, return_counts=True)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        rank = np.arange(len(cq)) - np.repeat(starts, counts) + 1
        sel = rank <= k_local
        yield pd.DataFrame(
            {
                "query_id": q_ids[cq[sel]],
                "neighbor_id": cn[sel],
                "score": cs[sel],
                "rank": rank[sel].astype(np.int32),
            }
        )

    narrowed = corpus.select(corpus_id, corpus_vec)
    partial = narrowed.mapInPandas(score_partition, out_schema)
    if narrowed.rdd.getNumPartitions() == 1:
        # single scan task -> the task-local ranks ARE global; the merge
        # window (an exchange + sort over k rows/query/task) is a no-op —
        # elide it. The serving regime (one cached corpus partition per
        # ~25k vectors, artifacts.py) hits this constantly.
        return partial.orderBy("query_id", "rank")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        partial.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def exact_scores(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
    round_decimals: int = 6,
) -> DataFrame:
    """Score EVERY corpus row against the query batch — no top-k, no window.

    The blend path of hybrid search (app.py:202-210) needs all candidate
    scores, not a ranking; routing it through exact_knn with a sentinel
    k would drag O(N) rows through the per-query rank window (a single
    serialized partition at scale). This is the same mapInPandas BLAS
    kernel as exact_knn minus selection: output stays partition-local,
    zero shuffles. Returns (query_id, neighbor_id, score).
    """
    q_ids, q_mat = _collect_queries(queries, query_id, query_vec)
    qid_dtype = queries.schema[query_id].dataType.simpleString()
    nid_dtype = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"query_id {qid_dtype}, neighbor_id {nid_dtype}, score double"
    excl = exclude_self
    dec = round_decimals

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm = q_mat.T  # (d, q)
        nq = q_mat.shape[0]
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.stack(pdf[corpus_vec].to_numpy()).astype(np.float64)
            ids = pdf[corpus_id].to_numpy()
            scores = np.round(cmat @ qm, dec)  # (n, q)
            n = len(ids)
            # column-major flatten: all of query 0's rows, then query 1's…
            out_q = np.repeat(np.arange(nq), n)
            out_n = np.tile(ids, nq)
            out_s = scores.T.ravel()
            if excl:
                valid = out_n != q_ids[out_q]
                out_q, out_n, out_s = out_q[valid], out_n[valid], out_s[valid]
            yield pd.DataFrame(
                {"query_id": q_ids[out_q], "neighbor_id": out_n, "score": out_s}
            )

    return corpus.select(corpus_id, corpus_vec).mapInPandas(
        score_partition, out_schema
    )


def exact_knn_expr(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
    round_decimals: int = 6,
) -> DataFrame:
    """Pure-expression variant: crossJoin(broadcast(queries)) + zip_with dot.

    Same semantics as exact_knn; stays entirely JVM-side (no Python worker)
    but shuffles O(q*N) scored rows into the top-k window — use for small
    query batches / cross-validation of the fast kernel, not the 100-TB path.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    joined = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    ).crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(dot("__cv", "__qv"), round_decimals).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def item_to_item(
    corpus: DataFrame,
    item_id,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """E2 (app.py:221-241): the query vector comes FROM the corpus —
    look up the item's vector, score everyone else, top-k, never return
    the item itself."""
    q = corpus.filter(F.col(corpus_id) == F.lit(item_id)).select(
        F.col(corpus_id).alias("query_id"), F.col(corpus_vec).alias("query_vec")
    )
    return exact_knn(
        corpus,
        q,
        k,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        exclude_self=True,
    )


def pairwise_similarity(
    items: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """J5 (app.py:348-354): similarity matrix for a small selected set
    (reference allows 2-4 products). Long form (id_a, id_b, score) including
    the diagonal, a < b ordering not applied so the square matrix can be
    pivoted client-side exactly like `V @ V.T`."""
    a = items.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = items.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(F.broadcast(b))
        .select("id_a", "id_b", F.round(dot("__va", "__vb"), round_decimals).alias("score"))
        .orderBy("id_a", "id_b")
    )
