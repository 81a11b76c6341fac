"""Product quantization (PQ) approximate KNN — the compressed-corpus scale
path alongside IVF (operators/ivf.py).

The reference's ANN layer is IndexIVFFlat (SURVEY.md section 2.7): coarse
pruning, full-precision residuals. PQ attacks the other axis — memory:
each vector is split into ``m`` subvectors and every subvector is replaced
by the id of its nearest per-subspace centroid (Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public paper).
A 64-d float64 vector (512 B) becomes ``m`` small ints (m bytes at
ksub<=256), a 64x compression, which is what lets a 100 TB embedding
corpus fit hot in cluster memory.

Spark-first mapping (no reference code involved — the reference has no
PQ; this is a training-data-pipeline extension):
- train: per-subspace Lloyd k-means on a bounded driver-side SAMPLE
  (exactly how faiss trains PQ codebooks); the codebook is m*ksub*dsub
  floats — kilobytes — broadcast to executors.
- encode: mapInPandas over the corpus; one argmin-distance matmul per
  (Arrow batch, subspace). The corpus never shuffles and never collects.
- search: asymmetric distance computation (ADC) — per query build an
  (m x ksub) lookup table of subvector dot products, then every corpus
  vector's approximate inner product is a sum of m table lookups; NumPy
  fancy-indexing inside mapInPandas keeps it vectorized. Optional exact
  re-rank of the top candidates against the full-precision vectors
  restores recall (the standard PQ + refine pipeline).

Exactness property used by tests: when every distinct subvector gets its
own centroid (ksub >= #unique subvectors, achievable at test scale),
quantization is lossless and PQ scores equal exact scores bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _lloyd(x: np.ndarray, k: int, *, iters: int = 25, seed: int = 42) -> np.ndarray:
    """Plain Lloyd k-means on a (n, d) sample -> (k', d) centroids.

    Unique-point init: if the sample has <= k distinct rows, each becomes
    its own centroid (zero distortion immediately — the lossless regime
    the exactness test exploits). Otherwise seeded random init.
    """
    uniq = np.unique(x, axis=0)
    if len(uniq) <= k:
        return uniq.astype(np.float64)
    rng = np.random.default_rng(seed)
    cents = uniq[rng.choice(len(uniq), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        # (n, k) squared distances via the expansion trick; argmin assign
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        new = np.empty_like(cents)
        for j in range(len(cents)):
            members = x[assign == j]
            new[j] = members.mean(axis=0) if len(members) else cents[j]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def train_pq(
    emb: DataFrame,
    *,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    sample: int = 20_000,
    seed: int = 42,
) -> list[np.ndarray]:
    """Train per-subspace codebooks on a bounded sample.

    Driver-side by contract: the sample is capped at ``sample`` rows (PQ
    codebooks are always trained on a subsample at scale — the codebook
    quality depends on the distribution, not the corpus size) and the
    result is m arrays of (<=ksub, d/m) floats, kilobytes total.
    """
    n = emb.count()
    frac = min(1.0, sample / max(n, 1))
    rows = (
        emb.select(F.col(vec_col).cast("array<double>").alias("v"))
        .sample(fraction=frac, seed=seed)
        .limit(sample)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        _lloyd(x[:, j * dsub : (j + 1) * dsub], ksub, seed=seed + j) for j in range(m)
    ]


def encode_pq(
    emb: DataFrame,
    codebooks: list[np.ndarray],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus -> (id, codes array<int>): nearest centroid per subspace.

    One mapInPandas pass; per Arrow batch and subspace the assignment is a
    single (batch x ksub) distance matmul. No shuffle, no collect.
    """
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast([c.tolist() for c in codebooks])
    m = len(codebooks)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = [np.asarray(c, dtype=np.float64) for c in bc.value]
        dsub = books[0].shape[1]
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j, cents in enumerate(books):
                sub = x[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ cents.T)
                    + (cents * cents).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return emb.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, codes array<int>"
    )


def pq_knn(
    codes_df: DataFrame,
    codebooks: list[np.ndarray],
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    emb: DataFrame | None = None,
    vec_col: str = "embedding",
    refine_factor: int = 4,
) -> DataFrame:
    """ADC top-k per query over the coded corpus.

    Per task: for each query, an (m x ksub) lookup table of subvector
    dots, then scores = sum of m fancy-indexed lookups over the code
    matrix. The kernel emits only its task-local exact top-``fetch`` per
    query under the total order (adc_score DESC, neighbor_id ASC) — the
    same ordering the merge window uses — so the merge shuffle moves
    O(tasks * queries * fetch) rows instead of every scored candidate,
    and a single-task code table (the cached serving layout) elides the
    merge window entirely: task-local ranks ARE global. Exact task-local
    selection under a total order provably contains the global top-fetch
    (any globally top-ranked candidate ranks at least as high within its
    own task), and because the order is total (ADC ties break by
    neighbor_id) the result is deterministic and independent of batch or
    partition boundaries — unlike the previous per-batch raw
    ``argpartition`` prune, whose tie handling at the fetch boundary was
    arbitrary. (Verified value-identical on the test corpora at
    sf0.001/0.01/0.1 — no ADC tie straddles a fetch boundary there.)

    If ``emb`` is given, the ADC top ``k*refine_factor`` candidates are
    re-scored exactly against the full-precision vectors (the tiny
    candidate set is BROADCAST onto the corpus scan, so the corpus never
    shuffles) and re-ranked; output is then (query_id, neighbor_id,
    score, rank) with exact scores, comparable to exact_knn's.
    """
    sess = codes_df.sparkSession
    qrows = queries.select(
        F.col("query_id"), F.col("query_vec").cast("array<double>")
    ).collect()
    qids = [int(r["query_id"]) for r in qrows]
    qmat = np.asarray([r["query_vec"] for r in qrows], dtype=np.float64)
    bc_q = sess.sparkContext.broadcast(qmat.tolist())
    bc_books = sess.sparkContext.broadcast([c.tolist() for c in codebooks])
    bc_qids = sess.sparkContext.broadcast(qids)
    fetch = k * refine_factor if emb is not None else k
    m = len(codebooks)

    def _topfetch(cq: np.ndarray, cn: np.ndarray, cs: np.ndarray):
        """Exact (query, adc desc, id asc) ranks; keep rank <= fetch."""
        order = np.lexsort((cn, -cs, cq))
        cq, cn, cs = cq[order], cn[order], cs[order]
        uniq, counts = np.unique(cq, return_counts=True)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        rank = np.arange(len(cq)) - np.repeat(starts, counts) + 1
        sel = rank <= fetch
        return cq[sel], cn[sel], cs[sel], rank[sel]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = [np.asarray(c, dtype=np.float64) for c in bc_books.value]
        q = np.asarray(bc_q.value, dtype=np.float64)
        ids = np.asarray(bc_qids.value, dtype=np.int64)
        dsub = books[0].shape[1]
        # luts[qi] is (m, ksub_j) ragged -> keep as list per subspace
        luts = [q[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)]
        nq = len(q)
        cand_q: list[np.ndarray] = []
        cand_n: list[np.ndarray] = []
        cand_s: list[np.ndarray] = []
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int32)  # (n, m)
            nid = pdf[id_col].to_numpy()
            scores = np.zeros((nq, len(codes)), dtype=np.float64)
            for j in range(m):
                scores += luts[j][:, codes[:, j]]  # (nq, n) lookup-add
            # batch-local exact top-fetch (a superset of the task-level
            # top-fetch) bounds task memory at O(queries * fetch * batches)
            bq, bn, bs, _ = _topfetch(
                np.repeat(np.arange(nq), len(codes)),
                np.tile(nid, nq),
                scores.ravel(),
            )
            cand_q.append(bq)
            cand_n.append(bn)
            cand_s.append(bs)
        if not cand_q:
            return
        cq, cn, cs, rank = _topfetch(
            np.concatenate(cand_q), np.concatenate(cand_n), np.concatenate(cand_s)
        )
        yield pd.DataFrame(
            {
                "query_id": ids[cq],
                "neighbor_id": cn,
                "adc_score": cs,
                "rank": rank.astype(np.int32),
            }
        )

    partial = codes_df.select(id_col, "codes").mapInPandas(
        score, "query_id long, neighbor_id long, adc_score double, rank int"
    )
    if codes_df.rdd.getNumPartitions() == 1:
        # one scan task -> task-local ranks ARE global (same elision as
        # ivf_knn/exact_knn); no merge exchange at all
        cand = partial
    else:
        w = Window.partitionBy("query_id").orderBy(
            F.desc("adc_score"), F.asc("neighbor_id")
        )
        cand = (
            partial.drop("rank")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= fetch)
        )
    if emb is None:
        return cand.select(
            "query_id",
            "neighbor_id",
            F.round("adc_score", 6).alias("score"),
            "rank",
        ).orderBy("query_id", "rank")

    # exact refine: re-score the tiny candidate set with full vectors.
    # The candidate table (queries * fetch rows) broadcasts onto the
    # corpus scan — emb itself never shuffles; only the rescored
    # candidates cross the rank-window exchange.
    from vector_database_product_recommendation_spark.functions.vectors import dot

    full = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    qdf = sess.createDataFrame(
        [(i, v) for i, v in zip(qids, qmat.tolist())],
        "query_id long, qv array<double>",
    )
    rescored = (
        full.join(F.broadcast(cand.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot("qv", "nv"), 6).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
