"""IVF (inverted-file) approximate KNN: KMeans coarse quantizer + cluster
pruning — the Spark-native rebuild of the reference's IndexIVFFlat
(SURVEY.md section 2.7 AN2-AN4; nlist=39≈⌊√1578⌋, metric=inner-product,
nprobe slider at app.py:383-384 [verified from the index binary header]).

Spark-first mapping:
- train (AN2): MLlib KMeans(k=nlist, fixed seed) on the vectors. Euclidean
  KMeans == spherical KMeans on unit vectors (‖a-b‖² = 2-2a·b), so the
  trained centroids serve the inner-product metric directly.
- assign/build (AN3): row-local argmax-dot against the broadcast centroid
  matrix inside mapInPandas (one BLAS matmul per Arrow batch; the corpus
  NEVER shuffles). Persisting `write.partitionBy('cluster_id')` turns
  nprobe pruning into native parquet partition pruning.
- probe (AN4): rank centroids per query (driver-side — the centroid table
  is tiny by construction), keep top-nprobe, then score ONLY corpus rows in
  probed clusters: a broadcast join on cluster_id followed by the same
  batched top-k kernel as exact KNN.

nprobe == nlist degenerates to exact search (metamorphic test).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def train_kmeans_centroids(
    emb: DataFrame,
    nlist: int,
    *,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    max_points_per_centroid: int = 256,
    max_train_bytes: int = 2 << 30,
    assign_block: int = 65_536,
    n_rows: int | None = None,
) -> DataFrame:
    """AN2: (cluster_id, centroid array<double>) — seeded Lloyd on a
    BOUNDED sample, FAISS-style.

    FAISS's own IVF training subsamples to Clustering.max_points_per_centroid
    (default 256) points per centroid before running k-means; the reference's
    IndexIVFFlat was trained exactly that way. The Spark analog: sample at
    most 256*nlist rows (one scan, no shuffle), collect THAT via Arrow as
    float32, and run Lloyd iterations in NumPy on the driver. Training a
    coarse quantizer with a distributed MLlib job costs a full pass over the
    corpus PER ITERATION — strictly worse whenever the sample fits on the
    driver, and ~10x slower wall-clock at bench scale (see SCALE.md).

    Driver memory, honestly: the transfer peak is 12*d*ppc*nlist bytes —
    the Arrow float64 columnar batch (8 B/elem, the wire format) plus the
    float32 training matrix it is cast into (4 B/elem); the Arrow buffer
    is freed before Lloyd runs, so the iterations hold only the float32
    matrix (nlist=4096, d=384 -> ~1.6 GiB held, ~4.8 GiB transfer peak;
    nlist=39 at bench scale -> trivial). The guard below budgets the full
    12 B/elem peak, not just the held matrix. The assignment step is
    CHUNKED (``assign_block`` rows at a time, like FAISS), so its scratch
    is O(assign_block * nlist), never the full s x k distance matrix
    (which would be ~34 GiB at nlist=4096). When even the sample exceeds
    ``max_train_bytes``, points-per-centroid shrinks to fit (floor 16);
    past that — huge nlist, e.g. the 100-TB-implied nlist~sqrt(N)~5e5 —
    the trainer falls back to distributed MLlib KMeans, which never
    collects the sample at all.

    Euclidean k-means == spherical k-means on unit vectors (‖a-b‖² = 2-2a·b),
    so the centroids serve the inner-product metric directly. Recall is
    governed by nprobe and pinned by the ivf(nprobe=nlist)==exact
    metamorphic test; clustering quality only shifts the recall/nprobe
    trade-off, which tests/test_ivf.py bounds.
    """
    # one job answers both scalars (callers that already counted pass
    # ``n_rows`` and only dim is fetched — the old form ran two jobs here
    # plus a third in the caller)
    if n_rows is None:
        n, d = emb.agg(
            F.count(F.lit(1)), F.first(F.size(vec_col), ignorenulls=True)
        ).first()
    else:
        n, d = n_rows, emb.select(F.size(vec_col)).first()[0]
    n, d = int(n), int(d)
    ppc = max_points_per_centroid
    # 12 B/elem = true transfer peak (8 B Arrow float64 + 4 B float32
    # target), not just the 4 B/elem matrix Lloyd holds afterwards
    bytes_per_elem = 12
    if bytes_per_elem * d * ppc * nlist > max_train_bytes:
        ppc = max(16, max_train_bytes // (bytes_per_elem * d * nlist))
    if bytes_per_elem * d * ppc * nlist > max_train_bytes:
        return _mllib_centroids(emb, nlist, vec_col=vec_col, seed=seed, max_iter=max_iter)
    bound = max(nlist * ppc, nlist + 1)
    sample = emb.select(vec_col)
    if n > bound:
        # seeded Bernoulli sample with slack, trimmed to the bound: one
        # narrow scan, deterministic for a fixed input partitioning. (The
        # LIMIT trim is partition-order-dependent: a re-layout of the
        # source files can shift which rows survive, hence cluster ids
        # across rebuilds — acceptable for a coarse quantizer, where only
        # the recall/nprobe trade-off matters, not stable ids.)
        sample = sample.sample(fraction=min(1.0, 1.2 * bound / n), seed=seed).limit(bound)
    # Arrow path: one columnar transfer held as the raw Arrow list buffer
    # (8 B/elem float64 — no pandas object-cell materialization, which
    # costs ~12 B/elem in per-row numpy headers alone), cast chunk-by-chunk
    # into the preallocated float32 matrix and freed. Peak = Arrow buffer +
    # float32 target = the 12 B/elem the guard above budgets.
    tbl = sample.toArrow()
    n_rows = tbl.num_rows
    x = np.empty((n_rows, d), dtype=np.float32)
    pos = 0
    for chunk in tbl.column(vec_col).chunks:
        flat = chunk.flatten()  # offset-adjusted float64 values array
        m = np.asarray(flat).reshape(-1, d)
        x[pos : pos + len(m)] = m  # float64 -> float32 cast into place
        pos += len(m)
    del tbl
    if pos != n_rows:
        # explicit raise (not assert: stripped under python -O) — a miscount
        # here means pyarrow flatten() dropped null list slots and x[pos:]
        # would be uninitialized np.empty garbage fed into Lloyd
        raise ValueError(
            f"k-means sample transfer lost rows: filled {pos} of {n_rows} "
            f"(null embedding slots in the sample?)"
        )
    s = len(x)
    k = min(nlist, s)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(s, size=k, replace=False)].astype(np.float32)
    # einsum with an explicit accumulate dtype: no full float64 copy of x
    x_sq = np.einsum("ij,ij->i", x, x, dtype=np.float64)
    assign = np.zeros(s, dtype=np.int64)
    adist = np.zeros(s, dtype=np.float64)
    for _ in range(max_iter):
        # chunked argmin ||x-c||^2 = argmin -2x.c + ||c||^2 (x^2 const/row):
        # peak scratch is O(assign_block * k), never the full s x k distance
        # matrix; centroid sums accumulate per block, so no full float64
        # copy of the sample exists at any point either
        c_sq = (cents.astype(np.float64) ** 2).sum(axis=1)
        new64 = np.zeros((k, x.shape[1]), dtype=np.float64)
        counts = np.zeros(k, dtype=np.float64)
        for lo in range(0, s, assign_block):
            hi = min(lo + assign_block, s)
            d2 = -2.0 * (x[lo:hi] @ cents.T).astype(np.float64) + c_sq[None, :]
            blk = np.argmin(d2, axis=1)
            assign[lo:hi] = blk
            adist[lo:hi] = d2[np.arange(hi - lo), blk]
            np.add.at(new64, blk, x[lo:hi].astype(np.float64))
            counts += np.bincount(blk, minlength=k)
        nonempty = counts > 0
        new64[nonempty] /= counts[nonempty, None]
        if not nonempty.all():
            # re-seed empty clusters at the points farthest from their center
            far = np.argsort(-(x_sq + adist))
            new64[~nonempty] = x[far[: (~nonempty).sum()]]
        new = new64.astype(np.float32)
        if np.allclose(new, cents, atol=1e-7):
            cents = new
            break
        cents = new
    out = [(i, [float(v) for v in c]) for i, c in enumerate(cents)]
    return emb.sparkSession.createDataFrame(
        out, "cluster_id int, centroid array<double>"
    )


def _mllib_centroids(
    emb: DataFrame, nlist: int, *, vec_col: str, seed: int, max_iter: int
) -> DataFrame:
    """Distributed KMeans escape hatch for nlist too large to train
    driver-side (the sample alone would blow ``max_train_bytes``). One full
    corpus pass per iteration — the price of never collecting vectors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(vecs)
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster_id int, centroid array<double>",
    )
    return cents


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """AN3: append `cluster_id` = argmax-dot centroid, row-local.

    The centroid matrix ships in the task closure (nlist x d floats); each
    Arrow batch does one matmul + argmax. No shuffle of the corpus.
    """
    cent = centroids.orderBy("cluster_id").collect()
    cmat = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in cent])
    cids = np.array([r["cluster_id"] for r in cent])
    # fresh StructType — .add() would mutate the DataFrame's cached schema
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(list(emb.schema.fields) + [StructField("cluster_id", IntegerType())])
    out_cols = [f.name for f in schema.fields]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            best = cids[np.argmax(mat @ cmat.T, axis=1)]
            pdf = pdf.assign(cluster_id=best.astype(np.int32))
            yield pdf[out_cols]

    return emb.mapInPandas(assign, schema)


def ivf_knn(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = False,
    round_decimals: int = 6,
    query_rows: list | None = None,
    centroid_rows: list | None = None,
) -> DataFrame:
    """AN4: per-query top-k over the union of its nprobe best clusters.

    Returns (query_id, neighbor_id, score, rank) like exact_knn. With the
    corpus laid out partitionBy('cluster_id'), the cluster_id IN (...)
    semi-join becomes partition pruning — only nprobe/nlist of the data is
    read per query batch.

    Like exact_knn, the scoring kernel keeps only its task-local top-k per
    query (score rounded BEFORE selection, ties by neighbor id), so the
    merge shuffle moves O(q * k * n_tasks) rows instead of every scored
    candidate — at 100 TB the probed candidate set is nprobe/nlist of the
    corpus, which must never cross an exchange. A single-task candidate
    scan (the cached serving layout) elides the merge window entirely.

    ``query_rows``: pre-collected (query_id, query_vec) rows — callers
    probing the same batch repeatedly (the nprobe sweep) pass them once
    instead of re-running the collect job per call. ``centroid_rows``:
    same for the (tiny) centroid table, ordered by cluster_id.
    """
    spark = assigned.sparkSession
    cent = centroid_rows if centroid_rows is not None else centroids.orderBy("cluster_id").collect()
    cmat = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in cent])
    cids = np.array([r["cluster_id"] for r in cent])

    qrows = query_rows if query_rows is not None else queries.select(query_id, query_vec).collect()
    if not qrows:
        raise ValueError("empty query batch")
    # cluster -> row indices of the queries that probe it. The probe map
    # ships in the task closure (it is O(q * nprobe) ints) instead of a
    # broadcast-joined table: corpus rows then cross the Python boundary
    # ONCE each, not once per probing query, and the cluster filter is a
    # plain pushable isin — native PARTITION PRUNING on the ivf_store
    # layout with no runtime (DPP) machinery needed.
    probe_map: dict[int, list[int]] = {}
    for qi, r in enumerate(qrows):
        qv = np.asarray(r[1], dtype=np.float64)
        sims = cmat @ qv
        # deterministic centroid ranking: (-sim, cluster_id)
        top = cids[np.lexsort((cids, -sims))[: min(nprobe, len(cids))]]
        for c in top:
            probe_map.setdefault(int(c), []).append(qi)

    # Score candidates with a vectorized Arrow kernel — the query batch is
    # already on the driver. Per batch, rows group by cluster and one BLAS
    # matmul scores each cluster's rows against exactly the queries that
    # probed it. Each task emits only its local top-k per query (exact
    # task-level (score desc, id asc) ordering after rounding — identical
    # selection semantics to the global window).
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qid_dtype = queries.schema[query_id].dataType.simpleString()
    nid_dtype = assigned.schema[corpus_id].dataType.simpleString()
    dec = round_decimals
    excl = exclude_self
    k_local = k

    def _topk(cq: np.ndarray, cn: np.ndarray, cs: np.ndarray):
        """Exact (query, score desc, id asc) ranks; returns arrays + rank."""
        order = np.lexsort((cn, -cs, cq))
        cq, cn, cs = cq[order], cn[order], cs[order]
        uniq, counts = np.unique(cq, return_counts=True)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        rank = np.arange(len(cq)) - np.repeat(starts, counts) + 1
        sel = rank <= k_local
        return cq[sel], cn[sel], cs[sel], rank[sel]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand_q: list[np.ndarray] = []
        cand_n: list[np.ndarray] = []
        cand_s: list[np.ndarray] = []
        for pdf in batches:
            if pdf.empty:
                continue
            emb_mat = np.stack(pdf[corpus_vec].to_numpy()).astype(np.float64)
            na_all = pdf[corpus_id].to_numpy()
            cl = pdf["cluster_id"].to_numpy()
            bq: list[np.ndarray] = []
            bn: list[np.ndarray] = []
            bs: list[np.ndarray] = []
            for c in np.unique(cl):
                qidx = probe_map.get(int(c))
                if not qidx:
                    continue
                rows = np.nonzero(cl == c)[0]
                s = np.round(emb_mat[rows] @ q_mat[qidx].T, dec)  # (nr, nq_c)
                nr = len(rows)
                bq.append(np.repeat(np.asarray(qidx), nr))
                bn.append(np.tile(na_all[rows], len(qidx)))
                bs.append(s.T.ravel())
            if not bq:
                continue
            qa = np.concatenate(bq)
            na = np.concatenate(bn)
            s = np.concatenate(bs)
            if excl:
                keep = na != q_ids[qa]
                qa, na, s = qa[keep], na[keep], s[keep]
            # per-batch prune to the batch-local top-k (exact superset of
            # the task-level top-k) so task memory stays O(q * k * batches)
            qa, na, s, _ = _topk(qa, na, s)
            cand_q.append(qa)
            cand_n.append(na)
            cand_s.append(s)
        if not cand_q:
            return
        cq, cn, cs, rank = _topk(
            np.concatenate(cand_q), np.concatenate(cand_n), np.concatenate(cand_s)
        )
        yield pd.DataFrame(
            {
                "query_id": q_ids[cq],
                "neighbor_id": cn,
                "score": cs,
                "rank": rank.astype(np.int32),
            }
        )

    pool = assigned.filter(
        F.col("cluster_id").isin(sorted(probe_map))
    ).select("cluster_id", corpus_id, corpus_vec)
    partial = pool.mapInPandas(
        score,
        f"query_id {qid_dtype}, neighbor_id {nid_dtype}, score double, rank int",
    )
    if pool.rdd.getNumPartitions() == 1:
        # one scan task -> task-local ranks ARE global (same elision as
        # exact_knn); no exchange at all beyond the output sort
        return partial.orderBy("query_id", "rank")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        partial.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    method: str = "auto",
    nlist: int | None = None,
    nprobe: int = 5,
    exact_threshold: int = 100_000,
    seed: int = 42,
    **kw,
) -> DataFrame:
    """Strategy-choosing KNN (SURVEY.md section 4): exact brute force for
    small corpora, IVF where scale warrants — the reference's footnote
    heuristic (app.py:442-445) made explicit, mirroring Spark's own
    broadcast-threshold idea."""
    from vector_database_product_recommendation_spark.operators.knn import exact_knn

    n = None
    if method == "auto":
        n = corpus.count()  # counted once; reused by the IVF branch below
        method = "exact" if n <= exact_threshold else "ivf"
    if method == "exact":
        return exact_knn(corpus, queries, k, **kw)
    if method != "ivf":
        raise ValueError(f"unknown method {method!r}")
    if n is None:
        n = corpus.count()
    nlist = nlist or max(1, int(n ** 0.5))
    cents = train_kmeans_centroids(corpus, nlist, vec_col=kw.get("corpus_vec", "embedding"), seed=seed, n_rows=n)
    assigned = assign_clusters(corpus, cents, vec_col=kw.get("corpus_vec", "embedding"))
    return ivf_knn(assigned, cents, queries, k, nprobe, **kw)


def write_ivf_store(
    assigned: DataFrame, path: str, *, mode: str = "overwrite"
) -> None:
    """Persist the clustered corpus partitionBy(cluster_id) — the on-disk
    inverted-file layout. A later `cluster_id IN (probed)` filter becomes
    native parquet PARTITION PRUNING: only nprobe/nlist of the files are
    ever opened (the reference's inverted-list skipping, AN4, expressed as
    data layout instead of index structure)."""
    assigned.write.mode(mode).partitionBy("cluster_id").parquet(path)


def read_ivf_store(spark, path: str) -> DataFrame:
    """Reopen the partitioned corpus; cluster_id comes back as a partition
    column (int)."""
    df = spark.read.parquet(path)
    return df.withColumn("cluster_id", F.col("cluster_id").cast("int"))
