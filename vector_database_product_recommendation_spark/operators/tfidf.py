"""TF-IDF + sparse cosine + hybrid blend as pure DataFrame programs.

The reference's model (SURVEY.md section 1.4, params [verified] from the
joblib pickle): sklearn TfidfVectorizer with token_pattern
``(?u)\\b\\w\\w+\\b``, english stop words, smooth_idf, l2 norm. Scoring
(section 2.6 F2-F4, app.py:202-210): sparse cosine of the query against
the WHOLE corpus, min-max rescale of the TF-IDF score over the candidate
set, then ``alpha*dense + (1-alpha)*tfidf_scaled`` (the dense side stays
raw — an asymmetry the reference ships, replicated per SURVEY 2.9.3).

Representation: the long sparse form (doc_id, term, weight) — the exploded
(term, weight) join is the Spark-native sparse dot product, shuffles only
on `term`, and doubles as the DuckDB oracle form (SURVEY 7 hard-part v).

sklearn parity notes:
- smooth idf: ln((1+n)/(1+df)) + 1
- tf is the raw count (sublinear_tf=False), l2-normalized per doc AFTER
  tf*idf
- stop-word list is a parameter; the engine default is our 20-word list,
  not sklearn's 318 (vocabulary choice, not an algorithm difference).

Scale notes: tf/df/norm are all hash aggregates with map-side combine; the
scored join broadcasts the query's terms (a query has O(10) terms). The
only full-corpus shuffles key on `term` and `doc_id`, both fine-grained.
The df table doubles as the vocabulary pruner (max_features) via top-k on
df — omitted here because the synthetic vocab is far below 20000.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from vector_database_product_recommendation_spark.functions.text import STOPWORDS_EN
from vector_database_product_recommendation_spark.lifetime import pin

# sklearn's (?u)\b\w\w+\b — runs of >=2 word chars (ASCII corpus).
TOKEN_PATTERN = r"\w\w+"


def _doc_terms(docs: DataFrame, id_col: str, text_col: str, stopwords) -> DataFrame:
    """(doc_id, term) one row per token occurrence, stop words removed.

    Pure-Column form, kept as the ANSI-SQL-expressible reference (it is
    the shape the DuckDB oracles mirror); the hot paths use the
    value-identical `_doc_term_counts` kernel below."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("term")
    ).filter(~F.array_contains(sw, F.col("term")))


def _doc_term_counts(
    docs: DataFrame, id_col: str, text_col: str, stopwords
) -> DataFrame:
    """(doc_id, term, tf) — term frequency per document, one Arrow kernel.

    Value-identical twin of ``_doc_terms(...).groupBy("doc_id","term")
    .count()``: term frequency is DOC-LOCAL, so counting inside the kernel
    removes the explode of every token occurrence AND the (doc_id, term)
    hash exchange — the previous form shuffled one row per token of the
    corpus to count what never leaves a document. Tokenization parity with
    the Column form is the bm25_search precedent: Python ``re`` with
    ``re.ASCII`` pins ``\\w`` to [a-zA-Z0-9_], byte-identical to Java's
    default ``\\w`` in regexp_extract_all, and ASCII lower() agrees with
    Java toLowerCase (oracle-verified across sf0.001/0.01/0.1).
    """
    pat = re.compile(TOKEN_PATTERN, flags=re.ASCII)
    stop = frozenset(stopwords)
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
    dtype = src.schema["doc_id"].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in batches:
            if pdf.empty:
                continue
            ids: list = []
            terms: list[str] = []
            tfs: list[int] = []
            for did, t in zip(pdf["doc_id"], pdf["__t"]):
                counts = Counter(
                    w for w in pat.findall((t or "").lower()) if w not in stop
                )
                ids.extend([did] * len(counts))
                terms.extend(counts.keys())
                tfs.extend(counts.values())
            yield pd.DataFrame({"doc_id": ids, "term": terms, "tf": tfs})

    return src.mapInPandas(kernel, f"doc_id {dtype}, term string, tf long")


class TfidfModel:
    """The fitted state (tf, df, n) with the per-scan shuffles persisted —
    every downstream consumer (weights, query transform, search, hybrid)
    derives from these without re-running tokenization/aggregation. The
    warehouse-scale analog is writing the tf/df tables once per corpus."""

    def __init__(
        self,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        stopwords,
        max_features: int | None = None,
        base_tf: DataFrame | None = None,
    ):
        self.docs = docs
        self.id_col = id_col
        self.text_col = text_col
        self.stopwords = stopwords
        # corpus row count is FITTED STATE (sklearn stores it as n_samples_);
        # kept as a plain int so consumers fold it into expressions as a
        # literal (the old one-row crossJoin form re-scanned docs on every
        # query transform).
        self.n = docs.count()
        # ``base_tf``: an already-fitted (doc_id, term, tf) table from a
        # sibling model over the SAME (docs, stopwords) — a capped-vocabulary
        # refit only prunes the vocabulary, so re-tokenizing the corpus for
        # it is pure waste (artifacts.fitted_tfidf passes the uncapped
        # model's tf). Values are identical by construction.
        tf = (
            base_tf
            if base_tf is not None
            else _doc_term_counts(docs, id_col, text_col, stopwords)
        )
        if max_features is not None:
            # sklearn max_features semantics: keep the top-k vocabulary by
            # total corpus term count (ties broken alphabetically — made
            # explicit here where sklearn relies on sort stability).
            from pyspark.sql import Window

            vocab = (
                tf.groupBy("term")
                .agg(F.sum("tf").alias("cnt"))
                .withColumn(
                    "rk",
                    F.row_number().over(
                        Window.orderBy(F.desc("cnt"), F.asc("term"))
                    ),
                )
                .filter(F.col("rk") <= max_features)
                .select("term")
            )
            tf = tf.join(F.broadcast(vocab), "term")
        self.tf = tf.persist()
        self.dfreq = self.tf.groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        ).persist()
        self._normalized_df: DataFrame | None = None

    def persisted(self) -> list[DataFrame]:
        """Every persisted DataFrame this model owns (for teardown)."""
        out = [self.tf, self.dfreq]
        if self._normalized_df is not None:
            out.append(self._normalized_df)
        return out

    def _raw(self, tf: DataFrame, keys: list[str]) -> DataFrame:
        # (1 + n) enters as an exact integer literal — value-identical to
        # the previous one-row crossJoin, minus a job and a broadcast
        return (
            tf.join(self.dfreq, "term")
            .select(
                *keys,
                (
                    F.col("tf").cast("double")
                    * (F.log(F.lit(1 + self.n) / (1 + F.col("df"))) + F.lit(1.0))
                ).alias("w"),
            )
        )

    def _normalized(self) -> DataFrame:
        """The UNROUNDED l2-normalized weight table (doc_id, term, wn),
        persisted once — every rounding level is a projection over it, so
        the normalize join+aggregate runs once per model instead of once
        per rounding level (and pins one cached copy, not one per level)."""
        if self._normalized_df is None:
            raw = self._raw(self.tf, ["doc_id", "term"])
            norms = raw.groupBy("doc_id").agg(
                F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
            )
            self._normalized_df = (
                raw.join(norms, "doc_id")
                .select("doc_id", "term", (F.col("w") / F.col("nrm")).alias("wn"))
                .persist()
            )
        return self._normalized_df

    def weights(self, round_decimals: int = 6) -> DataFrame:
        """l2-normalized smooth-idf TF-IDF, long sparse form
        (doc_id, term, weight), rounded per consumer contract — a cheap
        projection over the persisted normalized table (the reference's
        tfidf_matrix.joblib). round(w/nrm) is computed from the identical
        w/nrm double as before; only the persist boundary moved."""
        return self._normalized().select(
            "doc_id",
            "term",
            F.round(F.col("wn"), round_decimals).alias("weight"),
        ).orderBy("doc_id", "term")

    def transform_query(self, query_text: str) -> DataFrame:
        """One query string -> (term, qw) under the corpus-fitted idf.
        Unseen terms drop out (outside the fitted vocabulary, as in
        sklearn transform). Tiny result, meant to be broadcast.

        The query is a scalar parameter, not data, so its term counts are
        tokenized DRIVER-SIDE (re.ASCII — the bm25_search precedent,
        byte-identical to the Column form) into a literal local relation:
        no corpus-side job runs just to split one string. Counts are exact
        integers; every float enters downstream through the same engine
        expressions as before."""
        from collections import Counter

        spark = self.docs.sparkSession
        pat = re.compile(TOKEN_PATTERN, flags=re.ASCII)
        stop = frozenset(self.stopwords)
        counts = Counter(
            w for w in pat.findall((query_text or "").lower()) if w not in stop
        )
        q_tf = spark.createDataFrame(
            sorted(counts.items()) or [(None, None)], "term string, tf long"
        ).filter(F.col("term").isNotNull())
        raw = self._raw(q_tf, ["term"])
        nrm = raw.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        return raw.crossJoin(F.broadcast(nrm)).select(
            "term", (F.col("w") / F.col("nrm")).alias("qw")
        )


def tfidf_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_decimals: int = 6,
) -> DataFrame:
    """l2-normalized smooth-idf TF-IDF, long sparse form."""
    return TfidfModel(docs, id_col, text_col, stopwords).weights(round_decimals)


def query_tfidf(
    query_text: str,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
) -> DataFrame:
    """Transform one query string with the corpus-fitted idf -> (term, qw)."""
    return TfidfModel(docs, id_col, text_col, stopwords).transform_query(query_text)


def tfidf_search(
    query_text: str,
    docs: DataFrame,
    k: int = 20,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_decimals: int = 6,
    model: TfidfModel | None = None,
) -> DataFrame:
    """F2: sparse cosine = sum over shared terms of qw*weight, top-k.

    The scored join broadcasts the query terms; the corpus side never
    shuffles before the (tiny) per-query top-k. Pass a prefitted
    ``model`` to skip the fit (the joblib-artifact serving path)."""
    model = model or TfidfModel(docs, id_col, text_col, stopwords)
    w = model.weights(round_decimals=12)
    qw = model.transform_query(query_text)
    return (
        w.join(F.broadcast(qw), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("weight") * F.col("qw")), round_decimals).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_search(
    query_text: str,
    query_vec_id,
    docs: DataFrame,
    emb: DataFrame,
    k: int = 20,
    *,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_decimals: int = 6,
    model: TfidfModel | None = None,
) -> DataFrame:
    """F3+F4 (app.py:202-210): hybrid = alpha*dense_dot + (1-alpha)*
    minmax(tfidf_cosine), replicating the reference's quirks exactly
    (SURVEY 2.9.2-3): TF-IDF cosine computed over the WHOLE corpus, min-max
    over the candidate set (here: all docs), dense side left raw.
    """
    from vector_database_product_recommendation_spark.functions.vectors import dot

    # sparse side — cosine for every doc (missing -> 0.0, as sklearn yields)
    model = model or TfidfModel(docs, id_col, text_col, stopwords)
    w = model.weights(round_decimals=12)
    qw = model.transform_query(query_text)
    sparse = (
        w.join(F.broadcast(qw), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("qw")).alias("ts"))
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    # query-local pin: feeds the min/max bounds agg AND the rescale projection
    sparse = pin(all_docs.join(sparse, "doc_id", "left").select(
        "doc_id", F.coalesce("ts", F.lit(0.0)).alias("ts")
    ))
    # min-max over the candidate set (F3; guarded like app.py:207-208)
    bounds = sparse.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    scaled = sparse.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        F.when(
            F.col("mx") > F.col("mn"),
            (F.col("ts") - F.col("mn")) / (F.col("mx") - F.col("mn") + F.lit(1e-12)),
        )
        .otherwise(F.col("ts"))
        .alias("ts_scaled"),
    )
    # dense side — raw dot against the query item's own vector (E2 shape)
    qv = emb.filter(F.col(vec_id_col) == F.lit(query_vec_id)).select(
        F.col(vec_col).alias("__qv")
    )
    dense = emb.crossJoin(F.broadcast(qv)).select(
        F.col(vec_id_col).alias("doc_id"), dot(vec_col, "__qv").alias("vs")
    )
    return (
        scaled.join(dense, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.lit(alpha) * F.col("vs") + F.lit(1.0 - alpha) * F.col("ts_scaled"),
                round_decimals,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_search(
    query_text: str,
    docs: DataFrame,
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS_EN,
    round_decimals: int = 6,
) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson et al., TREC-3), the lexical
    scorer the reference's TF-IDF path approximates: score(q, d) =
    sum over query terms of idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    with the always-positive Lucene idf ln(1 + (n-df+0.5)/(df+0.5)).

    Spark shape: BOTH corpus statistics BM25 needs — query-term tf and
    per-doc length dl — are DOC-LOCAL, so ONE Arrow kernel pass over the
    corpus emits them together (dl rows carry term=NULL): no token
    occurrence is ever exploded or exchanged (the previous form exploded
    every corpus token twice, once per statistic, and hash-exchanged the
    query-term postings to count them). Query terms are tokenized
    driver-side (re.ASCII — byte-identical to Java \\w, so a non-ASCII
    query like "café" yields the same "caf" token both sides) and ship in
    the kernel closure. df over the kernel's tf rows equals full-corpus df
    on those terms; dl/avgdl stay all-terms by definition. Corpus-level
    scalars (n, avgdl) ride along as broadcast crossJoins, so nothing
    collects to the driver. Per-term contributions round to 12 decimals
    before the sum so engine FP noise stays below the final 6-decimal
    round (same policy as TfidfModel).
    """
    pat = re.compile(TOKEN_PATTERN, flags=re.ASCII)
    stop = frozenset(stopwords)
    qset = frozenset(
        t for t in pat.findall((query_text or "").lower()) if t not in stop
    )

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
    dtype = src.schema["doc_id"].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in batches:
            if pdf.empty:
                continue
            ids: list = []
            terms_out: list = []
            tfs: list = []
            dls: list = []
            for did, t in zip(pdf["doc_id"], pdf["__t"]):
                toks = [
                    w for w in pat.findall((t or "").lower()) if w not in stop
                ]
                if not toks:
                    # zero post-stopword tokens: absent from dl (and tf),
                    # exactly like the old explode->aggregate form
                    continue
                ids.append(did)
                terms_out.append(None)
                tfs.append(None)
                dls.append(len(toks))
                counts = Counter(w for w in toks if w in qset)
                ids.extend([did] * len(counts))
                terms_out.extend(counts.keys())
                tfs.extend(counts.values())
                dls.extend([None] * len(counts))
            yield pd.DataFrame(
                {"doc_id": ids, "term": terms_out, "tf": tfs, "dl": dls}
            )

    # query-local pin: the stats table feeds dl (avgdl + contribution join)
    # and tf (df count + contribution) — four consumers of one kernel pass
    stats = pin(
        src.mapInPandas(kernel, f"doc_id {dtype}, term string, tf long, dl long")
    )
    dl = stats.filter(F.col("term").isNull()).select("doc_id", "dl")
    tf = stats.filter(F.col("term").isNotNull()).select("doc_id", "term", "tf")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))

    idf = dfreq.crossJoin(F.broadcast(n)).select(
        "term",
        F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                12,
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), round_decimals).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
