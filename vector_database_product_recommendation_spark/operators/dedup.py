"""Deduplication operators for large-scale corpus pipelines.

Five families, all deterministic and oracle-checkable (every hash is md5 —
the one hash both Spark and DuckDB compute identically; 60-bit integer
hashes via ``functions.text.hash60``):

- exact:        group by md5(text)                          O(N) + 1 shuffle
- n-gram Jaccard: inverted-index self-join on shingles      sparse O(pairs)
- MinHash+LSH:  row-local signatures -> band-bucket join    O(N) + tiny join
- SimHash:      row-local 60-bit signature -> chunk blocks  O(N) + tiny join
- embedding cosine: threshold pairs over unit vectors       (exact baseline)

Scale notes (100 TB):
- signatures (minhash, simhash, fingerprints) are ROW-LOCAL pure-column
  expressions — array folds inside whole-stage codegen, no Python workers,
  no shuffle. The only shuffles are the pair-finding joins, whose keys
  (shingle / band signature / simhash chunk) are engineered to be sparse.
- the inverted-index join caps shingle document-frequency (``max_df``):
  a shingle occurring in more than max_df docs is a stop-shingle and is
  dropped from BOTH the numerator and the doc-size denominator (the
  operator is *defined* over the capped shingle space). This bounds the
  worst-case join fan-out at max_df^2 per shingle — without it one viral
  sentence produces a quadratic blowup.
- band/bucket joins move only (key, doc_id) pairs, never text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from vector_database_product_recommendation_spark.functions.text import (
    hash60,
    tokens_ws,
    word_shingles,
)
from vector_database_product_recommendation_spark.functions.vectors import dot

_MAXLONG = (1 << 62) - 1

# MinHash permutation family: one md5-based hash per shingle, then k affine
# permutations h -> (a*h + b) mod P over the Mersenne prime P = 2^31 - 1.
# One md5 per shingle total (vs k) — the dominant cost at scale. The a/b
# constants are themselves md5-derived so both engines embed identical
# literals.
_MERSENNE_P = (1 << 31) - 1


def _perm_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    a = [(h60(f"{s}A") % (_MERSENNE_P - 1)) + 1 for s in range(num_hashes)]
    b = [h60(f"{s}B") % _MERSENNE_P for s in range(num_hashes)]
    return a, b


def exact_dedup_groups(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups: one row per distinct text hash with the copy
    count and the canonical (minimum-id) survivor. Single hash-shuffle."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
        .orderBy("keep_id")
    )


def _doc_shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, shingles array<string>) for non-empty docs."""
    return docs.select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = 100,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard, found with an
    inverted-index self-join (never an N^2 cross join).

    Jaccard is computed over the capped shingle space (df <= max_df, see
    module docstring). Returns (id_a, id_b, jaccard), id_a < id_b.
    """
    sh = _doc_shingles(docs, id_col, text_col, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    ).persist()  # feeds df-count, sizes, and both sides of the self-join
    cold = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    sh = sh.join(cold, "shingle")  # keep only cold shingles
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _minhash_col(shingles: Column, num_hashes: int) -> Column:
    """array<bigint> of `num_hashes` minhashes — a row-local fold over the
    shingle array: base = hash60(shingle) mod P computed ONCE per shingle,
    then mh[s] = min over shingles of (a_s*base + b_s) mod P. Pure
    expression -> whole-stage codegen, zero shuffle, one md5 per shingle."""
    a_const, b_const = _perm_constants(num_hashes)
    a_arr = F.array(*[F.lit(x) for x in a_const])
    b_arr = F.array(*[F.lit(x) for x in b_const])
    hs = F.transform(shingles, lambda sh: hash60(sh) % F.lit(_MERSENNE_P))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.aggregate(
            hs,
            F.lit(_MAXLONG),
            lambda acc, h: F.least(
                acc,
                (F.element_at(a_arr, s + 1) * h + F.element_at(b_arr, s + 1))
                % F.lit(_MERSENNE_P),
            ),
        ),
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Long-form MinHash signatures: (doc_id, seed, minhash)."""
    sh = _doc_shingles(docs, id_col, text_col, n)
    return (
        sh.select("doc_id", F.posexplode(_minhash_col(F.col("shingles"), num_hashes)).alias("seed", "minhash"))
        .orderBy("doc_id", "seed")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket candidate join, then exact
    Jaccard verification on the candidates only.

    bands * rows == num_hashes; a pair becomes a candidate iff some band of
    `rows` consecutive minhashes matches exactly. Returns
    (id_a, id_b, jaccard) for verified candidates, id_a < id_b.
    """
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    rows = num_hashes // bands
    sh = _doc_shingles(docs, id_col, text_col, n)
    # Persist the signature table: it feeds the band self-join (2 scans) and
    # both verify joins (2 more) — without it Spark re-runs the whole
    # shingle+minhash pipeline per scan. At warehouse scale this is the
    # "write signatures once" step of any LSH pipeline.
    with_mh = sh.select(
        "doc_id", "shingles", _minhash_col(F.col("shingles"), num_hashes).alias("mh")
    ).persist()
    band_sigs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("mh"), j * rows + 1, rows), lambda x: x.cast("string")
                ),
            )
        ),
    )
    banded = with_mh.select(
        "doc_id", F.posexplode(band_sigs).alias("band", "sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = with_mh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = with_mh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - inter).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


_SIMHASH_BITS = 60  # hash60 yields 60-bit values; stay within them


def simhash_col(text: Column | str, bits: int = _SIMHASH_BITS) -> Column:
    """Row-local 60-bit SimHash of the whitespace-token multiset (token
    frequency acts as the weight, the classic Charikar construction):
    bit b is set iff sum over tokens of (+1 if bit b of hash60(token) else
    -1) is positive."""
    toks = tokens_ws(text)
    hs = F.transform(toks, lambda t: hash60(t))
    pows = F.array(*[F.lit(1 << b) for b in range(bits)])
    vote = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            hs,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.element_at(pows, b + 1)) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            vote, pows, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_signatures(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) — row-local, no shuffle at all."""
    return docs.select(
        F.col(id_col).alias("doc_id"), simhash_col(text_col).alias("simhash")
    ).filter(F.size(tokens_ws(F.col(text_col))) > 0).orderBy("doc_id")


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 15-bit
    signature chunks (a pair within Hamming d of a 60-bit signature must
    agree exactly on at least one of 4 chunks whenever d < 4 — the
    standard pigeonhole blocking; for d >= 4 it is a recall-bounded
    approximation, stated in the docs)."""
    chunk_bits = _SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1
    sig = simhash_signatures(docs, id_col=id_col, text_col=text_col)
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), chunk_bits * c).bitwiseAND(F.lit(mask))
            for c in range(n_chunks)
        ]
    )
    blocked = sig.select(
        "doc_id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def embedding_near_dup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_decimals: int = 6,
) -> DataFrame:
    """Exact cosine near-dup pairs over unit vectors: (id_a, id_b, score),
    score = dot >= threshold, id_a < id_b.

    This is the exact baseline (all-pairs); it is the correctness oracle
    for the LSH-blocked variant and is only appropriate when one side fits
    a broadcast. The 100-TB path is the banded/blocked variant (cluster or
    hyperplane blocking) verified against this on samples.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(dot("__va", "__vb"), round_decimals).alias("score")
        )
        .filter(F.col("score") >= threshold)
        .orderBy("id_a", "id_b")
    )
