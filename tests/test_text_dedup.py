"""Unit + metamorphic tests for text analysis and dedup operators.

The cross-engine value checks live in the driver oracle (tools/
oracle_check.py); these tests pin the *semantics* on hand-built rows where
the right answer is obvious.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_database_product_recommendation_spark.functions.text import (
    doc_fingerprint,
    hash60,
    lang_id,
    quality_score,
    token_count_regex,
    token_count_ws,
    word_shingles,
)
from vector_database_product_recommendation_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_counts(spark):
    df = _docs(spark, [(1, "Hello,  world! x"), (2, ""), (3, "   ")])
    out = {
        r["doc_id"]: (r["ws"], r["re"])
        for r in df.select(
            "doc_id",
            token_count_ws("text").alias("ws"),
            token_count_regex("text").alias("re"),
        ).collect()
    }
    # "hello," "world!" "x" -> 3 ws tokens; regex: hello , world ! x -> 5
    assert out[1] == (3, 5)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)


def test_lang_id_markers(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog of it"),
            (2, "der hund und die katze ist"),
            (3, "le chat et la maison est"),
            (4, "xyzzy qwerty"),
        ],
    )
    out = {r["doc_id"]: r["l"] for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "und"


def test_fingerprint_order_invariant(spark):
    df = _docs(spark, [(1, "b a c a"), (2, "a b c"), (3, "a b d")])
    out = {r["doc_id"]: r["f"] for r in df.select("doc_id", doc_fingerprint("text").alias("f")).collect()}
    assert out[1] == out[2]  # same distinct token set
    assert out[1] != out[3]


def test_quality_score_range(spark):
    df = _docs(spark, [(1, "the quick brown fox jumps over a lazy dog today ok"), (2, "x")])
    out = {r["doc_id"]: r["q"] for r in df.select("doc_id", quality_score("text").alias("q")).collect()}
    assert out[1] == 1.0
    assert 0.0 <= out[2] < 1.0


def test_word_shingles_short_doc(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b c d")])
    out = {r["doc_id"]: sorted(r["s"]) for r in df.select("doc_id", word_shingles("text").alias("s")).collect()}
    assert out[1] == ["a b"]  # shorter than n -> whole text
    assert out[2] == ["a b c", "b c d"]


def test_hash60_positive_and_stable(spark):
    rows = spark.range(1).select(hash60(F.lit("7|foo bar baz")).alias("h")).collect()
    assert rows[0]["h"] == 46699026325707782  # cross-checked against DuckDB


def test_exact_dedup_groups(spark):
    df = _docs(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(df).collect()}
    assert out == {1: 2, 3: 1}


def test_near_dup_family_finds_planted_pair(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, base),
        (2, base + "lambda"),  # near-dup of 1
        (3, "totally different words entirely unrelated content here now"),
    ]
    df = _docs(spark, rows)
    jac = ngram_jaccard_pairs(df, threshold=0.5)
    assert [(r["id_a"], r["id_b"]) for r in jac.collect()] == [(1, 2)]
    lsh = minhash_lsh_pairs(df, threshold=0.5)
    assert [(r["id_a"], r["id_b"]) for r in lsh.collect()] == [(1, 2)]


def test_simhash_pairs_identical_docs_blocked_join(spark):
    # identical docs -> hamming 0, must be found through the chunk blocking;
    # an unrelated doc must not pair up. (A one-token edit on a short doc
    # legitimately flips ~5-8 of 60 bits, so near-dup recall at small
    # max_hamming is only meaningful on longer documents — covered by the
    # sf0.01 oracle check with its planted near-dups.)
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "totally different words entirely unrelated content here now"),
        ],
    )
    out = [(r["id_a"], r["id_b"], r["hamming"]) for r in simhash_pairs(df, max_hamming=3).collect()]
    assert out == [(1, 2, 0)]


def test_simhash_identical_docs_same_sig(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d e"), (3, "q r s t u")])
    out = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert all(0 <= v < (1 << 60) for v in out.values())


def test_embedding_near_dup(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = embedding_near_dup(emb, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"], r["score"]) for r in out] == [(1, 2, 1.0)]


def test_embedding_lsh_blocked_matches_exact_on_planted_dups(spark):
    import numpy as np

    from vector_database_product_recommendation_spark.operators.dedup import (
        embedding_near_dup_lsh,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        if i % 4 == 0:  # plant a near-duplicate of every 4th vector
            w = v + rng.normal(scale=0.02, size=64)
            w /= np.linalg.norm(w)
            rows.append((1000 + i, w.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(emb, threshold=0.95).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_lsh(emb, threshold=0.95).collect()}
    assert lsh <= exact                      # precision exact by construction
    assert len(exact) >= 10
    assert len(lsh) / len(exact) >= 0.9      # SRP recall at near-dup cosine


def test_text_functions_property_fuzz(spark):
    """Property fuzz (hypothesis): for arbitrary printable strings, the
    Column-expression text ops agree with their plain-Python definitions
    and stay in range."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts_acc = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=st.characters(codec="ascii", exclude_categories=("Cc",)), max_size=80))
    def collect(t):
        texts_acc.append(t)

    collect()
    rows = [(i, t) for i, t in enumerate(texts_acc)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        token_count_ws("text").alias("n"),
        quality_score("text").alias("q"),
        doc_fingerprint("text").alias("f"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    for i, t in rows:
        r = by_id[i]
        assert r["n"] == len(t.lower().split())
        assert 0.0 <= r["q"] <= 1.0
        import hashlib as _h

        expect = _h.md5(" ".join(sorted(set(t.lower().split()))).encode()).hexdigest()
        assert r["f"] == expect


def test_corpus_prep_funnel_monotone(spark, sf_dir):
    from vector_database_product_recommendation_spark.operators.corpus import corpus_prep_pipeline

    rows = {r["stage"]: r for r in corpus_prep_pipeline(spark, sf_dir).collect()}
    assert set(rows) == {"raw", "lang_quality_gate", "fingerprint_dedup"}
    assert rows["raw"]["n_docs"] >= rows["lang_quality_gate"]["n_docs"] >= rows["fingerprint_dedup"]["n_docs"]
    assert rows["fingerprint_dedup"]["n_docs"] > 0
    assert rows["raw"]["total_tokens"] >= rows["lang_quality_gate"]["total_tokens"]


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al. guarantee: two documents sharing a token run of
    length >= w + k - 1 (= 8 for k=4, w=5) share at least one
    fingerprint; disjoint-vocabulary documents share none."""
    from vector_database_product_recommendation_spark.operators.dedup import winnow_fingerprints_df

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (0, f"intro words here {shared} closing remarks"),
        (1, f"{shared} completely different tail content"),
        (2, "unrelated vocabulary entirely separate tokens nine ten eleven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints_df(docs).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1]  # shared run -> shared fingerprint
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_winnowing_short_doc_fingerprint(spark):
    from vector_database_product_recommendation_spark.operators.dedup import winnow_fingerprints_df

    docs = spark.createDataFrame(
        [(0, "one two three"), (1, "one two three")], "doc_id long, text string"
    )
    fp = winnow_fingerprints_df(docs).collect()
    assert len(fp) == 2  # one whole-stream fingerprint each
    assert fp[0]["fp"] == fp[1]["fp"]


def test_connected_components_transitive(spark):
    from vector_database_product_recommendation_spark.operators.dedup import connected_components

    # chain 1-2, 2-3 plus isolated 4: {1,2,3} share min-label 1, 4 stays alone
    verts = spark.createDataFrame([(1,), (2,), (3,), (4,)], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: r["component_id"] for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_dedup_components_keeps_min_id(spark):
    from vector_database_product_recommendation_spark.operators.dedup import dedup_components

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, base),
        (11, base + " lambda"),          # near-dup of 10
        (12, base + " lambda mu"),       # near-dup of 11 (chains to 10)
        (20, "totally different words one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["component_id"], r["is_kept"]) for r in dedup_components(docs).collect()}
    assert out[10] == (10, True)
    assert out[11][0] == 10 and out[11][1] is False
    assert out[12][0] == 10 and out[12][1] is False
    assert out[20] == (20, True)


def test_repetition_signals_extremes(spark):
    from vector_database_product_recommendation_spark.operators.quality import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # fully repetitive
            (2, "one two three four"),            # fully unique
            (3, "solo"),                          # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert got[1]["top_token_frac"] == 1.0 and got[1]["dup_bigram_frac"] == 1.0
    assert got[1]["unique_token_ratio"] == 0.25
    assert got[2]["top_token_frac"] == 0.25 and got[2]["dup_bigram_frac"] == 0.0
    assert got[2]["unique_token_ratio"] == 1.0
    assert got[3]["n_tokens"] == 1 and got[3]["dup_bigram_frac"] == 0.0


def test_embedding_near_dup_guard_raises_beyond_max_rows(spark):
    """The exact all-pairs path collects the corpus to the driver — it must
    refuse large inputs and point to the LSH scale path (VERDICT r01 #6)."""
    emb = spark.range(6).select(
        F.col("id").cast("int").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        embedding_near_dup(emb, max_rows=5)
    # at or under the cap it still runs
    assert embedding_near_dup(emb, max_rows=6).count() > 0
