"""Python UDTF surface: lateral fan-out correctness and composability."""

from __future__ import annotations

from vector_database_product_recommendation_spark.functions.tablefuncs import register_udtfs
from vector_database_product_recommendation_spark.sources.tables import load_table, register_views

SF_DIR = "/root/testdata/sf0.001"


def test_chunk_words_reassembles_to_source(spark):
    register_views(spark, SF_DIR, "documents")
    register_udtfs(spark)
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_words
        FROM documents d, LATERAL chunk_words(d.text, 25) c
        """
    ).collect()
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_DIR, "documents").collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in docs.items() if t.strip()}
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        # chunks partition the token stream exactly
        rejoined = " ".join(r["chunk"] for r in rs).split()
        assert rejoined == docs[doc].lower().strip().split()
        assert all(r["n_words"] == 25 for r in rs[:-1])
        assert 1 <= rs[-1]["n_words"] <= 25


def test_sentence_split_drops_empties(spark):
    register_udtfs(spark)
    got = spark.sql(
        "SELECT * FROM sentence_split('one two. . three four five.  ')"
    ).collect()
    # '. '-split consumes both separators and the trailing '.  ' pair;
    # the empty middle segment and trailing whitespace are dropped
    assert [(r["sentence"], r["n_words"]) for r in got] == [
        ("one two", 2),
        ("three four five", 3),
    ]
