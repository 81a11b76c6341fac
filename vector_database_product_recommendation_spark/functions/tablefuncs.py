"""Python UDTFs (user-defined TABLE functions) — the row-expanding UDF
surface (Spark 3.5+), completing the engine's Python boundary set:
scalar pandas_udf (functions/embed.py), mapInPandas kernels
(operators/knn.py), applyInPandasWithState (streaming/events.py), and
here lateral table functions.

Scale notes: a UDTF runs row-local like any map-side UDF — no shuffle,
output partitioning follows input. Use for fan-out shapes (one doc ->
many sentences) where the expansion logic is genuinely procedural;
expression-only fan-outs (sequence + explode, see audio framing) stay
JVM-side and should be preferred when expressible.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence: string, n_words: int")
class SentenceSplit:
    """text -> one row per '. '-delimited sentence with its word count.

    Deterministic and mirrored by the DuckDB oracle (string_split +
    trim + whitespace tokenization), so the UDTF boundary itself is
    value-checked cross-engine.
    """

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for raw in text.split(". "):
            s = raw.strip()
            if s:
                yield s, len(s.split())


@udtf(returnType="chunk_idx: int, chunk: string, n_words: int")
class ChunkWords:
    """Context-window chunking: text -> fixed-size word chunks.

    The training-data fan-out shape (documents -> model-context-sized
    pieces). Whitespace tokenization matches functions/text.py; the last
    chunk may be short. Mirrored by the DuckDB oracle via list slicing.
    """

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        words = text.lower().strip().split()
        for i in range(0, len(words), n):
            piece = words[i : i + n]
            yield i // n, " ".join(piece), len(piece)


def register_udtfs(spark) -> None:
    """Make the UDTFs addressable from spark.sql (idempotent)."""
    spark.udtf.register("sentence_split", SentenceSplit)
    spark.udtf.register("chunk_words", ChunkWords)
