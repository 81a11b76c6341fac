"""Query-scoped persist lifetimes (guide section 5: unpersist when done).

Several composite queries persist an intermediate that feeds two or more
consumers inside the SAME query (LSH signature tables, winnowing
fingerprints, the hybrid-search sparse scores). Those persists are
QUERY-LOCAL: nothing outside the one invocation ever reads them — but a
bare ``.persist()`` has no release point, so a long bench session pins a
fresh copy per invocation (bounded only by LRU eviction; r21 verdict
item 5).

The contract: operators mark such intermediates with :func:`pin`; the
registry wrapper calls :func:`release_pins` as each new query begins, so
at any moment at most ONE query's pins are cached. Release happens at the
START of the next query (not at return) because queries return lazy
DataFrames — the pins must survive until the caller materializes the
result.

Artifact-lifetime persists (fitted TF-IDF tables, the IVF assignment,
encoded documents, PQ codes) are NOT pins: they are session-scoped by
design and torn down by ``artifacts.clear()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINS: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist a query-local intermediate; released when the next registry
    query begins."""
    df = df.persist()
    _PINS.append(df)
    return df


def release_pins() -> None:
    """Unpersist every pinned intermediate from the previous query."""
    while _PINS:
        df = _PINS.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def pinned_count() -> int:
    """How many query-local pins are currently live (tests)."""
    return len(_PINS)
