"""Python user-defined TABLE functions (Spark 4 `@udtf`) — the
row-expanding escape hatch of the UDF surface.

The engine's rule stands: hot paths are JVM expressions or Arrow-batched
kernels, never row-at-a-time Python. A UDTF is the one shape the other
escape hatches don't cover — a function whose OUTPUT is a relation
(lateral-joinable, SQL-addressable by name), for logic genuinely outside
Column algebra. `GramWindows` is the reference instance: it reproduces
exactly the JVM `transform`-over-index-sequence window builder that
`dedup.shared_run_pairs` uses in production (the unit pins row-for-row
equivalence), so the pair documents both the API and the cost choice —
same semantics, one ~10-100× faster. Register with `register(spark)` and
use from SQL as ``... t, LATERAL gram_windows(t.text, 5) g``.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class GramWindows:
    """All ``w``-token consecutive windows of a whitespace-tokenized
    text, with their 1-based start position — the q155 window builder as
    a table function. Texts shorter than ``w`` yield no rows (matching
    the JVM builder's size guard)."""

    def eval(self, text: str, w: int):
        if text is None or w is None or w < 1:
            return
        toks = text.split(" ")
        for i in range(len(toks) - w + 1):
            yield i + 1, " ".join(toks[i : i + w])


def register(spark) -> None:
    """Make the table functions SQL-addressable (idempotent)."""
    spark.udtf.register("gram_windows", GramWindows)
