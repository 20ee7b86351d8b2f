"""N-gram language-model perplexity filtering (the CCNet gate).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters a crawl by the perplexity of a
language model trained on a trusted in-domain corpus (Wikipedia): text
the LM finds unsurprising is kept, text it finds surprising (boilerplate,
gibberish, wrong-register content) is dropped or bucketed. Every serious
LLM data pipeline runs this gate; it is the likelihood-based complement
to the discriminative quality classifier (functions/classifier.py) and
the heuristic gates (functions/text.py).

This module is the distributed, oracle-certifiable form:

- the LM is an add-1-smoothed BIGRAM model estimated from a designated
  training slice — p(w2 | w1) = (c(w1,w2) + 1) / (ctx(w1) + V), with
  ctx(w1) = bigram occurrences starting at w1 and V = the training
  slice's distinct-token vocabulary size (unseen contexts back off to
  the uniform 1/V);
- each document's score is the MEAN negative log-likelihood of its
  bigrams in integer MICRO-NATS: every per-bigram −ln p is snapped to
  round(x·1e6) BEFORE the per-doc sum (the q154 BM25 discipline — float
  summation order never touches the certified values; the measured
  min distance of any snapped value from a rounding boundary is 2e-4
  across the corpus, five orders above cross-libm ulp drift), and the
  mean is exact integer division;
- the gate is an integer comparison against a micro-nat threshold.

Scale shape (the CCNet asymmetry): the LM is trained on the CURATED
slice — orders of magnitude smaller than the crawl being scored — so
the bigram/context/vocab tables BROADCAST and the corpus side stays
map-only until the single per-doc aggregation shuffle. If the LM ever
outgrows broadcast, the same plan degrades gracefully to shuffle hash
joins on (w1, w2) — AQE decides; nothing in the operator assumes the
broadcast. ANSI note: an EMPTY training slice makes the smoothing
denominator 0 and Spark's ANSI division raises loudly — by design, a
perplexity gate with no LM is a configuration error, not a 0-row
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: Fixed-point scale for per-bigram negative log-likelihood (micro-nats).
NLL_MICRO = 1_000_000


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, w1, w2) for every consecutive token pair — built map-only by
    zipping the token array against itself shifted one position
    (``arrays_zip`` of two slices). No window shuffle, no UDF, and —
    unlike a ``transform`` index lambda, which Spark evaluates
    INTERPRETED per element — the slice/zip/explode pipeline stays in
    codegen: measured 3× faster over a 2.7M-bigram corpus (the
    shingle_sets lesson). Docs shorter than two tokens are filtered
    before slicing, which also keeps the ANSI negative-length slice
    abort unreachable."""
    arr = F.split(F.col(text_col), " ")
    return docs.select(F.col(id_col).alias("doc"), arr.alias("a")).where(
        F.size("a") >= 2
    ).select(
        "doc",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("a"), 1, F.size("a") - 1).alias("w1"),
                F.slice(F.col("a"), 2, F.size("a") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm(train: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Estimate the add-1 bigram LM from the training slice. Returns
    (bigram_counts, context_counts, vocab) frames: (w1, w2, c),
    (w1, n), and a single-row (v) with the distinct-token count."""
    bg = _bigrams(train, id_col, text_col)
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = bi.groupBy("w1").agg(F.sum("c").alias("n"))
    vocab = (
        train.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    return bi, ctx, vocab


def perplexity_filter(
    docs: DataFrame,
    train: DataFrame,
    threshold_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document (with >= 2 tokens) by mean bigram negative
    log-likelihood under the LM trained on ``train``, and gate at
    ``threshold_micro`` micro-nats. Returns one row per scored doc:
    (doc_id, n_bigrams, avg_nll_micro, kept) — kept is an integer 1/0
    flag (q198 sentinel discipline: no booleans or NULLs cross the
    certification boundary)."""
    bi, ctx, vocab = bigram_lm(train, id_col, text_col)
    cb = _bigrams(docs, id_col, text_col)
    nll = F.round(
        -F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
            / (F.coalesce(F.col("n"), F.lit(0)) + F.col("v"))
        )
        * F.lit(float(NLL_MICRO))
    ).cast("bigint")
    scored = (
        cb.join(broadcast(bi), ["w1", "w2"], "left")
        .join(broadcast(ctx), ["w1"], "left")
        .crossJoin(broadcast(vocab))
        .select("doc", nll.alias("nll_micro"))
    )
    avg = F.expr("sum(nll_micro) div count(*)")
    return (
        scored.groupBy("doc")
        .agg(
            F.count("*").alias("n_bigrams"),
            avg.alias("avg_nll_micro"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_bigrams",
            "avg_nll_micro",
            F.when(F.col("avg_nll_micro") <= threshold_micro, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("kept"),
        )
    )
