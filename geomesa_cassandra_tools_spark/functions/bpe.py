"""Byte-Pair Encoding: deterministic distributed TRAIN + ENCODE.

The r11 text surface tokenized with a BPE-ish regex stand-in
(`functions/text.py` `bpe_tokens`); this module is the real algorithm
(Sennrich 2016), built so a SQL engine can replay it bit-for-bit:

- the symbol state is a RELATIONAL table (keys..., pos, sym), never a
  driver-side list — one row per symbol occurrence, renumbered 1..n per
  word after every merge;
- each training iteration is (a) one adjacent-pair count (window lead +
  hash agg, weighted by word frequency), (b) one deterministic argmax
  (count DESC, left ASC, right ASC), (c) one merge application;
- merge application is the classic left-to-right non-overlapping pass,
  expressed as GAPS-AND-ISLANDS PARITY: candidate positions (sym = a,
  next = b) that sit at consecutive positions form an island (only
  possible chains are a == b runs), and the kept candidates are the
  island's even offsets — exactly what a sequential scanner keeps. The
  absorbed right-hand rows drop, survivors renumber.

Both sides of the differential run this same relational algorithm: the
DuckDB oracle (oracles.py `_bpe_train_sql`) is the identical chain of
window CTEs, so merge tables and token ids bit-match with no float
discipline at all (everything is strings and integer counts).

Determinism contract (mirrored in the oracle): vocab = top-V words by
(count DESC, word ASC); argmax tie-break (count DESC, left ASC,
right ASC); characters via substring(word, i, 1) — identical UTF-8
semantics in Spark and DuckDB.

Scale: the state table is O(corpus symbol occurrences) rows,
partitioned by word — every window runs inside one word's partition
group, every count is a partial-agg shuffle. Training normally runs on
a frequency-capped vocab (top-V distinct words), so iterations touch
V·avg_len rows no matter how big the corpus that produced the counts;
encoding is the same window pass over (doc, word) keys, M map-side
stages over the slice being encoded. The per-iteration driver step
collects ONE row (the argmax merge) — the Lloyd's-centroid pattern.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def word_vocab(docs: DataFrame, top_v: int) -> DataFrame:
    """Top-``top_v`` whitespace words by (count DESC, word ASC) with
    their corpus frequencies — the BPE training vocabulary."""
    w = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.length("word") > 0)
    counts = w.groupBy("word").agg(F.count("*").alias("wcount"))
    return (
        counts.orderBy(F.col("wcount").desc(), F.col("word"))
        .limit(top_v)
    )


def char_seqs(words: DataFrame, keys: list[str]) -> DataFrame:
    """Explode each word into its initial character-symbol rows:
    (*keys, pos 1.., sym). ``words`` must carry a ``word`` column;
    ``keys`` are the identity columns carried through training/encoding
    (["word"] for train, ["doc_id", "widx", "word"] for encode)."""
    return words.select(
        *keys,
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), "
                   "i -> substring(word, i, 1))")
        ).alias("__p", "sym"),
    ).select(*keys, (F.col("__p") + 1).alias("pos"), "sym")


def pair_counts(seqs: DataFrame, keys: list[str],
                weight: str | None) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol state:
    (left, right, cnt), weighted by ``weight`` (the word frequency)
    when given."""
    w = Window.partitionBy(*keys).orderBy("pos")
    pairs = seqs.withColumn("nxt", F.lead("sym").over(w)).where(
        F.col("nxt").isNotNull()
    )
    agg = (
        F.sum(weight).cast("bigint") if weight else F.count("*")
    )
    return pairs.groupBy(
        F.col("sym").alias("left"), F.col("nxt").alias("right")
    ).agg(agg.alias("cnt"))


def apply_merge(
    seqs: DataFrame, keys: list[str], left: str, right: str
) -> DataFrame:
    """One left-to-right non-overlapping merge pass of (left, right) ->
    left||right; survivors renumber 1..n per key group.

    JOIN-FREE and SINGLE-PARTITIONING: every window partitions by
    ``keys`` alone — candidate flag via lead(), run starts via
    lag(cand), the island offset as pos minus the last run-start pos
    (running last_value, positions are consecutive integers so
    candidate runs are pos-contiguous), keep = even offset, absorbed =
    lag(keep). A chain of M applications is ONE shuffle on the keys
    followed by in-partition sorts — no self-joins, linear analysis.
    Selection order is exactly the oracle's island-parity CTE chain."""
    w = Window.partitionBy(*keys).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (
        seqs.withColumn("nxt", F.lead("sym").over(w))
        .withColumn(
            "cand",
            F.coalesce(
                (F.col("sym") == F.lit(left))
                & (F.col("nxt") == F.lit(right)),
                F.lit(False),
            ),
        )
        .withColumn(
            "rstart",
            F.col("cand")
            & ~F.coalesce(F.lag("cand").over(w), F.lit(False)),
        )
        .withColumn(
            "rpos",
            F.last(
                F.when(F.col("rstart"), F.col("pos")), ignorenulls=True
            ).over(run),
        )
        .withColumn(
            "keep",
            F.col("cand") & ((F.col("pos") - F.col("rpos")) % 2 == 0),
        )
        # the absorbed right-hand row of each kept candidate drops
        .withColumn(
            "absorbed",
            F.coalesce(F.lag("keep").over(w), F.lit(False)),
        )
    )
    return c.where(~F.col("absorbed")).select(
        *keys,
        F.row_number().over(w).alias("pos"),
        F.when(
            F.col("keep"), F.concat(F.col("sym"), F.col("nxt"))
        ).otherwise(F.col("sym")).alias("sym"),
    )


def train(
    spark: SparkSession,
    docs: DataFrame,
    top_v: int,
    n_merges: int,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges from the top-``top_v`` word vocab
    of ``docs``. Returns (merges, final symbol state); each merge is
    ``{"step", "left", "right", "cnt"}``. The per-iteration argmax is
    a ONE-ROW collect (the Lloyd's-centroid discipline: k-bounded,
    deterministic); the symbol state persists per round and the
    previous round unpersists, so lineage stays O(1) per iteration."""
    vocab = word_vocab(docs, top_v)
    seqs = char_seqs(vocab.select("word", "wcount"), ["word", "wcount"])
    # persist per round: the per-iteration argmax is an action, and
    # without a materialization each iteration would recompute the
    # whole chain (O(M^2) total work). apply_merge is join-free, so
    # the lineage stays LINEAR and analysis O(1) per round.
    seqs = seqs.persist()
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(seqs, ["word", "wcount"], "wcount")
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word is a single symbol — nothing to merge
        m = top[0]
        merges.append(
            {"step": step, "left": m["left"], "right": m["right"],
             "cnt": m["cnt"]}
        )
        nxt_state = apply_merge(
            seqs, ["word", "wcount"], m["left"], m["right"]
        ).persist()
        nxt_state.count()  # materialize before releasing the parent
        seqs.unpersist()
        seqs = nxt_state
    return merges, seqs


def encode(
    seqs: DataFrame, keys: list[str], merges: list[dict]
) -> DataFrame:
    """Apply learned merges IN TRAINING ORDER to a fresh symbol state
    (the BPE encode rule). ``seqs`` is a `char_seqs` frame over the
    text to tokenize; returns the final (keys..., pos, sym) rows."""
    out = seqs
    for m in merges:
        out = apply_merge(out, keys, m["left"], m["right"])
    return out  # one linear plan: a single shuffle on the keys


def encode_words(
    words: DataFrame, merges: list[dict],
    word_col: str = "word", out_col: str = "toks",
) -> DataFrame:
    """MAP-ONLY BPE encode: each word becomes its token ARRAY by one
    left-fold per merge applied in training order, no window, no
    shuffle — the scan-shaped encode path for bulk tokenization (the
    relational `encode` is the window twin the training oracle replays).

    The fold is value-identical to the left-to-right non-overlapping
    pass: merge when the accumulator's last element is ``left`` and the
    incoming symbol is ``right``. A just-merged token can never
    re-trigger the same merge spuriously (``left+right == left`` would
    need an empty ``right``), so no just-merged flag is needed — the
    q197 hash pins this equivalence against the island-parity oracle,
    and tests/test_operators.py pins it against the relational window
    path per word.

    Implementation (r14, guide §4.2/§4.5): an Arrow-batched iterator
    UDF with a per-task MEMO keyed on the word. The previous form — M
    nested interpreted `aggregate` HOFs, each step copying the
    accumulator array — re-encoded every OCCURRENCE of every word and
    dominated q197/q200 in per-task expression-interpreter work; word
    frequencies are Zipfian, so the memo collapses the work to one
    encode per DISTINCT word per task, and a substring pre-check skips
    merges that cannot occur in the word at all (symbols are contiguous
    substrings of the word, so adjacent symbols ``left``,``right``
    imply ``left+right`` is a substring). Only the word column crosses
    the Python boundary (§4.1); the pure-Python fold is bit-exact —
    strings and list ops only, no floats. The q180 lesson (per-task
    PREP of the giant HOF tree dominating) goes away with the tree."""
    mt = [(m["left"], m["right"], m["left"] + m["right"]) for m in merges]

    @F.pandas_udf("array<string>")
    def _enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            hit = memo.get(w)
            if hit is not None:
                return hit
            syms: list[str] = list(w)
            for lf, rf, mg in mt:
                if mg not in w:
                    continue  # left+right never adjacent in this word
                out: list[str] = []
                append = out.append
                for x in syms:
                    if out and out[-1] == lf and x == rf:
                        out[-1] = mg
                    else:
                        append(x)
                syms = out
            memo[w] = syms
            return syms

        for s in batches:
            yield s.map(enc)

    return words.withColumn(out_col, _enc(F.col(word_col)))
