"""Text-analysis column functions for the LLM-data-pipeline layer.

All pure Column expressions (JVM-side, codegen) — no Python UDFs. Designed
so every derived quantity is portable to the ANSI-SQL oracle: tokenization is
an exact single-space split, counts are length arithmetic, hashes are modular
integer arithmetic over corpus-assigned token ids (see operators/dedup.py for
the id assignment; at 100 TB swap the id join for xxhash64 — same pipeline
shape, no global vocabulary needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword list for quality scoring.
STOPWORDS = ("the", "a", "of", "and", "to")

#: Fingerprint modulus: the Mersenne prime 2^31-1. A ~1e6 space would
#: pigeonhole billions of documents' fingerprints into a million identities
#: at corpus scale; 2^31-1 keeps every product/sum on the fingerprint paths
#: inside int64 (docs are ≤ ~1e4 tokens; longer corpora should fold the
#: running mod per term, as `doc_fingerprint`'s aggregate variant does).
FINGERPRINT_MOD = 2_147_483_647

#: Rabin–Karp base for character rolling hashes.
ROLLING_BASE = 257

#: BPE-ish pre-tokenization regex: word runs or single non-space symbols —
#: the usual pre-split a byte-pair tokenizer applies before merges. Same
#: semantics under Java regex (Spark) and RE2 (DuckDB) for ASCII.
BPE_SPLIT_RE = r"\w+|[^\w\s]"


def rolling_hash_powers(max_len: int = 1024) -> list[tuple[int, int]]:
    """(position, ROLLING_BASE^position mod FINGERPRINT_MOD) pairs — the
    shared constant table both the Spark plan (broadcast join) and the SQL
    oracle (VALUES list) consume, so the modular arithmetic is identical."""
    return [(i, pow(ROLLING_BASE, i, FINGERPRINT_MOD)) for i in range(max_len)]


def tokens(text: Column) -> Column:
    """Exact whitespace tokenization (documents corpus is single-spaced)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length = (chars - spaces) / tokens."""
    n = token_count(text)
    return (F.length(F.replace(text, F.lit(" "), F.lit(""))) / n).cast("double")


def stopword_ratio_t(tk: Column) -> Column:
    """`stopword_ratio` over an already-bound token array.  ``tk`` MUST be
    a bound attribute or lambda variable — passing an expression would
    re-evaluate it at every reference (the quadratic-resplit trap the
    bind-once discipline exists to avoid)."""
    hits = F.size(F.filter(tk, lambda t: t.isin(*STOPWORDS)))
    return (hits / F.size(tk)).cast("double")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    return stopword_ratio_t(tokens(text))


def distinct_token_ratio_t(tk: Column) -> Column:
    """`distinct_token_ratio` over an already-bound token array."""
    return (F.size(F.array_distinct(tk)) / F.size(tk)).cast("double")


def distinct_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens (repetition detector)."""
    toks = tokens(text)
    return (F.size(F.array_distinct(toks)) / F.size(toks)).cast("double")


def shingles_t(tk: Column, n: int = 3) -> Column:
    """Word n-gram shingles over an already-bound token array (attribute
    or lambda variable — NOT a bare expression; see `stopword_ratio_t`).

    The size guard matters: Spark's ``sequence(0, size-n)`` would produce
    a *descending* sequence when size < n instead of an empty one."""
    idx = F.when(
        F.size(tk) >= n, F.sequence(F.lit(0), F.size(tk) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, i + j + 1) for j in range(n)]
        ),
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles, space-joined; empty array when < n tokens.

    The token array is bound ONCE as a lambda variable (same pattern as
    bigram_array below): inlining tokens(text) into the per-position
    lambda would re-split the whole text n times PER POSITION —
    quadratic in document length under interpreted HOF evaluation.
    """
    return F.element_at(
        F.transform(F.array(tokens(text)), lambda tk: shingles_t(tk, n)),
        1,
    )


def bigram_array(text: Column, payload=None) -> Column:
    """Bind-once adjacent-bigram array over whitespace tokens; empty array
    when < 2 tokens (``sequence(1, size-1)`` would otherwise DESCEND to
    [1, 0] for one-token docs and ``element_at(tk, 0)`` is always an
    invalid-index error — the same Spark trap ``shingles`` guards).

    The token array is bound ONCE as a lambda variable: referencing
    ``F.split(...)`` inside the per-index lambda would re-inline the full
    split into every element_at — 2·(n−1) splits of the whole text per
    doc. ``payload(tk, i)`` customizes what each position emits (default:
    the space-joined bigram string)."""
    if payload is None:
        payload = lambda tk, i: F.concat_ws(  # noqa: E731
            " ", F.element_at(tk, i), F.element_at(tk, i + 1)
        )

    def indices(tk):
        # the guard sits on the INDEX array so the per-position payload
        # (and its element_at calls) is never evaluated for short docs
        return F.when(
            F.size(tk) >= 2, F.sequence(F.lit(1), F.size(tk) - 1)
        ).otherwise(F.array().cast("array<int>"))

    return F.element_at(
        F.transform(
            F.array(tokens(text)),
            lambda tk: F.transform(indices(tk), lambda i: payload(tk, i)),
        ),
        1,
    )


def quality_score_t(tk: Column) -> Column:
    """`quality_score` over an already-bound token array — bit-identical
    arithmetic (same sub-terms, same order, one final double cast)."""
    n = F.size(tk)
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = (F.size(F.array_distinct(tk)) / n).cast("double")
    stop = (F.size(F.filter(tk, lambda t: t.isin(*STOPWORDS))) / n).cast(
        "double"
    )
    return ((length_term + diversity + (1 - stop)) / 3).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: favors mid-length docs with
    diverse vocabulary and moderate stopword density.

    The token array is bound ONCE (lambda variable) and every sub-metric
    derives from it — the naive composition re-split the text ~4x per
    row (token_count + distinct_token_ratio + stopword_ratio each call
    ``split``, and interpreted HOF paths defeat subexpression
    elimination)."""
    return F.element_at(
        F.transform(F.array(tokens(text)), quality_score_t), 1
    )


def _dup_bp_from_grams(g: Column) -> Column:
    """floor(10000 * duplicate grams / grams) over a bound gram array."""
    total = F.size(g)
    dup = total - F.size(F.array_distinct(g))
    return (
        F.when(total > 0, F.floor(dup * F.lit(10000) / total))
        .otherwise(F.lit(0))
        .cast("long")
    )


def dup_ngram_bp_t(tk: Column, n: int) -> Column:
    """`dup_ngram_bp` over an already-bound token array.

    The gram array is itself bound once as a lambda variable: the naive
    form mentions the full `shingles_t` tree FOUR times (guard, total,
    distinct, denominator), and Catalyst's analyze/optimize cost on these
    interpreted-HOF trees is superlinear in tree size — the 4x inline
    made PLANNING (not execution) the dominant cost of the repetition
    gates (~1.3 s/plan at 3 metrics; execution itself is ~60 ms)."""
    return F.element_at(
        F.transform(F.array(shingles_t(tk, n)), _dup_bp_from_grams), 1
    )


def dup_ngram_bp(text: Column, n: int) -> Column:
    """Duplicate word-n-gram fraction in basis points — the Gopher-style
    repetition gate (Rae et al. 2021, appendix A1.1 "repetition removal"),
    word-level variant: floor(10000 * (grams - distinct grams) / grams),
    0 for docs with fewer than n tokens.

    Integer counts + one IEEE double division (identical in DuckDB), so
    the oracle hash-matches bit-exactly.  Map-only per-doc lambdas — no
    explode, no shuffle; at 100 TB this is scan-bound."""
    return F.element_at(
        F.transform(F.array(tokens(text)), lambda tk: dup_ngram_bp_t(tk, n)),
        1,
    )


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — one
    linear `aggregate` pass with a (prev, run, best) accumulator.  On a
    sorted token array the longest run IS the max token multiplicity."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, w):
        run = F.when(acc["prev"].eqNullSafe(w), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])


def top_token_bp_t(tk: Column) -> Column:
    """`top_token_bp` over an already-bound token array: sort the tokens
    (O(n log n)), then one linear run-length pass — the max run of the
    sorted array is the max multiplicity.  Replaces the old
    count-per-distinct-token inner loop, which was O(distinct x tokens)
    per document (quadratic for repetitive docs — exactly the docs this
    gate exists to catch)."""
    return F.floor(
        _max_run_length(F.sort_array(tk)) * F.lit(10000) / F.size(tk)
    ).cast("long")


def token_chunk_lines(tk: Column, k: int) -> Column:
    """Deterministic k-token line segmentation: the token stream grouped
    into space-joined chunks of k (last chunk partial).  The corpus
    documents carry no newlines, so the Gopher LINE-level gates run over
    this fixed segmentation; a real corpus with newlines feeds
    ``split(text, '\\n')`` to the same downstream metrics."""
    idx = F.when(
        F.size(tk) >= 1,
        F.sequence(F.lit(0), F.floor((F.size(tk) - 1) / k).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tk, i * k + 1, k))
    )


def _top_run_and_elem(sorted_arr: Column) -> Column:
    """struct(best, elem): the longest equal-adjacent run in a SORTED
    array and the element achieving it — ties keep the FIRST maximum,
    which on a sorted array is the lexicographically smallest element
    (the deterministic tie rule the SQL oracle replays)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(None).cast("string").alias("elem"),
    )

    def step(acc, w):
        run = F.when(acc["prev"].eqNullSafe(w), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            F.when(run > acc["best"], w).otherwise(acc["elem"]).alias("elem"),
        )

    return F.aggregate(sorted_arr, acc0, step)


def top_elem_char_bp_t(arr: Column, text: Column) -> Column:
    """Gopher's "fraction of characters in the most common n-gram" gate
    (Rae et al. 2021, A1.1) in basis points over a bound element array
    (word n-grams, or lines): floor(10000 * top multiplicity *
    len(top element) / document chars).  One sort + one linear run pass;
    ties resolve to the smallest element (see `_top_run_and_elem`)."""
    res = F.element_at(
        F.transform(
            F.array(_top_run_and_elem(F.sort_array(arr))),
            lambda a: F.floor(
                a["best"]
                * F.length(a["elem"])
                * F.lit(10000).cast("bigint")
                / F.length(text)
            ),
        ),
        1,
    )
    return (
        F.when((F.size(arr) > 0) & (F.length(text) > 0), res)
        .otherwise(F.lit(0))
        .cast("long")
    )


def dup_elem_char_bp_t(arr: Column, text: Column) -> Column:
    """Gopher's "fraction of characters in duplicated n-grams" gate
    (Rae et al. 2021, A1.1) in basis points over a bound element array:
    every occurrence of an element appearing >= 2 times contributes its
    length; floor(10000 * duplicated chars / document chars).
    Overlapping gram occurrences double-count characters — the paper's
    counting, identical in the SQL oracle, so the bp value may exceed
    10000 for pathologically repetitive docs (both engines agree).  One
    sort + one linear run pass with a (prev, run, dup-chars) fold."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def step(acc, w):
        same = acc["prev"].eqNullSafe(w)
        closed = F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0)).cast("bigint")
        return F.struct(
            w.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["dup"]).otherwise(acc["dup"] + closed).alias(
                "dup"
            ),
        )

    def finish(acc):
        tail = F.when(
            acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0)).cast("bigint")
        return acc["dup"] + tail

    dup_chars = F.aggregate(F.sort_array(arr), acc0, step, finish)
    return (
        F.when(
            (F.size(arr) > 0) & (F.length(text) > 0),
            F.floor(dup_chars * F.lit(10000).cast("bigint") / F.length(text)),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )


def top_token_bp(text: Column) -> Column:
    """Most-frequent-token share in basis points (Gopher's "fraction of
    characters in the most common word" gate, token-count variant):
    floor(10000 * max token multiplicity / tokens).

    The token array is bound ONCE as a lambda variable (the same
    quadratic-resplit trap ``shingles`` documents); see `top_token_bp_t`
    for the linear-pass multiplicity algorithm."""
    return F.element_at(
        F.transform(F.array(tokens(text)), top_token_bp_t), 1
    )


def fingerprint(token_id_positions: Column) -> Column:
    """Order-sensitive document fingerprint over an array of
    ``struct(pos, tid)``: sum((tid+1)*(pos+1)) mod P.  Pure integer
    arithmetic → identical in any SQL engine."""
    return (
        F.aggregate(
            token_id_positions,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc + (x["tid"] + 1) * (x["pos"] + 1)) % FINGERPRINT_MOD,
        )
    ).alias("fingerprint")


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization (regexp_extract_all) — the token-count
    companion to plain whitespace splitting; counts punctuation separately
    from word runs the way byte-pair vocabularies see text."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)


def lang_id_heuristic(text: Column, marker_words: dict[str, tuple[str, ...]]) -> Column:
    """N-gram/marker-word language guess: the language whose marker list
    hits the most tokens; 'und' when nothing matches.

    ``marker_words``: lang → tuple of high-frequency words for that lang.
    Built-in expressions only — at scale this is a scan with no shuffle.
    """
    # LINEAR expression tree: hit counts land in one array and
    # array_position(arr, array_max(arr)) picks the FIRST maximum — the
    # same winner as the old iterate-and-compare chain (ties -> first
    # lang in sorted order), whose nested when(...).otherwise(prev)
    # doubled the tree per language (O(2^n_langs) plan nodes: fine for 5
    # languages, catastrophic for a realistic 25-30-entry marker dict).
    langs = sorted(marker_words.items())
    toks = tokens(text)

    def hit_count(words: tuple[str, ...]):
        # closure (not a default arg): pyspark derives HOF lambda arity
        # from the function signature, so an extra bound parameter would
        # be mistaken for the element-index argument
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    packed = F.array(
        *[
            F.struct(
                hit_count(words).alias("hits"),
                F.lit(-i).alias("negi"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, words) in enumerate(langs)
        ]
    )
    # struct max compares (hits, negi): highest hit count, ties to the
    # LOWEST index — i.e. the first language in sorted order, exactly the
    # old chain's winner
    best = F.array_max(packed)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


#: PII patterns, deliberately restricted to the regex subset Java
#: (Spark) and RE2 (DuckDB) evaluate identically — plain character
#: classes, explicit quantifiers, no \d/\w/\b shorthands, no
#: backtracking constructs. Redaction order matters and is fixed:
#: email first (its domain would otherwise feed the IP pattern), then
#: ip, then phone.
PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4s / phone numbers to typed placeholder tokens —
    the standard pre-training text-cleaning stage, as a pure JVM
    regexp_replace chain (whole-stage codegen, no UDF; at 100 TB this is
    a map-only column rewrite riding whatever scan already runs). The
    pattern subset is dialect-portable by construction (see
    PII_PATTERNS), so a SQL oracle replays every byte."""
    out = text
    for _kind, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> Column:
    """Per-kind match counts BEFORE redaction, as a struct(email, ip,
    phone) — the audit side of `redact_pii` (how much was scrubbed,
    reportable per source/language slice). Counts apply the same
    in-order masking as the redaction chain, so an IP inside an email's
    domain is counted as email only — counts always sum to the number
    of replacements `redact_pii` performs."""
    fields = []
    masked = text
    for kind, pat, token in PII_PATTERNS:
        fields.append(F.regexp_count(masked, F.lit(pat)).alias(kind))
        masked = F.regexp_replace(masked, pat, token)
    return F.struct(*fields)
