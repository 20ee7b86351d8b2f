"""Property-based certification of the data-skipping layer's ONE invariant:
pruning must be a SUPERSET of the truth — `_file_survives` may keep a file
with no matches (the refine handles it) but must NEVER drop a file that
contains a matching value. Random decimals/ints/floats/timestamps with
deliberately float-collapsing precision exercise the directed-rounding and
domain-tag fixes; truth is evaluated in exact Decimal / integer arithmetic.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_cassandra_tools_spark.operators import transactional as tx

# decimals around 0.1/0.2-style float-collapse zones, 20 fractional digits
decimals = st.decimals(
    min_value=Decimal("-2"), max_value=Decimal("2"),
    allow_nan=False, allow_infinity=False, places=20,
)
ints = st.integers(min_value=-10**12, max_value=10**12)


def _span_from(values, side_norm):
    lo = min(values)
    hi = max(values)
    return [side_norm(lo, "lo"), side_norm(hi, "hi")]


def _truth_any(values, op, lit):
    if op == "=":
        return any(v == lit for v in values)
    if op == "<":
        return any(v < lit for v in values)
    if op == "<=":
        return any(v <= lit for v in values)
    if op == ">":
        return any(v > lit for v in values)
    if op == ">=":
        return any(v >= lit for v in values)
    if op == "between":
        a, b = lit
        return any(a <= v <= b for v in values)
    raise AssertionError(op)


OPS = ["=", "<", "<=", ">", ">=", "between"]


@settings(max_examples=300, deadline=None)
@given(
    values=st.lists(decimals, min_size=1, max_size=8),
    lit=decimals,
    lit2=decimals,
    op=st.sampled_from(OPS),
)
def test_decimal_pruning_is_conservative(values, lit, lit2, op):
    span = _span_from(values, tx._norm_stat)
    pred_lit = (min(lit, lit2), max(lit, lit2)) if op == "between" else lit
    if _truth_any(values, op, pred_lit):
        assert tx._file_survives({"d": span}, ("d", op, pred_lit))


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(ints, min_size=1, max_size=8),
    lit=ints,
    lit2=ints,
    op=st.sampled_from(OPS),
)
def test_int_pruning_is_conservative(values, lit, lit2, op):
    span = _span_from(values, tx._norm_stat)
    pred_lit = (min(lit, lit2), max(lit, lit2)) if op == "between" else lit
    if _truth_any(values, op, pred_lit):
        assert tx._file_survives({"k": span}, ("k", op, pred_lit))


aware_ts = st.datetimes(
    min_value=datetime.datetime(2000, 1, 1),
    max_value=datetime.datetime(2040, 1, 1),
).map(lambda d: d.replace(tzinfo=datetime.timezone.utc))
offsets = st.integers(min_value=-12, max_value=12).map(
    lambda h: datetime.timezone(datetime.timedelta(hours=h))
)


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(aware_ts, min_size=1, max_size=6),
    lit=aware_ts,
    off=offsets,
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
)
def test_instant_pruning_is_offset_invariant_and_conservative(values, lit, off, op):
    """Aware stats + an aware literal rendered in ANY zone offset: the
    pruning verdict must match the UTC rendering and stay conservative."""
    span = [tx._norm_stat(min(values), "lo"), tx._norm_stat(max(values), "hi"),
            "instant"]
    shifted = lit.astimezone(off)  # same instant, different rendering
    v_utc = tx._file_survives({"ts": span}, ("ts", op, lit))
    v_off = tx._file_survives({"ts": span}, ("ts", op, shifted))
    assert v_utc == v_off
    if _truth_any(values, op, lit):
        assert v_utc


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(aware_ts, min_size=1, max_size=6),
    naive=st.datetimes(
        min_value=datetime.datetime(2000, 1, 1),
        max_value=datetime.datetime(2040, 1, 1),
    ),
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
)
def test_naive_literal_never_prunes_instant_span(values, naive, op):
    span = [tx._norm_stat(min(values), "lo"), tx._norm_stat(max(values), "hi"),
            "instant"]
    assert tx._file_survives({"ts": span}, ("ts", op, naive))


# ---------------------------------------------------------------------------
# Null-count skipping (r8): conservativeness over random null layouts
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        min_size=1, max_size=12,
    ),
    known=st.booleans(),
    op=st.sampled_from(["isnull", "isnotnull"]),
)
def test_nullcount_pruning_is_conservative(vals, known, op):
    """Whatever the null layout, a file containing a satisfying row is
    NEVER dropped; unknown counts always keep."""
    n_null = sum(1 for v in vals if v is None)
    non_null = [v for v in vals if v is not None]
    span = [min(non_null), max(non_null)] if non_null else None
    col_stats = {"k": span}
    if known:
        col_stats["__nulls__"] = {"k": n_null}
        col_stats["__rows__"] = len(vals)
    truth = n_null > 0 if op == "isnull" else len(non_null) > 0
    kept = tx._file_survives(col_stats, ("k", op, None))
    if truth:
        assert kept  # the invariant: matching file must survive
    if not known:
        assert kept  # unknown counts never prune
