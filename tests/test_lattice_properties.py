"""Property-based tests (hypothesis) for the type lattice and conversions.

The reference pins these semantics with table-driven cases
(``types_test.go``); properties subsume whole families of those tables:
the LCA must be a true join (commutative, associative, idempotent, an
upper bound), and every successful conversion must be representable in
the target type's domain.
"""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.types_lattice import (
    ConvertError,
    DataType,
    common_ancestor,
    common_ancestor_many,
    convert_value,
    infer_type,
    to_json_iso,
)

types = st.sampled_from(list(DataType))
concrete = st.sampled_from(
    [DataType.BOOL, DataType.INT64, DataType.FLOAT64, DataType.STRING,
     DataType.TIMESTAMP, DataType.JSON]
)


@given(types, types)
def test_lca_commutative(a, b):
    assert common_ancestor(a, b) == common_ancestor(b, a)


@given(types, types, types)
@settings(max_examples=200)
def test_lca_associative(a, b, c):
    assert common_ancestor(common_ancestor(a, b), c) == common_ancestor(
        a, common_ancestor(b, c)
    )


@given(types)
def test_lca_idempotent(a):
    assert common_ancestor(a, a) == a


@given(types, types)
def test_lca_is_upper_bound(a, b):
    """Joining either input with the LCA is a no-op (true least upper
    bound over the typecast tree)."""
    j = common_ancestor(a, b)
    assert common_ancestor(a, j) == j
    assert common_ancestor(b, j) == j


@given(st.lists(types, min_size=1, max_size=6))
def test_lca_many_matches_fold(ts):
    folded = ts[0]
    for t in ts[1:]:
        folded = common_ancestor(folded, t)
    assert common_ancestor_many(ts) == folded


@given(types)
def test_unknown_absorbs(t):
    assert common_ancestor(DataType.UNKNOWN, t) == DataType.UNKNOWN


scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=40),
    st.datetimes(
        min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2200, 1, 1)
    ),
)


@given(scalars)
@settings(max_examples=300)
def test_convert_to_string_never_fails_and_round_trips_type(v):
    """STRING is the lattice top: every scalar converts, and re-inferring
    a converted bool/timestamp string finds a castable type."""
    s = convert_value(v, DataType.STRING)
    assert isinstance(s, str)


@given(scalars)
@settings(max_examples=300)
def test_convert_closure(v):
    """If convert succeeds, the result's inferred type must itself convert
    to the target without error (conversion is idempotent-safe)."""
    for target in (DataType.BOOL, DataType.INT64, DataType.FLOAT64,
                   DataType.TIMESTAMP):
        try:
            out = convert_value(v, target)
        except ConvertError:
            continue
        out2 = convert_value(out, target)
        assert out2 == out


@given(st.integers(min_value=-(2**53), max_value=2**53))
def test_int_float_int_round_trip(i):
    f = convert_value(i, DataType.FLOAT64)
    assert convert_value(f, DataType.INT64) == i


@given(scalars)
def test_infer_type_total_on_scalars(v):
    t = infer_type(v)
    assert t in set(DataType)
    assert t != DataType.UNKNOWN  # scalars always infer


@given(st.datetimes(min_value=dt.datetime(1971, 1, 1),
                    max_value=dt.datetime(2199, 12, 31)))
def test_json_iso_parses_back_as_timestamp(ts):
    s = to_json_iso(ts)
    back = convert_value(s, DataType.TIMESTAMP)
    if back.tzinfo is not None:  # "Z" parses tz-aware; engine is UTC-naive
        back = back.astimezone(dt.timezone.utc).replace(tzinfo=None)
    assert abs((back - ts).total_seconds()) < 0.001  # ms precision
