"""JVM fast-path ingest (ingest_fast.py) — equivalence with the Python
path, engagement/fallback triggers, and rescue semantics.

The load-bearing test is the property: over randomized FLAT events
(ints, plain floats, strings, timestamps, booleans, nulls, scalar
arrays) the fast path and the Python path must produce the same header
(names, order, types) and the same rows. `_unmapped_data` blobs are
compared PARSED: JSON object key order and float spelling are not
semantically meaningful, and the two paths legitimately order rescue
keys differently (documented in ingest_fast.py).
"""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import bulker_spark.ingest as ingest_mod
from bulker_spark.ingest import (
    infer_header_distributed,
    ingest_json,
    normalize_json_df,
)
from bulker_spark.ingest_fast import fast_infer_header, fast_normalize
from bulker_spark.schema import unify_with_existing

keys = st.sampled_from(["a", "b", "c", "timestamp", "long_name_col"])
plain_float = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
).map(lambda f: round(f, 4))
ts_text = st.sampled_from(
    [
        "2024-01-02T03:04:05Z",
        "2024-01-02 03:04:05",
        "2024-03-04",
        "2024-01-02T03:04:05.123456+02:00",
        "definitely not a timestamp",
        "2024-13-45T99:99:99Z",  # looks right by length, fails parsing
    ]
)
scalar = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.booleans(),
    st.text(alphabet="xyzé \"\\", max_size=8),
    plain_float,
    ts_text,
    st.none(),
)
leaf = st.one_of(scalar, st.lists(scalar, max_size=3))
event = st.dictionaries(keys, leaf, min_size=1, max_size=5)


def _python_path(spark, jdf, existing=None):
    header = infer_header_distributed(jdf)
    unified, _ = unify_with_existing(existing, header, None)
    return normalize_json_df(jdf, unified), unified


def _rows_comparable(rows):
    out = []
    for r in rows:
        d = dict(r.asDict())
        blob = d.pop("_unmapped_data", None)
        d["_unmapped_data"] = (
            json.loads(blob) if blob is not None else None
        )
        out.append(json.dumps(d, sort_keys=True, default=str))
    return sorted(out)


@settings(max_examples=20, deadline=None)
@given(st.lists(event, min_size=1, max_size=4))
def test_fast_path_matches_python_path(spark, events):
    jdf = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    )
    fb = fast_infer_header(jdf)
    if fb is None:  # e.g. all-empty objects — fast path declines, fine
        return
    py_df, py_unified = _python_path(spark, jdf)
    assert [
        (s.name, s.data_type) for s in fb.header.columns.values()
    ] == [
        (s.name, s.data_type)
        for s in infer_header_distributed(jdf).columns.values()
    ]
    unified, _ = unify_with_existing(None, fb.header, None)
    fast_df = fast_normalize(jdf, fb, unified)
    if fast_df is None:
        # outside the conversion table (e.g. STRING target with numeric
        # members) — fallback is legitimate, equivalence not claimed
        return
    assert fast_df.columns == py_df.columns
    assert _rows_comparable(fast_df.collect()) == _rows_comparable(
        py_df.collect()
    )


def _jdf(spark, events):
    return spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    )


def test_engages_on_flat_batch(spark):
    ingest_json(
        spark,
        _jdf(spark, [{"pk": 1, "user": "u", "score": 1.5, "ok": True}]),
    )
    assert ingest_mod.last_ingest_path == "jvm"


def test_falls_back_on_nested(spark):
    df, header = ingest_json(
        spark, _jdf(spark, [{"a": {"b": 1}, "c": 2}])
    )
    assert ingest_mod.last_ingest_path == "python"
    assert [r["a_b"] for r in df.collect()] == [1]


def test_falls_back_on_type_hint(spark):
    df, header = ingest_json(
        spark, _jdf(spark, [{"a": 1, "__sql_type_a": "json"}])
    )
    assert ingest_mod.last_ingest_path == "python"


def test_falls_back_on_duplicate_keys(spark):
    jdf = spark.createDataFrame(
        [('{"a": 1, "a": 2}',)], "value string"
    )
    df, header = ingest_json(spark, jdf)
    assert ingest_mod.last_ingest_path == "python"
    assert [r["a"] for r in df.collect()] == [2]  # last wins, like dict


def test_falls_back_on_case_transform(spark):
    ingest_json(spark, _jdf(spark, [{"A": 1}]), case="lower")
    assert ingest_mod.last_ingest_path == "python"


def test_jvm_header_python_normalize_on_mixed_string_column(spark):
    # column with both a number and a string widens to STRING — numeric
    # rendering is outside the proven table, so normalize falls back but
    # the JVM header is kept
    df, header = ingest_json(
        spark, _jdf(spark, [{"a": 1}, {"a": "x"}])
    )
    assert ingest_mod.last_ingest_path == "jvm-header"
    assert sorted(r["a"] for r in df.collect()) == ["1", "x"]


def test_int64_rescue_non_integral_float(spark):
    from bulker_spark.types_lattice import DataType

    jdf = _jdf(spark, [{"a": 2.5}, {"a": 3}, {"a": 4.0}])
    fb = fast_infer_header(jdf)
    unified, _ = unify_with_existing({"a": DataType.INT64}, fb.header, None)
    fast_df = fast_normalize(jdf, fb, unified)
    assert fast_df is not None
    key = lambda t: (t[0] is None, t)  # noqa: E731
    rows = sorted(
        ((r["a"], r["_unmapped_data"]) for r in fast_df.collect()), key=key
    )
    assert rows == [
        (3, None),
        (4, None),  # 4.0 is integral → converts, like convert_value
        (None, '{"a":2.5}'),
    ]
    # parity with the Python path
    py_df, _ = _python_path(spark, jdf, {"a": DataType.INT64})
    assert sorted(
        ((r["a"], r["_unmapped_data"]) for r in py_df.collect()), key=key
    ) == rows


def test_timestamp_rescue_parity(spark):
    from bulker_spark.types_lattice import DataType

    jdf = _jdf(
        spark,
        [{"t": "2024-01-02T03:04:05Z"}, {"t": "nope"}, {"t": "2024-01-02"}],
    )
    fb = fast_infer_header(jdf)
    unified, _ = unify_with_existing(
        {"t": DataType.TIMESTAMP}, fb.header, None
    )
    fast_df = fast_normalize(jdf, fb, unified)
    assert fast_df is not None
    py_df, _ = _python_path(spark, jdf, {"t": DataType.TIMESTAMP})
    assert _rows_comparable(fast_df.collect()) == _rows_comparable(
        py_df.collect()
    )


def test_timestamp_default_field_name(spark):
    # "timestamp" is a TIMESTAMP_DEFAULT_FIELDS name: string values type
    # as TIMESTAMP even when they don't look like one (unparseable →
    # rescue), exactly like the Python path
    jdf = _jdf(spark, [{"timestamp": "hello"}])
    fb = fast_infer_header(jdf)
    from bulker_spark.types_lattice import DataType

    assert fb.header.columns["timestamp"].data_type == DataType.TIMESTAMP


def test_engine_load_uses_fast_path_and_matches(spark, tmp_warehouse):
    import shutil
    import tempfile

    from bulker_spark.api import Engine

    events = [
        {"pk": i, "user": f"u{i%3}", "score": i * 1.5,
         "ts": "2024-01-02T03:04:05Z"}
        for i in range(50)
    ] + [{"pk": 7, "user": "dup", "score": 0.0, "ts": "2024-01-03 00:00:00"}]
    lines = [json.dumps(e) for e in events]

    eng = Engine(spark, tmp_warehouse)
    eng.bulk_load(
        "t", lines, mode="batch", primary_key=["pk"], deduplicate=True
    )
    assert ingest_mod.last_ingest_path == "jvm"
    fast_rows = sorted(
        map(str, eng.warehouse.read("t").drop("_unmapped_data").collect())
    )

    # force the Python path and compare tables
    import bulker_spark.ingest_fast as fast_mod

    other = tempfile.mkdtemp()
    orig = fast_mod.fast_infer_header
    try:
        ingest_mod_fast = lambda *_a, **_k: None  # noqa: E731
        fast_mod.fast_infer_header = ingest_mod_fast
        eng2 = Engine(spark, other)
        eng2.bulk_load(
            "t", lines, mode="batch", primary_key=["pk"], deduplicate=True
        )
        assert ingest_mod.last_ingest_path == "python"
        py_rows = sorted(
            map(str, eng2.warehouse.read("t").drop("_unmapped_data").collect())
        )
    finally:
        fast_mod.fast_infer_header = orig
        shutil.rmtree(other, ignore_errors=True)
    assert fast_rows == py_rows
    assert len(fast_rows) == 50  # dedup last-wins applied on the fast path


def test_falls_back_on_uint64_style_big_int(spark):
    """DECIMAL(19,0) ambiguity (ADVICE r03): 9300000000000000000 is a
    legal JSON integer above Long.MAX; the variant parser types it
    DECIMAL(19,0) — exactly what a 19-digit ``x.0`` float also produces.
    The old fast path classified it FLOAT64 and stored a rounded double,
    SILENTLY losing low-order digits. It must decline to the Python path,
    which either preserves the digits or fails LOUDLY (the documented
    Arrow-boundary overflow error) — never a quiet rounding."""
    big = 9_300_000_000_000_000_001
    try:
        df, header = ingest_json(spark, _jdf(spark, [{"a": 1, "big": big}]))
        assert ingest_mod.last_ingest_path == "python"
        [row] = df.collect()
        got = row["big"]
        if isinstance(got, str):  # rescued as text somewhere
            assert str(big) in got or json.loads(got) == big
        else:
            assert int(got) == big, "low-order digits must survive"
    except Exception as e:  # loud overflow beats silent rounding
        assert "big" in str(e) or "int64" in str(e) or "uint64" in str(e)


def test_small_dot_zero_floats_still_take_fast_path(spark):
    """The disambiguation must not widen: 2.0-style floats (DECIMAL(1,0))
    keep the JVM path and keep typing FLOAT64."""
    df, header = ingest_json(
        spark, _jdf(spark, [{"a": 2.0, "b": 1}, {"a": 3.5, "b": 2}])
    )
    assert ingest_mod.last_ingest_path == "jvm"
    assert sorted(r["a"] for r in df.collect()) == [2.0, 3.5]
