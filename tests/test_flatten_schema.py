"""Flatten + hint extraction + header inference (FIXTURES F5/F6/F7)."""

from bulker_spark.flatten import flatten_event
from bulker_spark.naming import IdentifierAdapter, NameTransformer
from bulker_spark.schema import (
    BatchHeader,
    SchemaPolicy,
    extract_type_hints,
    infer_header,
    normalize_events,
    unify_with_existing,
)
from bulker_spark.types_lattice import DataType as D


def test_flatten_nested():
    ev = {"id": 1, "nested": {"id": 2, "name": "n", "deep": {"x": 9}}, "arr": [{"a": 1}]}
    flat = flatten_event(ev)
    assert flat == {
        "id": 1,
        "nested_id": 2,
        "nested_name": "n",
        "nested_deep_x": 9,
        "arr": '[{"a":1}]',
    }


def test_flatten_order_and_nils():
    ev = {"b": 1, "a": None, "c": {"z": 1, "y": 2}}
    assert list(flatten_event(ev)) == ["b", "c_z", "c_y"]
    assert list(flatten_event(ev, omit_nils=False)) == ["b", "a", "c_z", "c_y"]


def test_flatten_case_fold():
    ev = {"Camel": {"Case": 1}}
    assert flatten_event(ev, name_transformer=NameTransformer("lower")) == {
        "camel_case": 1
    }


def test_extract_hints():
    ev = {
        "id": 1,
        "int1": "27",
        "__sql_type_int1": "bigint",
        "nested_json1": {"a": 1, "__sql_type": "json"},
        "nested_json2": {"a": "2", "__sql_type_a": "bigint"},
    }
    clean, hints = extract_type_hints(ev)
    assert hints == {
        "int1": "bigint",
        "nested_json1": "json",
        "nested_json2_a": "bigint",
    }
    assert "__sql_type_int1" not in clean
    assert clean["nested_json1"] == {"a": 1}


def test_hinted_subtree_not_flattened():
    ev = {"a": {"b": {"c": 1}}, "__sql_type_a_b": "json"}
    clean, hints = extract_type_hints(ev)
    flat = flatten_event(clean, keep_json_paths=frozenset(hints))
    assert flat == {"a_b": '{"c":1}'}


def test_infer_header_lattice():
    events = [
        {"id": 1, "x": 1, "s": "a", "t": "2022-08-18T14:17:22.375Z"},
        {"id": 2.5, "x": "str", "s": "b", "t": "plain"},
    ]
    h = infer_header(events)
    assert h.columns["id"].data_type == D.FLOAT64
    assert h.columns["x"].data_type == D.STRING
    assert h.columns["s"].data_type == D.STRING
    assert h.columns["t"].data_type == D.STRING  # TIMESTAMP ⊔ STRING
    assert list(h.columns) == ["id", "x", "s", "t"]


def test_normalize_rescues_uncastable():
    events = [{"id": 1}, {"id": "abc"}]
    # pin id to INT64 (existing table) — "abc" must be rescued
    existing = {"id": D.INT64}
    h = infer_header(events)
    unified, new = unify_with_existing(existing, h)
    rows = list(normalize_events(events, unified))
    assert rows[0] == {"id": 1}
    assert rows[1].get("id") is None
    assert "abc" in rows[1]["_unmapped_data"]


def test_schema_freeze_and_max_columns():
    h = infer_header([{"a": 1, "b": 2, "c": 3}])
    unified, new = unify_with_existing({"a": D.INT64}, h, SchemaPolicy(schema_freeze=True))
    assert list(unified.columns) == ["a"]
    unified2, new2 = unify_with_existing({"a": D.INT64}, h, SchemaPolicy(max_columns=2))
    assert list(unified2.columns) == ["a", "b"]
    rows = list(normalize_events([{"a": 1, "b": 2, "c": 3}], unified2))
    assert rows[0]["a"] == 1 and rows[0]["b"] == 2
    assert '"c":3' in rows[0]["_unmapped_data"]


def test_identifier_adapter():
    ia = IdentifierAdapter(max_len=63)
    assert ia.adapt("normal_name") == "normal_name"
    assert ia.adapt("column with spaces") == "column_with_spaces"
    assert ia.adapt("weird!@#chars") == "weirdchars"
    assert ia.adapt("123starts_with_digit").startswith("_123")
    long = "x" * 100
    assert len(ia.adapt(long)) <= 63
    # stability via cache
    assert ia.adapt("column with spaces") == "column_with_spaces"
    emoji = ia.adapt("🚀")
    assert emoji and all(c.isalnum() or c == "_" for c in emoji)


def test_agg_dedup_matches_window_dedup(spark):
    """The skew-resistant hash-agg dedup must be row-for-row identical to
    the window formulation, including discriminator + tie semantics."""
    from bulker_spark.operators.dedup import (
        dedup_discriminator,
        dedup_discriminator_agg,
        dedup_last_wins,
        dedup_last_wins_agg,
        with_sequence,
    )

    rows = [
        (1, None, "a"), (1, 5, "b"), (1, 5, "c"),      # tie on discr=5 → later wins
        (2, 3, "d"), (2, None, "e"),                    # null discr loses
        (3, None, "f"),                                 # all-null keeps row
        (4, 9, "g"),
    ]
    df = with_sequence(
        spark.createDataFrame(rows, "id int, discr int, name string")
    ).persist()

    for win_fn, agg_fn, args in [
        (dedup_last_wins, dedup_last_wins_agg, ([ "id" ],)),
        (dedup_discriminator, dedup_discriminator_agg, (["id"], ["discr"])),
    ]:
        a = sorted(win_fn(df, *args).drop("__seq").collect())
        b = sorted(agg_fn(df, *args).drop("__seq").collect())
        assert a == b, (win_fn.__name__, a, b)
    df.unpersist()


def test_agg_dedup_has_partial_aggregation(spark):
    from bulker_spark.operators.dedup import dedup_last_wins_agg, with_sequence
    from bulker_spark.plans import audit

    df = with_sequence(spark.range(100).selectExpr("id % 7 as pk", "id as v"))
    out = dedup_last_wins_agg(df, ["pk"])
    assert audit.has_partial_aggregate(out)  # map-side combine → skew-safe
    assert audit.exchange_count(out) == 1
