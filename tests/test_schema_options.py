"""Fixed-schema pinning (F11) and identifier adaptation (F10) through the
full engine path, plus batch counters."""

from bulker_spark import Engine


def test_schema_option_pins_columns(spark, tmp_warehouse):
    """Events carry only {id}; the schema option declares extra typed
    columns that must exist with declared types (schema_option.ndjson
    semantics, bulkerlib/options.go:149-166)."""
    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "pinned",
        [{"id": 1}, {"id": 2}],
        mode="batch",
        schema={"name": "text", "score": "double", "joined": "timestamp"},
    )
    assert res.successful_rows == 2
    meta = e.warehouse.get_meta("pinned")
    from bulker_spark.types_lattice import DataType as D

    assert meta.columns["name"] == D.STRING
    assert meta.columns["score"] == D.FLOAT64
    assert meta.columns["joined"] == D.TIMESTAMP
    df = e.warehouse.read("pinned")
    assert df.filter(df.name.isNull()).count() == 2
    # pinned type wins over inference: "score" arrives as string later
    e.bulk_load(
        "pinned",
        [{"id": 3, "score": "1.5"}],
        mode="batch",
        schema={"score": "double"},
    )
    row = e.warehouse.read("pinned").filter("id = 3").first()
    assert row["score"] == 1.5


def test_identifier_adaptation_e2e(spark, tmp_warehouse):
    """Keys with spaces/emoji/specials become loadable columns (F10)."""
    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "weird",
        [{"id": 1, "column with spaces": "x", "weird!@#": "y", "🚀": "z"}],
        mode="batch",
    )
    cols = list(e.warehouse.get_meta("weird").columns)
    assert "column_with_spaces" in cols
    assert "weirdchars" not in cols  # punctuation stripped -> 'weird'
    assert any(c == "weird" for c in cols)
    # all columns parquet-safe
    for c in cols:
        assert not any(ch in c for ch in ' ,;{}()=\n\t')
    row = e.warehouse.read("weird").first()
    assert row["column_with_spaces"] == "x"


def test_counters_are_batch_scoped(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    r1 = e.bulk_load("c", [{"id": i} for i in range(5)], mode="batch")
    assert r1.successful_rows == 5
    r2 = e.bulk_load("c", [{"id": 99}], mode="batch")
    assert r2.successful_rows == 1  # batch rows, not table total
    assert e.warehouse.count("c") == 6


def test_column_types_option_pins_types(spark, tmp_warehouse):
    from bulker_spark.api import Engine

    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "ct", [{"id": 1, "price": 5}], mode="batch",
        column_types={"price": "double precision"},
    )
    assert dict(e.warehouse.read("ct").dtypes)["price"] == "double"


def test_temporary_batch_flush_bounds_driver_buffer(spark, tmp_warehouse):
    from bulker_spark.api import Engine

    e = Engine(spark, tmp_warehouse)
    s = e.create_stream("tb", mode="batch", temporary_batch_size=10)
    for i in range(35):
        s.consume({"id": i, "v": f"x{i}"})
        assert len(s._events) < 10  # buffer flushed to JVM every 10
    res = s.complete()
    assert res.successful_rows == 35
    assert e.warehouse.count("tb") == 35


def test_functions_env_passthrough_ignored(spark, tmp_warehouse):
    from bulker_spark.api import Engine

    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "fe", [{"id": 1}], mode="batch",
        functions_env={"KEY": "val"}, disable_temporary_tables=True,
    )
    assert res.successful_rows == 1
