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


def test_json_as_variant_storage_and_merge(spark, tmp_warehouse):
    """json_as_variant stores array/object escape-hatch columns (and the
    _unmapped_data rescue) as Spark 4 VARIANT; variant_get path reads work
    and a second merge batch keeps the type stable."""
    from pyspark.sql import functions as F

    e = Engine(spark, tmp_warehouse)
    # "meta" is pinned as a JSON subtree via the __sql_type hint (so it is
    # NOT flattened); "tags" is an array — both are JSON-lattice columns
    events = [
        {"id": 1, "tags": ["a", "b"], "meta": {"deep": 7}, "__sql_type_meta": "json"},
        {"id": 2, "tags": [], "meta": {"deep": 8}, "__sql_type_meta": "json"},
    ]
    res = e.bulk_load(
        "var_t", events, mode="batch", primary_key=["id"],
        deduplicate=True, json_as_variant=True,
    )
    assert res.successful_rows == 2
    df = e.warehouse.read("var_t")
    dt = dict(df.dtypes)
    assert dt["tags"] == "variant" and dt["meta"] == "variant"
    got = {
        r["id"]: (r["deep"], r["t0"])
        for r in df.select(
            "id",
            F.try_variant_get("meta", "$.deep", "long").alias("deep"),
            F.try_variant_get("tags", "$[0]", "string").alias("t0"),
        ).collect()
    }
    assert got == {1: (7, "a"), 2: (8, None)}
    # merge a second batch: upsert id=2, insert id=3 — type stays variant
    e.bulk_load(
        "var_t",
        [{"id": 2, "tags": ["z"], "meta": {"deep": 80}, "__sql_type_meta": "json"},
         {"id": 3, "tags": ["c"], "meta": {"deep": 9}, "__sql_type_meta": "json"}],
        mode="batch", primary_key=["id"], deduplicate=True,
        json_as_variant=True,
    )
    df2 = e.warehouse.read("var_t")
    assert dict(df2.dtypes)["tags"] == "variant"
    got2 = {
        r["id"]: r["deep"]
        for r in df2.select(
            "id", F.try_variant_get("meta", "$.deep", "long").alias("deep")
        ).collect()
    }
    assert got2 == {1: 7, 2: 80, 3: 9}


def test_json_as_variant_rescue_column(spark, tmp_warehouse):
    """Uncastable values rescued into _unmapped_data stay readable as
    variant paths when json_as_variant is on."""
    from pyspark.sql import functions as F

    e = Engine(spark, tmp_warehouse)
    e.bulk_load("var_r", [{"id": 1, "n": 5}], mode="batch",
                json_as_variant=True)
    # "n" arrives as an uncastable string -> rescued
    e.bulk_load("var_r", [{"id": 2, "n": "not-a-number"}], mode="batch",
                json_as_variant=True)
    df = e.warehouse.read("var_r")
    assert dict(df.dtypes)["_unmapped_data"] == "variant"
    rescued = (
        df.filter("id = 2")
        .select(F.try_variant_get("_unmapped_data", "$.n", "string").alias("v"))
        .first()["v"]
    )
    assert rescued == "not-a-number"
