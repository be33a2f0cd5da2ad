"""End-to-end engine tests mirroring the reference's integration matrix
(``bulker_test.go:234-440``; fixtures FIXTURES.md F1-F12)."""

import datetime as dt
import json
import os

from pyspark.sql import types as T

from bulker_spark import Engine

TS = "2022-08-18T14:17:22.375Z"


def _rows(engine, table):
    df = engine.warehouse.read(table)
    return [r.asDict() for r in df.orderBy("id").collect()]


def test_simple_e2e(spark, tmp_warehouse):
    """F1: source → flatten(no-op) → infer → create → load."""
    e = Engine(spark, tmp_warehouse)
    events = [
        {"_timestamp": TS, "id": 1, "name": "test"},
        {"_timestamp": TS, "id": 2, "name": "test2"},
        {"_timestamp": TS, "id": 3, "name": "test3"},
    ]
    res = e.bulk_load("simple", events, mode="batch")
    assert res.successful_rows == 3
    df = e.warehouse.read("simple")
    # first-seen column order + inferred types
    assert df.columns[:3] == ["_timestamp", "id", "name"]
    assert isinstance(df.schema["_timestamp"].dataType, T.TimestampType)
    assert isinstance(df.schema["id"].dataType, T.LongType)
    assert isinstance(df.schema["name"].dataType, T.StringType)
    rows = _rows(e, "simple")
    assert [r["name"] for r in rows] == ["test", "test2", "test3"]
    assert rows[0]["_timestamp"] == dt.datetime(2022, 8, 18, 14, 17, 22, 375000)


def test_columns_added_evolution(spark, tmp_warehouse):
    """F2: progressive schema evolution across batches."""
    e = Engine(spark, tmp_warehouse)
    e.bulk_load("evo", [{"_timestamp": TS, "id": 1, "name": "a"}], mode="batch")
    e.bulk_load(
        "evo",
        [{"_timestamp": TS, "id": 2, "name": "b", "column1": "data"}],
        mode="batch",
    )
    e.bulk_load(
        "evo",
        [
            {
                "_timestamp": TS,
                "id": 3,
                "name": "c",
                "column1": "data",
                "column2": "data",
                "column3": "data",
            }
        ],
        mode="batch",
    )
    meta = e.warehouse.get_meta("evo")
    assert list(meta.columns) == [
        "_timestamp",
        "id",
        "name",
        "column1",
        "column2",
        "column3",
    ]
    rows = _rows(e, "evo")
    assert len(rows) == 3
    assert rows[0].get("column1") is None
    assert rows[2]["column3"] == "data"


def test_repeated_ids_dedup(spark, tmp_warehouse):
    """F3: last-wins dedup with PK; without PK all rows survive."""
    e = Engine(spark, tmp_warehouse)
    events = [
        {"_timestamp": TS, "id": 1, "name": "test"},
        {"_timestamp": TS, "id": 1, "name": "test7"},
        {"_timestamp": TS, "id": 2, "name": "x"},
        {"_timestamp": TS, "id": 2, "name": "y"},
    ]
    e.bulk_load("nodedup", events, mode="batch")
    assert e.warehouse.count("nodedup") == 4

    e.bulk_load(
        "dedup", events, mode="batch", primary_key=["id"], deduplicate=True
    )
    rows = _rows(e, "dedup")
    assert [r["name"] for r in rows] == ["test7", "y"]

    # second batch upserts by PK
    e.bulk_load(
        "dedup",
        [{"_timestamp": TS, "id": 1, "name": "updated"}, {"_timestamp": TS, "id": 3, "name": "new"}],
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
    )
    rows = _rows(e, "dedup")
    assert [r["name"] for r in rows] == ["updated", "y", "new"]


def test_dedup_discriminator(spark, tmp_warehouse):
    """F4: keep highest discriminator value per PK, not arrival order."""
    e = Engine(spark, tmp_warehouse)
    events = [
        {"_timestamp": "2022-08-18T14:17:22.375Z", "id": 1, "name": "C", "int1": 3},
        {"_timestamp": "2022-08-15T14:17:22.375Z", "id": 1, "name": "B", "int1": 2},
        {"_timestamp": "2022-08-16T14:17:22.375Z", "id": 1, "name": "D", "int1": 4},
    ]
    e.bulk_load(
        "discr",
        events,
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
        discriminator_field=["int1"],
    )
    rows = _rows(e, "discr")
    assert len(rows) == 1
    assert rows[0]["name"] == "D"


def test_types_collision_rescue(spark, tmp_warehouse):
    """F6/F12: LCA unification within batch; existing-type wins across
    batches with uncastable values rescued to _unmapped_data."""
    e = Engine(spark, tmp_warehouse)
    e.bulk_load("tt", [{"id": 1, "int_1": 1, "float1": 1.2}], mode="batch")
    meta = e.warehouse.get_meta("tt")
    from bulker_spark.types_lattice import DataType as D

    assert meta.columns["int_1"] == D.INT64
    # second batch: int_1 arrives as non-integral float → rescue
    e.bulk_load("tt", [{"id": 2, "int_1": 2.7, "float1": 2}], mode="batch")
    rows = _rows(e, "tt")
    assert rows[1]["int_1"] is None
    assert "2.7" in rows[1]["_unmapped_data"]
    assert rows[1]["float1"] == 2.0  # integral into FLOAT64 fine


def test_replace_table(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    e.bulk_load("rt", [{"id": 1, "name": "old"}], mode="replace_table")
    e.bulk_load("rt", [{"id": 10, "name": "new"}, {"id": 11, "name": "new2"}],
                mode="replace_table")
    rows = _rows(e, "rt")
    assert [r["id"] for r in rows] == [10, 11]


def test_replace_partition(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    batch1 = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    batch2 = [{"id": 3, "name": "c"}]
    e.bulk_load("rp", batch1, mode="replace_partition", partition_id="p1")
    e.bulk_load("rp", batch2, mode="replace_partition", partition_id="p2")
    assert e.warehouse.count("rp") == 3
    # reload p1 with different rows: only p1 replaced
    e.bulk_load(
        "rp",
        [{"id": 9, "name": "z"}],
        mode="replace_partition",
        partition_id="p1",
    )
    df = e.warehouse.read("rp")
    got = {(r["id"], r["__partition_id"]) for r in df.collect()}
    assert got == {(9, "p1"), (3, "p2")}


def test_merge_window(spark, tmp_warehouse):
    """F8: duplicates older than the merge window are NOT merged."""
    e = Engine(spark, tmp_warehouse)
    now = dt.datetime(2023, 1, 10)
    old = {"_timestamp": "2023-01-01T00:00:00Z", "id": 1, "name": "old"}
    e.bulk_load(
        "mw", [old], mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="_timestamp", frozen_now=now,
    )
    # new batch, same PK, recent timestamp, window 3 days: old row is outside
    # window → not merged → both rows present
    new = {"_timestamp": "2023-01-10T00:00:00Z", "id": 1, "name": "new"}
    e.bulk_load(
        "mw", [new], mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="_timestamp", deduplicate_window=3, frozen_now=now,
    )
    assert e.warehouse.count("mw") == 2
    # batch old enough that the shrunk window covers the target row → merge
    # collapses to 1 (window = ceil(batch age) = 9 days ≥ target age)
    e.bulk_load(
        "mw2", [old], mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="_timestamp", frozen_now=now,
    )
    covering = {"_timestamp": "2023-01-01T12:00:00Z", "id": 1, "name": "new"}
    e.bulk_load(
        "mw2", [covering], mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="_timestamp", deduplicate_window=365, frozen_now=now,
    )
    assert e.warehouse.count("mw2") == 1
    assert _rows(e, "mw2")[0]["name"] == "new"


def test_ndjson_and_multibyte(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    lines = [
        json.dumps({"id": 1, "name": "multi\nline"}),
        json.dumps({"id": 2, "name": "emoji 🚀"}),
    ]
    e.bulk_load("weird", lines, mode="batch")
    rows = _rows(e, "weird")
    assert rows[0]["name"] == "multi\nline"
    assert rows[1]["name"] == "emoji 🚀"


def test_warehouse_state_step_timings(spark, tmp_warehouse):
    """WarehouseState parity (bulker.go:169-176): per-step ms recorded."""
    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "timed", [{"id": i} for i in range(5)], mode="batch",
        primary_key=["id"], deduplicate=True,
    )
    st = res.warehouse_state
    assert st["consume_convert_ms"] > 0 and st["merge_ms"] > 0
    res2 = e.bulk_load("timed2", [{"id": 1}], mode="replace_table")
    assert "replace_table_ms" in res2.warehouse_state


def test_compaction_reduces_files_preserves_rows(spark, tmp_warehouse):
    """Streaming appends fragment the table; compact() rewrites the
    version with sized files, atomically, without changing contents."""
    e = Engine(spark, tmp_warehouse)
    for i in range(8):  # 8 appends → many small files
        e.bulk_load("frag", [{"id": j, "batch": i} for j in range(i * 10, i * 10 + 10)],
                    mode="batch")
    before = e.warehouse.table_stats("frag")
    rows_before = sorted(r["id"] for r in e.warehouse.read("frag").collect())
    rep = e.warehouse.compact("frag", target_file_bytes=10 * 1024 * 1024)
    assert rep["after"]["n_files"] < before["n_files"]
    assert rep["after"]["n_files"] == 1  # tiny table → one right-sized file
    rows_after = sorted(r["id"] for r in e.warehouse.read("frag").collect())
    assert rows_after == rows_before == list(range(80))


def test_compaction_cluster_by_yields_disjoint_file_ranges(spark, tmp_warehouse):
    """compact(cluster_by=...) range-clusters the rewrite so parquet
    footer min/max stats can prune files on key predicates — assert the
    per-file id ranges actually end up disjoint (the property pruning
    relies on), and contents survive."""
    import glob

    import pyarrow.parquet as pq

    e = Engine(spark, tmp_warehouse)
    ids = [(i * 37) % 1000 for i in range(1000)]  # shuffled key order
    e.bulk_load("clust", [{"id": i, "v": f"x{i}"} for i in ids], mode="batch")
    e.warehouse.compact("clust", target_file_bytes=2048, cluster_by=["id"])
    meta = e.warehouse.get_meta("clust")
    vdir = os.path.join(e.warehouse._table_dir("clust", None), meta.version)
    ranges = []
    for f in glob.glob(os.path.join(vdir, "*.parquet")):
        md = pq.read_metadata(f)
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(cols["id"]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1, "need several files to demonstrate clustering"
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"file key ranges overlap: {ranges}"
    got = sorted(r["id"] for r in e.warehouse.read("clust").collect())
    assert got == sorted(ids)


def test_bulk_load_from_path_distributed(spark, tmp_warehouse, tmp_path):
    """A string source is read by Spark's text source (distributed, gzip
    OK), not opened on the driver."""
    import gzip

    p = tmp_path / "events.ndjson.gz"
    with gzip.open(p, "wt") as fh:
        for i in range(50):
            fh.write(json.dumps({"id": i, "name": f"n{i}"}) + "\n")
    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load("fromfile", str(p), mode="batch")
    assert res.successful_rows == 50
    assert e.warehouse.count("fromfile") == 50


def test_malformed_lines_counted_not_fatal(spark, tmp_warehouse):
    """Bad JSON lines are dropped and counted; the batch still commits."""
    e = Engine(spark, tmp_warehouse)
    s = e.create_stream("mal", mode="batch", temporary_batch_size=2)
    for line in ['{"id": 1}', "{not json", '{"id": 2}', "also-not-json",
                 '{"id": 3}']:
        s.consume_json(line)
    res = s.complete()
    assert res.successful_rows == 3
    assert res.malformed_rows == 2
    assert res.processed_rows == 5
    assert sorted(r["id"] for r in e.warehouse.read("mal").collect()) == [1, 2, 3]


def test_engine_sql_surface(spark, tmp_path):
    from bulker_spark import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.bulk_load(
        "users",
        [
            '{"id": 1, "name": "ada", "score": 3.5}',
            '{"id": 2, "name": "bob", "score": 1.25}',
            '{"id": 3, "name": "cy", "score": 9.0}',
        ],
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
    )
    eng.bulk_load(
        "orders_t",
        ['{"oid": 10, "uid": 1, "amt": 5.0}', '{"oid": 11, "uid": 1, "amt": 2.0}',
         '{"oid": 12, "uid": 3, "amt": 1.0}'],
        mode="batch",
    )
    rows = eng.sql(
        "SELECT u.name, SUM(o.amt) AS total FROM users u "
        "JOIN orders_t o ON u.id = o.uid GROUP BY u.name ORDER BY u.name"
    ).collect()
    assert [(r["name"], r["total"]) for r in rows] == [("ada", 7.0), ("cy", 1.0)]
