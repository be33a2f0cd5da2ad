"""CLI front (`python -m bulker_spark`): load / sql / tables / history /
count against a warehouse, reusing the test SparkSession via injection."""

import json
import os

from bulker_spark.__main__ import main


def _w(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_cli_load_and_inspect(spark, tmp_warehouse, tmp_path, capsys):
    src = os.path.join(tmp_path, "batch.ndjson")
    _w(src, [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}, {"id": 2, "v": "b2"}])

    rc = main(
        [
            "-w", tmp_warehouse, "load", src,
            "--table", "t", "--mode", "batch",
            "--pk", "id", "--deduplicate",
        ],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["successful_rows"] == 2  # deduped

    rc = main(["-w", tmp_warehouse, "count", "-t", "t"], spark=spark)
    assert rc == 0
    assert capsys.readouterr().out.strip() == "2"

    rc = main(["-w", tmp_warehouse, "tables"], spark=spark)
    assert "t" in capsys.readouterr().out.split()
    assert rc == 0

    rc = main(
        ["-w", tmp_warehouse, "sql", "SELECT v FROM t ORDER BY id"],
        spark=spark,
    )
    assert rc == 0
    shown = capsys.readouterr().out
    assert "b2" in shown

    rc = main(["-w", tmp_warehouse, "history", "-t", "t"], spark=spark)
    assert rc == 0
    assert "commit 1" in capsys.readouterr().out


def test_cli_load_stdin(spark, tmp_warehouse, capsys, monkeypatch):
    import io

    monkeypatch.setattr(
        "sys.stdin", io.StringIO('{"id": 1}\n\n{"id": 2}\n')
    )
    rc = main(
        ["-w", tmp_warehouse, "load", "-", "--table", "s"],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["successful_rows"] == 2


def test_cli_maintenance_commands(spark, tmp_warehouse, tmp_path, capsys):
    """compact / rebucket / stats / vacuum / delete-keys round-trip."""
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "t", [{"id": i, "v": f"x{i}"} for i in range(50)],
        mode="batch", primary_key=["id"], deduplicate=True,
        bucket_by=4, merge_on_read=True,
    )
    e.bulk_load(
        "t", [{"id": 1, "v": "upd"}],
        mode="batch", primary_key=["id"], deduplicate=True,
    )

    rc = main(["-w", tmp_warehouse, "stats", "-t", "t"], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["buckets"]["n_buckets"] == 4
    assert out["mor"]["pending_deltas"] == 1

    rc = main(["-w", tmp_warehouse, "compact", "-t", "t"], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["after"]["n_files"] <= out["before"]["n_files"]

    rc = main(
        ["-w", tmp_warehouse, "rebucket", "-t", "t", "--n-buckets", "8"],
        spark=spark,
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "table": "t", "n_buckets": 8,
    }

    rc = main(
        ["-w", tmp_warehouse, "delete-keys", "-t", "t", "3", "5"],
        spark=spark,
    )
    assert rc == 0
    capsys.readouterr()
    rc = main(["-w", tmp_warehouse, "count", "-t", "t"], spark=spark)
    assert rc == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "48"

    rc = main(["-w", tmp_warehouse, "vacuum", "-t", "t"], spark=spark)
    assert rc == 0
    assert "removed" in json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_make_session_conf(spark):
    """Session factory: scale posture is present on a built session.
    (Reuses the active JVM — getOrCreate returns the test session with
    the requested confs applied where session-settable.)"""
    from bulker_spark.session import make_session

    s = make_session()
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
    assert s.conf.get("spark.sql.session.timeZone") == "UTC"


def test_cli_clone(spark, tmp_warehouse, capsys):
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "src", [{"id": i} for i in range(10)],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    rc = main(
        ["-w", tmp_warehouse, "clone", "-t", "src", "--target", "pinned"],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cloned"] == "pinned"
    assert e.warehouse.read("pinned").count() == 10


def test_cli_changes(spark, tmp_warehouse, capsys):
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse, retain_versions=5)
    e.bulk_load(
        "t", [{"id": i, "v": "a"} for i in range(3)],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    e.bulk_load(
        "t", [{"id": 0, "v": "B"}, {"id": 9, "v": "n"}],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    rc = main(
        ["-w", tmp_warehouse, "--retain-versions", "5",
         "changes", "-t", "t", "--since", "1"],
        spark=spark,
    )
    assert rc == 0
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    got = sorted((r["id"], r["__change_type"]) for r in rows)
    assert got == [
        (0, "update_postimage"),
        (0, "update_preimage"),
        (9, "insert"),
    ]
