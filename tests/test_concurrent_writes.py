"""Optimistic concurrency on the warehouse commit log.

The reference serializes writers with per-table locks inside one process
(``table_helper.go:285-303``); a Spark deployment can run many drivers
against one warehouse, so the commit protocol itself must serialize them.
These tests race two independent Warehouse handles (distinct meta caches,
same root — the two-drivers topology) and assert the Delta-style
semantics: blind appends commute, read-modify-write conflicts surface as
ConcurrentWriteError, and the loser's retry converges.
"""

import pytest

from bulker_spark import ConcurrentWriteError
from bulker_spark.sinks.warehouse import Warehouse


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "wh")


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, v string")


def test_appends_from_two_handles_commute(spark, roots):
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    b.append("t", _df(spark, [(2, "b")]))
    a.append("t", _df(spark, [(3, "c")]))  # a's cache is stale; still fine
    assert a.read("t").count() == 3
    log = a._read_log("t")
    assert [e["commit"] for e in log] == [1, 2, 3]


def test_concurrent_merge_raises_instead_of_losing_update(spark, roots):
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a"), (2, "b")]), pk=["pk"])

    # interleave: force b's snapshot read before a's commit by claiming
    # a's commit while b is "computing" — simulate with explicit tokens
    base = b._last_commit_id("t")
    a.merge("t", _df(spark, [(2, "a-wins"), (3, "a-new")]), pk=["pk"])

    meta = b.get_meta("t")
    merged = b.read("t")  # b now reads a's result, but its token is stale
    meta.version = b._write_version("t", merged, meta.partition_by, None)
    with pytest.raises(ConcurrentWriteError):
        b._commit_meta(meta, op="merge", expected_commit=base)

    # live state is exactly a's commit — the race lost cleanly
    rows = {r["pk"]: r["v"] for r in a.read("t").collect()}
    assert rows == {1: "a", 2: "a-wins", 3: "a-new"}


def test_loser_retry_converges(spark, roots):
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    a.merge("t", _df(spark, [(1, "a2")]), pk=["pk"])

    # b lost a race (stale token) → refresh + re-apply succeeds
    b.refresh("t")
    b.merge("t", _df(spark, [(1, "b2"), (2, "b-new")]), pk=["pk"])
    rows = {r["pk"]: r["v"] for r in b.read("t").collect()}
    assert rows == {1: "b2", 2: "b-new"}
    ops = [e["op"] for e in b._read_log("t")]
    assert ops == ["replace_table", "merge", "merge"]


def test_history_and_time_travel_survive_protocol(spark, roots):
    wh = Warehouse(spark, roots, retain_versions=5)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    wh.append("t", _df(spark, [(2, "b")]))
    wh.merge("t", _df(spark, [(1, "a2")]), pk=["pk"])
    hist = wh.history("t")
    assert [e["commit"] for e in hist] == [3, 2, 1]
    assert wh.read("t", version=1).count() == 1
    wh.restore("t", 1)
    assert {r["pk"] for r in wh.read("t").collect()} == {1}
