"""The driver parses bench.py's LAST stdout line from a 2000-char tail
buffer. Rounds 1 and 2 lost their performance record to an oversized
line — this pins the contract against the CURRENT query set so catalog
growth can't silently regress it again."""

import json

import bench


def test_compact_line_fits_driver_tail_buffer():
    timings = {q: 123.456 for q in bench.BENCH_QUERIES}
    # the non-catalog tiers the bench adds at runtime
    for tier in bench.STDOUT_PRIORITY:
        timings.setdefault(tier, 123.456)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "n_queries": len(timings),
    }
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE <= 1990
    parsed = json.loads(line)
    assert parsed["value"] == out["value"]
    assert parsed["queries"]  # trimmed, never empty
    # the engine tiers must survive trimming — they anchor BASELINE.md
    for tier in (
        "ingest_100k_rows",
        "trickle_merge_1m_manifest",
        "stream_ingest_100k_rows",
    ):
        assert tier in parsed["queries"], tier


def test_compact_line_caps_error_payload():
    timings = {q: 1.0 for q in bench.STDOUT_PRIORITY}
    out = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "errors": {f"q{i}": "x" * 400 for i in range(20)},
    }
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE
    parsed = json.loads(line)
    assert parsed["errors"]["more_errors"] == "18"


def test_every_bench_query_is_registered():
    from bulker_spark.plans.queries import QUERIES

    missing = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert not missing, missing
