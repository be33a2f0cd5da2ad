"""Topic-id naming parity (topic_manager.go:726-806)."""

import re

import pytest

from bulker_spark.streaming.topics import (
    TOPIC_LENGTH_LIMIT,
    destination_subscribe_pattern,
    make_topic_id,
    parse_topic_id,
)


def test_round_trip_plain():
    t = make_topic_id("pg1", "batch", "events")
    assert t == "in.id.pg1.m.batch.t.events"
    assert parse_topic_id(t) == ("pg1", "batch", "events")


def test_round_trip_b64_for_odd_names():
    t = make_topic_id("pg1", "batch", "my table/with spaces")
    assert ".b64." in t
    assert parse_topic_id(t) == ("pg1", "batch", "my table/with spaces")


def test_retry_dead_collapse_to_all():
    assert make_topic_id("d", "retry", "whatever").endswith(".m.retry.t._all_")
    assert make_topic_id("d", "dead", "x").endswith(".m.dead.t._all_")


def test_partition_suffix_and_prefix():
    t = make_topic_id("d", "stream", "tbl", prefix="pfx.", partition=3)
    assert t == "pfx.in.id.d.m.stream.t.tbl.p.3"
    assert parse_topic_id(t) == ("d", "stream", "tbl")


def test_length_limit():
    with pytest.raises(ValueError, match="exceeds limit"):
        make_topic_id("d", "batch", "x" * (TOPIC_LENGTH_LIMIT + 1))
    # unchecked passes through
    assert make_topic_id("d", "batch", "x" * 300, check_length=False)


def test_malformed_rejected():
    for bad in ("nonsense", "in.id.only.two", "in.id.d.q.batch.t.tbl"):
        with pytest.raises(ValueError):
            parse_topic_id(bad)


def test_subscribe_pattern_matches_own_topics_only():
    pat = re.compile(destination_subscribe_pattern("pg1"))
    assert pat.fullmatch(make_topic_id("pg1", "batch", "events"))
    assert pat.fullmatch(make_topic_id("pg1", "retry", "x"))
    assert not pat.fullmatch(make_topic_id("pg2", "batch", "events"))
    assert not pat.fullmatch(make_topic_id("pg10", "batch", "events"))
