"""Unit tests for the type lattice — mirrors the reference's
``types_test.go`` semantics (see SURVEY.md §1.2, FIXTURES.md F6)."""

import datetime as dt

import pytest

from bulker_spark.types_lattice import (
    ConvertError,
    DataType,
    common_ancestor,
    convert_value,
    infer_type,
    looks_like_timestamp,
    parse_timestamp,
    to_json_iso,
)

D = DataType


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (D.INT64, D.INT64, D.INT64),
        (D.BOOL, D.INT64, D.INT64),
        (D.BOOL, D.FLOAT64, D.FLOAT64),
        (D.INT64, D.FLOAT64, D.FLOAT64),
        (D.INT64, D.STRING, D.STRING),
        (D.FLOAT64, D.STRING, D.STRING),
        (D.TIMESTAMP, D.STRING, D.STRING),
        (D.TIMESTAMP, D.INT64, D.STRING),
        (D.TIMESTAMP, D.FLOAT64, D.STRING),
        (D.BOOL, D.TIMESTAMP, D.STRING),
        (D.JSON, D.STRING, D.STRING),
        (D.JSON, D.INT64, D.STRING),
        (D.JSON, D.JSON, D.JSON),
        (D.UNKNOWN, D.INT64, D.UNKNOWN),
        (D.UNKNOWN, D.STRING, D.UNKNOWN),
    ],
)
def test_common_ancestor(a, b, expected):
    assert common_ancestor(a, b) == expected
    assert common_ancestor(b, a) == expected


def test_infer_types():
    assert infer_type(True) == D.BOOL
    assert infer_type(1) == D.INT64
    assert infer_type(1.5) == D.FLOAT64
    assert infer_type("hello") == D.STRING
    assert infer_type("2022-08-18T14:17:22.375Z") == D.TIMESTAMP
    assert infer_type("2022-08-18 14:17:22") == D.TIMESTAMP
    assert infer_type({"a": 1}) == D.JSON
    assert infer_type([1, 2]) == D.JSON
    assert infer_type(None) == D.UNKNOWN
    # well-known timestamp field names default to TIMESTAMP
    assert infer_type("whatever-string", "_timestamp") == D.TIMESTAMP


def test_timestamp_probe_bounds():
    assert not looks_like_timestamp("2022-08-18")  # too short (date only)
    assert not looks_like_timestamp("31-12-2022T00:00:00")
    assert looks_like_timestamp("2022-08-18T14:17:22.375Z")
    assert looks_like_timestamp("1999-01-01 00:00:00")


def test_convert_string():
    assert convert_value(True, D.STRING) == "true"
    assert convert_value(1.0, D.STRING) == "1"
    assert convert_value(1.5, D.STRING) == "1.5"
    assert convert_value({"a": 1}, D.STRING) == '{"a":1}'
    ts = dt.datetime(2022, 8, 18, 14, 17, 22, 375000)
    assert convert_value(ts, D.STRING) == "2022-08-18T14:17:22.375Z"


def test_convert_int():
    assert convert_value("42", D.INT64) == 42
    assert convert_value(4.0, D.INT64) == 4
    assert convert_value(True, D.INT64) == 1
    with pytest.raises(ConvertError):
        convert_value(4.5, D.INT64)
    with pytest.raises(ConvertError):
        convert_value("abc", D.INT64)


def test_convert_float_and_bool():
    assert convert_value("1,234.5", D.FLOAT64) == 1234.5
    assert convert_value("1", D.BOOL) is True
    assert convert_value("false", D.BOOL) is False
    with pytest.raises(ConvertError):
        convert_value("maybe", D.BOOL)


def test_convert_timestamp():
    got = convert_value("2022-08-18T14:17:22.375Z", D.TIMESTAMP)
    assert got.year == 2022 and got.microsecond == 375000
    assert parse_timestamp("2022-08-18") == dt.datetime(2022, 8, 18)
    with pytest.raises(ConvertError):
        convert_value("not-a-time", D.TIMESTAMP)


def test_json_iso_roundtrip():
    assert to_json_iso(dt.datetime(2022, 1, 2, 3, 4, 5, 60000)) == (
        "2022-01-02T03:04:05.060Z"
    )
