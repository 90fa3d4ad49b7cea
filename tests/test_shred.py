"""Shredder golden tests — exact row tuples ported from the reference's
``tests/RecordProcessor.spec.ts`` (deep-nested children, versioning, value
translation, non-array tolerance)."""

import json

import pytest

from singer_target_clickhouse_spark.schema import build_meta
from singer_target_clickhouse_spark.shred import shred_stream

ORDER_SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "integer"},
        "name": {"type": ["null", "string"]},
        "tags": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "name": {"type": ["null", "string"]},
                    "values": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "properties": {"name": {"type": ["null", "string"]}},
                        },
                    },
                },
            },
        },
    },
}


def records_df(spark, records, start_seq=0):
    rows = [(json.dumps(r), i + start_seq) for i, r in enumerate(records)]
    return spark.createDataFrame(rows, "record string, _seq long")


DEEP_RECORD = {
    "id": 1234,
    "name": "a",
    "tags": [
        {"name": "tag_a", "values": [{"name": "value_a"}, {"name": "value_b"}, {"name": "value_c"}]},
        {"name": "tag_b", "values": [{"name": "value_d"}, {"name": "value_e"}]},
    ],
}


def test_deep_nested_children_golden(spark):
    # reference RecordProcessor.spec.ts:91-131 with maxVer=50 -> _ver=51
    meta = build_meta("order", ORDER_SCHEMA, ["id"])
    out = shred_stream(records_df(spark, [DEEP_RECORD]), meta, ver_offset=50)
    assert set(out) == {"order", "order__tags", "order__tags__values"}

    root = [tuple(r) for r in out["order"].collect()]
    assert root == [(1234, "a", 51)]

    tags = sorted(tuple(r) for r in out["order__tags"].collect())
    assert tags == [(1234, 0, "tag_a", 51), (1234, 1, "tag_b", 51)]

    values = sorted(tuple(r) for r in out["order__tags__values"].collect())
    assert values == [
        (1234, 0, 0, "value_a", 51),
        (1234, 0, 1, "value_b", 51),
        (1234, 0, 2, "value_c", 51),
        (1234, 1, 0, "value_d", 51),
        (1234, 1, 1, "value_e", 51),
    ]
    # column order parity (reference buildSQLInsertField golden)
    assert out["order__tags__values"].columns == [
        "_root_id", "_level_0_index", "_level_1_index", "name", "_root_ver",
    ]


def test_version_increments_with_seq(spark):
    meta = build_meta("order", ORDER_SCHEMA, ["id"])
    recs = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}, {"id": 1, "name": "c"}]
    out = shred_stream(records_df(spark, recs), meta, ver_offset=0)
    rows = sorted(tuple(r) for r in out["order"].collect())
    assert rows == [(1, "a", 1), (1, "c", 3), (2, "b", 2)]


def test_value_translation(spark):
    # reference RecordProcessor.spec.ts:59-87: "true" -> boolean true when
    # translate on; raw string kept (cast) when off.
    schema = {
        "type": "object",
        "properties": {"id": {"type": "integer"}, "valid": {"type": "boolean"}},
    }
    meta = build_meta("t", schema, ["id"])
    df = records_df(spark, [{"id": 1, "valid": "true"}])
    on = shred_stream(df, meta, translate_values=True)["t"].collect()[0]
    assert (on["id"], on["valid"]) == (1, True)
    off = shred_stream(df, meta, translate_values=False)["t"].collect()[0]
    # from_json with a boolean field and a string payload yields null (the
    # reference would ship the raw string to ClickHouse and fail there)
    assert off["valid"] is None


def test_translation_parse_int_float(spark):
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "n": {"type": ["null", "integer"]},
            "f": {"type": ["null", "number"], "format": "float64"},
        },
    }
    meta = build_meta("t", schema, ["id"])
    df = records_df(spark, [{"id": 1, "n": "12abc", "f": "2.5e2xyz"}, {"id": 2, "n": "zz", "f": "abc"}])
    rows = {r["id"]: r for r in shred_stream(df, meta, translate_values=True)["t"].collect()}
    assert rows[1]["n"] == 12  # JS parseInt("12abc") == 12
    assert rows[1]["f"] == 250.0  # JS parseFloat("2.5e2xyz") == 250
    assert rows[2]["n"] is None  # NaN -> null
    assert rows[2]["f"] is None


def test_translation_best_effort_datetime(spark):
    # ClickHouse best_effort parity (ClickhouseConnection.ts:163): mixed
    # datetime layouts all land as the same instant; garbage -> null.
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "at": {"type": ["null", "string"], "format": "date-time"},
            "d": {"type": ["null", "string"], "format": "date"},
        },
    }
    meta = build_meta("t", schema, ["id"])
    df = records_df(
        spark,
        [
            {"id": 1, "at": "2021-03-07T14:00:01Z", "d": "2021-03-07"},
            {"id": 2, "at": "07/03/2021 14:00:01", "d": "07/03/2021"},
            {"id": 3, "at": "2021/03/07 14:00:01", "d": "2021/03/07"},
            {"id": 4, "at": "07 Mar 2021 14:00:01", "d": "07 Mar 2021"},
            {"id": 5, "at": "1615125601", "d": None},
            {"id": 6, "at": "not a date", "d": "nope"},
        ],
    )
    rows = {r["id"]: r for r in shred_stream(df, meta, translate_values=True)["t"].collect()}
    expect = rows[1]["at"]
    assert expect is not None
    for i in (2, 3, 4, 5):
        assert rows[i]["at"] == expect, i
    assert str(rows[1]["d"]) == "2021-03-07"
    for i in (2, 3, 4):
        assert rows[i]["d"] == rows[1]["d"], i
    assert rows[6]["at"] is None and rows[6]["d"] is None


def test_non_array_tolerance(spark):
    # reference RecordProcessor.ts:117-119: object (or scalar) where array
    # expected -> single-element array; null/absent -> no child rows.
    meta = build_meta("order", ORDER_SCHEMA, ["id"])
    recs = [
        {"id": 1, "name": "x", "tags": {"name": "solo", "values": []}},
        {"id": 2, "name": "y"},
        {"id": 3, "name": "z", "tags": None},
    ]
    out = shred_stream(records_df(spark, recs), meta)
    tags = [tuple(r) for r in out["order__tags"].collect()]
    assert tags == [(1, 0, "solo", 1)]


def test_scalar_array_child(spark):
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "collaborator_ids": {"type": ["null", "array"], "items": {"type": ["null", "integer"]}},
        },
    }
    meta = build_meta("audits", schema, ["id"])
    recs = [{"id": 7, "collaborator_ids": [10, 20, 30]}, {"id": 8, "collaborator_ids": "55"}]
    out = shred_stream(records_df(spark, recs), meta)
    rows = sorted(tuple(r) for r in out["audits__collaborator_ids"].collect())
    # scalar-where-array tolerance applies here too
    assert rows == [(7, 0, 10, 1), (7, 1, 20, 1), (7, 2, 30, 1), (8, 0, 55, 2)]


def test_nested_object_flatten(spark):
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "nested": {"type": ["null", "object"], "properties": {"color": {"type": "string"}}},
        },
    }
    meta = build_meta("audits", schema, ["id"])
    out = shred_stream(records_df(spark, [{"id": 1, "nested": {"color": "blue"}}, {"id": 2}]), meta)
    rows = sorted(tuple(r) for r in out["audits"].collect())
    assert rows == [(1, "blue", 1), (2, None, 2)]
    assert out["audits"].columns == ["id", "nested__color", "_ver"]
