"""Schema-compiler golden tests, ported from the reference's
``tests/jsonSchemaInspector.spec.ts`` (same fixtures, same expectations)."""

from singer_target_clickhouse_spark.identifiers import escape_identifier
from singer_target_clickhouse_spark.schema.inspector import (
    PKType,
    build_meta,
    scalar_type,
)

SIMPLE_SCHEMA = {
    "properties": {
        "author_id": {"type": ["null", "string"]},
        "id": {"type": ["null", "integer"]},
        "created_at": {"format": "date-time", "type": ["string"]},
        "ticket_id": {"type": ["null", "integer"]},
    },
    "type": ["null", "object"],
}

NESTED_OBJECT_SCHEMA = {
    "properties": {
        "id": {"type": ["null", "integer"]},
        "nested": {"type": ["null", "object"], "properties": {"color": {"type": "string"}}},
    },
    "type": ["null", "object"],
}

ARRAY_SCALAR_SCHEMA = {
    "properties": {
        "collaborator_ids": {
            "items": {"type": ["null", "integer"]},
            "type": ["null", "array"],
        },
        "id": {"type": ["null", "integer"]},
    },
    "type": ["null", "object"],
}

ARRAY_OBJECT_SCHEMA = {
    "properties": {
        "custom_fields": {
            "items": {
                "properties": {
                    "field": {"type": ["null", "integer"]},
                    "value": {},
                },
                "type": ["null", "object"],
            },
            "type": ["null", "array"],
        },
        "id": {"type": ["null", "integer"]},
    },
    "type": ["null", "object"],
}

NESTED_OBJECT_WITH_ARRAYS_SCHEMA = {
    "properties": {
        "id": {"type": ["null", "integer"]},
        "nested": {
            "type": ["null", "object"],
            "properties": {
                "color": {"type": "string"},
                "tags": {
                    "type": "array",
                    "items": {
                        "properties": {"value": {"type": "integer"}},
                        "type": "object",
                    },
                },
            },
        },
    },
    "type": ["null", "object"],
}

DEEP_NESTED_ARRAY_OBJECT_SCHEMA = {
    "properties": {
        "bill_fields": {
            "items": {
                "properties": {
                    "bill_id": {"type": "number"},
                    "john_fields": {
                        "type": "array",
                        "items": {
                            "properties": {
                                "jack_fields": {
                                    "type": "array",
                                    "items": {
                                        "properties": {"jack_value": {"type": "number"}},
                                        "type": "object",
                                    },
                                },
                                "john_id": {"type": "number"},
                                "name": {"type": "string"},
                            },
                            "type": "object",
                        },
                    },
                },
                "type": "object",
            },
            "type": "array",
        },
        "id": {"type": "integer"},
    },
    "type": "object",
}

NESTED_VALUE_ARRAY_SCHEMA = {
    "type": ["null", "object"],
    "properties": {
        "id": {"type": "string"},
        "events": {
            "type": ["null", "array"],
            "items": {
                "type": ["null", "object"],
                "properties": {
                    "previous_value": {
                        "type": ["null", "array", "string"],
                        "items": {"type": ["null", "string"]},
                    },
                },
            },
        },
    },
}


def test_simple_column_sql_type():
    assert scalar_type({"type": ["null", "integer"]}, None, "audits")[0] == "Int64"


def test_simple_schema():
    res = build_meta("audits", SIMPLE_SCHEMA, ["id"])
    assert res.sql_table_name == "`audits`"
    assert len(res.pk_columns) == 1
    assert res.pk_columns[0].ch_type == "Int64"
    assert len(res.simple_columns) == 3
    created = next(c for c in res.simple_columns if c.prop == "created_at")
    assert created.nullable is False
    assert created.ch_type == "DateTime"


def test_array_scalar():
    res = build_meta("audits", ARRAY_SCALAR_SCHEMA, ["id"])
    assert len(res.children) == 1
    child = res.children[0]
    assert child.sql_table_name == "`audits__collaborator_ids`"
    assert len(child.pk_columns) == 2
    assert child.pk_columns[1].prop == "_level_0_index"
    assert child.pk_columns[1].ch_type == "Int32"
    assert child.pk_columns[1].nullable is False
    assert child.pk_columns[0].prop == "id"
    assert child.pk_columns[0].ch_type == "Int64"
    # array-of-scalar child carries a single nullable `value` column
    assert [c.name for c in child.simple_columns] == ["value"]
    assert child.simple_columns[0].ch_type == "Int64"
    assert child.simple_columns[0].nullable is True


def test_nested_object():
    res = build_meta("audits", NESTED_OBJECT_SCHEMA, ["id"])
    assert len(res.children) == 0
    assert len(res.simple_columns) == 1
    assert len(res.pk_columns) == 1
    assert res.simple_columns[0].sql_identifier == "`nested__color`"
    assert res.simple_columns[0].ch_type == "String"
    # nullable parent propagates nullability to flattened children
    assert res.simple_columns[0].nullable is True


def test_array_of_nested_object():
    res = build_meta("audits", ARRAY_OBJECT_SCHEMA, ["id"])
    child = res.children[0]
    assert child.sql_table_name == "`audits__custom_fields`"
    # `value: {}` empty schema is skipped (unknown type)
    assert len(child.simple_columns) == 1
    assert child.simple_columns[0].sql_identifier == "`field`"
    assert len(child.pk_columns) == 2
    assert child.pk_columns[1].sql_identifier == "`_level_0_index`"
    assert child.pk_columns[0].sql_identifier == "`_root_id`"


def test_array_of_nested_object_with_children_pk():
    akp = {"props": ["id"], "children": {"custom_fields": {"props": [], "children": {}}}}
    res = build_meta("audits", ARRAY_OBJECT_SCHEMA, ["id"], all_key_properties=akp)
    child = res.children[0]
    assert child.sql_table_name == "`audits__custom_fields`"
    assert len(child.simple_columns) == 1
    assert child.simple_columns[0].sql_identifier == "`field`"
    assert len(child.pk_columns) == 3
    assert [c.sql_identifier for c in child.pk_columns] == [
        "`_root_id`", "`_parent_id`", "`_level_0_index`",
    ]


def test_deep_nested_array_object_with_children_pk():
    akp = {
        "props": ["id"],
        "children": {
            "bill_fields": {
                "props": ["bill_id"],
                "children": {"john_fields": {"props": ["john_id"], "children": {}}},
            }
        },
    }
    res = build_meta("audits", DEEP_NESTED_ARRAY_OBJECT_SCHEMA, ["id"], all_key_properties=akp)
    bill = res.children[0]
    assert bill.sql_table_name == "`audits__bill_fields`"
    assert [c.sql_identifier for c in bill.pk_columns] == [
        "`_root_id`", "`_parent_id`", "`bill_id`", "`_level_0_index`",
    ]
    john = bill.children[0]
    assert john.sql_table_name == "`audits__bill_fields__john_fields`"
    assert [c.sql_identifier for c in john.pk_columns] == [
        "`_root_id`", "`_parent_bill_id`", "`john_id`", "`_level_0_index`", "`_level_1_index`",
    ]
    # PK must not leak into simple columns
    assert all(c.prop != "john_id" for c in john.simple_columns)
    assert any(c.prop == "name" for c in john.simple_columns)
    jack = john.children[0]
    assert jack.sql_table_name == "`audits__bill_fields__john_fields__jack_fields`"
    assert [c.sql_identifier for c in jack.pk_columns] == [
        "`_root_id`", "`_parent_john_id`", "`_level_0_index`", "`_level_1_index`", "`_level_2_index`",
    ]


def test_nested_object_with_arrays():
    res = build_meta("audits", NESTED_OBJECT_WITH_ARRAYS_SCHEMA, ["id"])
    assert len(res.children) == 1
    assert res.children[0].sql_table_name == "`audits__nested__tags`"
    assert len(res.children[0].simple_columns) == 1
    # flattened compound path survives for extraction
    color = next(c for c in res.simple_columns if c.name == "nested__color")
    assert color.path == ["nested", "color"]


def test_nested_value_array_schema_golden():
    res = build_meta("audits", NESTED_VALUE_ARRAY_SCHEMA, ["id"])

    def summarize(meta):
        return {
            "prop": meta.prop,
            "sqlTableName": meta.sql_table_name,
            "pks": [
                (c.prop, c.sql_identifier, c.ch_type, c.nullable, c.low_cardinality,
                 c.nested_array, c.pk_type.value)
                for c in meta.pk_columns
            ],
            "simple": [
                (c.sql_identifier, c.ch_type, c.nullable, c.low_cardinality, c.nested_array)
                for c in meta.simple_columns
            ],
            "children": [summarize(c) for c in meta.children],
        }

    assert summarize(res) == {
        "prop": "audits",
        "sqlTableName": "`audits`",
        "pks": [("id", "`id`", "String", False, False, False, "CURRENT")],
        "simple": [],
        "children": [
            {
                "prop": "events",
                "sqlTableName": "`audits__events`",
                "pks": [
                    ("id", "`_root_id`", "String", False, False, False, "ROOT"),
                    ("_level_0_index", "`_level_0_index`", "Int32", False, False, False, "LEVEL"),
                ],
                "simple": [],
                "children": [
                    {
                        "prop": "previous_value",
                        "sqlTableName": "`audits__events__previous_value`",
                        "pks": [
                            ("id", "`_root_id`", "String", False, False, False, "ROOT"),
                            ("_level_0_index", "`_level_0_index`", "Int32", False, False, False, "LEVEL"),
                            ("_level_1_index", "`_level_1_index`", "Int32", False, False, False, "LEVEL"),
                        ],
                        "simple": [("`value`", "String", True, False, False)],
                        "children": [],
                    }
                ],
            }
        ],
    }


def test_identifier_truncation_is_byte_identical():
    # reference escapeIdentifier: >64 chars -> head + sha1[:10] + last 27
    long_id = "a" * 100
    out = escape_identifier(long_id)
    assert out.startswith("`") and out.endswith("`")
    inner = out.strip("`")
    assert len(inner) == 64
    import hashlib

    uid = hashlib.sha1(long_id.encode()).hexdigest()[:10]
    assert inner == long_id[: 64 - 10 - 27] + uid + long_id[-27:]


def test_array_child_without_root_pk_refused():
    import pytest

    with pytest.raises(Exception, match="refused"):
        build_meta("audits", ARRAY_SCALAR_SCHEMA, [])
