"""DDL + diff golden tests, ported from the reference's
``tests/jsonSchemaTranslator.spec.ts``."""

import pytest

from singer_target_clickhouse_spark.schema.inspector import ColumnSpec, PKType, TableMeta
from singer_target_clickhouse_spark.schema.translator import (
    Column,
    columns_intersection,
    create_table_ddl,
    to_qualified_type,
)


def col(prop, ident, ch, nullable=False, lowcard=False, arr=False, pk=None):
    return ColumnSpec(
        prop=prop, sql_identifier=ident, ch_type=ch, spark_type=None,
        nullable=nullable, low_cardinality=lowcard, nested_array=arr, pk_type=pk,
    )


def simple_meta(**over):
    base = dict(
        prop="order",
        sql_table_name="`order`",
        pk_columns=[],
        simple_columns=[
            col("id", "`id`", "Int32"),
            col("name", "`name`", "String", nullable=True),
        ],
        children=[],
        level=0,
    )
    base.update(over)
    return TableMeta(**base)


def meta_with_pk(**over):
    base = dict(
        prop="order",
        sql_table_name="`order`",
        pk_columns=[col("id", "`id`", "UInt32", pk=PKType.CURRENT)],
        simple_columns=[col("name", "`name`", "String", nullable=True)],
        children=[],
        level=0,
    )
    base.update(over)
    return TableMeta(**base)


def test_refuse_empty_meta():
    with pytest.raises(ValueError):
        create_table_ddl("db", simple_meta(pk_columns=[], simple_columns=[]), True)


def test_translate_basic_meta():
    res = create_table_ddl("db", simple_meta(), True)
    assert res == [
        "CREATE TABLE db.`order` ( `id` Int32, `name` Nullable(String) ) "
        "ENGINE = MergeTree ORDER BY tuple()"
    ]


def test_translate_meta_with_pk():
    res = create_table_ddl("db", meta_with_pk(), True)
    assert res == [
        "CREATE TABLE db.`order` ( `id` UInt32, `name` Nullable(String), `_ver` UInt64 ) "
        "ENGINE = ReplacingMergeTree(_ver) ORDER BY `id`"
    ]


def test_translate_meta_with_pk_and_children():
    child = simple_meta(sql_table_name="`order_child`", level=1)
    res = create_table_ddl("db", meta_with_pk(children=[child]), True)
    assert res == [
        "CREATE TABLE db.`order` ( `id` UInt32, `name` Nullable(String), `_ver` UInt64 ) "
        "ENGINE = ReplacingMergeTree(_ver) ORDER BY `id`",
        "CREATE TABLE db.`order_child` ( `id` Int32, `name` Nullable(String), `_root_ver` UInt64 ) "
        "ENGINE = MergeTree ORDER BY tuple()",
    ]


def test_translate_cardinality():
    m = simple_meta()
    m.simple_columns[1].low_cardinality = True
    res = create_table_ddl("db", m, True)
    assert res == [
        "CREATE TABLE db.`order` ( `id` Int32, `name` LowCardinality(Nullable(String)) ) "
        "ENGINE = MergeTree ORDER BY tuple()"
    ]


def test_list_table_names():
    child = simple_meta(sql_table_name="`order_child`", level=1)
    assert meta_with_pk(children=[child]).table_names() == ["order", "order_child"]


@pytest.mark.parametrize(
    "ch,nullable,lowcard,arr,expected",
    [
        ("Int32", False, False, False, "Int32"),
        ("String", False, False, True, "Array(String)"),
        ("UInt64", True, False, False, "Nullable(UInt64)"),
        ("DateTime", False, True, False, "LowCardinality(DateTime)"),
        ("UInt8", True, True, True, "Array(LowCardinality(Nullable(UInt8)))"),
    ],
)
def test_to_qualified_type(ch, nullable, lowcard, arr, expected):
    assert to_qualified_type(col("c", "`c`", ch, nullable, lowcard, arr)) == expected


def test_columns_intersections():
    not_modified = Column("not_modified", "1")
    to_delete = Column("to_delete", "1")
    to_modify_existing = Column("to_modify", "1")
    to_add = Column("to_add", "1")
    to_modify_required = Column("to_modify", "2")
    res = columns_intersection(
        [not_modified, to_delete, to_modify_existing],
        [not_modified, to_add, to_modify_required],
    )
    assert res["missing"] == [to_add]
    assert res["modified"] == [{"existing": to_modify_existing, "new": to_modify_required}]
    assert res["obsolete"] == [to_delete]
