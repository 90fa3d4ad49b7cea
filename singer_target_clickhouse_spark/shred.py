"""Vectorized record shredding — reference ``src/RecordProcessor.ts`` as pure
DataFrame plans (category C of SURVEY.md §2).

One JSON record becomes one root row plus N child rows per array level.
Everything is JVM-side and whole-stage-codegen friendly:

- the record parses once per nesting level with ``from_json``; array-child
  properties are captured as *raw JSON strings* (string-typed struct fields
  keep the unparsed text), so each level parses lazily;
- the reference's tolerance rule — schema says array but the record holds an
  object -> treat as 1-element array (``RecordProcessor.ts:117-119``) — is a
  ``when(startswith('{'), concat('[', raw, ']'))`` string rewrite before the
  nested ``from_json``;
- element position at every nesting level comes from ``posexplode``
  (= ``_level_i_index``, ``RecordProcessor.ts:96,120-121``);
- root PK values / parent PK values / root ``_ver`` thread down as carried
  columns (``RecordProcessor.ts:92-106``);
- optional ``translate_values`` coercion (``src/SchemaTranslator.ts``) is a
  cast/when chain per column — no per-row Python anywhere.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from .identifiers import NESTED_SUB_OBJECT_SEPARATOR
from .schema.inspector import ColumnSpec, PKType, TableMeta

SEQ_COL = "_seq"


# ---------------------------------------------------------------------------
# Value translation (reference SchemaTranslator.ts:6-60), vectorized.
# ---------------------------------------------------------------------------

_INT_RE = r"^\s*([+-]?\d+)"
_FLOAT_RE = r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"

#: Non-ISO layouts accepted by the best-effort datetime parser, mirroring
#: ClickHouse's ``date_time_input_format: "best_effort"`` which the reference
#: sets on every insert connection (``ClickhouseConnection.ts:163``): real
#: Singer taps emit RFC-ish and slash-separated forms, not just ISO. Ambiguous
#: day/month order resolves day-first, like ClickHouse best_effort.
_TS_FORMATS = [
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
    "dd/MM/yyyy",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd",
    "dd MMM yyyy HH:mm:ss",
    "dd MMM yyyy",
]


def _best_effort_timestamp(col: Column) -> Column:
    """ISO first (plain cast handles offsets/'T'/fractions), then the layout
    list, then bare unix epoch seconds; unparseable -> null (the reference's
    insert would store a best-effort value or fail the row — warn-and-null is
    the lossless-to-diagnose Spark equivalent). All branches are ``try_``
    forms: no ANSI runtime failures, pure JVM expressions."""
    attempts = [col.try_cast("timestamp")]
    attempts += [F.try_to_timestamp(col, F.lit(f)) for f in _TS_FORMATS]
    attempts.append(
        F.when(col.rlike(r"^\d{9,10}$"), F.timestamp_seconds(col.try_cast("long")))
    )
    return F.coalesce(*attempts)


def _translate_scalar(col: Column, spec: ColumnSpec) -> Column:
    """JS-parity coercion from a raw string value: parseInt / parseFloat with
    NaN->null, boolean "true"/true/1 -> true, String(v) otherwise; date /
    date-time formats get best-effort multi-layout parsing."""
    jt = spec.json_type
    if jt == "boolean":
        out = F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            col.isin("true", "1")
        )
        return out.cast(spec.spark_type)
    if jt == "integer":
        digits = F.regexp_extract(col, _INT_RE, 1)
        return F.when(digits == "", F.lit(None)).otherwise(digits).cast(spec.spark_type)
    if jt == "number":
        num = F.regexp_extract(col, _FLOAT_RE, 1)
        return F.when(num == "", F.lit(None)).otherwise(num).cast(spec.spark_type)
    if isinstance(spec.spark_type, T.TimestampType):
        return _best_effort_timestamp(col)
    if isinstance(spec.spark_type, T.DateType):
        return _best_effort_timestamp(col).cast("date")
    # strings cast from their text form
    return col.cast(spec.spark_type)


def _column_value(parsed: Column, spec: ColumnSpec, translate: bool) -> Column:
    """Extract + coerce one column from a parsed struct column."""
    v = parsed
    for part in spec.path:
        if part:
            v = v.getField(part)
    if translate:
        if spec.nested_array:
            return F.transform(v, lambda e: _translate_scalar(e, spec)).cast(
                spec.spark_field_type()
            )
        return _translate_scalar(v, spec)
    return v.cast(spec.spark_field_type())


def _parse_schema_for(meta: TableMeta, translate: bool) -> T.DataType:
    """Parse schema of one element of this node. With translate_values on,
    scalar leaves parse as strings so the coercion chain sees the raw text
    (the reference re-parses the already-JSON.parse()d value)."""
    if meta_is_scalar_leaf(meta):
        leaf = meta.simple_columns[0]
        return T.StringType() if translate else (leaf.spark_type or T.StringType())
    schema = meta.parse_schema()
    if not translate:
        return schema

    def stringify(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, stringify(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(stringify(dt.elementType), True)
        if isinstance(dt, T.StringType):
            return dt
        return T.StringType()

    return stringify(schema)


def meta_is_scalar_leaf(meta: TableMeta) -> bool:
    """Array-of-scalars child: single unnamed `value` column
    (``jsonSchemaInspector.ts:263-281``)."""
    return len(meta.simple_columns) == 1 and meta.simple_columns[0].prop == ""


def _wrap_single_object(raw: Column) -> Column:
    """Reference C4 (``RecordProcessor.ts:117-119``): a non-array value where
    an array was declared becomes a 1-element array (objects AND scalars —
    see the reference's nested-value-array golden, RecordProcessor.spec.ts:137-151);
    JS-falsy values (null/false/0/"") produce no rows."""
    trimmed = F.ltrim(raw)
    return (
        F.when(raw.isNull() | trimmed.isin("null", "false", "0", '""'), F.lit(None).cast("string"))
        .when(trimmed.startswith("["), raw)
        .otherwise(F.concat(F.lit("["), raw, F.lit("]")))
    )


def shred_stream(
    records: DataFrame,
    meta: TableMeta,
    ver_offset: int = 0,
    translate_values: bool = False,
    record_col: str = "record",
) -> dict[str, DataFrame]:
    """Shred a batch of one stream's RECORD payloads into per-table DataFrames.

    ``records`` must have a string column ``record_col`` (the record's JSON
    text) and a long ``_seq`` column — the durable, strictly-monotone source
    offset. The root version is ``_ver = ver_offset + _seq + 1``: derived from
    the source offset, not a driver counter, so replays regenerate identical
    versions (this is what makes the MERGE idempotent — the Spark-native
    upgrade over the reference's in-memory ``maxVer``,
    ``StreamProcessor.ts:56-61``).

    Returns ``{table_name: DataFrame}`` with every frame in the table's
    physical column order (pks, simple columns, version).
    """
    out: dict[str, DataFrame] = {}
    ver_expr = (F.col(SEQ_COL) + F.lit(ver_offset + 1)).cast("long")

    root_schema = _parse_schema_for(meta, translate_values)
    parsed = records.select(
        F.from_json(F.col(record_col), root_schema).alias("r"), F.col(SEQ_COL)
    )

    def emit(node: TableMeta, df: DataFrame, elem: Column, carried: dict[str, Column]):
        """elem = parsed struct of this node's element; carried = inherited
        key/version columns (root pks, parent pks, level indexes, _ver)."""
        cols: list[Column] = []
        for spec in node.pk_columns:
            if spec.pk_type == PKType.CURRENT:
                cols.append(_column_value(elem, spec, translate_values).alias(spec.name))
            else:
                cols.append(carried[spec.name].alias(spec.name))
        if meta_is_scalar_leaf(node):
            leaf = node.simple_columns[0]
            v = _translate_scalar(elem, leaf) if translate_values else elem.cast(
                leaf.spark_field_type()
            )
            cols.append(v.alias(leaf.name))
        else:
            for spec in node.simple_columns:
                cols.append(_column_value(elem, spec, translate_values).alias(spec.name))
        vc = node.version_column
        if vc:
            cols.append(carried["__ver"].alias(vc))

        out[node.table_name] = df.select(*cols)

        if meta_is_scalar_leaf(node):
            return
        # Children: thread root pks / this node's CURRENT pks / levels down.
        for child in node.children:
            raw = elem
            for part in child.prop.split(NESTED_SUB_OBJECT_SEPARATOR):
                raw = raw.getField(part)
            child_schema = T.ArrayType(_parse_schema_for(child, translate_values))
            arr = F.from_json(_wrap_single_object(raw), child_schema)

            carry_exprs: dict[str, Column] = {}
            for spec in child.pk_columns:
                if spec.pk_type == PKType.ROOT:
                    carry_exprs[spec.name] = carried.get(
                        spec.name,
                        _column_value(elem, spec, translate_values) if node.is_root else None,
                    )
                elif spec.pk_type == PKType.PARENT:
                    parent_spec = next(
                        c for c in node.pk_columns
                        if c.pk_type == PKType.CURRENT and c.prop == spec.prop
                    )
                    carry_exprs[spec.name] = _column_value(elem, parent_spec, translate_values)
                elif spec.pk_type == PKType.LEVEL and spec.name in carried:
                    carry_exprs[spec.name] = carried[spec.name]

            select_carry = [expr.alias(f"__c_{k}") for k, expr in carry_exprs.items()]
            pos_name = f"_level_{child.level - 1}_index"
            exploded = df.select(
                *select_carry,
                carried["__ver"].alias("__c___ver"),
                F.posexplode(arr).alias("__pos", "__elem"),
            )
            child_carried = {k: F.col(f"__c_{k}") for k in carry_exprs}
            child_carried[pos_name] = F.col("__pos").cast("int")
            child_carried["__ver"] = F.col("__c___ver")
            emit(child, exploded, F.col("__elem"), child_carried)

    root_carried = {"__ver": ver_expr}
    emit(meta, parsed, F.col("r"), root_carried)
    return out
