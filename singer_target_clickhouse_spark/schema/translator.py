"""DDL synthesis + schema-evolution diffing.

Re-expresses the reference's ``src/jsonSchemaTranslator.ts``:

- ``to_qualified_type`` — ClickHouse type-string composition
  ``Array(LowCardinality(Nullable(T)))`` (``jsonSchemaTranslator.ts:90-100``),
  kept verbatim because the column diff compares *these strings*;
- ``create_table_ddl`` — the reference's ``CREATE TABLE … ENGINE … ORDER BY``
  statement (``jsonSchemaTranslator.ts:57-78``), emitted for parity tests and
  documentation (the lake itself stores the same facts in its manifest);
- ``expected_columns`` — the required column set incl. ``_ver``/``_root_ver``
  and sorting-key flags (``jsonSchemaTranslator.ts:158-183``);
- ``columns_intersection`` — {missing, modified, obsolete}
  (``jsonSchemaTranslator.ts:117-144``);
- ``check_primary_keys_consistency`` — PK add/remove vs existing sorting key
  is an error (``jsonSchemaTranslator.ts:146-156``).
"""

from __future__ import annotations

from dataclasses import dataclass

from .inspector import ColumnSpec, PKType, TableMeta


@dataclass(frozen=True)
class Column:
    """≙ reference ``ClickhouseConnection.Column``."""

    name: str
    type: str
    is_in_sorting_key: bool = False


def to_qualified_type(col: ColumnSpec) -> str:
    """Compose modifiers (reference ``jsonSchemaTranslator.ts:90-100``)."""
    t = col.ch_type
    for modifier, enabled in (("Nullable", col.nullable), ("LowCardinality", col.low_cardinality), ("Array", col.nested_array)):
        if enabled:
            t = f"{modifier}({t})"
    return t


def resolve_engine(meta: TableMeta) -> str:
    """Reference ``jsonSchemaTranslator.ts:36``."""
    return "ReplacingMergeTree(_ver)" if meta.is_root and meta.pk_columns else "MergeTree"


def _order_by_content(idents: list[str]) -> str:
    if not idents:
        return "tuple()"
    inner = ", ".join(idents)
    return f"({inner})" if len(idents) > 1 else inner


def resolve_order_by(meta: TableMeta) -> str:
    """Reference ``jsonSchemaTranslator.ts:39-53``."""
    if meta.is_root:
        idents = [c.sql_identifier for c in meta.pks_of(PKType.CURRENT)]
    else:
        idents = [c.sql_identifier for c in meta.pks_of(PKType.ROOT, PKType.LEVEL)]
    return _order_by_content(idents)


def _version_column_def(meta: TableMeta, with_type: bool = True) -> str:
    """Reference ``resolveVersionColumn`` (jsonSchemaTranslator.ts:22-34)."""
    suffix = " UInt64" if with_type else ""
    vc = meta.version_column
    return f"`{vc}`{suffix}" if vc else ""


def create_table_ddl(database: str, meta: TableMeta, recursive: bool) -> list[str]:
    """Reference ``translateCH`` (jsonSchemaTranslator.ts:57-78), emitted for
    parity tests; refuses zero-column tables like the reference."""
    if not meta.simple_columns and not meta.pk_columns:
        raise ValueError("Attempting to create table without columns")
    defs = (
        [f"{c.sql_identifier} {c.ch_type}" for c in meta.pk_columns]
        + [f"{c.sql_identifier} {to_qualified_type(c)}" for c in meta.simple_columns]
        + [_version_column_def(meta)]
    )
    defs = [d for d in defs if d]
    out = [
        f"CREATE TABLE {database}.{meta.sql_table_name} ( {', '.join(defs)} ) "
        f"ENGINE = {resolve_engine(meta)} ORDER BY {resolve_order_by(meta)}"
    ]
    if recursive:
        for child in meta.children:
            out.extend(create_table_ddl(database, child, recursive))
    return out


def expected_columns(meta: TableMeta) -> list[Column]:
    """Required columns vs which an existing table is diffed
    (reference ``updateSchema``'s expectedColumns, jsonSchemaTranslator.ts:158-183)."""
    # The reference decides root-ness here by "has no ROOT pk columns".
    is_root = len(meta.pks_of(PKType.ROOT)) == 0
    cols: list[Column] = []
    for c in meta.pk_columns:
        in_sorting = (
            c.pk_type == PKType.CURRENT
            if is_root
            else c.pk_type in (PKType.ROOT, PKType.LEVEL)
        )
        if in_sorting:
            # PK mappings are never nullable/array, so qualified type == ch_type.
            cols.append(Column(c.name, c.ch_type, True))
    for c in meta.pk_columns:
        if not is_root and c.pk_type in (PKType.CURRENT, PKType.PARENT):
            cols.append(Column(c.name, c.ch_type, False))
    for c in meta.simple_columns:
        cols.append(Column(c.name, to_qualified_type(c), False))
    if not is_root or meta.pks_of(PKType.CURRENT):
        cols.append(Column("_ver" if is_root else "_root_ver", "UInt64", False))
    return cols


def columns_intersection(existing: list[Column], required: list[Column]) -> dict:
    """Reference ``getColumnsIntersections`` (jsonSchemaTranslator.ts:117-144)."""
    by_name_existing = {c.name: c for c in existing}
    by_name_required = {c.name: c for c in required}
    missing = [c for c in required if c.name not in by_name_existing]
    modified = [
        {"existing": e, "new": by_name_required[e.name]}
        for e in existing
        if e.name in by_name_required and by_name_required[e.name].type != e.type
    ]
    obsolete = [c for c in existing if c.name not in by_name_required]
    return {"missing": missing, "modified": modified, "obsolete": obsolete}


class PKConsistencyError(ValueError):
    pass


def check_primary_keys_consistency(existing: list[Column], meta: TableMeta) -> None:
    """Reference ``checkPrimaryKeysConsistency`` (jsonSchemaTranslator.ts:146-156):
    the incoming PK set must equal the table's sorting key."""
    table_pks = {c.name for c in existing if c.is_in_sorting_key}
    schema_pks = {c.prop for c in meta.pk_columns}
    added = schema_pks - table_pks
    removed = table_pks - schema_pks
    if added or removed:
        raise PKConsistencyError(
            "Could not update table because of key properties "
            f"(new: {sorted(added)}, removed: {sorted(removed)})"
        )
