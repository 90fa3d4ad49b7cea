"""Identifier escaping / truncation rules.

Byte-identical port of the *rule* in the reference's
``src/jsonSchemaInspector.ts:377-385`` (``escapeIdentifier``): identifiers are
backtick-enclosed and, when longer than 64 chars, shortened to
``head + sha1(id)[:10] + tail27`` so that the total stays at 64. Table-name
equality with the reference matters for state-hash parity, so the truncation
math is kept verbatim.
"""

from __future__ import annotations

import hashlib

#: Separator injected between a nested object's name and its child property
#: when flattening 1..1 objects into the parent table
#: (reference ``jsonSchemaInspector.ts:20``). Chosen by the reference as
#: "least likely to appear in a column name"; swapped for the subtable
#: separator at escape time.
NESTED_SUB_OBJECT_SEPARATOR = "$%€£"

#: Default separator between parent and child table names
#: (reference ``src/Config.ts:27``).
DEFAULT_SUBTABLE_SEPARATOR = "__"

MAX_IDENTIFIER_LEN = 64


def escape_identifier(ident: str, subtable_separator: str = DEFAULT_SUBTABLE_SEPARATOR) -> str:
    """Backtick-escape + 64-char sha1 truncation (reference
    ``jsonSchemaInspector.ts:377-385``)."""
    ident = ident.replace(NESTED_SUB_OBJECT_SEPARATOR, subtable_separator)
    if len(ident) > MAX_IDENTIFIER_LEN:
        uid = hashlib.sha1(ident.encode("utf-8")).hexdigest()[:10]
        ident = ident[: MAX_IDENTIFIER_LEN - len(uid) - 27] + uid + ident[len(ident) - 27 :]
    return f"`{ident}`"


def unescape(ident: str) -> str:
    """Strip the magic backquotes (reference ``jsonSchemaTranslator.ts:113``)."""
    return ident.replace("`", "")


def plain_identifier(ident: str, subtable_separator: str = DEFAULT_SUBTABLE_SEPARATOR) -> str:
    """The escaped identifier without backticks — what our lake uses as the
    physical table/column name (Parquet/Iceberg names can't carry quotes)."""
    return unescape(escape_identifier(ident, subtable_separator))
