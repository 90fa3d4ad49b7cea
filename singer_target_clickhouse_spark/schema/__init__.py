from .inspector import (  # noqa: F401
    ColumnSpec,
    PKType,
    TableMeta,
    build_meta,
    format_level_index_column,
    format_parent_pk_column,
    format_root_pk_column,
)
