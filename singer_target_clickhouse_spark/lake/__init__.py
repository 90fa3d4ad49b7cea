from .catalog import LakeCatalog, TableSnapshot  # noqa: F401
