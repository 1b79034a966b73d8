from .tables import TABLE_SCHEMAS, TABLES, load_table  # noqa: F401
