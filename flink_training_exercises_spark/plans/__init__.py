from .catalog import CATALOG, entry_query, oracle_sql, queries  # noqa: F401
