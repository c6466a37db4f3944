from .catalog import CATALOG, queries, oracle_sql  # noqa: F401
