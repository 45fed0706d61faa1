from .tables import TABLE_SCHEMAS, TABLES, load_table, register_views

__all__ = ["TABLES", "TABLE_SCHEMAS", "load_table", "register_views"]
