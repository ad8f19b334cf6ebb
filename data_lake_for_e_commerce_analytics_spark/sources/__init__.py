from .tables import TABLE_NAMES, ensure_min_parallelism, load_table, load_tables

__all__ = ["TABLE_NAMES", "ensure_min_parallelism", "load_table", "load_tables"]
