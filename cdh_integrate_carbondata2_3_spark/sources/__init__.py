from .registry import TPCH_TABLES, load_table, register_views  # noqa: F401
