from .tables import TABLE_NAMES, load_table, load_all, register_views  # noqa: F401
