from .tables import TABLES, load_tables  # noqa: F401
