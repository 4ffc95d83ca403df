from .io import read_csv_dir, safe_read_csv, union_by_name, write_table  # noqa: F401
