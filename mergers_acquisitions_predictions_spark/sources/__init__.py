from .readers import TABLES, load_table, read_corpus_dir, read_csv, register_views
from .writers import write_csv, write_parquet, write_single_csv

__all__ = [
    "TABLES",
    "load_table",
    "read_corpus_dir",
    "read_csv",
    "register_views",
    "write_csv",
    "write_parquet",
    "write_single_csv",
]
