from .tables import TABLES, load_table, load_tables, read_kv_text_dir

__all__ = ["TABLES", "load_table", "load_tables", "read_kv_text_dir"]
