from .catalog import (
    TABLES, load_table, load_tables, register_views, scratch_dir, spread,
)

__all__ = [
    "TABLES", "load_table", "load_tables", "register_views", "scratch_dir",
    "spread",
]
