from .writers import write_bucketed_table, write_table

__all__ = ["write_table", "write_bucketed_table"]
