from .writers import write_table

__all__ = ["write_table"]
