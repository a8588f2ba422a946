from .inspect import count_exchanges, join_strategies, plan_summary, scan_info

__all__ = ["plan_summary", "count_exchanges", "join_strategies", "scan_info"]
