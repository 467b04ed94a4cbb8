from .checks import executed_plan, has_broadcast_hash_join, pushed_filters, read_schema

__all__ = ["executed_plan", "has_broadcast_hash_join", "pushed_filters", "read_schema"]
