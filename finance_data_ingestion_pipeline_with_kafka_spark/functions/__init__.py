from .core import DEC, davg, dsum, dsum_expr, deterministic_id, epoch_millis_to_ts, log_return

__all__ = [
    "DEC",
    "davg",
    "dsum",
    "dsum_expr",
    "deterministic_id",
    "epoch_millis_to_ts",
    "log_return",
]
