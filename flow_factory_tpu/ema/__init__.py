from .ema import (
    EMA,
    constant_decay,
    cosine_decay,
    get_decay_schedule,
    linear_decay,
    piecewise_linear_decay,
    power_decay,
    warmup_cosine_decay,
)

__all__ = [
    "EMA",
    "get_decay_schedule",
    "constant_decay",
    "power_decay",
    "linear_decay",
    "piecewise_linear_decay",
    "cosine_decay",
    "warmup_cosine_decay",
]
