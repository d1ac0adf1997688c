from .abc import BaseAdapter, PendingRollout, finish_rollout
from .loader import load_adapter
from .registry import available_adapters, register_adapter, resolve_adapter_class

__all__ = [
    "BaseAdapter",
    "PendingRollout",
    "finish_rollout",
    "load_adapter",
    "resolve_adapter_class",
    "register_adapter",
    "available_adapters",
]
