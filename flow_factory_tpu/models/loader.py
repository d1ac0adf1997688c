"""Adapter factory (reference: ``src/flow_factory/models/loader.py``)."""
from __future__ import annotations

from typing import Optional

from .abc import BaseAdapter
from .registry import resolve_adapter_class


def load_adapter(config, mesh=None) -> BaseAdapter:
    cls = resolve_adapter_class(config.model_args.model_type)
    return cls(config, mesh=mesh)
