"""Scheduler registry: scheduler name → SDE scheduler class.

Mirrors reference ``scheduler/registry.py:29-33`` which maps diffusers
scheduler class names onto their SDE subclasses. Here the keys are our own
scheduler names plus the diffusers class-name aliases so the reference YAML
configs keep working.
"""
from __future__ import annotations

from typing import Dict, Type

_SCHEDULER_REGISTRY: Dict[str, type] = {}


def register_scheduler(*names: str):
    def deco(cls):
        for name in names:
            _SCHEDULER_REGISTRY[name.lower()] = cls
        return cls

    return deco


def get_scheduler_class(name: str) -> Type:
    key = name.lower()
    if key not in _SCHEDULER_REGISTRY:
        raise KeyError(
            f"Unknown scheduler {name!r}. Registered: {sorted(_SCHEDULER_REGISTRY)}"
        )
    return _SCHEDULER_REGISTRY[key]


def _register_builtin():
    from .flow_match_euler import FlowMatchEulerSDE
    from .unipc import UniPCSDEScheduler

    register_scheduler(
        "flow_match_euler",
        "FlowMatchEulerDiscreteScheduler",
        "flowmatcheulerdiscrete",
    )(FlowMatchEulerSDE)
    register_scheduler(
        "unipc",
        "UniPCMultistepScheduler",
        "unipcmultistep",
    )(UniPCSDEScheduler)


_register_builtin()
