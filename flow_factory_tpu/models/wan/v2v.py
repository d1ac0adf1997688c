"""Wan V2V adapter (re-export; implementation in i2v.py alongside I2V)."""
from .i2v import WanV2VAdapter

__all__ = ["WanV2VAdapter"]
