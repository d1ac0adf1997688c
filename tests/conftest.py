"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-device sharding paths run on
`--xla_force_host_platform_device_count=8` CPU devices, something the
CUDA-bound reference framework cannot do.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
