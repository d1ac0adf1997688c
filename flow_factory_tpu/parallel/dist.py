"""Distributed topology + host-side collectives.

The reference builds a custom collective layer over NCCL/torch.distributed
(``src/flow_factory/utils/dist.py``: variable-length gathers, packed stat
reductions, env world-size detection at ``:54-71``). On TPU the device-side
communication is XLA collectives inserted by ``jit`` from sharding
annotations; what remains here is:

- world/replica topology resolution (for config geometry alignment),
- host-side cross-process gathers for the reward/advantage path
  (multi-host only; single-process runs degrade to local no-ops, the same
  design discipline as the reference's ``_is_distributed()`` guards).

Terminology: *replica* = one data-parallel rollout worker. By default each
device is a replica (pure DP); with model sharding, replicas =
``num_devices / shard_size``.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional

import numpy as np

_WORLD_SIZE_OVERRIDE: Optional[int] = None


def set_world_size_override(n: Optional[int]) -> None:
    """Force the replica count (used by tests and config tooling)."""
    global _WORLD_SIZE_OVERRIDE
    _WORLD_SIZE_OVERRIDE = n


def get_world_size() -> int:
    """Number of data-parallel replicas.

    Resolution order: explicit override → ``FFT_NUM_REPLICAS`` env →
    JAX device count (if JAX is already initialized or cheaply initializable)
    → 1. Mirrors the reference env contract (WORLD_SIZE/OMPI/PMI,
    ``utils/dist.py:54-71``) with TPU-native names.
    """
    if _WORLD_SIZE_OVERRIDE is not None:
        return _WORLD_SIZE_OVERRIDE
    for var in ("FFT_NUM_REPLICAS", "WORLD_SIZE"):
        v = os.environ.get(var)
        if v:
            return int(v)
    try:
        import jax

        return jax.device_count()
    except Exception:
        return 1


def get_rank() -> int:
    """Host process index (multi-host); 0 in single-process runs."""
    v = os.environ.get("FFT_PROCESS_INDEX")
    if v:
        return int(v)
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def get_num_processes() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def is_distributed() -> bool:
    """True when more than one *host process* participates.

    Device-level parallelism inside one process is handled entirely by XLA
    and never needs host collectives.
    """
    return get_num_processes() > 1


def initialize_multihost(coordinator_address: Optional[str] = None) -> None:
    """Initialize JAX multi-host (one process per host on a pod slice)."""
    import jax

    if jax.process_count() > 1:
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # Already initialized or single-host run.
        pass


def host_allgather(x: np.ndarray) -> np.ndarray:
    """All-gather a host numpy array across processes (axis 0 concat).

    Single-process: identity. Multi-host: uses
    ``jax.experimental.multihost_utils.process_allgather``.
    """
    if not is_distributed():
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x), tiled=True))


def host_allgather_objects(objs: List[Any]) -> List[List[Any]]:
    """Gather arbitrary (picklable) python objects from all processes.

    The reference's pickle ``gather_object`` fallback
    (``utils/dist.py:284,315``). Returns ONE LIST PER PROCESS, indexed by
    process id; single-process runs return ``[objs]``.
    """
    if not is_distributed():
        return [list(objs)]
    import pickle

    payload = pickle.dumps(list(objs))
    buf = np.frombuffer(payload, dtype=np.uint8)
    # pad to max length across hosts
    from jax.experimental import multihost_utils

    n = np.array([len(buf)], dtype=np.int64)
    lens = np.asarray(multihost_utils.process_allgather(n, tiled=True)).reshape(-1)
    maxlen = int(lens.max())
    padded = np.zeros((maxlen,), dtype=np.uint8)
    padded[: len(buf)] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded, tiled=True)).reshape(-1, maxlen)
    return [pickle.loads(row[:ln].tobytes()) for row, ln in zip(gathered, lens)]


def global_stats(values: np.ndarray) -> tuple:
    """Global (mean, std) across processes via one packed (count,sum,sumsq)
    reduction — the reference's single-reduce trick (``utils/dist.py:414-489``)."""
    values = np.asarray(values, dtype=np.float64)
    packed = np.array([values.size, values.sum(), (values**2).sum()], dtype=np.float64)
    if is_distributed():
        packed = host_allgather(packed[None, :]).reshape(-1, 3).sum(axis=0)
    n, s, ss = packed
    mean = s / max(n, 1)
    std = max((ss / max(n, 1) - mean**2), 0.0) ** 0.5
    return float(mean), float(max(std, 1e-6))
