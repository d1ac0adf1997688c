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


def global_tensor_stats_batch(metrics: dict) -> dict:
    """Global {min, max, mean, std} for N metrics in ONE packed gather.

    The reference computes stats for N metrics in exactly 3 all-reduces
    (``utils/dist.py:724-809``); here one packed (N, 5) row of
    (count, sum, sumsq, min, max) per process does it in a single
    ``process_allgather``. Single-process runs never communicate.
    """
    names = sorted(metrics)
    packed = np.zeros((len(names), 5), np.float64)
    for i, name in enumerate(names):
        v = np.asarray(metrics[name], np.float64).reshape(-1)
        if v.size == 0:
            packed[i] = [0, 0, 0, np.inf, -np.inf]
        else:
            packed[i] = [v.size, v.sum(), (v * v).sum(), v.min(), v.max()]
    if is_distributed():
        rows = host_allgather(packed[None]).reshape(-1, len(names), 5)
        counts = rows[:, :, 0].sum(0)
        sums = rows[:, :, 1].sum(0)
        sumsqs = rows[:, :, 2].sum(0)
        mins = rows[:, :, 3].min(0)
        maxs = rows[:, :, 4].max(0)
    else:
        counts, sums, sumsqs, mins, maxs = packed.T
    out = {}
    for i, name in enumerate(names):
        n = max(counts[i], 1.0)
        mean = sums[i] / n
        var = max(sumsqs[i] / n - mean * mean, 0.0)
        out[name] = {
            "mean": float(mean),
            "std": float(var ** 0.5),
            "min": float(mins[i]) if np.isfinite(mins[i]) else 0.0,
            "max": float(maxs[i]) if np.isfinite(maxs[i]) else 0.0,
        }
    return out


def reduce_loss_info(loss_info: dict) -> dict:
    """Cross-process metric reduction (reference ``reduce_loss_info``,
    ``utils/dist.py:812-859``): per-sample vectors → {mean,std,min,max},
    scalars → global mean. Flat ``metric`` / ``metric_{std,min,max}`` keys."""
    vectors = {k: v for k, v in loss_info.items()
               if np.asarray(v).size > 1}
    scalars = {k: v for k, v in loss_info.items() if k not in vectors}
    out: dict = {}
    if scalars:
        stats = global_tensor_stats_batch(scalars)
        out.update({k: s["mean"] for k, s in stats.items()})
    if vectors:
        stats = global_tensor_stats_batch(vectors)
        for k, s in stats.items():
            out[k] = s["mean"]
            out[f"{k}_std"] = s["std"]
            out[f"{k}_min"] = s["min"]
            out[f"{k}_max"] = s["max"]
    return out


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
