"""Device mesh + declarative sharding.

Replaces the reference's entire accelerate/DeepSpeed/FSDP parallelism stack
(SURVEY.md §2.2) with one declarative mechanism: a 3-axis
``Mesh(('replica', 'fsdp', 'tensor'))`` and NamedSharding rules.

Mapping from the reference's strategies:

  DDP / multi_gpu.yaml         → mesh (N, 1, 1): params replicated
  ZeRO-1/2 (deepspeed_zero*)   → optimizer-state sharded over 'fsdp'
  ZeRO-3 / FSDP full-shard     → params + opt-state sharded over 'fsdp'
  HYBRID_SHARD [replicate,shard] (multinode fsdp2_wan.yaml) →
                                 mesh (num_hosts, devices_per_host, 1):
                                 DCN rides 'replica', ICI rides 'fsdp'
  TP (not in reference trainer) → 'tensor' axis; attention heads / FFN
                                 sharded over ICI (extension)

The rollout/global batch is sharded over ('replica', 'fsdp') — every device
is a data-parallel worker; XLA inserts the all-gathers (params) and
reduce-scatters (grads) that DeepSpeed/FSDP do imperatively.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICA_AXIS = "replica"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
DATA_AXES = (REPLICA_AXIS, FSDP_AXIS)


@dataclass(frozen=True)
class MeshConfig:
    """Declarative parallelism selection (the YAML-visible knobs)."""

    fsdp_size: int = 1      # devices per parameter-shard group (ICI)
    tensor_size: int = 1    # tensor-parallel degree (ICI)
    replica_size: Optional[int] = None  # derived when None

    def resolve(self, num_devices: int) -> Tuple[int, int, int]:
        fsdp = max(1, self.fsdp_size)
        tensor = max(1, self.tensor_size)
        if num_devices % (fsdp * tensor) != 0:
            raise ValueError(
                f"num_devices={num_devices} not divisible by fsdp_size*tensor_size={fsdp * tensor}"
            )
        replica = self.replica_size or num_devices // (fsdp * tensor)
        if replica * fsdp * tensor != num_devices:
            raise ValueError(
                f"mesh {replica}x{fsdp}x{tensor} != num_devices {num_devices}"
            )
        return replica, fsdp, tensor


def create_mesh(
    mesh_config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create the 3-axis mesh. DCN (multi-host) maps onto the leading
    'replica' axis; ICI onto 'fsdp'×'tensor' — collectives for parameter
    gathering ride the fast interconnect."""
    mesh_config = mesh_config or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    replica, fsdp, tensor = mesh_config.resolve(len(devices))
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((replica, fsdp, tensor), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(replica, fsdp, tensor)
    return Mesh(dev_array, (REPLICA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def batch_pspec() -> P:
    """Batch dimension sharded over all data-parallel axes."""
    return P(DATA_AXES)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with the leading dim sharded over data axes.

    Multi-controller runs assemble each leaf from PROCESS-LOCAL rows into one
    globally-sharded ``jax.Array`` (``make_array_from_process_local_data``),
    so jitted batch reductions — DGPO's ``segment_sum`` group sums, CRD's
    centering means, loss means — run over the GLOBAL batch with XLA
    collectives, matching the reference's scatter_add + all-reduce semantics
    (``src/flow_factory/trainers/dgpo.py`` group reduction) exactly at pod
    scale. Scalars and 0-d leaves are identical on every process by
    construction and are replicated.
    """
    multihost = jax.process_count() > 1

    def _put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # already a GLOBAL array (e.g. the output of a previous jitted
            # stage — NFT/AWM/CRD old-velocity precomputes feed the training
            # batch directly): it cannot round-trip through host numpy on
            # any one process, and jit resharding handles any spec mismatch
            return x
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        spec = P(DATA_AXES, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multihost and x.ndim >= 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def fetch_local_batch(arr: Any, batch_axis: int = 0) -> np.ndarray:
    """Device→host fetch that works in MULTI-PROCESS runs.

    A rollout output is a globally batch-sharded ``jax.Array``;
    ``jax.device_get`` on it raises (non-addressable shards live on other
    hosts). Each process only needs ITS OWN rows — the ones its loader fed
    into ``shard_batch`` — so this gathers the addressable shards, dedups
    replicas (tensor/fsdp axes replicate batch rows), and concatenates them
    in global order along ``batch_axis``. Fully-addressable arrays (single
    process) take the plain ``device_get`` path unchanged.
    """
    if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
        return np.asarray(jax.device_get(arr))
    parts: Dict[int, np.ndarray] = {}
    for s in arr.addressable_shards:
        idx = s.index[batch_axis]
        start = idx.start or 0
        if start in parts:
            continue
        # only the batch axis may be sharded for rollout outputs
        for ax, sl in enumerate(s.index):
            if ax != batch_axis and (sl.start not in (None, 0) or sl.stop is not None
                                     and sl.stop != arr.shape[ax]):
                raise ValueError(
                    f"fetch_local_batch: axis {ax} is sharded too "
                    f"(index {s.index}); only batch_axis={batch_axis} is supported"
                )
        parts[start] = np.asarray(s.data)
    return np.concatenate([parts[k] for k in sorted(parts)], axis=batch_axis)


# ---------------------------------------------------------------------------
# Parameter sharding
# ---------------------------------------------------------------------------

def _spec_fits(spec: P, shape, axis_sizes: Dict[str, int]) -> bool:
    """A PartitionSpec applies only when every named dim divides evenly."""
    if len(spec) > len(shape):
        return False
    for dim, names in enumerate(spec):
        if names is None:
            continue
        group = names if isinstance(names, tuple) else (names,)
        total = 1
        for n in group:
            total *= axis_sizes.get(n, 1)
        if total > 1 and shape[dim] % total != 0:
            return False
    return True


def _default_leaf_spec(path: str, leaf: Any, fsdp: int, rules, axis_sizes=None) -> P:
    """FSDP default: shard the largest dim divisible by the fsdp size.

    Model-specific ``rules`` (regex → PartitionSpec) take precedence; they are
    how adapters express tensor parallelism (attention heads / FFN over
    'tensor'). A rule that does not divide the leaf's shape falls through to
    the next rule / the FSDP default.
    """
    axis_sizes = axis_sizes or {}
    for pattern, spec in rules:
        if re.search(pattern, path) and _spec_fits(spec, getattr(leaf, "shape", ()), axis_sizes):
            return spec
    shape = getattr(leaf, "shape", ())
    if fsdp <= 1 or len(shape) == 0:
        return P()
    # Prefer sharding the largest divisible dimension (most memory saved);
    # ties broken toward the last dim (better layouts for matmul operands).
    best_dim, best_size = None, 0
    for d, s in enumerate(shape):
        if s % fsdp == 0 and s >= best_size and s >= 2 * fsdp:
            best_dim, best_size = d, s
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = FSDP_AXIS
    return P(*spec)


def param_sharding_rules(extra: Optional[Dict[str, P]] = None):
    """Compose model-provided regex rules with the FSDP default."""
    return list((extra or {}).items())


def shard_params(params: Any, mesh: Mesh, rules: Optional[Dict[str, P]] = None) -> Any:
    """Device-put a parameter pytree with NamedShardings over the mesh."""
    rule_list = param_sharding_rules(rules)
    fsdp = mesh.shape[FSDP_AXIS]
    axis_sizes = dict(mesh.shape)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    out = []
    for kp, leaf in flat:
        spec = _default_leaf_spec(path_str(kp), leaf, fsdp, rule_list, axis_sizes)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def sharding_spec_tree(params: Any, mesh: Mesh, rules: Optional[Dict[str, P]] = None) -> Any:
    """Like :func:`shard_params` but returns the NamedSharding pytree (for
    ``jax.jit`` in/out_shardings without touching data)."""
    rule_list = param_sharding_rules(rules)
    fsdp = mesh.shape[FSDP_AXIS]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    axis_sizes = dict(mesh.shape)
    out = [
        NamedSharding(mesh, _default_leaf_spec(path_str(kp), leaf, fsdp, rule_list, axis_sizes))
        for kp, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)
