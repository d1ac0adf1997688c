"""Ring flash attention: sequence parallelism over a mesh axis.

The reference has NO sequence parallelism (SURVEY.md §2.2 — long video
sequences are handled by flash attention + remat + storage levers); this is
the TPU-native EXTENSION the survey flags: shard the sequence dim over the
ICI ring, keep Q local, rotate K/V shards with ``ppermute``, and merge the
per-shard flash results with the standard log-sum-exp combine.

Usage (inside ``shard_map`` with sequence sharded over ``axis_name``):

    out = ring_flash_attention(q_local, k_local, v_local, axis_name="tensor")

or use :func:`make_ring_attention` to build the shard_map'd callable from a
mesh. Forward-path (rollout) op; training steps at ring scale should chunk
with remat or gather K/V (tracked follow-up alongside the kernel-level
ring VJP).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, _flash_forward


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two attention partials over disjoint key sets."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    out = (out_a * wa[..., None] + out_b * wb[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)


def ring_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Full (non-causal) attention with K/V ring-rotated over ``axis_name``.

    Each device holds (B, H, S/n, D) shards. n-1 ``ppermute`` hops move K/V
    around the ring while the local flash kernel accumulates; communication
    overlaps the next chunk's compute under XLA's async collectives.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    out, lse = _flash_forward(q, k, v, float(scale), block_q, block_k)

    def body(i, carry):
        out_acc, lse_acc, k_cur, v_cur = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        out_i, lse_i = _flash_forward(q, k_cur, v_cur, float(scale), block_q, block_k)
        out_acc, lse_acc = _merge(out_acc, lse_acc, out_i, lse_i)
        return out_acc, lse_acc, k_cur, v_cur

    out, lse, _, _ = jax.lax.fori_loop(0, n - 1, body, (out, lse, k, v))
    return out.astype(q.dtype)


def make_ring_attention(mesh, axis_name: str = "tensor", scale: Optional[float] = None):
    """shard_map'd ring attention over ``mesh[axis_name]``.

    Returns a callable taking GLOBAL (B, H, S, D) arrays with S divisible by
    the axis size; inputs/outputs are sharded on the S dim.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis_name, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_rep=False
    )
    def _ring(q, k, v):
        return ring_flash_attention(q, k, v, axis_name, scale=scale)

    return _ring
