"""Ring flash attention: sequence parallelism over a mesh axis.

The reference has NO sequence parallelism (SURVEY.md §2.2 — long video
sequences are handled by flash attention + remat + storage levers); this is
the TPU-native EXTENSION the survey flags: shard the sequence dim over the
ICI ring, keep Q local, rotate K/V shards with ``ppermute``, and merge the
per-shard flash results with the standard log-sum-exp combine.

Differentiable: a ``jax.custom_vjp`` backward re-rings K/V and carries the
dK/dV accumulators THROUGH the same rotation, so each shard's gradient is
accumulated while co-located with its keys and arrives back on the owning
device after the full ring — no gather, O(S/n) memory per device. Each hop
reuses the Pallas flash backward kernels with the GLOBAL (merged) lse, which
is exactly the flash decomposition of full-softmax gradients.

Usage (inside ``shard_map`` with sequence sharded over ``axis_name``):

    out = ring_flash_attention(q_local, k_local, v_local, axis_name="tensor")

or use :func:`make_ring_attention` to build the shard_map'd callable from a
mesh.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, _flash_backward, _flash_forward


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two attention partials over disjoint key sets."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    out = (out_a * wa[..., None] + out_b * wb[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)


def _ring_forward(q, k, v, axis_name: str, scale: float, block_q: int, block_k: int):
    """n-1 ppermute hops; returns (out fp32, global lse)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    out, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    out = out.astype(jnp.float32)

    def body(i, carry):
        out_acc, lse_acc, k_cur, v_cur = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        out_i, lse_i = _flash_forward(q, k_cur, v_cur, scale, block_q, block_k)
        out_acc, lse_acc = _merge(out_acc, lse_acc, out_i.astype(jnp.float32), lse_i)
        return out_acc, lse_acc, k_cur, v_cur

    out, lse, _, _ = jax.lax.fori_loop(0, n - 1, body, (out, lse, k, v))
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_attention(q, k, v, axis_name, scale, block_q, block_k):
    out, _ = _ring_forward(q, k, v, axis_name, scale, block_q, block_k)
    return out.astype(q.dtype)


def _ring_attention_fwd(q, k, v, axis_name, scale, block_q, block_k):
    out, lse = _ring_forward(q, k, v, axis_name, scale, block_q, block_k)
    return out.astype(q.dtype), (q, k, v, out.astype(q.dtype), lse)


def _ring_attention_bwd(axis_name, scale, block_q, block_k, residuals, g):
    q, k, v, out, lse = residuals
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        dq_acc, dk_cur, dv_cur, k_cur, v_cur = carry
        dq_i, dk_i, dv_i = _flash_backward(
            q, k_cur, v_cur, out, lse, g, scale, block_q, block_k
        )
        dq_acc = dq_acc + dq_i.astype(jnp.float32)
        dk_cur = dk_cur + dk_i.astype(jnp.float32)
        dv_cur = dv_cur + dv_i.astype(jnp.float32)
        # rotate K/V TOGETHER WITH their grad accumulators: after n hops the
        # accumulated dK/dV have travelled the full ring back to their owner
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_cur = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_cur = jax.lax.ppermute(dv_cur, axis_name, perm)
        return dq_acc, dk_cur, dv_cur, k_cur, v_cur

    zeros = lambda t: jnp.zeros(t.shape, jnp.float32)
    dq, dk, dv, _, _ = jax.lax.fori_loop(
        0, n, body, (zeros(q), zeros(k), zeros(v), k, v)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


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
    Differentiable end-to-end (see module docstring).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _ring_attention(q, k, v, axis_name, float(scale), block_q, block_k)


def make_ring_attention(mesh, axis_name: str = "tensor", scale: Optional[float] = None):
    """shard_map'd ring attention over ``mesh[axis_name]``.

    Returns a callable taking GLOBAL (B, H, S, D) arrays with S divisible by
    the axis size; inputs/outputs are sharded on the S dim.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
        _NEW_SHARD_MAP = True
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
        _NEW_SHARD_MAP = False

    spec = P(None, None, axis_name, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        **({"check_vma": False} if _NEW_SHARD_MAP else {"check_rep": False})
    )
    def _ring(q, k, v):
        return ring_flash_attention(q, k, v, axis_name, scale=scale)

    return _ring
