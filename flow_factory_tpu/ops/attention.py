"""Attention ops: Pallas TPU flash attention + native XLA fallback.

TPU-native replacement for the reference's attention-backend dispatch
(``src/flow_factory/models/abc.py:782-798`` routes diffusers attention to
flash/sage/xformers CUDA kernels). Here the backends are:

  'native'  — jnp einsum attention with fp32 softmax; runs anywhere (CPU tests)
              and XLA already fuses it well for short sequences.
  'flash'   — Pallas TPU kernel: blockwise online-softmax, O(S) memory,
              MXU-shaped (128-aligned) tiles, fp32 accumulation.
  'auto'    — 'flash' on TPU when shapes qualify, else 'native'.

The flash path is wrapped in ``jax.custom_vjp``; BOTH directions are Pallas
kernels with O(S) memory:

  forward  — blockwise online-softmax in base 2 (q pre-scaled by
             scale·log2(e) so exp2 — the native VPU transcendental —
             replaces exp); key-pad masking via one broadcast bias-add; a
             scratch-free single-k-block fast path when the fitted block
             covers the sequence. Emits the NATURAL-log lse as residual
             (the contract shared with ring attention and the backward).
  backward — dedicated dq and dk/dv kernels (`_flash_bwd_dq_kernel`,
             `_flash_bwd_dkv_kernel`) that recompute p from (q, k, lse)
             per block and contract in the INPUT dtype (bf16 in
             production — MXU-native) with fp32 accumulation. Padded key
             rows need no masking: they are zero, and `exp2(min(s-lse,0))`
             bounds their p at 1 so zero·1 contributes nothing.

All shapes are (B, H, S, D) with D the head dim.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e (SD3.5-M geometry, S=4429 D=64): 512x1024 sustains ~34 TF/s
# per kernel vs ~13 TF/s at 256x256 (bigger K-blocks amortize the online-
# softmax VPU work against the small-D MXU matmuls).
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
# (FFT_FLASH_MXU_LSUM — softmax denominator via a ones-column in the PV
# matmul — was measured on-chip in round 4: 1.9601 vs 2.0123 samples/s
# ceiling, a 2.6% LOSS, and deleted. The extra MXU lane work and the
# concat's layout copy cost more than the VPU row-sum it replaced.)
_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # softmax runs in base-2 inside the kernels:
_LN2 = 0.6931471805599453    # q is pre-scaled by scale*log2(e) so exp2 — the
#                              native VPU transcendental — replaces exp and
#                              the per-element `s * scale` multiply vanishes.


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Native (XLA) attention
# ---------------------------------------------------------------------------

def native_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference einsum attention, fp32 softmax, output in q.dtype."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _kpad_bias(shape, j: int, kv_len: int, block_k: int):
    """(1, Bk) additive bias row masking the zero-padded key tail.

    A broadcast ADD costs one VPU op/element where the previous
    iota+compare+select spent three (the 114 ms/step profile showed the
    kernel VPU-bound, docs/performance.md §Step profile)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, shape[1]), 1) + j * block_k
    return jnp.where(col < kv_len, 0.0, _NEG_INF).astype(jnp.float32)


def _flash_fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    kv_len: int,
    block_k: int,
):
    """Grid (B, H, num_q_blocks, num_k_blocks); k-block axis innermost.

    Scratch (m, l, acc) persists across the sequential k-block axis —
    the classic online-softmax recurrence. q arrives PRE-scaled by
    scale*log2(e): all softmax math runs in base-2 (see _LOG2E note).
    """
    j = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # (Bq, D)
    k = k_ref[0, 0]  # (Bk, D)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, Bk), base-2 logits

    if kv_len % block_k != 0:
        s = s + _kpad_bias(s.shape, j, kv_len, block_k)

    m_prev = m_scratch[:]  # (Bq, 1)
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    v_blk = v_ref[0, 0]  # (Bk, D)
    pv = jax.lax.dot_general(
        p.astype(v_blk.dtype),
        v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(j == num_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0, 0] = (acc_scratch[:] / denom).astype(o_ref.dtype)
        # external lse contract stays NATURAL-log (ring merge, backward)
        lse_ref[0, 0] = m_scratch[:] * _LN2 + jnp.log(denom)  # (Bq, 1)


def _flash_fwd_single_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    *,
    kv_len: int,
    block_k: int,
):
    """Specialization for a single k-block (the sequence-fitted common case,
    e.g. SD3.5-M's S=1357 → one 1408-wide block): the online-softmax
    recurrence degenerates, so skip the scratch round-trips and the
    alpha-rescale entirely — one max, one exp2, one sum, one divide."""
    q = q_ref[0, 0]  # (Bq, D), pre-scaled by scale*log2(e)
    k = k_ref[0, 0]  # (Bk, D)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if kv_len % block_k != 0:
        s = s + _kpad_bias(s.shape, 0, kv_len, block_k)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    v_blk = v_ref[0, 0]
    pv = jax.lax.dot_general(
        p.astype(v_blk.dtype),
        v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = (pv / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m * _LN2 + jnp.log(l)


def _rms_scale(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    """fp32 RMS-norm × scale, bit-identical to flax ``nn.RMSNorm`` (stats in
    fp32, ``y = x32 · (rsqrt(mean(x²)+eps) · γ)``). ``g`` broadcasts against
    the trailing (…, S, D) axes, so a per-position (S, D) scale map equals
    per-stream norms for piecewise-constant maps. Returns fp32."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True)
    return x32 * (jax.lax.rsqrt(var + eps) * g)


def _kernel_rms(x, g, eps, out_dtype):
    """In-kernel twin of :func:`_rms_scale` (+ cast): normalizes a (rows, D)
    block against a (rows-or-1, D) scale block. Same op order as the XLA
    composition; the only tolerated divergence is reduction-tree rounding."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True)
    return (x32 * (jax.lax.rsqrt(var + eps) * g)).astype(out_dtype)


def _pick_block(S: int, hi: int, overhead: int) -> int:
    """Fit the block to the sequence: minimize padded-length × per-block
    overhead factor over multiples of 128 (MXU row granularity).

    Fixed 512×1024 blocks over-compute 1.71× at S=1357 (padding 1357 →
    1536×2048); a single 1408-wide k-block removes the k-side waste. The
    `(1 + overhead/b)` factor models the online-softmax recurrence and
    pipeline costs that made 512×1024 sustain ~34 TF/s where 256×256 only
    hit ~13 (see the DEFAULT_BLOCK note) — without it, pure pad-minimizing
    would pick pathologically small blocks (e.g. 128 at S=4429).
    """
    best_cost, best_b = None, None
    for b in range(128, hi + 1, 128):
        cost = _round_up(S, b) * (1.0 + overhead / b)
        if best_cost is None or cost < best_cost or (cost == best_cost and b > best_b):
            best_cost, best_b = cost, b
    return best_b


def _pad_qkv(q, k, v, block_q, block_k, q_stretch: float = 3.0):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    # the configured sizes act as caps; fit blocks to the actual sequence
    # to minimize zero-padding compute. The k cap stretches 1.5× and the
    # FORWARD q cap 3× so a sequence like 1357 can take a single 1408-wide
    # k-block AND a single 1408-wide q-block (Sq_pad 1408 vs 1536 = 8% less
    # attention over-compute); the forward kernel's score tile then peaks at
    # ~8 MB fp32, inside the 16 MB scoped-VMEM budget. The BACKWARD kernels
    # hold s/p/dp/ds tiles simultaneously (measured 18.96 MB at 1408×1408 —
    # a compile-time VMEM OOM), so _flash_backward passes q_stretch=1 and
    # keeps the 512-row q blocks that fit.
    block_q = _pick_block(Sq, max(128, int(block_q * q_stretch) // 128 * 128), overhead=64)
    block_k = _pick_block(Sk, max(128, (block_k * 3 // 2) // 128 * 128), overhead=128)
    Sq_pad = _round_up(Sq, block_q)
    Sk_pad = _round_up(Sk, block_k)
    if Sq_pad != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_pad - Sq), (0, 0)))
    if Sk_pad != Sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sk_pad - Sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sk_pad - Sk), (0, 0)))
    return q, k, v, block_q, block_k, Sq, Sk, Sq_pad, Sk_pad


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int,
    block_k: int,
):
    B, H, _, D = q.shape
    # Fold scale and the base-2 conversion into q once per call (64× fewer
    # elements than scaling s in-kernel; XLA fuses it into the producer).
    q = q * (scale * _LOG2E)
    q, k, v, block_q, block_k, Sq, Sk, Sq_pad, Sk_pad = _pad_qkv(q, k, v, block_q, block_k)

    single_k = Sk_pad == block_k
    if single_k:
        grid = (B, H, Sq_pad // block_q)
        kernel = functools.partial(
            _flash_fwd_single_kernel, kv_len=Sk, block_k=block_k
        )
        idx_q = lambda b, h, i: (b, h, i, 0)
        idx_k = lambda b, h, i: (b, h, 0, 0)
        scratch_shapes = []
        dim_sem = ("parallel", "parallel", "parallel")
    else:
        grid = (B, H, Sq_pad // block_q, Sk_pad // block_k)
        kernel = functools.partial(
            _flash_fwd_kernel, kv_len=Sk, block_k=block_k
        )
        idx_q = lambda b, h, i, j: (b, h, i, 0)
        idx_k = lambda b, h, i, j: (b, h, j, 0)
        scratch_shapes = [
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ]
        dim_sem = ("parallel", "parallel", "parallel", "arbitrary")
    # Interpret mode lets the CPU test mesh execute the TPU kernel faithfully.
    interpret = _active_platform() != "tpu"
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), idx_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), idx_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), idx_k, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), idx_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), idx_q, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Sq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sq_pad, 1), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
        ),
        cost_estimate=pl.CostEstimate(
            # TRUE (unpadded) algorithmic flops: this estimate flows into
            # XLA cost_analysis, which perf accounting treats as the
            # authoritative FLOP model (scripts/bench_reconcile.py) — a
            # padded count would inflate reported MFU
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq_pad * Sk_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    if Sq_pad != Sq:
        out = out[:, :, :Sq, :]
        lse = lse[:, :, :Sq]
    return out, lse[..., 0]


# ---------------------------------------------------------------------------
# Pallas flash attention with FUSED qk RMS-norm (forward)
# ---------------------------------------------------------------------------
#
# The SD3-family MMDiT applies a per-head RMS qk-norm immediately before
# attention (no RoPE in between). Composed in XLA, each norm is a full
# HBM round trip of q and k (read raw, write normalized, re-read in the
# kernel) inside the ~78 ms/step fp32-norm-chain slice the round-3 profile
# flagged (docs/performance.md §Step profile). Fusing the norm INTO the
# flash kernel reads the RAW q/k blocks once and normalizes in VMEM.
#
# Invariant story: BOTH rollout and training replay route through the same
# fused kernel, so replay-ratio==1 holds by construction. The backward
# recomputes the normalized q/k in XLA (standard flash-recompute practice;
# the in-kernel and XLA reductions may differ in tree order by ulps, which
# perturbs gradients, never the forward log-probs). Non-TPU platforms and
# RoPE-interposed families (FLUX, Wan, LTX-2) keep the unfused composition.
#
# The scale maps gq/gk are (S, D) fp32 per-POSITION scales: the joint
# sequence concatenates context tokens (γ_added) and image tokens (γ) with
# different learned scales, and a piecewise-constant map equals the
# per-stream norms exactly.


def _flash_fwd_single_kernel_qkn(
    q_ref, k_ref, v_ref, gq_ref, gk_ref, o_ref, lse_ref,
    *, kv_len: int, block_k: int, eps: float,
):
    """Single-k-block fast path with in-kernel qk RMS-norm.

    q arrives RAW; gq is pre-folded with scale·log2(e) so one fp32 multiply
    lands the base-2 pre-scaled, normalized q (one bf16 rounding instead of
    the unfused path's two). Padded rows are zero → var=0 → rsqrt(eps),
    normalized value 0: no NaN, and the pad bias masks the k tail."""
    q = _kernel_rms(q_ref[0, 0], gq_ref[...], eps, o_ref.dtype)
    k = _kernel_rms(k_ref[0, 0], gk_ref[...], eps, o_ref.dtype)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if kv_len % block_k != 0:
        s = s + _kpad_bias(s.shape, 0, kv_len, block_k)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = (pv / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m * _LN2 + jnp.log(l)


def _flash_fwd_kernel_qkn(
    q_ref, k_ref, v_ref, gq_ref, gk_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch, qn_scratch,
    *, kv_len: int, block_k: int, eps: float,
):
    """Multi-k-block online-softmax with in-kernel qk RMS-norm.

    The normalized q block is computed once (j==0) into a VMEM scratch and
    reused across the sequential k axis; each k block normalizes on load."""
    j = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)
        qn_scratch[:] = _kernel_rms(q_ref[0, 0], gq_ref[...], eps, qn_scratch.dtype)

    q = qn_scratch[:]
    k = _kernel_rms(k_ref[0, 0], gk_ref[...], eps, o_ref.dtype)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if kv_len % block_k != 0:
        s = s + _kpad_bias(s.shape, j, kv_len, block_k)

    m_prev = m_scratch[:]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    v_blk = v_ref[0, 0]
    pv = jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(j == num_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0, 0] = (acc_scratch[:] / denom).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scratch[:] * _LN2 + jnp.log(denom)


def _flash_forward_qkn(q, k, v, gq, gk, scale, eps, block_q, block_k):
    B, H, _, D = q.shape
    # scale·log2e folds into the fp32 γ map — the normalized q lands
    # pre-scaled in base-2 with a single bf16 rounding
    gq = gq.astype(jnp.float32) * (scale * _LOG2E)
    gk = gk.astype(jnp.float32)
    q, k, v, block_q, block_k, Sq, Sk, Sq_pad, Sk_pad = _pad_qkv(q, k, v, block_q, block_k)
    if Sq_pad != Sq:
        gq = jnp.pad(gq, ((0, Sq_pad - Sq), (0, 0)))
    if Sk_pad != Sk:
        gk = jnp.pad(gk, ((0, Sk_pad - Sk), (0, 0)))

    single_k = Sk_pad == block_k
    if single_k:
        grid = (B, H, Sq_pad // block_q)
        kernel = functools.partial(
            _flash_fwd_single_kernel_qkn, kv_len=Sk, block_k=block_k, eps=eps
        )
        idx_q = lambda b, h, i: (b, h, i, 0)
        idx_k = lambda b, h, i: (b, h, 0, 0)
        idx_gq = lambda b, h, i: (i, 0)
        idx_gk = lambda b, h, i: (0, 0)
        scratch_shapes = []
        dim_sem = ("parallel", "parallel", "parallel")
    else:
        grid = (B, H, Sq_pad // block_q, Sk_pad // block_k)
        kernel = functools.partial(
            _flash_fwd_kernel_qkn, kv_len=Sk, block_k=block_k, eps=eps
        )
        idx_q = lambda b, h, i, j: (b, h, i, 0)
        idx_k = lambda b, h, i, j: (b, h, j, 0)
        idx_gq = lambda b, h, i, j: (i, 0)
        idx_gk = lambda b, h, i, j: (j, 0)
        scratch_shapes = [
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, D), q.dtype),
        ]
        dim_sem = ("parallel", "parallel", "parallel", "arbitrary")
    interpret = _active_platform() != "tpu"
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), idx_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), idx_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), idx_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, D), idx_gq, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, D), idx_gk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), idx_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), idx_q, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Sq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sq_pad, 1), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
        ),
        cost_estimate=pl.CostEstimate(
            # identical to the unfused kernel: attention flops only, so the
            # XLA cost_analysis FLOP model is unchanged by the fusion
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq_pad * Sk_pad,
        ),
        interpret=interpret,
    )(q, k, v, gq, gk)
    if Sq_pad != Sq:
        out = out[:, :, :Sq, :]
        lse = lse[:, :, :Sq]
    return out, lse[..., 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _qknorm_flash(q, k, v, gq, gk, scale, eps, block_q, block_k):
    out, _ = _flash_forward_qkn(q, k, v, gq, gk, scale, eps, block_q, block_k)
    return out


def _qknorm_flash_fwd(q, k, v, gq, gk, scale, eps, block_q, block_k):
    out, lse = _flash_forward_qkn(q, k, v, gq, gk, scale, eps, block_q, block_k)
    return out, (q, k, v, gq, gk, out, lse)


def _qknorm_flash_bwd(scale, eps, block_q, block_k, residuals, g):
    q, k, v, gq, gk, out, lse = residuals
    # recompute the normalized q/k in XLA (rollout never pays this; the
    # grad pass trades one cheap elementwise recompute for O(S) memory)
    norm = lambda x, gg: _rms_scale(x, gg, eps).astype(x.dtype)
    qn, vjp_q = jax.vjp(norm, q, gq)
    kn, vjp_k = jax.vjp(norm, k, gk)
    dqn, dkn, dv = _flash_backward(qn, kn, v, out, lse, g, scale, block_q, block_k)
    dq, dgq = vjp_q(dqn)
    dk, dgk = vjp_k(dkn)
    return dq, dk, dv, dgq, dgk


_qknorm_flash.defvjp(_qknorm_flash_fwd, _qknorm_flash_bwd)


def fused_qknorm_eligible(backend: str, head_dim: int) -> bool:
    """True when qk-norm + attention should take the fused Pallas kernel:
    flash-class backend resolving to TPU, MXU-friendly head dim, no RoPE
    between norm and attention (the CALLER asserts that by choosing this
    entry point)."""
    return backend in ("auto", "flash", "splash") and _on_tpu() and head_dim <= 256


def qknorm_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    gq: jax.Array,
    gk: jax.Array,
    scale: Optional[float] = None,
    eps: float = 1e-6,
    backend: str = "auto",
) -> jax.Array:
    """RMS qk-norm immediately followed by attention — fused on TPU.

    ``gq``/``gk``: per-position (S, D) fp32 scale maps (piecewise-constant
    over streams for the MMDiT joint sequence) or plain (D,) scales.
    Non-fused platforms/backends compose :func:`_rms_scale` (bit-identical
    to flax ``nn.RMSNorm``) with the regular backend dispatch, so CPU
    goldens and the ring/native paths are untouched.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if gq.ndim == 1:
        gq = jnp.broadcast_to(gq, (q.shape[2], q.shape[3]))
    if gk.ndim == 1:
        gk = jnp.broadcast_to(gk, (k.shape[2], k.shape[3]))
    if fused_qknorm_eligible(backend, q.shape[-1]):
        return _qknorm_flash(
            q, k, v, gq, gk, float(scale), float(eps), DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K
        )
    qn = _rms_scale(q, gq, eps).astype(q.dtype)
    kn = _rms_scale(k, gk, eps).astype(k.dtype)
    return dot_product_attention(qn, kn, v, scale=scale, backend=backend)


# ---------------------------------------------------------------------------
# Pallas flash attention (backward)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scratch,
    *, scale: float,
):
    """dq = scale · Σ_j ds_ij k_j, ds = p ∘ (do vᵀ − Δ); grid k-axis innermost.

    q arrives pre-scaled by scale*log2(e) and lse by log2(e) (base-2 domain,
    see _LOG2E). No key-pad masking needed: padded k rows are ZERO, so the
    spurious p columns hit zero k rows in ds@k and contribute nothing to dq.
    Matmuls contract in the INPUT dtype (bf16 in production — MXU-native;
    the previous fp32 upcasts ran the MXU at fractional rate) with fp32
    accumulation.
    """
    j = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]  # (Bq, 1), base-2
    delta = delta_ref[0, 0]  # (Bq, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # min(·, 0) is EXACT for real columns (s ≤ m ≤ lse since l ≥ 1) and
    # bounds the unmasked zero-pad columns at p=1 so they can't overflow
    # to inf (inf × zero-k-row = NaN).
    p = jnp.exp2(jnp.minimum(s - lse, 0.0))  # (Bq, Bk)
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta)).astype(k.dtype)
    dq_scratch[:] += jax.lax.dot_general(
        ds, k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_k - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_scratch[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale: float,
):
    """dk, dv accumulated over the q-block axis (innermost).

    Same conventions as _flash_bwd_dq_kernel (pre-scaled q/lse, base-2 p,
    input-dtype matmuls). No key-pad masking: spurious pad-ROW values land
    in dk/dv rows that the caller slices off. dk = scale·dsᵀq with q
    pre-scaled by scale·log2e, so the finalize factor is ln2.
    """
    i = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]  # (Bq, 1), base-2
    delta = delta_ref[0, 0]  # (Bq, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(jnp.minimum(s - lse, 0.0))  # (Bq, Bk); see dq-kernel note
    # dv += pᵀ do
    dv_scratch[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    # dk += dsᵀ q
    dk_scratch[:] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_q - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_scratch[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k):
    B, H, _, D = q.shape
    Sq0, Sk0 = q.shape[2], k.shape[2]
    g = g.astype(q.dtype)
    # Δ = rowsum(dout ∘ out) — tiny elementwise op, leave to XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,H,Sq)

    # base-2 domain for the kernels: q pre-scaled, lse converted (see _LOG2E)
    q = q * (scale * _LOG2E)
    lse = lse * _LOG2E
    q_p, k_p, v_p, block_q, block_k, Sq, Sk, Sq_pad, Sk_pad = _pad_qkv(
        q, k, v, block_q, block_k, q_stretch=1.0)
    if Sq_pad != Sq:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, Sq_pad - Sq), (0, 0)))
        # padded q rows: lse=+inf ⇒ p=0 ⇒ no contribution
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Sq_pad - Sq)), constant_values=jnp.inf)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Sq_pad - Sq)))
    lse = lse[..., None]  # (B,H,Sq,1): TPU-tileable trailing dim
    delta = delta[..., None]

    interpret = _active_platform() != "tpu"
    common_in = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
    ]

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(B, H, Sq_pad // block_q, Sk_pad // block_k),
        in_specs=common_in,
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_pad, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, g, lse, delta)

    # dkv: q-block axis innermost; swap index maps accordingly
    dkv_in = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(B, H, Sk_pad // block_k, Sq_pad // block_q),
        in_specs=dkv_in,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Sk_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Sk_pad, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, g, lse, delta)

    dq = dq[:, :, :Sq0]
    dk = dk[:, :, :Sk0]
    dv = dv[:, :, :Sk0]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, block_q, block_k):
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k)
    return out


def _flash_attention_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(scale, block_q, block_k, residuals, g):
    q, k, v, out, lse = residuals
    return _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Pallas flash attention, full (non-causal) — the DiT hot op.

    ``block_q``/``block_k`` are CAPS, not exact sizes: `_pad_qkv` fits the
    actual block to the sequence (multiples of 128) to minimize zero-pad
    compute, and the k cap is stretched up to 1.5× so a sequence like 1357
    can take a single 1408-wide k-block (the scratch-free fast path). A
    caller bounding the fp32 score-tile VMEM footprint should budget for
    ``block_q × ceil(1.5·block_k/128)·128`` fp32 elements.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention(q, k, v, float(scale), block_q, block_k)


# ---------------------------------------------------------------------------
# Hybrid: XLA fused forward + Pallas flash backward
# ---------------------------------------------------------------------------
#
# Measured on v5e at SD3.5-M geometry (B=48, H=24, S=1357, D=64, bf16):
# XLA's fused dot_product_attention forward runs 2.8× faster than the Pallas
# kernel (9.9 ms vs 27.9 ms — the D=64-thin contractions cap the Pallas
# kernel at ~20 TF/s), while Pallas wins the combined fwd+bwd (105 ms vs
# 128 ms) and keeps backward memory O(S). So: forward = XLA, backward =
# flash recompute (one extra flash fwd for the lse, then the flash bwd
# kernels). XLA's forward materializes an O(B·H·S²) bf16 score tensor, so
# it is gated to geometries where that transient fits; longer sequences
# stay fully on Pallas.

#: max transient score-tensor bytes before falling back to pure Pallas
XLA_SCORE_BYTES_LIMIT = 8 * 1024**3


def _xla_attention(q, k, v, scale):
    tr = lambda t: t.transpose(0, 2, 1, 3)  # (B,H,S,D) ↔ (B,S,H,D)
    return tr(jax.nn.dot_product_attention(tr(q), tr(k), tr(v), scale=scale))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _hybrid_attention(q, k, v, scale, block_q, block_k):
    return _xla_attention(q, k, v, scale)


def _hybrid_attention_fwd(q, k, v, scale, block_q, block_k):
    return _xla_attention(q, k, v, scale), (q, k, v)


def _hybrid_attention_bwd(scale, block_q, block_k, residuals, g):
    q, k, v = residuals
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    return _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k)


_hybrid_attention.defvjp(_hybrid_attention_fwd, _hybrid_attention_bwd)


def hybrid_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, Sq, _ = q.shape
    Sk = k.shape[2]
    if B * H * Sq * Sk * q.dtype.itemsize > XLA_SCORE_BYTES_LIMIT:
        return _flash_attention(q, k, v, float(scale), block_q, block_k)
    return _hybrid_attention(q, k, v, float(scale), block_q, block_k)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _active_platform() -> str:
    """Platform the current trace will execute on.

    Honors an active ``jax.default_device(...)`` context (e.g. host-RAM model
    init), falling back to the process default backend.
    """
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform
    except Exception:
        pass
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def _on_tpu() -> bool:
    return _active_platform() == "tpu"


# ---------------------------------------------------------------------------
# Ring (sequence-parallel) backend context
# ---------------------------------------------------------------------------
#: installed by BaseAdapter when ``attn_backend: ring`` runs under a mesh —
#: the 'tensor' mesh axis is repurposed as the SEQUENCE axis (Megatron-style
#: SP shares the TP group); TP head-sharding rules are disabled then.
_RING_CONTEXT: dict = {"mesh": None, "axis": None}


def set_ring_context(mesh, axis_name: str) -> None:
    _RING_CONTEXT["mesh"] = mesh
    _RING_CONTEXT["axis"] = axis_name


def _ring_dispatch(q, k, v, scale):
    mesh, axis = _RING_CONTEXT["mesh"], _RING_CONTEXT["axis"]
    n = 1 if mesh is None else dict(mesh.shape).get(axis, 1)
    # self-attention with a ring-divisible sequence rides the ring; anything
    # else (cross-attention to short text, no mesh) exactly falls back —
    # ring attention IS full attention, just sequence-sharded
    if n <= 1 or q.shape[2] % n != 0 or k.shape[2] % n != 0 or q.shape[2] != k.shape[2]:
        if _on_tpu() and q.shape[-1] <= 256:
            return flash_attention(q, k, v, scale=scale)
        return native_attention(q, k, v, scale=scale)
    from .ring_attention import make_ring_attention

    return make_ring_attention(mesh, axis, scale=scale)(q, k, v)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    backend: str = "auto",
) -> jax.Array:
    """Backend-dispatched attention — the equivalent of the reference's
    ``attn_backend`` config knob (``hparams/model_args.py:97-105``)."""
    if backend == "auto":
        # measured end-to-end on v5e (SD3.5-M rollout): 'hybrid' (XLA fused
        # forward) is within relay noise of pure Pallas, and pure Pallas is
        # ~20% faster through fwd+bwd — so 'flash' stays the default; pass
        # backend='hybrid' to experiment per model
        backend = "flash" if (mask is None and _on_tpu() and q.shape[-1] <= 256) else "native"
    if backend == "splash":  # config alias (jax's experimental TPU kernel name)
        backend = "flash"
    if backend == "ring":
        if mask is not None:
            raise NotImplementedError("ring backend does not take a dense mask; use 'native'")
        return _ring_dispatch(q, k, v, scale)
    if backend == "hybrid":
        if mask is not None:
            raise NotImplementedError("hybrid backend does not take a dense mask; use 'native'")
        return hybrid_attention(q, k, v, scale=scale)
    if backend == "flash":
        if mask is not None:
            raise NotImplementedError("flash backend does not take a dense mask; use 'native'")
        return flash_attention(q, k, v, scale=scale)
    if backend == "native":
        return native_attention(q, k, v, scale=scale, mask=mask)
    raise ValueError(f"Unknown attention backend {backend!r}")
