"""Fused LayerNorm(+modulation) Pallas kernel — measured, default OFF.

The DiT blocks interleave fp32 LayerNorms with timestep modulation
(``models/layers.py:AdaLayerNormZero`` / ``modulate``; Wan/FLUX inline the
same pattern). The on-chip step profile attributes ~19% of the SD3.5-M
denoise step to these convert→reduce→normalize chains (docs/performance.md
§Step profile). This kernel does the whole thing in ONE pass: read the bf16
activation block into VMEM once, compute mean/var and the modulated output
in fp32 registers, write once.

MEASURED OUTCOME (v5e, SD3.5-M rollout ceiling, identical fence): fused
1.9045 vs native 1.9344 samples/s — XLA's own fusion of these chains into
the surrounding elementwise graph already wins; the standalone custom call
costs ~1.5% by orphaning adjacent astype/residual ops. Dispatch therefore
defaults to the native composition everywhere; set ``FFT_FUSED_NORMS=1``
to re-test on other geometries. Kept because the call sites are now routed
through one seam (this module), the exactness tests pin the flax formula
variants, and other geometries (longer sequences, wider D) may flip the
verdict.

Semantics match the native composition exactly (flax ``nn.LayerNorm`` with
``use_fast_variance=True``: var = max(0, E[x²] − E[x]²); eps inside the
rsqrt), up to fp32 reduction order:

    modulate(LayerNorm_fp32(x.astype(f32)), shift, scale).astype(out_dtype)

Dispatch: Pallas on TPU when the feature dim is lane-aligned; the pure-jnp
composition everywhere else (CPU test mesh, odd dims) — verified bit-identical
to the flax composition, so CPU goldens are untouched. Backward recomputes
through the native composition's VJP — bit-identical gradients to the unfused
graph, no extra residuals.

Reference parity note: the reference runs diffusers' AdaLayerNormZero →
torch ``LayerNorm(elementwise_affine=False)`` in fp32 upcast; this kernel
preserves that upcast contract while removing the HBM round-trips.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _active_platform

_DEFAULT_EPS = 1e-6
#: rows per grid step — 256×D fp32 working set stays well inside VMEM for
#: every production width (D=1536 SD3.5-M → 1.5 MB; D=5120 Wan-14B → 5 MB)
_BLOCK_S = 256


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bcast(m: jax.Array, B: int) -> jax.Array:
    """Canonicalize a modulation operand to (B, S_or_1, D)."""
    if m.ndim == 1:
        m = jnp.broadcast_to(m[None, None, :], (B, 1, m.shape[-1]))
    elif m.ndim == 2:
        m = m[:, None, :]
    return m.astype(jnp.float32)


def _native_ln_mul_add(x, mul, add, eps, out_dtype, fold, rms=False):
    """fold=False — the AdaLN order: ((x−μ)·rsqrt)·mul + add (flax no-affine
    LayerNorm followed by ``modulate``). fold=True — the flax AFFINE
    LayerNorm order: (x−μ)·(rsqrt·mul) + add (flax folds the scale into the
    rsqrt multiplier). rms=True — flax no-affine RMSNorm (no mean
    subtraction; LTX-2 stream norms). All paths are bit-identical to their
    flax composition on CPU."""
    x32 = x.astype(jnp.float32)
    if rms:
        r = jax.lax.rsqrt(jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True) + eps)
        out = x32 * r * mul + add
        return out.astype(out_dtype)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True) - jax.lax.square(mean)
    )
    r = jax.lax.rsqrt(var + eps)
    if fold:
        out = (x32 - mean) * (r * mul) + add
    else:
        out = (x32 - mean) * r * mul + add
    return out.astype(out_dtype)


def _ln_mul_add_kernel(x_ref, mul_ref, add_ref, o_ref, *, eps: float, fold: bool, rms: bool):
    x = x_ref[0].astype(jnp.float32)  # (Bs, D)
    d = x.shape[-1]
    if rms:
        r = jax.lax.rsqrt(jnp.sum(jax.lax.square(x), axis=-1, keepdims=True) / d + eps)
        o_ref[0] = (x * r * mul_ref[0] + add_ref[0]).astype(o_ref.dtype)
        return
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    var = jnp.maximum(
        0.0, jnp.sum(jax.lax.square(x), axis=-1, keepdims=True) / d - jax.lax.square(mean)
    )
    r = jax.lax.rsqrt(var + eps)
    # mul/add blocks are (1, D) or (Bs, D); numpy broadcasting covers both
    if fold:
        o_ref[0] = ((x - mean) * (r * mul_ref[0]) + add_ref[0]).astype(o_ref.dtype)
    else:
        o_ref[0] = ((x - mean) * r * mul_ref[0] + add_ref[0]).astype(o_ref.dtype)


def _ln_mul_add_pallas(x, mul, add, eps, out_dtype, block_s, fold, rms):
    B, S, D = x.shape
    per_token = mul.shape[1] != 1
    S_pad = _cdiv(S, block_s) * block_s
    if S_pad != S:
        # rows are independent — pad rows produce garbage that is sliced off
        x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0)))
        if per_token:
            mul = jnp.pad(mul, ((0, 0), (0, S_pad - S), (0, 0)))
            add = jnp.pad(add, ((0, 0), (0, S_pad - S), (0, 0)))
    if per_token:
        mod_spec = pl.BlockSpec((1, block_s, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    else:
        mod_spec = pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_mul_add_kernel, eps=eps, fold=fold, rms=rms),
        grid=(B, S_pad // block_s),
        in_specs=[
            pl.BlockSpec((1, block_s, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            mod_spec,
            mod_spec,
        ],
        out_specs=pl.BlockSpec((1, block_s, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S_pad, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S * D,  # elementwise+reduce work, not MXU flops
            bytes_accessed=B * S * D * (x.dtype.itemsize + jnp.dtype(out_dtype).itemsize),
            transcendentals=B * S,  # one rsqrt per row
        ),
        interpret=_active_platform() != "tpu",
    )(x, mul, add)
    return out[:, :S] if S_pad != S else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_ln_mul_add(x, mul, add, eps, out_dtype, block_s, fold, rms):
    return _ln_mul_add_pallas(x, mul, add, eps, out_dtype, block_s, fold, rms)


def _fused_ln_mul_add_fwd(x, mul, add, eps, out_dtype, block_s, fold, rms):
    return _ln_mul_add_pallas(x, mul, add, eps, out_dtype, block_s, fold, rms), (x, mul, add)


def _fused_ln_mul_add_bwd(eps, out_dtype, block_s, fold, rms, residuals, g):
    x, mul, add = residuals
    _, vjp = jax.vjp(
        lambda x, m, a: _native_ln_mul_add(x, m, a, eps, out_dtype, fold, rms), x, mul, add
    )
    return vjp(g)


_fused_ln_mul_add.defvjp(_fused_ln_mul_add_fwd, _fused_ln_mul_add_bwd)


# Measured on v5e at the SD3.5-M rollout geometry (scripts/bench_reconcile,
# identical fence, warm cache): fused 1.9045 vs native 1.9344 samples/s —
# XLA already fuses these convert→reduce→modulate chains into the
# surrounding elementwise graph well enough that a standalone custom call
# LOSES ~1.5% (it orphans the neighboring astype/residual ops from their
# fusion homes). Default OFF; FFT_FUSED_NORMS=1 re-enables for A/B on
# other geometries (docs/performance.md §Fused-norm experiment).
# Read ONCE at import (numerics-affecting: rounding differs slightly) so a
# rollout/replay env mismatch is frozen per process and visible in logs
# (ADVICE r3: a trace-time env read could differ between the process that
# rolled out and the one replaying, silently degrading replay-ratio==1).
FUSED_NORMS = os.environ.get("FFT_FUSED_NORMS", "0") in ("1", "true")
if FUSED_NORMS:
    import logging

    logging.getLogger(__name__).warning(
        "FFT_FUSED_NORMS=1: norm/modulate chains run the one-pass Pallas "
        "kernel (different rounding than XLA's fusion). Rollout and replay "
        "processes must BOTH set this flag or ratio==1 degrades."
    )


def _fused_enabled() -> bool:
    return FUSED_NORMS


def _dispatch(x, mul, add, eps, out_dtype, block_s, fold, rms=False):
    D = x.shape[-1]
    # lane-aligned widths on TPU take the one-pass kernel; everything else
    # (tiny CPU test configs, odd dims) keeps the native composition so CPU
    # goldens and non-TPU numerics are untouched. FFT_FUSED_NORMS=0 forces
    # the native path for A/B timing.
    if _active_platform() == "tpu" and D % 128 == 0 and x.ndim == 3 and _fused_enabled():
        return _fused_ln_mul_add(x, mul, add, float(eps), out_dtype, int(block_s), fold, rms)
    return _native_ln_mul_add(x, mul, add, float(eps), out_dtype, fold, rms)


def adaln_modulate(
    x: jax.Array,
    shift: jax.Array,
    scale: jax.Array,
    eps: float = _DEFAULT_EPS,
    out_dtype: Optional[jnp.dtype] = None,
    block_s: int = _BLOCK_S,
) -> jax.Array:
    """``modulate(LayerNorm_noaffine_fp32(x), shift, scale)`` in one pass.

    x: (B, S, D); shift/scale: (D,), (B, D), (B, 1, D), or per-token (B, S, D).
    Output in ``out_dtype`` (default: x.dtype).
    """
    B = x.shape[0]
    mul = 1.0 + _bcast(scale, B)
    add = _bcast(shift, B)
    return _dispatch(x, mul, add, eps, out_dtype or x.dtype, block_s, fold=False)


def fused_layernorm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    eps: float = _DEFAULT_EPS,
    out_dtype: Optional[jnp.dtype] = None,
    block_s: int = _BLOCK_S,
) -> jax.Array:
    """Affine fp32 LayerNorm (flax ``nn.LayerNorm`` semantics), one pass."""
    B = x.shape[0]
    return _dispatch(
        x, _bcast(weight, B), _bcast(bias, B), eps, out_dtype or x.dtype, block_s, fold=True
    )


def rms_modulate(
    x: jax.Array,
    shift: jax.Array,
    scale: jax.Array,
    eps: float = _DEFAULT_EPS,
    out_dtype: Optional[jnp.dtype] = None,
    block_s: int = _BLOCK_S,
) -> jax.Array:
    """``modulate(RMSNorm_noaffine_fp32(x), shift, scale)`` in one pass
    (the LTX-2 stream-norm pattern, ``models/ltx2/transformer.py:_rms``)."""
    B = x.shape[0]
    mul = 1.0 + _bcast(scale, B)
    add = _bcast(shift, B)
    return _dispatch(x, mul, add, eps, out_dtype or x.dtype, block_s, fold=False, rms=True)


# ---------------------------------------------------------------------------
# Fused residual + gate + AdaLN-modulate (round 4)
# ---------------------------------------------------------------------------
#
# The STANDALONE norm kernel above measured a net loss twice (round 3:
# −1.5%; round 4 at the fused-qkn HEAD: 2.231 vs 2.2609, −1.3%) because it
# orphans its elementwise neighbors from XLA's fusions. This op instead
# ABSORBS the neighbors: the MMDiT block pattern
#
#     x = x + gate · branch            (residual join after attn/ff)
#     x_mod = LN(x)·(1+scale) + shift  (the next AdaLN modulate)
#
# becomes one kernel that reads x and branch once and writes x_new and
# x_mod once (4 HBM passes vs ~6 in the XLA graph, and the convert→reduce
# chain never round-trips).
#
# MEASURED OUTCOME (round 4, v5e, SD3.5-M ceiling, identical fence): fused
# 2.1851 vs native 2.2609 samples/s — a 3.4% LOSS, the third strike for
# hand-fused norm-chain kernels on this geometry. XLA's convert_reduce
# fusions overlap the norm chains with the surrounding matmuls better than
# a standalone custom call can; the 78 ms/step LN slice is entangled
# latency, not recoverable bandwidth. Dispatch therefore defaults to the
# bit-identical native composition; FFT_RGM=1 re-enables the kernel for
# A/B on other geometries (read once at import — see FUSED_NORMS note).
RGM_FUSED = os.environ.get("FFT_RGM", "0") in ("1", "true")
if RGM_FUSED:
    import logging as _logging

    _logging.getLogger(__name__).warning(
        "FFT_RGM=1: residual+gate+modulate runs the fused Pallas kernel "
        "(different reduction rounding than XLA). Rollout and replay "
        "processes must BOTH set this flag or ratio==1 degrades."
    )


def _native_residual_gate_modulate(x, branch, gate, mul, add, eps, out_dtype):
    """Bit-identical to the open-coded block composition:
    ``x + gate[:,None,:].astype(x.dtype) * branch`` then
    :func:`adaln_modulate`'s native path."""
    x_new = x + gate[:, None, :].astype(x.dtype) * branch
    x_mod = _native_ln_mul_add(x_new, mul, add, eps, out_dtype, fold=False)
    return x_new, x_mod


def _rgm_kernel(x_ref, b_ref, g_ref, mul_ref, add_ref, xn_ref, xm_ref, *, eps: float):
    x = x_ref[0]
    xn = x + g_ref[0].astype(x.dtype) * b_ref[0]
    xn_ref[0] = xn
    x32 = xn.astype(jnp.float32)
    d = x32.shape[-1]
    mean = jnp.sum(x32, axis=-1, keepdims=True) / d
    var = jnp.maximum(
        0.0, jnp.sum(jax.lax.square(x32), axis=-1, keepdims=True) / d - jax.lax.square(mean)
    )
    r = jax.lax.rsqrt(var + eps)
    xm_ref[0] = ((x32 - mean) * r * mul_ref[0] + add_ref[0]).astype(xm_ref.dtype)


def _rgm_pallas(x, branch, gate, mul, add, eps, out_dtype, block_s):
    B, S, D = x.shape
    S_pad = _cdiv(S, block_s) * block_s
    xp, bp = x, branch
    if S_pad != S:
        xp = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0)))
        bp = jnp.pad(branch, ((0, 0), (0, S_pad - S), (0, 0)))
    row_spec = pl.BlockSpec((1, block_s, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    xn, xm = pl.pallas_call(
        functools.partial(_rgm_kernel, eps=eps),
        grid=(B, S_pad // block_s),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_pad, D), x.dtype),
            jax.ShapeDtypeStruct((B, S_pad, D), out_dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * S * D,
            bytes_accessed=2 * B * S * D * (
                x.dtype.itemsize + jnp.dtype(out_dtype).itemsize),
            transcendentals=B * S,
        ),
        interpret=_active_platform() != "tpu",
    )(xp, bp, gate[:, None, :], mul, add)
    if S_pad != S:
        xn, xm = xn[:, :S], xm[:, :S]
    return xn, xm


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _rgm_fused(x, branch, gate, mul, add, eps, out_dtype, block_s):
    return _rgm_pallas(x, branch, gate, mul, add, eps, out_dtype, block_s)


def _rgm_fused_fwd(x, branch, gate, mul, add, eps, out_dtype, block_s):
    out = _rgm_pallas(x, branch, gate, mul, add, eps, out_dtype, block_s)
    return out, (x, branch, gate, mul, add)


def _rgm_fused_bwd(eps, out_dtype, block_s, residuals, g):
    x, branch, gate, mul, add = residuals
    _, vjp = jax.vjp(
        lambda x, b, gt, m, a: _native_residual_gate_modulate(x, b, gt, m, a, eps, out_dtype),
        x, branch, gate, mul, add,
    )
    return vjp(g)


_rgm_fused.defvjp(_rgm_fused_fwd, _rgm_fused_bwd)


def residual_gate_modulate(
    x: jax.Array,
    branch: jax.Array,
    gate: jax.Array,
    shift: jax.Array,
    scale: jax.Array,
    eps: float = _DEFAULT_EPS,
    out_dtype: Optional[jnp.dtype] = None,
    block_s: int = _BLOCK_S,
) -> Tuple[jax.Array, jax.Array]:
    """``x_new = x + gate·branch; x_mod = modulate(LN_fp32(x_new), shift,
    scale)`` — fused on TPU, bit-identical native composition elsewhere.

    x/branch: (B, S, D); gate/shift/scale: (B, D) fp32 (AdaLN chunks).
    Returns ``(x_new, x_mod)`` with x_mod in ``out_dtype`` (default x.dtype).
    """
    B = x.shape[0]
    mul = 1.0 + _bcast(scale, B)
    add = _bcast(shift, B)
    od = out_dtype or x.dtype
    if (RGM_FUSED and _active_platform() == "tpu"
            and x.shape[-1] % 128 == 0 and x.ndim == 3):
        return _rgm_fused(x, branch, gate.astype(jnp.float32), mul, add,
                          float(eps), od, int(block_s))
    return _native_residual_gate_modulate(x, branch, gate.astype(jnp.float32), mul, add,
                                          float(eps), od)
