"""Shared DiT building blocks (flax.linen).

TPU-first primitives used by all adapters' transformers: timestep embeddings,
adaptive layer norms, joint (dual-stream) attention blocks, patch embedding.
Attention routes through :mod:`flow_factory_tpu.ops.attention` so every model
picks up the Pallas flash kernel via one config knob (the TPU equivalent of
the reference's diffusers ``set_attention_backend``,
``src/flow_factory/models/abc.py:782-798``).

Matmul-heavy modules compute in the param dtype (bf16 on TPU) with fp32
accumulation via ``preferred_element_type`` inside the attention ops; norms
and modulation run in fp32 for stability.
"""
from __future__ import annotations

import math
import os
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import (
    _rms_scale,
    dot_product_attention,
    fused_qknorm_eligible,
    qknorm_dot_product_attention,
)
from ..ops.norms import adaln_modulate, fused_layernorm, residual_gate_modulate, rms_modulate


def sinusoidal_timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: int = 10000,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
) -> jax.Array:
    """(B,) timesteps → (B, dim) sinusoidal features (diffusers convention)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedder(nn.Module):
    """Sinusoidal features → 2-layer SiLU MLP."""

    hidden_dim: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        x = sinusoidal_timestep_embedding(t, self.freq_dim)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear_1")(x.astype(self.dtype))
        x = nn.silu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class PooledTextEmbedder(nn.Module):
    """Pooled CLIP projection → time-conditioning vector."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear_1")(pooled.astype(self.dtype))
        x = nn.silu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class PatchEmbed(nn.Module):
    """2-D latent → patch tokens with (optionally cropped) learned pos-embed."""

    patch_size: int
    hidden_dim: int
    pos_embed_max_size: Optional[int] = None  # learned grid side; None = sincos-free
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: jax.Array) -> jax.Array:
        # latents: (B, H, W, C) channel-last (TPU-friendly conv layout)
        B, H, W, C = latents.shape
        p = self.patch_size
        x = nn.Conv(
            self.hidden_dim,
            kernel_size=(p, p),
            strides=(p, p),
            dtype=self.dtype,
            name="proj",
        )(latents.astype(self.dtype))
        h, w = H // p, W // p
        x = x.reshape(B, h * w, self.hidden_dim)
        if self.pos_embed_max_size is not None:
            grid = self.pos_embed_max_size
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, grid, grid, self.hidden_dim),
                jnp.float32,
            )
            top = (grid - h) // 2
            left = (grid - w) // 2
            pos = jax.lax.dynamic_slice(
                pos, (0, top, left, 0), (1, h, w, self.hidden_dim)
            ).reshape(1, h * w, self.hidden_dim)
            x = x + pos.astype(self.dtype)
        return x


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def tag_attn_out(out: jax.Array) -> jax.Array:
    """Name the raw attention output for selective rematerialization.

    Under ``remat_policy('save_attn')`` the gradient pass SAVES these
    (B, H, S, E) tensors instead of re-running the flash kernel — the most
    recompute-expensive leg of a DiT block — while everything else still
    rematerializes (memory cost ≈ one hidden-state per attention per block).

    The tag is inserted ONLY when the policy is active: the ``name``
    primitive is identity at runtime but changes the jaxpr, which would
    churn every persistent-compile-cache key for the default programs."""
    if os.environ.get("FFT_REMAT_POLICY") != "save_attn":
        return out
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(out, "attn_out")


def remat_policy(name: Optional[str]):
    """Resolve a rematerialization policy for ``nn.remat`` blocks.

    ``None``/'full'  — save nothing, recompute everything (default; matches
                       the reference's ``enable_gradient_checkpointing``).
    'save_attn'      — save tensors tagged :func:`tag_attn_out`; the flash
                       attention forward is NOT re-run in the backward.
    'dots'           — XLA-saveable matmul outputs (most memory, least
                       recompute).
    Overridable via env ``FFT_REMAT_POLICY`` for on-chip experiments.
    """
    name = os.environ.get("FFT_REMAT_POLICY", name or "full")
    if name in ("", "full", None):
        return None
    import jax.ad_checkpoint as adc

    if name == "save_attn":
        return adc.checkpoint_policies.save_only_these_names("attn_out")
    if name == "dots":
        return adc.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "checkpoint_dots":
        # save EVERY matmul output inside the block — skips the whole
        # forward recompute in the backward at ~280 MB/block memory cost
        return adc.checkpoint_policies.checkpoint_dots
    raise ValueError(f"Unknown remat policy {name!r}")


class AdaLayerNormZero(nn.Module):
    """LayerNorm with 6-way (or 9-way) conditioning from the time embedding.

    ``num_chunks == 9`` is the diffusers ``SD35AdaLayerNormZeroX`` dual-
    attention form: chunk order (shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp, shift_msa2, scale_msa2, gate_msa2), and BOTH
    modulated outputs come from the SAME pre-attention LayerNorm of ``x`` —
    parallel branches, not sequential (round-5 fix, pinned by
    tests/test_torch_reference.py). Returns
    (x_mod, x_mod2, gate_msa, shift_mlp, scale_mlp, gate_mlp, gate_msa2)."""

    hidden_dim: int
    num_chunks: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> Tuple[jax.Array, ...]:
        mods = nn.Dense(self.num_chunks * self.hidden_dim, dtype=jnp.float32, name="linear")(
            nn.silu(emb.astype(jnp.float32))
        )
        chunks = jnp.split(mods, self.num_chunks, axis=-1)
        # one-pass Pallas LayerNorm+modulate on TPU; bit-identical native
        # composition elsewhere (ops/norms.py)
        out = adaln_modulate(x, chunks[0], chunks[1])
        if self.num_chunks == 9:
            out2 = adaln_modulate(x, chunks[6], chunks[7])
            return (out, out2, chunks[2], chunks[3], chunks[4], chunks[5], chunks[8])
        return (out, *chunks[2:])


class AdaLayerNormContinuous(nn.Module):
    """Final-layer AdaLN: shift/scale from the conditioning vector.

    Chunk order is **scale-first** — the diffusers ``AdaLayerNormContinuous``
    convention (``scale, shift = emb.chunk(2)``), which DIFFERS from
    ``AdaLayerNormZero``'s shift-first order. Diffusers-format checkpoints
    (SD3/FLUX ``norm_out.linear``, SD3 final-block ``norm1_context.linear``)
    bake this in: the upstream original→diffusers converters swap_scale_shift
    the original shift-first weights into scale-first. Round-5 fix — the
    previous shift-first split silently mis-modulated any real imported
    checkpoint; pinned by tests/test_torch_reference.py."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        mods = nn.Dense(2 * self.hidden_dim, dtype=jnp.float32, name="linear")(
            nn.silu(emb.astype(jnp.float32))
        )
        scale, shift = jnp.split(mods, 2, axis=-1)
        return adaln_modulate(x, shift, scale)


class FeedForward(nn.Module):
    hidden_dim: int
    mult: float = 4.0
    activation: str = "gelu_tanh"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.hidden_dim * self.mult)
        if self.activation == "swiglu":
            # gated MLP: fc1 packs [gate; value] along the output dim
            h = nn.Dense(2 * inner, dtype=self.dtype, name="fc1")(x)
            g, v = jnp.split(h, 2, axis=-1)
            h = nn.silu(g) * v
        else:
            h = nn.Dense(inner, dtype=self.dtype, name="fc1")(x)
            if self.activation == "gelu_tanh":
                h = nn.gelu(h, approximate=True)
            elif self.activation == "silu":
                h = nn.silu(h)
            else:
                raise ValueError(self.activation)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(h)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm(dtype=jnp.float32)``: identical params
    ('scale', 'bias'), init, and CPU numerics; one-pass Pallas on TPU."""

    epsilon: float = 1e-6
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (D,), jnp.float32)
        return fused_layernorm(x, scale, bias, eps=self.epsilon, out_dtype=self.out_dtype)


class _RMSScaleParam(nn.Module):
    """Bare RMSNorm scale holder: the same ``<name>/scale`` leaf flax
    ``nn.RMSNorm`` creates, but accessible WITHOUT computing the norm — the
    fused qk-norm attention path reads γ and normalizes inside the flash
    kernel (ops/attention.py:qknorm_dot_product_attention)."""

    dim: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(), (self.dim,), jnp.float32)

    def __call__(self) -> jax.Array:
        return self.scale


class QKNorm(nn.Module):
    """Per-head RMS norm of q/k (SD3.5 / FLUX convention).

    Param tree ('qk_norm/q_norm/scale', 'qk_norm/k_norm/scale') and the
    native computation are identical to the previous nn.RMSNorm-based
    formulation (``y = x32 · (rsqrt(mean(x²)+eps) · γ)``, fp32 stats, cast
    back — bit-equality CI-pinned in test_ops.py). :meth:`scales` exposes
    the γ leaves for the fused flash path."""

    head_dim: int
    epsilon: float = 1e-6

    def setup(self):
        self.q_norm = _RMSScaleParam(self.head_dim)
        self.k_norm = _RMSScaleParam(self.head_dim)

    def __call__(self, q: jax.Array, k: jax.Array) -> Tuple[jax.Array, jax.Array]:
        qn = _rms_scale(q, self.q_norm(), self.epsilon)
        kn = _rms_scale(k, self.k_norm(), self.epsilon)
        return qn.astype(q.dtype), kn.astype(k.dtype)

    def scales(self) -> Tuple[jax.Array, jax.Array]:
        return self.q_norm(), self.k_norm()


def _across_heads_rms(x: jax.Array, gamma: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS-normalize (B, H, S, E) over the FULL hidden dim (H·E jointly).

    The diffusers ``qk_norm="rms_norm_across_heads"`` form (Wan, LTX-Video):
    upstream normalizes the (B, S, D) projection before the head split with a
    (D,)-shaped weight — the mean-square spans every head. With the
    head-major layout that is a reduction over axes (1, 3) and γ reshaped
    (H, E) (torch's ``view(B, S, H, E)`` puts D index = h·E + e)."""
    B, H, S, E = x.shape
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jax.lax.square(x32), axis=(1, 3), keepdims=True)
    r = jax.lax.rsqrt(ms + eps)
    return (x32 * r * gamma.reshape(1, H, 1, E)).astype(x.dtype)


class AcrossHeadsQKNorm(nn.Module):
    """q/k RMS norm ACROSS heads — γ shape (hidden_dim,).

    Param tree matches :class:`QKNorm` ('qk_norm/q_norm/scale', '.../k_norm/
    scale') so key maps are unchanged; only the γ SHAPE and the reduction
    span differ. Round-5 parity fix: Wan and LTX upstream checkpoints carry
    (D,)-shaped norm weights (original Wan ``WanRMSNorm(dim)``; diffusers
    ``rms_norm_across_heads``) — the previous per-head (E,) form would have
    failed shape validation on real weights AND normalized over the wrong
    span."""

    dim: int  # FULL hidden dim (H·E)
    epsilon: float = 1e-6

    def setup(self):
        self.q_norm = _RMSScaleParam(self.dim)
        self.k_norm = _RMSScaleParam(self.dim)

    def __call__(self, q: jax.Array, k: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return (
            _across_heads_rms(q, self.q_norm(), self.epsilon),
            _across_heads_rms(k, self.k_norm(), self.epsilon),
        )


class HeadProj(nn.Module):
    """QKV projection emitting the attention layout (B, H, S, E) DIRECTLY.

    Folds the head split into the projection einsum instead of
    Dense → reshape → transpose, so XLA's layout assignment writes the
    attention-kernel layout straight out of the matmul epilogue instead of
    materializing head-split transposes (measured ~12% of the Wan rollout
    timeline — docs/performance.md; 195.6 → 167.1 ms/step). Param names,
    shapes, init, and dtype promotion match ``nn.Dense`` exactly
    ('kernel' (D_in, H·E), 'bias' (H·E,), lecun-normal/zeros, fp32 params):
    checkpoint key maps, TP sharding rules, RNG draws, and numerics are
    identical to the Dense formulation (up to fp32 contraction order).
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, S, D_in) → (B, H, S, E)
        H, E = self.heads, self.head_dim
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (x.shape[-1], H * E))
        bias = self.param("bias", nn.initializers.zeros_init(), (H * E,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jnp.einsum("bsd,dhe->bhse", x, kernel.reshape(x.shape[-1], H, E))
        return y + bias.reshape(1, H, 1, E)


class MergeProj(nn.Module):
    """Output projection consuming (B, H, S, E) directly → (B, S, D_out).

    The head merge contracts inside the einsum (no transpose+reshape before
    the Dense). Same param layout as ``nn.Dense`` on the merged (B, S, H·E)
    input — 'kernel' (H·E, D_out) — so key maps and TP rules hold."""

    out_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, attn: jax.Array) -> jax.Array:
        B, H, S, E = attn.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (H * E, self.out_dim))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.out_dim,))
        attn, kernel, bias = nn.dtypes.promote_dtype(attn, kernel, bias, dtype=self.dtype)
        return jnp.einsum("bhse,hed->bsd", attn, kernel.reshape(H, E, self.out_dim)) + bias


class JointAttention(nn.Module):
    """MMDiT dual-stream joint attention.

    Latent tokens and context (text) tokens get separate qkv projections,
    attend jointly over the concatenated sequence, then project back per
    stream. ``context_pre_only`` drops the context output projection (final
    block).
    """

    hidden_dim: int
    num_heads: int
    qk_norm: bool = True
    context_pre_only: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array]
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        D = self.hidden_dim
        head_dim = D // self.num_heads
        hp = lambda name: HeadProj(
            heads=self.num_heads, head_dim=head_dim, dtype=self.dtype, name=name)

        q = hp("to_q")(x)
        k = hp("to_k")(x)
        v = hp("to_v")(x)
        # No RoPE sits between the qk-norm and attention in the MMDiT, so the
        # norm can fuse into the flash kernel (raw q/k normalized in VMEM —
        # saves the per-block HBM round trips of normalized q/k)
        fused = self.qk_norm and fused_qknorm_eligible(self.attn_backend, head_dim)
        qkn = QKNorm(head_dim, name="qk_norm") if self.qk_norm else None
        if self.qk_norm and not fused:
            q, k = qkn(q, k)

        ctx_len = 0
        added_qkn = None
        if context is not None:
            cq = hp("add_q_proj")(context)
            ck = hp("add_k_proj")(context)
            cv = hp("add_v_proj")(context)
            if self.qk_norm:
                added_qkn = QKNorm(head_dim, name="added_qk_norm")
                if not fused:
                    cq, ck = added_qkn(cq, ck)
            ctx_len = context.shape[1]
            # Context tokens lead the joint sequence (diffusers SD3 order).
            q = jnp.concatenate([cq, q], axis=2)
            k = jnp.concatenate([ck, k], axis=2)
            v = jnp.concatenate([cv, v], axis=2)

        if fused:
            gq, gk = qkn.scales()
            if context is not None:
                # per-position scale maps: context rows carry the added-norm
                # γ, image rows the main γ (piecewise-constant ≡ per-stream)
                cgq, cgk = added_qkn.scales()
                img_len = x.shape[1]
                gq = jnp.concatenate([
                    jnp.broadcast_to(cgq, (ctx_len, head_dim)),
                    jnp.broadcast_to(gq, (img_len, head_dim)),
                ], axis=0)
                gk = jnp.concatenate([
                    jnp.broadcast_to(cgk, (ctx_len, head_dim)),
                    jnp.broadcast_to(gk, (img_len, head_dim)),
                ], axis=0)
            out = qknorm_dot_product_attention(q, k, v, gq, gk, backend=self.attn_backend)
        else:
            out = dot_product_attention(q, k, v, backend=self.attn_backend)
        out = tag_attn_out(out)

        ctx_out = None
        if context is not None:
            ctx_part, x_part = out[:, :, :ctx_len], out[:, :, ctx_len:]
            if not self.context_pre_only:
                ctx_out = MergeProj(out_dim=D, dtype=self.dtype, name="to_add_out")(ctx_part)
        else:
            x_part = out
        x_out = MergeProj(out_dim=D, dtype=self.dtype, name="to_out")(x_part)
        return x_out, ctx_out


class SelfAttention(nn.Module):
    """Plain self-attention over one stream (MMDiT-X dual-attention blocks)."""

    hidden_dim: int
    num_heads: int
    qk_norm: bool = True
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        D = self.hidden_dim
        E = D // self.num_heads
        hp = lambda name: HeadProj(heads=self.num_heads, head_dim=E, dtype=self.dtype, name=name)
        q = hp("to_q")(x)
        k = hp("to_k")(x)
        v = hp("to_v")(x)
        if self.qk_norm and fused_qknorm_eligible(self.attn_backend, E):
            gq, gk = QKNorm(E, name="qk_norm").scales()
            out = qknorm_dot_product_attention(q, k, v, gq, gk, backend=self.attn_backend)
        elif self.qk_norm:
            q, k = QKNorm(E, name="qk_norm")(q, k)
            out = dot_product_attention(q, k, v, backend=self.attn_backend)
        else:
            out = dot_product_attention(q, k, v, backend=self.attn_backend)
        return MergeProj(out_dim=D, dtype=self.dtype, name="to_out")(tag_attn_out(out))


# ---------------------------------------------------------------------------
# Rotary position embeddings (FLUX / Qwen-Image / video DiTs)
# ---------------------------------------------------------------------------

def rope_frequencies(
    ids: jax.Array, axes_dim: Sequence[int], theta: float = 10000.0
) -> Tuple[jax.Array, jax.Array]:
    """Multi-axis RoPE tables.

    ``ids``: (L, A) integer coordinates per token per axis (e.g. FLUX uses
    A=3: [batch/text, height, width]). ``axes_dim``: rotary dims per axis,
    summing to the head dim. Returns (cos, sin) of shape (L, head_dim/2).
    """
    ids = jnp.asarray(ids, jnp.float32)
    parts_cos, parts_sin = [], []
    for a, dim in enumerate(axes_dim):
        half = dim // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / dim))
        angles = ids[:, a][:, None] * freqs[None, :]  # (L, half)
        parts_cos.append(jnp.cos(angles))
        parts_sin.append(jnp.sin(angles))
    return jnp.concatenate(parts_cos, axis=-1), jnp.concatenate(parts_sin, axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (B, H, L, D) by per-position tables (L, D/2) — interleaved pairs."""
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def unpatchify(x: jax.Array, h: int, w: int, patch_size: int, channels: int) -> jax.Array:
    """(B, h*w, p*p*C) → (B, H, W, C) channel-last."""
    B = x.shape[0]
    p = patch_size
    x = x.reshape(B, h, w, p, p, channels)
    x = jnp.einsum("bhwpqc->bhpwqc", x)
    return x.reshape(B, h * p, w * p, channels)
