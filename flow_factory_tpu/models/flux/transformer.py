"""FLUX.1 transformer in flax.linen.

TPU-first re-implementation of the architecture behind the reference FLUX
adapters (``src/flow_factory/models/flux/flux1.py`` wraps diffusers'
``FluxTransformer2DModel``). Hybrid DiT:

* N double-stream blocks — image & text streams with separate projections,
  joint attention over the concatenated sequence with multi-axis RoPE and
  per-head RMS QK-norm;
* M single-stream blocks — streams concatenated, fused parallel
  attention + MLP (one input projection, one output projection);
* guidance-distilled timestep conditioning (timestep + guidance + pooled
  CLIP vector embeddings summed into AdaLN modulation).

Latents arrive PACKED: (B, L, 64) tokens of 2×2×16 latent patches with
``latent_image_ids`` giving (h, w) coordinates for RoPE (reference
``flux1.py:141,192``). Channel-last, bf16 matmuls, fp32 norms.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (
    AdaLayerNormContinuous,
    FeedForward,
    HeadProj,
    MergeProj,
    PooledTextEmbedder,
    QKNorm,
    TimestepEmbedder,
    adaln_modulate,
    apply_rope,
    rope_frequencies,
)
from ...ops.attention import dot_product_attention


@dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # packed 2x2x16
    hidden_dim: int = 3072
    num_heads: int = 24
    num_double_blocks: int = 19
    num_single_blocks: int = 38
    context_dim: int = 4096  # T5
    pooled_dim: int = 768  # CLIP-L
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embeds: bool = True
    mlp_ratio: float = 4.0
    #: double-block FFN form: "gelu_tanh" (FLUX.1) or "swiglu" (gated —
    #: FLUX.2's ``ff.linear_in/linear_out`` layout supports either; the
    #: pretrained import raises with the fix if the checkpoint disagrees)
    mlp_style: str = "gelu_tanh"
    attn_backend: str = "auto"
    dtype: str = "bfloat16"
    remat: bool = False  # gradient checkpointing (rematerialize blocks)
    #: Qwen-Image applies an RMSNorm to text features before the context
    #: embedder (upstream ``txt_norm``); FLUX does not
    txt_norm: bool = False

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @staticmethod
    def flux1_dev(**o) -> "FluxConfig":
        return FluxConfig(**o)

    @staticmethod
    def tiny(**o) -> "FluxConfig":
        base = dict(
            in_channels=16,
            hidden_dim=64,
            num_heads=4,
            num_double_blocks=2,
            num_single_blocks=2,
            context_dim=48,
            pooled_dim=16,
            axes_dim=(4, 6, 6),
        )
        base.update(o)
        return FluxConfig(**base)


class FluxDoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, temb, cos, sin):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.hidden_dim, cfg.num_heads
        txt_len = txt.shape[1]

        img_mods = nn.Dense(6 * D, dtype=jnp.float32, name="img_mod")(nn.silu(temb))
        txt_mods = nn.Dense(6 * D, dtype=jnp.float32, name="txt_mod")(nn.silu(temb))
        i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2 = jnp.split(img_mods, 6, -1)
        t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2 = jnp.split(txt_mods, 6, -1)

        # one-pass fused LayerNorm+modulate (ops/norms.py); the replaced
        # no-affine LayerNorms carried no params
        img_mod = adaln_modulate(img, i_shift, i_scale, out_dtype=dt)
        txt_mod = adaln_modulate(txt, t_shift, t_scale, out_dtype=dt)

        E = D // H
        hp = lambda name: HeadProj(heads=H, head_dim=E, dtype=dt, name=name)
        iq = hp("img_q")(img_mod)
        ik = hp("img_k")(img_mod)
        iv = hp("img_v")(img_mod)
        tq = hp("txt_q")(txt_mod)
        tk = hp("txt_k")(txt_mod)
        tv = hp("txt_v")(txt_mod)
        iq, ik = QKNorm(E, name="img_qk_norm")(iq, ik)
        tq, tk = QKNorm(E, name="txt_qk_norm")(tq, tk)

        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = dot_product_attention(q, k, v, backend=cfg.attn_backend)
        txt_attn, img_attn = out[:, :, :txt_len], out[:, :, txt_len:]

        img = img + i_gate[:, None].astype(img.dtype) * MergeProj(
            out_dim=D, dtype=dt, name="img_attn_out")(img_attn)
        txt = txt + t_gate[:, None].astype(txt.dtype) * MergeProj(
            out_dim=D, dtype=dt, name="txt_attn_out")(txt_attn)

        img_ff = adaln_modulate(img, i_shift2, i_scale2, out_dtype=dt)
        img = img + i_gate2[:, None].astype(img.dtype) * FeedForward(
            D, mult=cfg.mlp_ratio, activation=cfg.mlp_style, dtype=dt, name="img_ff"
        )(img_ff)
        txt_ff = adaln_modulate(txt, t_shift2, t_scale2, out_dtype=dt)
        txt = txt + t_gate2[:, None].astype(txt.dtype) * FeedForward(
            D, mult=cfg.mlp_ratio, activation=cfg.mlp_style, dtype=dt, name="txt_ff"
        )(txt_ff)
        return img, txt


class _SingleQKVMLP(nn.Module):
    """The single-block fused linear1 computed head-major.

    Upstream FLUX single blocks project QKV and the MLP branch with ONE
    fused Linear (kernel (D, 3D+mlp)); keeping that parameter layout (key
    maps unchanged) but slicing the kernel into a (d,(t,h,e)) einsum for the
    QKV columns lets XLA write the attention layout (B, H, S, E) straight
    out of the matmul epilogue — no head split/transpose on a (B, S, 3D)
    tensor (same trick as ``layers.HeadProj``; ~1e-6 contraction-order
    shift, goldens re-recorded)."""

    hidden_dim: int
    heads: int
    mlp_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        D, H, M = self.hidden_dim, self.heads, self.mlp_dim
        E = D // H
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (x.shape[-1], 3 * D + M))
        bias = self.param("bias", nn.initializers.zeros_init(), (3 * D + M,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        qkv = jnp.einsum("bsd,dthe->tbhse", x, kernel[:, : 3 * D].reshape(x.shape[-1], 3, H, E))
        qkv = qkv + bias[: 3 * D].reshape(3, 1, H, 1, E)
        mlp = x @ kernel[:, 3 * D :] + bias[3 * D :]
        return qkv[0], qkv[1], qkv[2], mlp


class _SingleOutProj(nn.Module):
    """The single-block fused linear2 consuming (B, H, S, E) attention
    directly: upstream kernel ((D+mlp), D) is sliced so the attention rows
    contract head-major (no merge transpose) and the MLP rows contract as a
    plain matmul; the two partial products sum exactly like the original
    concat([attn, mlp]) @ kernel."""

    hidden_dim: int
    mlp_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, attn, mlp):
        B, H, S, E = attn.shape
        D, M = self.hidden_dim, self.mlp_dim
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (D + M, D))
        bias = self.param("bias", nn.initializers.zeros_init(), (D,))
        attn, mlp, kernel, bias = nn.dtypes.promote_dtype(attn, mlp, kernel, bias, dtype=self.dtype)
        out = jnp.einsum("bhse,hed->bsd", attn, kernel[:D].reshape(H, E, D))
        return out + mlp @ kernel[D:] + bias


class FluxSingleBlock(nn.Module):
    """Fused parallel attention + MLP over the concatenated stream."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, temb, cos, sin):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.hidden_dim, cfg.num_heads
        mlp_dim = int(D * cfg.mlp_ratio)

        mods = nn.Dense(3 * D, dtype=jnp.float32, name="mod")(nn.silu(temb))
        shift, scale, gate = jnp.split(mods, 3, -1)
        x_mod = adaln_modulate(x, shift, scale, out_dtype=dt)

        q, k, v, mlp = _SingleQKVMLP(
            hidden_dim=D, heads=H, mlp_dim=mlp_dim, dtype=dt, name="linear1")(x_mod)
        q, k = QKNorm(D // H, name="qk_norm")(q, k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, backend=cfg.attn_backend)
        out = _SingleOutProj(hidden_dim=D, mlp_dim=mlp_dim, dtype=dt, name="linear2")(
            attn, nn.gelu(mlp, approximate=True)
        )
        return x + gate[:, None].astype(x.dtype) * out


class FluxTransformer(nn.Module):
    """Packed-latent hybrid DiT. timestep & guidance in scheduler scale."""

    cfg: FluxConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, L_img, in_channels) packed
        timestep: jax.Array,  # (B,) scheduler scale [0, 1000]
        encoder_hidden_states: jax.Array,  # (B, L_txt, context_dim)
        pooled_projections: jax.Array,  # (B, pooled_dim)
        img_ids: jax.Array,  # (L_img, 3)
        txt_ids: jax.Array,  # (L_txt, 3)
        guidance: Optional[jax.Array] = None,  # (B,) CFG scale (distilled)
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype

        img = nn.Dense(cfg.hidden_dim, dtype=dt, name="x_embedder")(latents.astype(dt))
        if cfg.txt_norm:
            encoder_hidden_states = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32, name="txt_norm")(
                encoder_hidden_states.astype(jnp.float32)
            )
        txt = nn.Dense(cfg.hidden_dim, dtype=dt, name="context_embedder")(
            encoder_hidden_states.astype(dt)
        )
        # diffusers FluxTransformer scales timestep to [0, 1]
        temb = TimestepEmbedder(cfg.hidden_dim, dtype=jnp.float32, name="time_embed")(
            timestep / 1000.0 * 1000.0
        )
        if cfg.guidance_embeds and guidance is not None:
            temb = temb + TimestepEmbedder(cfg.hidden_dim, dtype=jnp.float32, name="guidance_embed")(
                guidance * 1000.0
            )
        if cfg.pooled_dim > 0 and pooled_projections is not None:
            temb = temb + PooledTextEmbedder(cfg.hidden_dim, dtype=jnp.float32, name="text_embed")(
                pooled_projections.astype(jnp.float32)
            )

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)  # (L, 3)
        cos, sin = rope_frequencies(ids, cfg.axes_dim, cfg.rope_theta)

        DoubleCls = nn.remat(FluxDoubleBlock) if cfg.remat else FluxDoubleBlock
        SingleCls = nn.remat(FluxSingleBlock) if cfg.remat else FluxSingleBlock
        for i in range(cfg.num_double_blocks):
            img, txt = DoubleCls(cfg, name=f"double_{i}")(img, txt, temb, cos, sin)

        x = jnp.concatenate([txt, img], axis=1)
        for i in range(cfg.num_single_blocks):
            x = SingleCls(cfg, name=f"single_{i}")(x, temb, cos, sin)
        img = x[:, txt.shape[1]:]

        img = AdaLayerNormContinuous(cfg.hidden_dim, name="norm_out")(img, temb)
        return nn.Dense(cfg.in_channels, dtype=jnp.float32, name="proj_out")(
            img.astype(jnp.float32)
        )
