"""SD3 / SD3.5 MMDiT transformer in flax.linen.

TPU-first re-implementation of the architecture behind the reference's SD3.5
adapter (``src/flow_factory/models/stable_diffusion/sd3_5.py`` wraps the
diffusers ``SD3Transformer2DModel``; here the transformer itself is native).

Dual-stream MMDiT: latent patches and text-context tokens run in parallel
streams coupled by joint attention each block. SD3.5-medium ("MMDiT-X") adds a
second, latent-only self-attention in the early blocks
(``dual_attention_layers``).

Forward is a pure function of (params, latents, timestep, context, pooled) →
velocity; it is called inside the rollout ``lax.scan`` and the training step
alike. Layout is channel-last (B, H, W, C) — TPU conv-friendly — with NCHW
adapters at the module boundary.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    FeedForward,
    JointAttention,
    PatchEmbed,
    PooledTextEmbedder,
    SelfAttention,
    TimestepEmbedder,
    remat_policy,
    residual_gate_modulate,
    unpatchify,
)


@dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    hidden_dim: int = 1536
    depth: int = 24
    num_heads: int = 24
    context_dim: int = 4096  # T5 / concat CLIP hidden width
    pooled_dim: int = 2048  # CLIP-L (768) + CLIP-G (1280) pooled concat
    pos_embed_max_size: int = 384
    qk_norm: bool = True
    dual_attention_layers: Tuple[int, ...] = ()
    attn_backend: str = "auto"
    dtype: str = "bfloat16"
    remat: bool = False  # gradient checkpointing (rematerialize blocks)

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def sd3_5_medium(**overrides) -> "MMDiTConfig":
        base = dict(
            hidden_dim=1536,
            depth=24,
            num_heads=24,
            pos_embed_max_size=384,
            dual_attention_layers=tuple(range(13)),
            qk_norm=True,
        )
        base.update(overrides)
        return MMDiTConfig(**base)

    @staticmethod
    def sd3_5_large(**overrides) -> "MMDiTConfig":
        base = dict(
            hidden_dim=2432,
            depth=38,
            num_heads=38,
            pos_embed_max_size=192,
            dual_attention_layers=(),
            qk_norm=True,
        )
        base.update(overrides)
        return MMDiTConfig(**base)

    @staticmethod
    def tiny(**overrides) -> "MMDiTConfig":
        """Test-scale config: runs the full code path on a CPU mesh."""
        base = dict(
            hidden_dim=64,
            depth=2,
            num_heads=4,
            context_dim=32,
            pooled_dim=48,
            pos_embed_max_size=32,
            dual_attention_layers=(0,),
        )
        base.update(overrides)
        return MMDiTConfig(**base)


class JointTransformerBlock(nn.Module):
    cfg: MMDiTConfig
    context_pre_only: bool = False
    use_dual_attention: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, context: jax.Array, temb: jax.Array
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        cfg = self.cfg
        dt = cfg.compute_dtype

        num_chunks = 9 if self.use_dual_attention else 6
        norm_out = AdaLayerNormZero(cfg.hidden_dim, num_chunks=num_chunks, name="norm1")(x, temb)
        if self.use_dual_attention:
            # diffusers SD35AdaLayerNormZeroX: x_mod and x_mod2 are the SAME
            # pre-attention LayerNorm modulated twice — attn and attn2 are
            # parallel branches over the original x (round-5 parity fix;
            # previously attn2 consumed the post-attn residual)
            x_mod, x_mod2, gate_msa, shift_mlp, scale_mlp, gate_mlp, gate2 = norm_out
        else:
            x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp = norm_out

        if self.context_pre_only:
            c_mod = AdaLayerNormContinuous(cfg.hidden_dim, name="norm1_context")(context, temb)
            c_gates = None
        else:
            c_mod, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
                cfg.hidden_dim, num_chunks=6, name="norm1_context"
            )(context, temb)
            c_gates = (c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp)

        attn_out, ctx_attn_out = JointAttention(
            cfg.hidden_dim,
            cfg.num_heads,
            qk_norm=cfg.qk_norm,
            context_pre_only=self.context_pre_only,
            attn_backend=cfg.attn_backend,
            dtype=dt,
            name="attn",
        )(x_mod, c_mod)
        # residual joins fuse with the NEXT AdaLN modulate into one Pallas
        # pass on TPU (ops/norms.py:residual_gate_modulate) — the
        # convert→reduce LN chain never round-trips through HBM
        if self.use_dual_attention:
            attn2_out = SelfAttention(
                cfg.hidden_dim,
                cfg.num_heads,
                qk_norm=cfg.qk_norm,
                attn_backend=cfg.attn_backend,
                dtype=dt,
                name="attn2",
            )(x_mod2)
            x = x + gate_msa[:, None, :].astype(x.dtype) * attn_out.astype(x.dtype)
            x, x_ff_in = residual_gate_modulate(
                x, attn2_out, gate2, shift_mlp, scale_mlp, out_dtype=dt)
        else:
            x, x_ff_in = residual_gate_modulate(
                x, attn_out, gate_msa, shift_mlp, scale_mlp, out_dtype=dt)
        x = x + gate_mlp[:, None, :].astype(x.dtype) * FeedForward(
            cfg.hidden_dim, dtype=dt, name="ff"
        )(x_ff_in)

        if self.context_pre_only:
            return x, None

        c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = c_gates
        context, c_ff_in = residual_gate_modulate(
            context, ctx_attn_out, c_gate_msa, c_shift_mlp, c_scale_mlp, out_dtype=dt)
        context = context + c_gate_mlp[:, None, :].astype(context.dtype) * FeedForward(
            cfg.hidden_dim, dtype=dt, name="ff_context"
        )(c_ff_in)
        return x, context


class SD3Transformer(nn.Module):
    """MMDiT denoiser. Inputs channel-last; timestep in scheduler scale [0,1000]."""

    cfg: MMDiTConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) channel-last
        timestep: jax.Array,  # (B,) float, scheduler scale
        encoder_hidden_states: jax.Array,  # (B, L, context_dim)
        pooled_projections: jax.Array,  # (B, pooled_dim)
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, H, W, C = latents.shape
        h, w = H // cfg.patch_size, W // cfg.patch_size

        x = PatchEmbed(
            cfg.patch_size,
            cfg.hidden_dim,
            pos_embed_max_size=cfg.pos_embed_max_size,
            dtype=dt,
            name="pos_embed",
        )(latents)
        temb = TimestepEmbedder(cfg.hidden_dim, dtype=jnp.float32, name="time_embed")(timestep)
        temb = temb + PooledTextEmbedder(cfg.hidden_dim, dtype=jnp.float32, name="text_embed")(
            pooled_projections
        )
        context = nn.Dense(cfg.hidden_dim, dtype=dt, name="context_embedder")(
            encoder_hidden_states.astype(dt)
        )

        BlockCls = (
            nn.remat(JointTransformerBlock, policy=remat_policy(None))
            if cfg.remat else JointTransformerBlock
        )
        for i in range(cfg.depth):
            x, context = BlockCls(
                cfg,
                context_pre_only=(i == cfg.depth - 1),
                use_dual_attention=(i in cfg.dual_attention_layers),
                name=f"block_{i}",
            )(x, context, temb)

        x = AdaLayerNormContinuous(cfg.hidden_dim, name="norm_out")(x, temb)
        x = nn.Dense(
            cfg.patch_size * cfg.patch_size * cfg.out_channels, dtype=jnp.float32, name="proj_out"
        )(x.astype(jnp.float32))
        return unpatchify(x, h, w, cfg.patch_size, cfg.out_channels)
