"""Wan 2.x video DiT in flax.linen.

TPU-first re-implementation of the architecture behind the reference Wan
adapters (``src/flow_factory/models/wan/wan2_t2v.py`` wraps diffusers'
``WanTransformer3DModel``). Structure per block:

    self-attention over (t·h·w) video tokens with 3-D RoPE + RMS QK-norm
    cross-attention to UMT5 text embeddings
    feed-forward, all modulated by AdaLN with per-block learned offsets
    (Wan's "scale_shift_table" convention: modulation = table + time_proj(t))

Latents are 5-D (B, T, H, W, C) channel-last; patching is (1, 2, 2).
Wan2.2-A14B's temporal MoE (two experts routed by boundary timestep,
reference ``wan2_t2v.py:474-490``) lives in the adapter as two parameter
sets over this one module.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ..layers import (
    AcrossHeadsQKNorm,
    FusedLayerNorm,
    HeadProj,
    MergeProj,
    TimestepEmbedder,
    _across_heads_rms,
    adaln_modulate,
    apply_rope,
    rope_frequencies,
)


@dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)  # (t, h, w)
    hidden_dim: int = 1536
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    context_dim: int = 4096  # UMT5
    freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (44, 42, 42)  # rope dims for (t, h, w); sums to head_dim
    rope_theta: float = 10000.0
    qk_norm: bool = True
    attn_backend: str = "auto"
    dtype: str = "bfloat16"
    remat: bool = False  # gradient checkpointing (rematerialize blocks)
    #: Wan2.1 I2V: CLIP image tokens consumed by a second cross-attn stream
    #: (0 disables; Wan2.2 I2V conditions purely by latent concat)
    image_context_tokens: int = 0
    image_context_dim: int = 1280

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @staticmethod
    def wan21_1_3b(**o) -> "WanConfig":
        return WanConfig(**o)

    @staticmethod
    def wan21_14b(**o) -> "WanConfig":
        base = dict(hidden_dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)
        base.update(o)
        return WanConfig(**base)

    @staticmethod
    def tiny(**o) -> "WanConfig":
        base = dict(
            hidden_dim=64, ffn_dim=128, num_heads=4, num_layers=2,
            context_dim=48, freq_dim=32, axes_dim=(8, 4, 4),
        )
        base.update(o)
        return WanConfig(**base)


class WanBlock(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, context, temb6, cos, sin, context_img=None):
        """x: (B, L, D); context: (B, Lc, D_ctx); temb6: (B, 6, D);
        context_img: optional (B, Li, D) projected CLIP tokens (Wan2.1 I2V)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.hidden_dim, cfg.num_heads

        # Wan per-block modulation: learned table + projected time embedding.
        # temb6 is (B, 6, D) — one timestep per sample — or (B, L, 6, D) when
        # the transformer runs with per-token timesteps (Wan2.2 TI2V-style
        # expand_timesteps, reference wan2_t2v.py:502-506): modulations then
        # index per token and the broadcast dims below collapse.
        table = self.param("scale_shift_table", nn.initializers.normal(0.02), (1, 6, D), jnp.float32)
        if temb6.ndim == 4:  # per-token: (B, L, 6, D)
            mods = table[:, None] + temb6.astype(jnp.float32)
            shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = [
                mods[:, :, i] for i in range(6)  # each (B, L, D)
            ]
            tok = lambda m: m  # already per-token
        else:
            mods = table + temb6.astype(jnp.float32)
            shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = [
                mods[:, i] for i in range(6)  # each (B, D)
            ]
            tok = lambda m: m[:, None]  # broadcast over tokens

        E = D // H
        hp = lambda name: HeadProj(heads=H, head_dim=E, dtype=dt, name=name)
        mp = lambda name: MergeProj(out_dim=D, dtype=dt, name=name)

        # --- self attention (RoPE over video tokens); one-pass fused
        # LayerNorm+modulate (ops/norms.py) — "norm1"/"norm3" had no params
        h = adaln_modulate(x, tok(shift_sa), tok(scale_sa), out_dtype=dt)
        q = hp("sa_q")(h)
        k = hp("sa_k")(h)
        v = hp("sa_v")(h)
        if cfg.qk_norm:
            # upstream Wan qk-norm is ACROSS heads (γ shape (D,)) — original
            # WanRMSNorm(dim) / diffusers rms_norm_across_heads
            q, k = AcrossHeadsQKNorm(D, name="sa_qk_norm")(q, k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, backend=cfg.attn_backend)
        x = x + tok(gate_sa).astype(x.dtype) * mp("sa_out")(attn)

        # --- cross attention (no RoPE, plain LN)
        h = FusedLayerNorm(name="norm2", out_dtype=dt)(x)
        ctx = context.astype(dt)
        q = hp("ca_q")(h)
        ck = hp("ca_k")(ctx)
        cv = hp("ca_v")(ctx)
        if cfg.qk_norm:
            q, ck = AcrossHeadsQKNorm(D, name="ca_qk_norm")(q, ck)
        attn = dot_product_attention(q, ck, cv, backend=cfg.attn_backend)
        if cfg.image_context_tokens and context_img is not None:
            # Wan2.1 I2V second cross-attention stream: shared (normed) query
            # over CLIP image tokens, k-only RMS norm, outputs summed before
            # the shared output projection.
            ci = context_img.astype(dt)
            ik = hp("ca_k_img")(ci)
            iv = hp("ca_v_img")(ci)
            if cfg.qk_norm:
                # across-heads k-norm (upstream norm_added_k, γ (D,))
                from ..layers import _RMSScaleParam

                ik = _across_heads_rms(
                    ik, _RMSScaleParam(D, name="ca_k_img_norm")())
            attn = attn + dot_product_attention(q, ik, iv, backend=cfg.attn_backend)
        x = x + mp("ca_out")(attn)

        # --- feed forward
        h = adaln_modulate(x, tok(shift_ff), tok(scale_ff), out_dtype=dt)
        h = nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(D, dtype=dt, name="ffn2")(h)
        return x + tok(gate_ff).astype(x.dtype) * h


class WanTransformer(nn.Module):
    """Video DiT. Input (B, T, H, W, C) channel-last; t in scheduler scale."""

    cfg: WanConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, C)
        timestep: jax.Array,  # (B,) scheduler scale [0, 1000]
        encoder_hidden_states: jax.Array,  # (B, Lc, context_dim)
        encoder_hidden_states_image: Optional[jax.Array] = None,  # (B, Li, clip_dim)
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, T, H, W, C = latents.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = T // pt, H // ph, W // pw

        # 3-D patch embed
        x = latents.reshape(B, gt, pt, gh, ph, gw, pw, C)
        x = jnp.einsum("btphqwrc->bthwpqrc", x).reshape(B, gt * gh * gw, pt * ph * pw * C)
        x = nn.Dense(cfg.hidden_dim, dtype=dt, name="patch_embedding")(x.astype(dt))

        # time conditioning: sinusoidal → MLP → 6-way per-token table offset.
        # timestep may be (B,) — one t per sample — or (B, gt) per latent
        # frame (Wan2.2 TI2V-style expand_timesteps, reference
        # wan2_t2v.py:502-506: conditioned frames keep t=0); the per-frame
        # form expands to per-token modulations in the blocks.
        per_frame = timestep.ndim == 2
        t_flat = timestep.reshape(-1) if per_frame else timestep
        temb = TimestepEmbedder(cfg.hidden_dim, freq_dim=cfg.freq_dim, dtype=jnp.float32, name="time_embed")(t_flat)
        temb6 = nn.Dense(6 * cfg.hidden_dim, dtype=jnp.float32, name="time_proj")(
            nn.silu(temb)
        )
        if per_frame:
            temb = temb.reshape(B, gt, cfg.hidden_dim)
            temb6 = temb6.reshape(B, gt, 6, cfg.hidden_dim)
            # frame → token expansion (tokens are frame-major: gt·gh·gw)
            temb6 = jnp.repeat(temb6, gh * gw, axis=1)  # (B, L, 6, D)
        else:
            temb6 = temb6.reshape(B, 6, cfg.hidden_dim)

        context = nn.Dense(cfg.hidden_dim, dtype=dt, name="ctx_proj1")(
            nn.gelu(
                nn.Dense(cfg.hidden_dim, dtype=dt, name="ctx_proj0")(encoder_hidden_states.astype(dt)),
                approximate=True,
            )
        )

        # Wan2.1 I2V image-embedding projector (upstream MLPProj: LN → MLP → LN)
        context_img = None
        if cfg.image_context_tokens and encoder_hidden_states_image is not None:
            ih = nn.LayerNorm(dtype=jnp.float32, name="img_emb_norm1")(
                encoder_hidden_states_image.astype(jnp.float32)
            ).astype(dt)
            ih = nn.Dense(cfg.hidden_dim, dtype=dt, name="img_emb_fc1")(ih)
            ih = nn.gelu(ih, approximate=False)
            ih = nn.Dense(cfg.hidden_dim, dtype=dt, name="img_emb_fc2")(ih)
            context_img = nn.LayerNorm(dtype=jnp.float32, name="img_emb_norm2")(
                ih.astype(jnp.float32)
            ).astype(dt)

        # 3-D RoPE ids: (t, h, w) coordinates per token
        tt = jnp.repeat(jnp.arange(gt), gh * gw)
        hh = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gt)
        ww = jnp.tile(jnp.arange(gw), gt * gh)
        ids = jnp.stack([tt, hh, ww], axis=-1)  # (L, 3)
        cos, sin = rope_frequencies(ids, cfg.axes_dim, cfg.rope_theta)

        BlockCls = nn.remat(WanBlock) if cfg.remat else WanBlock
        for i in range(cfg.num_layers):
            x = BlockCls(cfg, name=f"block_{i}")(x, context, temb6, cos, sin, context_img)

        # head: modulated norm + linear to patch voxels. Upstream Wan adds the
        # raw time embedding straight onto the (1, 2, D) head table (no extra
        # projection), so imported checkpoints line up leaf-for-leaf.
        head_table = self.param("head_table", nn.initializers.normal(0.02), (1, 2, cfg.hidden_dim), jnp.float32)
        if per_frame:  # (B, gt, D) → per-token head modulation
            tok_temb = jnp.repeat(temb, gh * gw, axis=1).astype(jnp.float32)  # (B, L, D)
            head_mod = head_table[:, None] + tok_temb[:, :, None]  # (B, L, 2, D)
            shift, scale = head_mod[:, :, 0], head_mod[:, :, 1]
        else:
            head_mod = head_table + temb[:, None, :].astype(jnp.float32)
            shift, scale = head_mod[:, 0, None], head_mod[:, 1, None]  # (B, 1, D)
        x = adaln_modulate(x, shift, scale, out_dtype=jnp.float32)
        x = nn.Dense(pt * ph * pw * cfg.out_channels, dtype=jnp.float32, name="head_out")(x)

        # unpatchify back to (B, T, H, W, C)
        x = x.reshape(B, gt, gh, gw, pt, ph, pw, cfg.out_channels)
        x = jnp.einsum("bthwpqrc->btphqwrc", x)
        return x.reshape(B, T, H, W, cfg.out_channels)
