"""Z-Image single-stream DiT in flax.linen (S3-DiT, NextDiT lineage).

TPU-first re-implementation of the architecture behind the reference
Z-Image adapter (``src/flow_factory/models/z_image/z_image.py``). The
per-block Linear layout is pinned by the reference's
``default_target_modules`` (``z_image.py:70-75``):

    attention.{to_q,to_k,to_v,to_out.0}     — ONE joint attention over the
                                              concatenated [text; image]
                                              token stream ("single-stream")
    feed_forward.{w1,w2,w3}                 — SwiGLU (w2(silu(w1 x) · w3 x))

Block semantics follow the NextDiT / Lumina family Z-Image derives from:
sandwich norms around attention and FFN, adaLN modulation from the timestep
embedding with FOUR outputs (scale_msa, gate_msa, scale_mlp, gate_mlp) and
tanh-bounded gates. The reference transformer call passes only
(latents, timestep, prompt_embeds) — no guidance embedding and no pooled
vector (``z_image.py:444-449``); CFG is batch-doubled by the adapter.
Top-level embedder/final-layer spellings are best-effort pending real
weights (PARITY.md gap 1); the per-block layout is the verified part.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import dot_product_attention
from ..layers import HeadProj, MergeProj, QKNorm, TimestepEmbedder, adaln_modulate, apply_rope, rope_frequencies


@dataclass(frozen=True)
class ZImageConfig:
    in_channels: int = 64  # packed 2x2 VAE latents
    hidden_dim: int = 3072
    num_heads: int = 24
    num_layers: int = 38
    ffn_dim: int = 8192  # SwiGLU inner width
    context_dim: int = 2560  # Qwen3 hidden
    freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    attn_backend: str = "auto"
    dtype: str = "bfloat16"
    remat: bool = False

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @staticmethod
    def z_image(**o) -> "ZImageConfig":
        return ZImageConfig(**o)

    @staticmethod
    def tiny(**o) -> "ZImageConfig":
        base = dict(
            in_channels=16, hidden_dim=64, num_heads=4, num_layers=3,
            ffn_dim=128, context_dim=32, freq_dim=32, axes_dim=(4, 6, 6),
        )
        base.update(o)
        return ZImageConfig(**base)


def _rms(name: str):
    return nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32, name=name)


class ZImageBlock(nn.Module):
    """Sequential single-stream block: sandwich-normed attention + SwiGLU."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, temb, cos, sin):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.hidden_dim, cfg.num_heads

        mods = nn.Dense(4 * D, dtype=jnp.float32, name="adaLN_modulation")(nn.silu(temb))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mods, 4, axis=-1)
        gate_msa = jnp.tanh(gate_msa)[:, None]
        gate_mlp = jnp.tanh(gate_mlp)[:, None]

        E = D // H
        hp = lambda name: HeadProj(heads=H, head_dim=E, dtype=dt, name=name)
        h = (_rms("attention_norm1")(x.astype(jnp.float32)) * (1 + scale_msa[:, None])).astype(dt)
        q = hp("to_q")(h)
        k = hp("to_k")(h)
        v = hp("to_v")(h)
        q, k = QKNorm(E, name="qk_norm")(q, k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, backend=cfg.attn_backend)
        attn = MergeProj(out_dim=D, dtype=dt, name="to_out")(attn)
        x = x + gate_msa.astype(x.dtype) * _rms("attention_norm2")(
            attn.astype(jnp.float32)).astype(x.dtype)

        h = (_rms("ffn_norm1")(x.astype(jnp.float32)) * (1 + scale_mlp[:, None])).astype(dt)
        gatep = nn.Dense(cfg.ffn_dim, use_bias=False, dtype=dt, name="w1")(h)
        up = nn.Dense(cfg.ffn_dim, use_bias=False, dtype=dt, name="w3")(h)
        ff = nn.Dense(D, use_bias=False, dtype=dt, name="w2")(nn.silu(gatep) * up)
        return x + gate_mlp.astype(x.dtype) * _rms("ffn_norm2")(
            ff.astype(jnp.float32)).astype(x.dtype)


class ZImageTransformer(nn.Module):
    """Single-stream DiT over [text tokens ; packed image tokens].

    Inputs:
      latents:  (B, L, in_channels) packed image tokens
      timestep: (B,) scheduler scale [0, 1000]
      encoder_hidden_states: (B, Lc, context_dim) Qwen3 hidden states
      img_ids / txt_ids: (L, 3) / (Lc, 3) RoPE coordinates
    """

    cfg: ZImageConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        img_ids: jax.Array,
        txt_ids: jax.Array,
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, L, _ = latents.shape
        Lc = encoder_hidden_states.shape[1]

        img = nn.Dense(cfg.hidden_dim, dtype=dt, name="x_embedder")(latents.astype(dt))
        cap = encoder_hidden_states.astype(jnp.float32)
        cap = _rms("cap_norm")(cap).astype(dt)
        cap = nn.Dense(cfg.hidden_dim, dtype=dt, name="cap_embedder")(cap)
        x = jnp.concatenate([cap, img], axis=1)

        temb = TimestepEmbedder(cfg.hidden_dim, freq_dim=cfg.freq_dim,
                                dtype=jnp.float32, name="t_embedder")(timestep)

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_frequencies(ids, cfg.axes_dim, cfg.rope_theta)

        BlockCls = nn.remat(ZImageBlock) if cfg.remat else ZImageBlock
        for i in range(cfg.num_layers):
            x = BlockCls(cfg, name=f"layer_{i}")(x, temb, cos, sin)

        # final layer: modulated norm + projection (NextDiT FinalLayer form)
        mods = nn.Dense(2 * cfg.hidden_dim, dtype=jnp.float32,
                        name="final_adaLN")(nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        h = adaln_modulate(x, shift, scale, out_dtype=jnp.float32)
        out = nn.Dense(cfg.in_channels, dtype=jnp.float32, name="final_linear")(h)
        return out[:, Lc:]  # image tokens only
