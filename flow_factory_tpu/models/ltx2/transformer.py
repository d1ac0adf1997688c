"""LTX-2 joint audio-video DiT in flax.linen.

TPU-first re-implementation of the architecture behind the reference LTX-2
adapters (``src/flow_factory/models/ltx2/ltx2_t2av.py``): ONE transformer
over a unified concatenated sequence — video tokens first, audio tokens
after (``ltx2_t2av.py:680-705``) — with text cross-attention (Gemma3 hidden
states through per-modality connector projections,
``ltx2_t2av.py:370-482``).

Blocks are the self-attn(RoPE) + cross-attn + FFN form (shared with the Wan
video DiT). Video tokens carry (t, h, w) RoPE coordinates; audio tokens ride
the same tables with (t, 0, 0) — the temporal axis is shared so audio/video
tokens at the same time attend coherently.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import TimestepEmbedder, rope_frequencies
from ..wan.transformer import WanBlock, WanConfig


@dataclass(frozen=True)
class LTX2Config:
    video_channels: int = 128  # packed video latent channels
    audio_channels: int = 128  # packed audio latent channels
    hidden_dim: int = 2048
    ffn_dim: int = 8192
    num_heads: int = 16
    num_layers: int = 28
    context_dim: int = 3840  # Gemma3 hidden
    freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (64, 32, 32)
    rope_theta: float = 10000.0
    attn_backend: str = "auto"
    dtype: str = "bfloat16"
    remat: bool = False  # gradient checkpointing (rematerialize blocks)

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def ltx2(**o) -> "LTX2Config":
        return LTX2Config(**o)

    @staticmethod
    def tiny(**o) -> "LTX2Config":
        base = dict(
            video_channels=16, audio_channels=8, hidden_dim=64, ffn_dim=128,
            num_heads=4, num_layers=2, context_dim=32, freq_dim=32, axes_dim=(8, 4, 4),
        )
        base.update(o)
        return LTX2Config(**base)

    def wan_block_config(self) -> WanConfig:
        return WanConfig(
            in_channels=self.video_channels,
            hidden_dim=self.hidden_dim,
            ffn_dim=self.ffn_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            context_dim=self.context_dim,
            freq_dim=self.freq_dim,
            axes_dim=self.axes_dim,
            rope_theta=self.rope_theta,
            attn_backend=self.attn_backend,
            dtype=self.dtype,
            remat=False,  # remat is applied at the LTX2 block level
        )


class LTX2Transformer(nn.Module):
    """Joint AV DiT over [video_tokens ; audio_tokens].

    Inputs:
      video_latents: (B, Lv, video_channels) packed video tokens
      audio_latents: (B, La, audio_channels) packed audio tokens
      video_ids:     (Lv, 3) (t, h, w) coordinates
      audio_ids:     (La, 3) (t, 0, 0) coordinates
      timestep:      (B,) scheduler scale — shared across modalities
      video_context / audio_context: per-modality connector outputs
    """

    cfg: LTX2Config

    @nn.compact
    def __call__(
        self,
        video_latents: jax.Array,
        audio_latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,  # (B, Lc, context_dim) raw LM states
        video_ids: jax.Array,
        audio_ids: jax.Array,
        skip_blocks: Tuple[int, ...] = (),  # STG: perturbed (skipped) blocks
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, Lv, _ = video_latents.shape
        La = audio_latents.shape[1]

        v_tok = nn.Dense(cfg.hidden_dim, dtype=dt, name="video_embedder")(video_latents.astype(dt))
        a_tok = nn.Dense(cfg.hidden_dim, dtype=dt, name="audio_embedder")(audio_latents.astype(dt))
        x = jnp.concatenate([v_tok, a_tok], axis=1)

        temb = TimestepEmbedder(cfg.hidden_dim, freq_dim=cfg.freq_dim, dtype=jnp.float32, name="time_embed")(timestep)
        temb6 = nn.Dense(6 * cfg.hidden_dim, dtype=jnp.float32, name="time_proj")(
            nn.silu(temb)
        ).reshape(B, 6, cfg.hidden_dim)

        # dual connectors: video + audio context projections concatenated
        # (reference ltx2_t2av.py:370-482)
        ctx = encoder_hidden_states.astype(dt)
        v_ctx = nn.Dense(cfg.hidden_dim, dtype=dt, name="video_connector")(ctx)
        a_ctx = nn.Dense(cfg.hidden_dim, dtype=dt, name="audio_connector")(ctx)
        context = jnp.concatenate([v_ctx, a_ctx], axis=1)

        ids = jnp.concatenate([video_ids, audio_ids], axis=0)
        cos, sin = rope_frequencies(ids, cfg.axes_dim, cfg.rope_theta)

        wcfg = self.cfg.wan_block_config()
        BlockCls = nn.remat(WanBlock) if cfg.remat else WanBlock
        skip = set(skip_blocks)
        for i in range(cfg.num_layers):
            if i in skip:  # STG: identity through perturbed blocks
                continue
            x = BlockCls(wcfg, name=f"block_{i}")(x, context, temb6, cos, sin)

        head_table = self.param("head_table", nn.initializers.normal(0.02), (1, 2, cfg.hidden_dim), jnp.float32)
        head_mod = head_table + nn.Dense(2 * cfg.hidden_dim, dtype=jnp.float32, name="head_time")(
            nn.silu(temb)
        ).reshape(B, 2, cfg.hidden_dim)
        shift, scale = head_mod[:, 0], head_mod[:, 1]
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32, name="head_norm")(
            x.astype(jnp.float32)
        ) * (1 + scale[:, None]) + shift[:, None]

        v_out = nn.Dense(cfg.video_channels, dtype=jnp.float32, name="video_head")(x[:, :Lv])
        a_out = nn.Dense(cfg.audio_channels, dtype=jnp.float32, name="audio_head")(x[:, Lv:])
        return v_out, a_out
