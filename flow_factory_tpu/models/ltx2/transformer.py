"""LTX-2 joint audio-video DiT in flax.linen — dual-stream blocks.

TPU-first re-implementation of the architecture behind the reference LTX-2
adapters (``src/flow_factory/models/ltx2/ltx2_t2av.py``). The upstream
transformer keeps video and audio as SEPARATE token streams per block; the
reference documents the exact per-block linear layout (28 Linears) in
``ltx2_t2av.py:176-218`` (``default_target_modules``, "verified against
LTX2VideoTransformerBlock.named_modules()"):

    attn1    — video self-attention (3-D RoPE over (t, h, w))
    attn2    — video cross-attention to the video text-connector stream
    audio_attn1 — audio self-attention (temporal RoPE)
    audio_attn2 — audio cross-attention to the audio text-connector stream
    audio_to_video_attn — video queries attend audio tokens
    video_to_audio_attn — audio queries attend video tokens
    ff / audio_ff — per-modality feed-forward

``isolate_modalities`` (reference ``ltx2_t2av.py:726-760``, Modality
Isolation Guidance) disables the two cross-modal attentions; STG skips whole
listed blocks (``spatio_temporal_guidance_blocks``).

Modulation follows the LTX family convention (per-block learned
``scale_shift_table`` + projected time embedding, 6 entries gating
self-attn and FFN; cross attentions are plain residuals on the un-normed
stream) with an independent audio table — audio may run at a different
timestep than video (upstream ``use_cross_timestep``), so the module takes
an optional separate ``audio_timestep``.

Best-effort layout notes (pinned by synthesized-checkpoint import tests;
real-weight validation tracked in PARITY.md): cross-modal attentions carry
no RoPE (text-cross-style), per-attention q/k RMS norms, affine-free RMS
stream norms. The text "connectors" are folded into this module as two
Dense projections (upstream ships them as a separate pipeline component
whose internal layout is not documented in the reference).
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
    HeadProj,
    MergeProj,
    TimestepEmbedder,
    apply_rope,
    rms_modulate,
    rope_frequencies,
)


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

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

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


class _CrossAttention(nn.Module):
    """q from ``x``, k/v from ``y``; per-head RMS q/k norm; optional RoPE."""

    cfg: LTX2Config

    @nn.compact
    def __call__(self, x, y, q_rope=None, k_rope=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.hidden_dim, cfg.num_heads
        hp = lambda name: HeadProj(heads=H, head_dim=D // H, dtype=dt, name=name)
        q = hp("q")(x)
        k = hp("k")(y.astype(dt))
        v = hp("v")(y.astype(dt))
        # across-heads qk-norm (γ (D,)) — the LTX-Video upstream convention
        q, k = AcrossHeadsQKNorm(D, name="qk_norm")(q, k)
        if q_rope is not None:
            q = apply_rope(q, *q_rope)
        if k_rope is not None:
            k = apply_rope(k, *k_rope)
        attn = dot_product_attention(q, k, v, backend=cfg.attn_backend)
        return MergeProj(out_dim=D, dtype=dt, name="out")(attn)


class LTX2Block(nn.Module):
    """Dual-stream AV block (upstream ``LTX2VideoTransformerBlock``)."""

    cfg: LTX2Config

    @nn.compact
    def __call__(
        self,
        v,            # (B, Lv, D) video stream
        a,            # (B, La, D) audio stream
        v_ctx,        # (B, Lc, D) video text stream (connector output)
        a_ctx,        # (B, Lc, D) audio text stream
        v_temb6,      # (B, 6, D) video time modulation
        a_temb6,      # (B, 6, D) audio time modulation
        v_rope,       # (cos, sin) for video tokens
        a_rope,       # (cos, sin) for audio tokens
        isolate_modalities: bool = False,
        v_temb6_zero=None,  # (B, 6, D) t=0 video modulation (I2AV)
        v_cond_mask=None,   # (B, Lv, 1) 1 = hard-conditioned token
    ):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D = cfg.hidden_dim

        def mods(table_name, temb6, temb6_zero=None, cond_mask=None):
            table = self.param(table_name, nn.initializers.normal(0.02), (1, 6, D), jnp.float32)
            if temb6.ndim == 4:  # per-token (B, L, 6, D) — exact I2AV timesteps
                m = table[:, None] + temb6.astype(jnp.float32)
                return [m[:, :, i] for i in range(6)]  # each (B, L, D)
            m = table + temb6.astype(jnp.float32)
            if temb6_zero is None or cond_mask is None:
                return [m[:, i, None] for i in range(6)]  # each (B, 1, D)
            # I2AV per-token timestep: conditioned tokens modulate at t=0
            # (reference per-token ``ts·(1−cm)``; exact for a binary mask)
            m0 = table + temb6_zero.astype(jnp.float32)
            cm = cond_mask.astype(jnp.float32)  # (B, Lv, 1)
            return [cm * m0[:, i, None] + (1.0 - cm) * m[:, i, None] for i in range(6)]

        v_shift_sa, v_scale_sa, v_gate_sa, v_shift_ff, v_scale_ff, v_gate_ff = mods(
            "scale_shift_table", v_temb6, v_temb6_zero, v_cond_mask)
        a_shift_sa, a_scale_sa, a_gate_sa, a_shift_ff, a_scale_ff, a_gate_ff = mods(
            "audio_scale_shift_table", a_temb6)

        def self_attn(x, rope, prefix):
            E = D // cfg.num_heads
            hp = lambda name: HeadProj(heads=cfg.num_heads, head_dim=E, dtype=dt, name=name)
            q = hp(f"{prefix}_q")(x)
            k = hp(f"{prefix}_k")(x)
            val = hp(f"{prefix}_v")(x)
            q, k = AcrossHeadsQKNorm(D, name=f"{prefix}_qk_norm")(q, k)
            q = apply_rope(q, *rope)
            k = apply_rope(k, *rope)
            attn = dot_product_attention(q, k, val, backend=cfg.attn_backend)
            return MergeProj(out_dim=D, dtype=dt, name=f"{prefix}_out")(attn)

        # 1. modulated self-attention per modality
        # one-pass fused RMSNorm+modulate (ops/norms.py); the replaced
        # no-affine RMSNorms carried no params
        h = rms_modulate(v, v_shift_sa, v_scale_sa, out_dtype=dt)
        v = v + v_gate_sa.astype(v.dtype) * self_attn(h, v_rope, "sa")
        h = rms_modulate(a, a_shift_sa, a_scale_sa, out_dtype=dt)
        a = a + a_gate_sa.astype(a.dtype) * self_attn(h, a_rope, "a_sa")

        # 2. cross-attention to the per-modality text streams (plain residual
        #    on the un-normed stream — the LTX family convention)
        v = v + _CrossAttention(cfg, name="ca")(v, v_ctx)
        a = a + _CrossAttention(cfg, name="a_ca")(a, a_ctx)

        # 3. cross-modal exchange from a common snapshot (skipped under
        #    modality-isolation guidance, reference ltx2_t2av.py:726-760)
        if not isolate_modalities:
            v_snap, a_snap = v, a
            v = v + _CrossAttention(cfg, name="a2v")(v_snap, a_snap)
            a = a + _CrossAttention(cfg, name="v2a")(a_snap, v_snap)

        # 4. modulated feed-forward per modality
        h = rms_modulate(v, v_shift_ff, v_scale_ff, out_dtype=dt)
        h = nn.Dense(D, dtype=dt, name="ffn2")(
            nn.gelu(nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn1")(h), approximate=True))
        v = v + v_gate_ff.astype(v.dtype) * h
        h = rms_modulate(a, a_shift_ff, a_scale_ff, out_dtype=dt)
        h = nn.Dense(D, dtype=dt, name="a_ffn2")(
            nn.gelu(nn.Dense(cfg.ffn_dim, dtype=dt, name="a_ffn1")(h), approximate=True))
        a = a + a_gate_ff.astype(a.dtype) * h
        return v, a


class LTX2Transformer(nn.Module):
    """Dual-stream joint AV DiT.

    Inputs:
      video_latents: (B, Lv, video_channels) packed video tokens
      audio_latents: (B, La, audio_channels) packed audio tokens
      timestep:      (B,) scheduler scale — video stream
      encoder_hidden_states: (B, Lc, context_dim) raw LM hidden states;
                     projected by the two built-in connector Denses
      video_ids:     (Lv, 3) (t, h, w) coordinates
      audio_ids:     (La, 3) (t, 0, 0) coordinates
      skip_blocks:   STG perturbed (skipped) block indices
      audio_timestep: optional (B,) — audio stream time (``use_cross_timestep``)
      isolate_modalities: disable the cross-modal attentions
    """

    cfg: LTX2Config

    @nn.compact
    def __call__(
        self,
        video_latents: jax.Array,
        audio_latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        video_ids: jax.Array,
        audio_ids: jax.Array,
        skip_blocks: Tuple[int, ...] = (),
        audio_timestep: Optional[jax.Array] = None,
        isolate_modalities: bool = False,
        video_cond_mask: Optional[jax.Array] = None,  # (B, Lv, 1): 1 = conditioned
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        dt = cfg.compute_dtype
        B = video_latents.shape[0]

        v = nn.Dense(cfg.hidden_dim, dtype=dt, name="video_embedder")(video_latents.astype(dt))
        a = nn.Dense(cfg.hidden_dim, dtype=dt, name="audio_embedder")(audio_latents.astype(dt))

        if audio_timestep is None:
            audio_timestep = timestep if timestep.ndim == 1 else timestep[:, 0]
        time_embed = TimestepEmbedder(cfg.hidden_dim, freq_dim=cfg.freq_dim,
                                      dtype=jnp.float32, name="time_embed")
        time_proj = nn.Dense(6 * cfg.hidden_dim, dtype=jnp.float32, name="time_proj")
        if timestep.ndim == 2:
            # per-token video timestep (B, Lv) — the reference transformer's
            # native I2AV form (``video_ts = ts·(1 − conditioning_mask)``,
            # ltx2_i2av.py:858-866): embed every token's own t. Exact for
            # fractional conditioning masks; costs a (B, Lv, 6, D) tensor.
            Lv = timestep.shape[1]
            v_temb = time_embed(timestep.reshape(-1)).reshape(B, Lv, cfg.hidden_dim)
            v_temb6 = time_proj(nn.silu(v_temb)).reshape(B, Lv, 6, cfg.hidden_dim)
            v_temb0 = v_temb6_zero = None  # exactness is inherent per token
            video_cond_mask = None
        else:
            v_temb = time_embed(timestep)
            v_temb6 = time_proj(nn.silu(v_temb)).reshape(B, 6, cfg.hidden_dim)
            # I2AV per-token timestep, binary-mask fast path: conditioned video
            # tokens see t=0; blocks interpolate the two modulation sets by the
            # mask (exact when the mask is 0/1 — the adapter's own masks are)
            if video_cond_mask is not None:
                v_temb0 = time_embed(jnp.zeros_like(timestep))
                v_temb6_zero = time_proj(nn.silu(v_temb0)).reshape(B, 6, cfg.hidden_dim)
            else:
                v_temb0 = v_temb6_zero = None
        a_temb = TimestepEmbedder(cfg.hidden_dim, freq_dim=cfg.freq_dim,
                                  dtype=jnp.float32, name="audio_time_embed")(audio_timestep)
        a_temb6 = nn.Dense(6 * cfg.hidden_dim, dtype=jnp.float32, name="audio_time_proj")(
            nn.silu(a_temb)).reshape(B, 6, cfg.hidden_dim)

        # dual connectors: per-modality text streams (reference
        # ltx2_t2av.py:370-482 caches ``pipeline.connectors`` outputs; here
        # the projections live in the transformer tree)
        ctx = encoder_hidden_states.astype(dt)
        v_ctx = nn.Dense(cfg.hidden_dim, dtype=dt, name="video_connector")(ctx)
        a_ctx = nn.Dense(cfg.hidden_dim, dtype=dt, name="audio_connector")(ctx)

        v_rope = rope_frequencies(video_ids, cfg.axes_dim, cfg.rope_theta)
        a_rope = rope_frequencies(audio_ids, cfg.axes_dim, cfg.rope_theta)

        BlockCls = nn.remat(LTX2Block, static_argnums=(9,)) if cfg.remat else LTX2Block
        skip = set(skip_blocks)
        for i in range(cfg.num_layers):
            if i in skip:  # STG: identity through perturbed blocks
                continue
            v, a = BlockCls(cfg, name=f"block_{i}")(
                v, a, v_ctx, a_ctx, v_temb6, a_temb6, v_rope, a_rope,
                isolate_modalities, v_temb6_zero, video_cond_mask,
            )

        def head(x, temb, table_name, norm_name, head_name, out_ch,
                 temb_zero=None, cond_mask=None):
            table = self.param(table_name, nn.initializers.normal(0.02),
                               (1, 2, cfg.hidden_dim), jnp.float32)
            if temb.ndim == 3:  # per-token (B, L, D) — exact I2AV timesteps
                mod = table[:, None] + temb[:, :, None, :].astype(jnp.float32)
                x = rms_modulate(x, mod[:, :, 0], mod[:, :, 1], out_dtype=jnp.float32)
                return nn.Dense(out_ch, dtype=jnp.float32, name=head_name)(x)
            mod = table + temb[:, None, :].astype(jnp.float32)
            if temb_zero is not None and cond_mask is not None:
                mod0 = table + temb_zero[:, None, :].astype(jnp.float32)
                cm = cond_mask.astype(jnp.float32)
                shift = cm * mod0[:, 0, None] + (1.0 - cm) * mod[:, 0, None]
                scale = cm * mod0[:, 1, None] + (1.0 - cm) * mod[:, 1, None]
            else:
                shift, scale = mod[:, 0, None], mod[:, 1, None]
            x = rms_modulate(x, shift, scale, out_dtype=jnp.float32)
            return nn.Dense(out_ch, dtype=jnp.float32, name=head_name)(x)

        v_out = head(v, v_temb, "head_table", "head_norm", "video_head",
                     cfg.video_channels, v_temb0, video_cond_mask)
        a_out = head(a, a_temb, "audio_head_table", "audio_head_norm", "audio_head",
                     cfg.audio_channels)
        return v_out, a_out
