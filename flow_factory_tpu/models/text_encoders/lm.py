"""Decoder-only LM text encoder (Qwen2.5-VL / Mistral / Gemma role).

The reference's newer adapters condition on hidden states of large causal
LMs — Qwen2.5-VL for Qwen-Image (``src/flow_factory/models/qwen_image/``),
Mistral for FLUX.2, Gemma3 for LTX-2, Qwen3 for Z-Image. This module provides
the TPU-native encoder for that role: a standard pre-norm decoder stack
(RMSNorm, RoPE attention with GQA, SwiGLU MLP) returning final hidden
states. Frozen, bf16, preprocessing-only.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import rope_frequencies


def _apply_rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """NeoX/Llama-style rotation: pairs are (i, i + d/2), NOT interleaved.

    HF Llama/Mistral/Qwen2 ``rotate_half`` pairs dimension i with i + d/2
    (``modeling_llama.apply_rotary_pos_emb``); the diffusers DiTs pair
    (2i, 2i+1) instead (``models/layers.apply_rope``). Real upstream LM
    weights only reproduce under this convention — verified by
    ``tests/test_upstream_parity.py`` against torch ``Qwen2ForCausalLM``.

    x: (B, H, L, D); cos/sin: (L, D/2).
    """
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    c = jnp.concatenate([cos, cos], axis=-1)
    s = jnp.concatenate([sin, sin], axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


@dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 151936
    hidden_dim: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    mlp_dim: int = 18944
    rope_theta: float = 1000000.0
    #: Qwen2.x puts biases on the q/k/v projections (Llama/Mistral/Gemma don't)
    attn_bias: bool = False
    #: HF rms_norm_eps (Qwen2 ships 1e-6; released Mistral weights use 1e-5)
    rms_eps: float = 1e-6
    #: Qwen2.5-VL multimodal RoPE: rotary dims per (t, h, w) section
    #: (halved dims; sums to head_dim//2). None → standard 1-D RoPE.
    #: For pure text with equal section positions, M-RoPE == 1-D RoPE, so
    #: text-only encoding is unchanged.
    mrope_sections: Optional[Tuple[int, int, int]] = None
    #: "llama" (Llama/Mistral/Qwen2 layout) or "gemma3". Gemma3 differs in
    #: SEVEN load-bearing ways (HF ``modeling_gemma3.py``): sqrt(hidden)
    #: embedding scale, (1+weight) zero-init RMSNorms computed fully in
    #: fp32, sandwich norms (post-attention AND post-feedforward norms
    #: before each residual add), per-head q/k RMSNorms, gelu-tanh GeGLU,
    #: ``query_pre_attn_scalar**-0.5`` attention scaling, and interleaved
    #: local/global attention (5 sliding-window layers with local RoPE
    #: theta per 1 global layer with linearly-scaled RoPE).
    arch: str = "llama"
    #: Gemma3: attention scale base (HF query_pre_attn_scalar); None → head_dim
    query_pre_attn_scalar: Optional[float] = None
    #: Gemma3 interleaved attention: window size (0 → all layers global)
    sliding_window: int = 0
    #: layer i is sliding unless (i+1) % pattern == 0 (HF layer_types default)
    sliding_window_pattern: int = 6
    #: RoPE theta for sliding layers (HF rope_local_base_freq)
    rope_local_theta: float = 10000.0
    #: linear RoPE scaling on GLOBAL layers (HF rope_scaling {"linear", factor})
    rope_scaling_factor: float = 1.0
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def qwen25_7b(**o) -> "LMConfig":
        base = dict(attn_bias=True)
        base.update(o)
        return LMConfig(**base)

    @staticmethod
    def qwen25_vl_7b(**o) -> "LMConfig":
        """Qwen2.5-VL-7B language side (M-RoPE sections 16/24/24)."""
        base = dict(attn_bias=True, mrope_sections=(16, 24, 24))
        base.update(o)
        return LMConfig(**base)

    @staticmethod
    def mistral_small(**o) -> "LMConfig":
        base = dict(vocab_size=131072, hidden_dim=5120, num_layers=40, num_heads=32,
                    num_kv_heads=8, head_dim=128, mlp_dim=32768)
        base.update(o)
        return LMConfig(**base)

    @staticmethod
    def gemma3(**o) -> "LMConfig":
        """Gemma3-12B text stack (LTX-2's conditioning LM): HF
        ``Gemma3TextConfig`` 12B values incl. interleaved 5-local/1-global
        attention and factor-8 linear RoPE scaling on global layers."""
        base = dict(vocab_size=262208, hidden_dim=3840, num_layers=48, num_heads=16,
                    num_kv_heads=8, head_dim=256, mlp_dim=15360, arch="gemma3",
                    query_pre_attn_scalar=256.0, sliding_window=1024,
                    sliding_window_pattern=6, rope_theta=1_000_000.0,
                    rope_local_theta=10_000.0, rope_scaling_factor=8.0)
        base.update(o)
        return LMConfig(**base)

    @staticmethod
    def gemma3_tiny(**o) -> "LMConfig":
        base = dict(vocab_size=1000, hidden_dim=32, num_layers=3, num_heads=4,
                    num_kv_heads=2, head_dim=8, mlp_dim=64, arch="gemma3",
                    query_pre_attn_scalar=8.0, sliding_window=4,
                    sliding_window_pattern=2, rope_theta=1_000_000.0,
                    rope_local_theta=10_000.0, rope_scaling_factor=8.0)
        base.update(o)
        return LMConfig(**base)

    @staticmethod
    def tiny(**o) -> "LMConfig":
        base = dict(vocab_size=1000, hidden_dim=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, head_dim=8, mlp_dim=64, rope_theta=10000.0)
        base.update(o)
        return LMConfig(**base)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    #: Gemma convention: zero-init weight applied as (1 + w), with the whole
    #: product computed in fp32 before the cast back (HF Gemma3RMSNorm)
    plus_one: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.plus_one else nn.initializers.ones
        scale = self.param("weight", init, (self.dim,), jnp.float32)
        if self.plus_one:
            scale = 1.0 + scale
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class LMBlock(nn.Module):
    cfg: LMConfig
    #: Gemma3 interleaved attention: this layer uses the sliding-window mask
    #: + local-RoPE tables instead of the global ones (static per layer)
    is_sliding: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D = cfg.hidden_dim
        Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        gemma = cfg.arch == "gemma3"

        h = RMSNorm(D, cfg.rms_eps, plus_one=gemma, name="ln1")(x)
        q = nn.Dense(Hq * hd, use_bias=cfg.attn_bias, dtype=dt, name="q")(h)
        k = nn.Dense(Hkv * hd, use_bias=cfg.attn_bias, dtype=dt, name="k")(h)
        v = nn.Dense(Hkv * hd, use_bias=cfg.attn_bias, dtype=dt, name="v")(h)
        B, L, _ = h.shape
        q = q.reshape(B, L, Hq, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, Hkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, Hkv, hd).transpose(0, 2, 1, 3)
        if gemma:
            # per-head q/k RMSNorms, applied BEFORE RoPE (HF Gemma3Attention)
            q = RMSNorm(hd, cfg.rms_eps, plus_one=True, name="q_norm")(q)
            k = RMSNorm(hd, cfg.rms_eps, plus_one=True, name="k_norm")(k)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        # GQA: repeat kv heads
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        scale = (cfg.query_pre_attn_scalar if cfg.query_pre_attn_scalar is not None
                 else hd) ** -0.5
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, L, Hq * hd)
        o = nn.Dense(D, use_bias=False, dtype=dt, name="o")(o)
        if gemma:  # sandwich norm: post-attention norm BEFORE the residual add
            o = RMSNorm(D, cfg.rms_eps, plus_one=True, name="post_attn_ln")(o)
        x = x + o

        h = RMSNorm(D, cfg.rms_eps, plus_one=gemma, name="ln2")(x)
        gate = nn.Dense(cfg.mlp_dim, use_bias=False, dtype=dt, name="gate")(h)
        up = nn.Dense(cfg.mlp_dim, use_bias=False, dtype=dt, name="up")(h)
        act = (lambda g: jax.nn.gelu(g, approximate=True)) if gemma else nn.silu
        m = nn.Dense(D, use_bias=False, dtype=dt, name="down")(act(gate) * up)
        if gemma:  # sandwich norm: post-feedforward norm BEFORE the residual
            m = RMSNorm(D, cfg.rms_eps, plus_one=True, name="post_ff_ln")(m)
        return x + m


class LMEncoder(nn.Module):
    """Causal LM; returns final hidden states (B, L, D).

    With ``return_logits=True`` additionally returns tied-embedding
    next-token logits (``Embed.attend``) — the generation surface for the
    caption upsampler (same module, no extra head params).
    """

    cfg: LMConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        return_logits: bool = False,
        vision_embeds: Optional[jax.Array] = None,  # (B, Lv, D)
        vision_mask: Optional[jax.Array] = None,    # (B, L) bool: image-pad slots
        position_ids: Optional[jax.Array] = None,   # (3, L) M-RoPE t/h/w ids
    ):
        cfg = self.cfg
        gemma = cfg.arch == "gemma3"
        B, L = input_ids.shape
        tok_emb = nn.Embed(
            cfg.vocab_size, cfg.hidden_dim, dtype=cfg.compute_dtype, name="token_embedding"
        )
        x = tok_emb(input_ids)
        if gemma:
            # HF Gemma3TextScaledWordEmbedding: × sqrt(hidden), cast to the
            # embedding dtype first (matters under bf16 weights)
            x = x * jnp.asarray(cfg.hidden_dim ** 0.5, cfg.compute_dtype)
        if vision_embeds is not None and vision_mask is not None:
            # scatter vision-tower outputs into the image-pad positions
            # (the VLM conditioning path, reference qwen_image_edit_plus.py:186-193)
            vm = vision_mask.astype(jnp.int32)
            idx = jnp.clip(jnp.cumsum(vm, axis=1) - 1, 0, vision_embeds.shape[1] - 1)
            gathered = jnp.take_along_axis(
                vision_embeds.astype(x.dtype), idx[..., None], axis=1
            )
            x = jnp.where(vision_mask[..., None], gathered, x)
        if position_ids is not None and cfg.mrope_sections is not None:
            # M-RoPE: frequency j takes its position from section comp(j)
            half = cfg.head_dim // 2
            freqs = 1.0 / (
                cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / cfg.head_dim)
            )
            sel = np.concatenate([
                np.full(s, i, np.int32) for i, s in enumerate(cfg.mrope_sections)
            ])
            pos_per_freq = position_ids.astype(jnp.float32)[jnp.asarray(sel)]  # (half, L)
            angles = pos_per_freq.T * freqs[None]  # (L, half)
            cos, sin = jnp.cos(angles), jnp.sin(angles)
        else:
            pos = jnp.arange(L)[:, None].astype(jnp.float32)
            # global layers: linear RoPE scaling divides positions by the
            # factor (HF rope_scaling {"rope_type": "linear", "factor": f})
            cos, sin = rope_frequencies(
                pos / cfg.rope_scaling_factor, (cfg.head_dim,), cfg.rope_theta)
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        if attention_mask is not None:
            causal = causal & attention_mask[:, None, None, :].astype(bool)
        if gemma and cfg.sliding_window > 0:
            # sliding layers: local-theta RoPE (unscaled positions) and a
            # banded causal mask q - kv < window (HF Gemma3 local path)
            pos = jnp.arange(L)[:, None].astype(jnp.float32)
            cos_l, sin_l = rope_frequencies(pos, (cfg.head_dim,), cfg.rope_local_theta)
            band = (jnp.arange(L)[:, None] - jnp.arange(L)[None, :]) < cfg.sliding_window
            sliding_mask = causal & band[None, None]
        else:
            cos_l, sin_l, sliding_mask = cos, sin, causal
        for i in range(cfg.num_layers):
            is_sliding = (gemma and cfg.sliding_window > 0
                          and bool((i + 1) % cfg.sliding_window_pattern))
            x = LMBlock(cfg, is_sliding=is_sliding, name=f"layer_{i}")(
                x,
                cos_l if is_sliding else cos,
                sin_l if is_sliding else sin,
                sliding_mask if is_sliding else causal,
            )
        x = RMSNorm(cfg.hidden_dim, cfg.rms_eps, plus_one=gemma, name="final_ln")(x)
        if return_logits:
            return x, tok_emb.attend(x.astype(tok_emb.dtype)).astype(jnp.float32)
        return x
