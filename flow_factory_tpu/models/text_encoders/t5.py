"""T5 encoder stack in flax.linen (frozen prompt encoder).

TPU-native stand-in for the ``T5EncoderModel`` (T5-XXL) the reference's SD3.5
and FLUX adapters use as ``text_encoder_3`` / ``text_encoder_2``
(``src/flow_factory/models/stable_diffusion/sd3_5.py`` encode path). Frozen,
bf16, preprocessing-only.

Implements the v1.1 encoder: relative-position-bucket attention bias on the
first layer (shared), T5 LayerNorm (no mean subtraction, no bias), gated-GELU
feed-forward.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    hidden_dim: int = 4096
    ff_dim: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    head_dim: int = 64
    rel_pos_buckets: int = 32
    rel_pos_max_distance: int = 128
    #: UMT5 (Wan's text encoder): every layer owns its relative-attention
    #: bias table instead of sharing block 0's (HF ``UMT5EncoderModel``).
    per_layer_rel_bias: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def xxl(**o) -> "T5Config":
        return T5Config(**o)

    @staticmethod
    def umt5_xxl(**o) -> "T5Config":
        """Wan2.x text encoder (UMT5-XXL: per-layer rel bias, vocab 256384)."""
        base = dict(vocab_size=256384, per_layer_rel_bias=True)
        base.update(o)
        return T5Config(**base)

    @staticmethod
    def tiny(**o) -> "T5Config":
        base = dict(vocab_size=1000, hidden_dim=32, ff_dim=64, num_layers=2, num_heads=4, head_dim=8)
        base.update(o)
        return T5Config(**base)


class T5LayerNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + 1e-6) * scale).astype(x.dtype)


def relative_position_bucket(
    rel_pos: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = jnp.where(rel_pos > 0, num_buckets, 0)
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array]) -> tuple:
        cfg = self.cfg
        dt = cfg.compute_dtype
        inner = cfg.num_heads * cfg.head_dim
        B, L, _ = x.shape
        split = lambda t: t.reshape(B, L, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        q = split(nn.Dense(inner, use_bias=False, dtype=dt, name="q")(x))
        k = split(nn.Dense(inner, use_bias=False, dtype=dt, name="k")(x))
        v = split(nn.Dense(inner, use_bias=False, dtype=dt, name="v")(x))
        if self.has_rel_bias:
            rel_bias_table = self.param(
                "rel_bias",
                nn.initializers.normal(0.02),
                (cfg.rel_pos_buckets, cfg.num_heads),
                jnp.float32,
            )
            pos = jnp.arange(L)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None], cfg.rel_pos_buckets, cfg.rel_pos_max_distance
            )
            bias = rel_bias_table[buckets].transpose(2, 0, 1)[None]  # (1, H, L, L)
        # T5: no scaling of q
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, L, inner)
        return nn.Dense(cfg.hidden_dim, use_bias=False, dtype=dt, name="o")(o), bias


class T5Block(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array]) -> tuple:
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = T5LayerNorm(cfg.hidden_dim, name="ln1")(x)
        attn_out, bias = T5Attention(cfg, has_rel_bias=self.has_rel_bias, name="attn")(h, bias)
        x = x + attn_out
        h = T5LayerNorm(cfg.hidden_dim, name="ln2")(x)
        wi0 = nn.Dense(cfg.ff_dim, use_bias=False, dtype=dt, name="wi_0")(h)
        wi1 = nn.Dense(cfg.ff_dim, use_bias=False, dtype=dt, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(cfg.hidden_dim, use_bias=False, dtype=dt, name="wo")(h)
        return x, bias


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.hidden_dim, dtype=cfg.compute_dtype, name="token_embedding")(
            input_ids
        )
        bias = None
        for i in range(cfg.num_layers):
            x, bias = T5Block(
                cfg,
                has_rel_bias=(i == 0 or cfg.per_layer_rel_bias),
                name=f"block_{i}",
            )(x, bias)
        return T5LayerNorm(cfg.hidden_dim, name="final_ln")(x)
