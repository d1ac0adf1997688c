"""CLIP text encoder in flax.linen (frozen prompt encoder).

TPU-native stand-in for the ``CLIPTextModelWithProjection`` encoders the
reference discovers on its wrapped pipelines
(``src/flow_factory/models/abc.py:229-325`` name-based text-encoder
discovery). Frozen, bf16, used only during stage-1 preprocessing
(``encode_prompt``) so it is jitted once and never sharded beyond data
parallelism.

Covers CLIP-L (SD3/FLUX ``text_encoder``) and OpenCLIP-bigG (SD3
``text_encoder_2``) via config. Returns both the final/penultimate hidden
states and the projected EOS pooled embedding, matching the HF contract the
adapters rely on.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407
    #: transformers CLIP default (flax LayerNorm defaults to 1e-6)
    layer_norm_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def clip_l(**o) -> "CLIPTextConfig":
        return CLIPTextConfig(**o)

    @staticmethod
    def clip_g(**o) -> "CLIPTextConfig":
        base = dict(
            hidden_dim=1280,
            num_layers=32,
            num_heads=20,
            projection_dim=1280,
            hidden_act="gelu",
        )
        base.update(o)
        return CLIPTextConfig(**base)

    @staticmethod
    def tiny(**o) -> "CLIPTextConfig":
        base = dict(
            vocab_size=1000, hidden_dim=32, num_layers=2, num_heads=4, projection_dim=32,
            eos_token_id=2,
        )
        base.update(o)
        return CLIPTextConfig(**base)


class CLIPTextOutput(NamedTuple):
    last_hidden_state: jax.Array  # (B, L, D) post-final-LN
    penultimate_hidden_state: jax.Array  # (B, L, D) pre-final-LN block output
    pooled: jax.Array  # (B, projection_dim) projected EOS embedding


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.hidden_dim, cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln1")(x.astype(jnp.float32)).astype(dt)
        q = nn.Dense(D, dtype=dt, name="q_proj")(h)
        k = nn.Dense(D, dtype=dt, name="k_proj")(h)
        v = nn.Dense(D, dtype=dt, name="v_proj")(h)
        B, L, _ = h.shape
        split = lambda t: t.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * ((D // H) ** -0.5)
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, dtype=dt, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln2")(x.astype(jnp.float32)).astype(dt)
        h = nn.Dense(4 * D, dtype=dt, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(D, dtype=dt, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> CLIPTextOutput:
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_dim, dtype=dt, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_dim),
            jnp.float32,
        )
        x = tok + pos[None, :L].astype(dt)
        causal = jnp.tril(jnp.ones((L, L), dtype=bool))[None, None]
        penultimate = x
        for i in range(cfg.num_layers):
            penultimate = x
            x = CLIPBlock(cfg, name=f"layer_{i}")(x, causal)
        final = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="final_ln")(x.astype(jnp.float32))
        # EOS pooling: first position equal to eos_token_id (HF convention).
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_idx = jnp.argmax(is_eos, axis=-1)
        pooled_raw = final[jnp.arange(B), eos_idx]
        pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.float32, name="text_projection")(
            pooled_raw
        )
        return CLIPTextOutput(
            last_hidden_state=final.astype(dt),
            penultimate_hidden_state=penultimate,
            pooled=pooled,
        )


# ---------------------------------------------------------------------------
# CLIP vision tower (Wan2.1 I2V image conditioning; reference loads the
# XLM-Roberta-CLIP ViT-H image encoder, ``src/flow_factory/models/wan``)
# ---------------------------------------------------------------------------

# OpenAI-CLIP pixel normalization constants
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_dim: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    hidden_act: str = "gelu"
    #: apply the transformer post-layernorm (CLIP contrastive pooling wants
    #: it; Wan's conditioning consumes penultimate-style states without it)
    use_post_ln: bool = False
    layer_norm_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def vit_h14(**o) -> "CLIPVisionConfig":
        return CLIPVisionConfig(**o)

    @staticmethod
    def tiny(**o) -> "CLIPVisionConfig":
        base = dict(image_size=16, patch_size=8, hidden_dim=32, num_layers=2, num_heads=4)
        base.update(o)
        return CLIPVisionConfig(**base)


class CLIPVisionEncoder(nn.Module):
    """ViT image tower returning all token states (CLS + patches).

    Output is the block-stack output WITHOUT a final layernorm — the
    penultimate-style states Wan's image cross-attention consumes. Input is
    (B, 3, H, W) in [0, 1]; CLIP normalization happens here.
    """

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, P = cfg.hidden_dim, cfg.patch_size
        mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32).reshape(1, 3, 1, 1)
        std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32).reshape(1, 3, 1, 1)
        x = ((pixels.astype(jnp.float32) - mean) / std).transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(D, (P, P), strides=(P, P), use_bias=False, dtype=dt,
                    name="patch_embedding")(x.astype(dt))
        B = x.shape[0]
        x = x.reshape(B, -1, D)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (D,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(dt), (B, 1, D)), x], axis=1)
        L = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (1, L, D), jnp.float32)
        x = x + pos.astype(dt)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="pre_ln")(x.astype(jnp.float32)).astype(dt)
        keep_all = jnp.ones((1, 1, L, L), bool)
        for i in range(cfg.num_layers):
            x = CLIPBlock(cfg, name=f"layer_{i}")(x, keep_all)
        if cfg.use_post_ln:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="post_ln")(x.astype(jnp.float32))
        return x.astype(jnp.float32)  # (B, L, D) token states
