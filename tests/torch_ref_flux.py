"""Independent torch reference of the diffusers ``FluxTransformer2DModel``.

Companion to ``torch_ref_sd3.py`` (see that module's docstring for the
method). Written from the upstream diffusers conventions with diffusers
parameter naming, so ``state_dict()`` feeds
``utils/checkpoint.py:flux_transformer_key_map`` +
``fuse_flux_single_block_qkv_mlp`` — the same import path real FLUX.1
checkpoints take.

Conventions encoded (the load-bearing ones):
* Double blocks: img/txt streams with separate AdaLayerNormZero mods
  (shift-first 6-chunk), per-stream per-head RMS qk-norm (eps 1e-6), txt
  tokens LEAD the joint sequence, multi-axis RoPE applied AFTER the concat
  to q and k (interleaved-pair rotation, per-axis theta^(2i/dim) freqs).
* Single blocks: AdaLayerNormZeroSingle (shift, scale, gate 3-chunk);
  separate to_q/to_k/to_v + proj_mlp (fused into our linear1 at import);
  attention has NO out projection — proj_out consumes [attn, gelu_tanh(mlp)].
* Timestep/guidance: 256-dim sinusoidal of t (scheduler scale) and
  guidance·1000, flip_sin_to_cos, shift 0.
* norm_out: AdaLayerNormContinuous — SCALE-first chunk.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_ref_sd3 import (
    AdaLayerNormContinuous,
    RMSNorm,
    TextProjection,
    TimestepEmbedder,
    timestep_embedding,
)


def rope(ids: torch.Tensor, axes_dim, theta: float = 10000.0):
    """(L, A) integer coords → (L, D/2) cos/sin tables (concat per axis)."""
    cos_parts, sin_parts = [], []
    for a, dim in enumerate(axes_dim):
        half = dim // 2
        freqs = 1.0 / (theta ** (torch.arange(half, dtype=torch.float64) * 2.0 / dim))
        angles = ids[:, a].double()[:, None] * freqs[None, :]
        cos_parts.append(torch.cos(angles))
        sin_parts.append(torch.sin(angles))
    return (torch.cat(cos_parts, -1).float(), torch.cat(sin_parts, -1).float())


def apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor):
    """Rotate (B, H, L, D) by (L, D/2) tables — interleaved even/odd pairs
    (diffusers apply_rotary_emb with use_real_unbind_dim=-1)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = torch.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)
    return out.reshape(x.shape)


class AdaLayerNormZero(nn.Module):
    def __init__(self, dim: int, n_chunks: int = 6):
        super().__init__()
        self.n_chunks = n_chunks
        self.linear = nn.Linear(dim, n_chunks * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        chunks = self.linear(F.silu(emb)).chunk(self.n_chunks, dim=-1)
        out = self.norm(x) * (1 + chunks[1][:, None]) + chunks[0][:, None]
        return (out, *chunks[2:])


class FluxAttention(nn.Module):
    """Joint attention of a double block (diffusers naming)."""

    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads, self.head_dim = heads, dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(self.head_dim)
        self.norm_k = RMSNorm(self.head_dim)
        self.norm_added_q = RMSNorm(self.head_dim)
        self.norm_added_k = RMSNorm(self.head_dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        self.to_add_out = nn.Linear(dim, dim)

    def _heads(self, x):
        B, S, _ = x.shape
        return x.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, img, txt, cos, sin):
        q = self.norm_q(self._heads(self.to_q(img)))
        k = self.norm_k(self._heads(self.to_k(img)))
        v = self._heads(self.to_v(img))
        tq = self.norm_added_q(self._heads(self.add_q_proj(txt)))
        tk = self.norm_added_k(self._heads(self.add_k_proj(txt)))
        tv = self._heads(self.add_v_proj(txt))
        # txt tokens lead (diffusers FluxAttnProcessor order)
        q = torch.cat([tq, q], dim=2)
        k = torch.cat([tk, k], dim=2)
        v = torch.cat([tv, v], dim=2)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        B, H, S, E = out.shape
        out = out.transpose(1, 2).reshape(B, S, H * E)
        L = txt.shape[1]
        return self.to_out[0](out[:, L:]), self.to_add_out(out[:, :L])


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.net = nn.ModuleList(
            [nn.ModuleDict({"proj": nn.Linear(dim, dim * mult)}), nn.Identity(),
             nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0]["proj"](x), approximate="tanh"))


class FluxTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = FluxAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        self.ff_context = FeedForward(dim)

    def forward(self, img, txt, temb, cos, sin):
        i_mod, i_gate, i_shift2, i_scale2, i_gate2 = self.norm1(img, temb)
        t_mod, t_gate, t_shift2, t_scale2, t_gate2 = self.norm1_context(txt, temb)
        img_attn, txt_attn = self.attn(i_mod, t_mod, cos, sin)
        img = img + i_gate[:, None] * img_attn
        txt = txt + t_gate[:, None] * txt_attn
        h = self.norm2(img) * (1 + i_scale2[:, None]) + i_shift2[:, None]
        img = img + i_gate2[:, None] * self.ff(h)
        hc = self.norm2_context(txt) * (1 + t_scale2[:, None]) + t_shift2[:, None]
        txt = txt + t_gate2[:, None] * self.ff_context(hc)
        return img, txt


class FluxSingleAttention(nn.Module):
    """Single-block attention: separate q/k/v, NO out projection."""

    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads, self.head_dim = heads, dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(self.head_dim)
        self.norm_k = RMSNorm(self.head_dim)

    def _heads(self, x):
        B, S, _ = x.shape
        return x.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, x, cos, sin):
        q = apply_rope(self.norm_q(self._heads(self.to_q(x))), cos, sin)
        k = apply_rope(self.norm_k(self._heads(self.to_k(x))), cos, sin)
        v = self._heads(self.to_v(x))
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        B, H, S, E = out.shape
        return out.transpose(1, 2).reshape(B, S, H * E)


class FluxSingleTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, mult: int = 4):
        super().__init__()
        self.norm = AdaLayerNormZero(dim, n_chunks=3)
        self.proj_mlp = nn.Linear(dim, dim * mult)
        self.attn = FluxSingleAttention(dim, heads)
        self.proj_out = nn.Linear(dim + dim * mult, dim)

    def forward(self, x, temb, cos, sin):
        x_mod, gate = self.norm(x, temb)
        mlp = F.gelu(self.proj_mlp(x_mod), approximate="tanh")
        attn = self.attn(x_mod, cos, sin)
        return x + gate[:, None] * self.proj_out(torch.cat([attn, mlp], dim=-1))


class CombinedTimestepGuidanceTextProjEmbeddings(nn.Module):
    def __init__(self, dim: int, pooled_dim: int):
        super().__init__()
        self.timestep_embedder = TimestepEmbedder(dim)
        self.guidance_embedder = TimestepEmbedder(dim)
        self.text_embedder = TextProjection(pooled_dim, dim)

    def forward(self, timestep, guidance, pooled):
        return (self.timestep_embedder(timestep)
                + self.guidance_embedder(guidance * 1000.0)
                + self.text_embedder(pooled))


class TorchFluxTransformer(nn.Module):
    """Tiny diffusers-convention FLUX.1 with diffusers param names."""

    def __init__(self, in_channels=16, dim=64, heads=4, num_double=2,
                 num_single=2, context_dim=48, pooled_dim=16,
                 axes_dim=(4, 6, 6)):
        super().__init__()
        self.axes_dim = axes_dim
        self.x_embedder = nn.Linear(in_channels, dim)
        self.context_embedder = nn.Linear(context_dim, dim)
        self.time_text_embed = CombinedTimestepGuidanceTextProjEmbeddings(dim, pooled_dim)
        self.transformer_blocks = nn.ModuleList(
            [FluxTransformerBlock(dim, heads) for _ in range(num_double)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [FluxSingleTransformerBlock(dim, heads) for _ in range(num_single)]
        )
        self.norm_out = AdaLayerNormContinuous(dim)
        self.proj_out = nn.Linear(dim, in_channels)

    @torch.no_grad()
    def forward(self, latents, timestep, encoder_hidden_states, pooled,
                img_ids, txt_ids, guidance):
        img = self.x_embedder(latents)
        txt = self.context_embedder(encoder_hidden_states)
        temb = self.time_text_embed(timestep, guidance, pooled)
        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = rope(ids, self.axes_dim)
        for block in self.transformer_blocks:
            img, txt = block(img, txt, temb, cos, sin)
        x = torch.cat([txt, img], dim=1)
        for block in self.single_transformer_blocks:
            x = block(x, temb, cos, sin)
        img = x[:, txt.shape[1]:]
        img = self.norm_out(img, temb)
        return self.proj_out(img)
