"""Independent torch reference of the diffusers ``SD3Transformer2DModel``.

Written from the upstream diffusers architecture conventions (NOT from the
flax code in this repo) so that ``tests/test_torch_reference.py`` can diff
our flax MMDiT + FlowMatch-Euler rollout against a second, framework-
independent implementation through the real key maps — the closest
available substitute for the reference's L3 torch-pipeline parity method
(``/root/reference/.agents/knowledge/topics/parity_testing.md``; diffusers
itself is not installed in this environment).

Parameter names match diffusers exactly (``transformer_blocks.N.attn.to_q``,
``pos_embed.proj``, ``time_text_embed.timestep_embedder.linear_1``, ...), so
``state_dict()`` feeds ``utils/checkpoint.py:sd3_transformer_key_map``
unchanged — the same import path real SD3.5 checkpoints take.

Upstream conventions encoded here (the load-bearing ones):
* AdaLayerNormZero: shift-first 6-chunk (shift_msa, scale_msa, gate_msa,
  shift_mlp, scale_mlp, gate_mlp); LayerNorm is affine-free, eps 1e-6.
* SD35AdaLayerNormZeroX (dual-attention blocks): 9 chunks appending
  (shift_msa2, scale_msa2, gate_msa2); BOTH modulated outputs come from the
  same pre-attention LayerNorm (attn/attn2 are parallel branches).
* AdaLayerNormContinuous (norm_out + final-block norm1_context):
  **scale-first** 2-chunk — the opposite order of AdaLayerNormZero; the
  original→diffusers weight converters swap_scale_shift into this order.
* Joint attention: per-head RMS qk-norm (eps 1e-6) after head split; sample
  tokens and context tokens concatenated along the sequence (order is
  irrelevant without RoPE — full attention is permutation-equivariant).
* FeedForward: Linear → GELU(tanh) → Linear.
* Timesteps: 256-dim sinusoidal, flip_sin_to_cos=True, downscale_freq_shift=0.
* pos_embed: persistent buffer (1, max*max, dim), center-cropped to the
  latent grid.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int = 256) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = torch.exp(exponent)[None, :] * t.float()[:, None]
    # flip_sin_to_cos=True → [cos, sin]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TimestepEmbedder(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(256, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(timestep_embedding(t))))


class TextProjection(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, dim: int, pooled_dim: int):
        super().__init__()
        self.timestep_embedder = TimestepEmbedder(dim)
        self.text_embedder = TextProjection(pooled_dim, dim)

    def forward(self, timestep, pooled):
        return self.timestep_embedder(timestep) + self.text_embedder(pooled)


class PatchEmbed(nn.Module):
    def __init__(self, in_channels: int, dim: int, patch_size: int, pos_embed_max_size: int):
        super().__init__()
        self.patch_size = patch_size
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = nn.Conv2d(in_channels, dim, kernel_size=patch_size, stride=patch_size)
        self.register_buffer(
            "pos_embed", torch.randn(1, pos_embed_max_size * pos_embed_max_size, dim) * 0.02
        )

    def forward(self, latent):  # (B, C, H, W)
        h = latent.shape[-2] // self.patch_size
        w = latent.shape[-1] // self.patch_size
        x = self.proj(latent).flatten(2).transpose(1, 2)  # (B, h*w, D)
        top = (self.pos_embed_max_size - h) // 2
        left = (self.pos_embed_max_size - w) // 2
        pos = self.pos_embed.reshape(1, self.pos_embed_max_size, self.pos_embed_max_size, -1)
        pos = pos[:, top : top + h, left : left + w, :].reshape(1, h * w, -1)
        return x + pos


class AdaLayerNormZero(nn.Module):
    """shift-first chunking; returns modulated x + the remaining chunks."""

    def __init__(self, dim: int, n_chunks: int = 6):
        super().__init__()
        self.n_chunks = n_chunks
        self.linear = nn.Linear(dim, n_chunks * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        chunks = self.linear(F.silu(emb)).chunk(self.n_chunks, dim=-1)
        normed = self.norm(x)
        out = normed * (1 + chunks[1][:, None]) + chunks[0][:, None]
        if self.n_chunks == 9:
            out2 = normed * (1 + chunks[7][:, None]) + chunks[6][:, None]
            # (x_mod, x_mod2, gate_msa, shift_mlp, scale_mlp, gate_mlp, gate_msa2)
            return out, out2, chunks[2], chunks[3], chunks[4], chunks[5], chunks[8]
        return (out, *chunks[2:])


class AdaLayerNormContinuous(nn.Module):
    """SCALE-first chunking (diffusers convention; differs from Zero)."""

    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        scale, shift = self.linear(F.silu(emb)).chunk(2, dim=-1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class RMSNorm(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        x32 = x.float()
        var = x32.pow(2).mean(-1, keepdim=True)
        return (x32 * torch.rsqrt(var + self.eps)) * self.weight


class JointAttention(nn.Module):
    def __init__(self, dim: int, heads: int, context_pre_only: bool):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.context_pre_only = context_pre_only
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
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)

    def _heads(self, x):
        B, S, _ = x.shape
        return x.view(B, S, self.heads, self.head_dim).transpose(1, 2)  # (B,H,S,E)

    def forward(self, x, ctx):
        q = self.norm_q(self._heads(self.to_q(x)))
        k = self.norm_k(self._heads(self.to_k(x)))
        v = self._heads(self.to_v(x))
        cq = self.norm_added_q(self._heads(self.add_q_proj(ctx)))
        ck = self.norm_added_k(self._heads(self.add_k_proj(ctx)))
        cv = self._heads(self.add_v_proj(ctx))
        # sample tokens first (diffusers JointAttnProcessor order)
        q = torch.cat([q, cq], dim=2)
        k = torch.cat([k, ck], dim=2)
        v = torch.cat([v, cv], dim=2)
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        B, H, S, E = out.shape
        out = out.transpose(1, 2).reshape(B, S, H * E)
        x_part, c_part = out[:, : x.shape[1]], out[:, x.shape[1] :]
        x_out = self.to_out[0](x_part)
        c_out = None if self.context_pre_only else self.to_add_out(c_part)
        return x_out, c_out


class SelfAttention(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(self.head_dim)
        self.norm_k = RMSNorm(self.head_dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def _heads(self, x):
        B, S, _ = x.shape
        return x.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, x):
        q = self.norm_q(self._heads(self.to_q(x)))
        k = self.norm_k(self._heads(self.to_k(x)))
        v = self._heads(self.to_v(x))
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        B, H, S, E = out.shape
        out = out.transpose(1, 2).reshape(B, S, H * E)
        return self.to_out[0](out)


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.net = nn.ModuleList(
            [nn.ModuleDict({"proj": nn.Linear(dim, dim * mult)}), nn.Identity(),
             nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0]["proj"](x), approximate="tanh"))


class JointTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, context_pre_only: bool, dual: bool):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.dual = dual
        self.norm1 = AdaLayerNormZero(dim, n_chunks=9 if dual else 6)
        if context_pre_only:
            self.norm1_context = AdaLayerNormContinuous(dim)
        else:
            self.norm1_context = AdaLayerNormZero(dim)
        self.attn = JointAttention(dim, heads, context_pre_only)
        if dual:
            self.attn2 = SelfAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.ff_context = FeedForward(dim)

    def forward(self, x, ctx, temb):
        if self.dual:
            x_mod, x_mod2, gate_msa, shift_mlp, scale_mlp, gate_mlp, gate_msa2 = \
                self.norm1(x, temb)
        else:
            x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(x, temb)
        if self.context_pre_only:
            c_mod = self.norm1_context(ctx, temb)
        else:
            c_mod, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = \
                self.norm1_context(ctx, temb)
        attn_out, ctx_attn_out = self.attn(x_mod, c_mod)
        x = x + gate_msa[:, None] * attn_out
        if self.dual:
            x = x + gate_msa2[:, None] * self.attn2(x_mod2)
        h = self.norm2(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * self.ff(h)
        if self.context_pre_only:
            return x, None
        ctx = ctx + c_gate_msa[:, None] * ctx_attn_out
        hc = self.norm2_context(ctx) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        ctx = ctx + c_gate_mlp[:, None] * self.ff_context(hc)
        return x, ctx


class TorchSD3Transformer(nn.Module):
    """Tiny diffusers-convention SD3 MMDiT(-X) with diffusers param names."""

    def __init__(self, in_channels=16, out_channels=16, patch_size=2, dim=64,
                 depth=2, heads=4, context_dim=32, pooled_dim=48,
                 pos_embed_max_size=32, dual_attention_layers=(0,)):
        super().__init__()
        self.patch_size = patch_size
        self.out_channels = out_channels
        self.pos_embed = PatchEmbed(in_channels, dim, patch_size, pos_embed_max_size)
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(dim, pooled_dim)
        self.context_embedder = nn.Linear(context_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [
                JointTransformerBlock(
                    dim, heads,
                    context_pre_only=(i == depth - 1),
                    dual=(i in dual_attention_layers),
                )
                for i in range(depth)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(dim)
        self.proj_out = nn.Linear(dim, patch_size * patch_size * out_channels)

    @torch.no_grad()
    def forward(self, latents, timestep, encoder_hidden_states, pooled):
        # latents: (B, C, H, W); timestep: (B,) scheduler scale [0, 1000]
        B, C, H, W = latents.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = self.pos_embed(latents)
        temb = self.time_text_embed(timestep, pooled)
        ctx = self.context_embedder(encoder_hidden_states)
        for block in self.transformer_blocks:
            x, ctx = block(x, ctx, temb)
        x = self.norm_out(x, temb)
        x = self.proj_out(x)
        # unpatchify: (B, h*w, p*p*C) → (B, C, H, W)
        x = x.reshape(B, h, w, p, p, self.out_channels)
        x = torch.einsum("bhwpqc->bchpwq", x)
        return x.reshape(B, self.out_channels, H, W)
