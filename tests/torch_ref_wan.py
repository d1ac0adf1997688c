"""Independent torch reference of the diffusers ``WanTransformer3DModel``.

Companion to ``torch_ref_sd3.py`` / ``torch_ref_flux.py`` (see those
docstrings for the method): written from the upstream Wan 2.x conventions
with diffusers parameter naming, so ``state_dict()`` feeds
``utils/checkpoint.py:wan_transformer_key_map`` unchanged.

Conventions encoded (the load-bearing ones):
* qk-norm is RMS **across heads** — γ shape (hidden_dim,), normalized over
  the full projection before the head split (original ``WanRMSNorm(dim)``,
  diffusers ``qk_norm="rms_norm_across_heads"``); round-5 fix pinned here.
* per-block modulation = learned (1, 6, D) ``scale_shift_table`` + the
  projected time embedding, chunk order (shift_sa, scale_sa, gate_sa,
  shift_ff, scale_ff, gate_ff); norm1/norm3 affine-free, norm2 AFFINE.
* 3-D RoPE: interleaved complex pairs, per-axis dims (t, h, w) summing to
  head_dim, frame-major token order.
* head: (1, 2, D) table + raw time embedding, SHIFT-first chunk, affine-free
  fp32 LayerNorm, then proj_out to patch voxels.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_ref_flux import apply_rope, rope
from torch_ref_sd3 import timestep_embedding


class AcrossHeadsRMS(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):  # (B, S, D)
        x32 = x.float()
        var = x32.pow(2).mean(-1, keepdim=True)
        return (x32 * torch.rsqrt(var + self.eps)) * self.weight


class WanAttention(nn.Module):
    """Self or cross attention with across-heads qk-norm; optional RoPE."""

    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads, self.head_dim = heads, dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = AcrossHeadsRMS(dim)
        self.norm_k = AcrossHeadsRMS(dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def _heads(self, x):
        B, S, _ = x.shape
        return x.view(B, S, self.heads, self.head_dim).transpose(1, 2)

    def forward(self, x, y=None, rope_tables=None):
        y = x if y is None else y
        q = self._heads(self.norm_q(self.to_q(x)))
        k = self._heads(self.norm_k(self.to_k(y)))
        v = self._heads(self.to_v(y))
        if rope_tables is not None:
            cos, sin = rope_tables
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        out = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        B, H, S, E = out.shape
        return self.to_out[0](out.transpose(1, 2).reshape(B, S, H * E))


class WanFeedForward(nn.Module):
    def __init__(self, dim: int, ffn_dim: int):
        super().__init__()
        self.net = nn.ModuleList(
            [nn.ModuleDict({"proj": nn.Linear(dim, ffn_dim)}), nn.Identity(),
             nn.Linear(ffn_dim, dim)]
        )

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0]["proj"](x), approximate="tanh"))


class WanTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, ffn_dim: int):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(1, 6, dim) * 0.02)
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn1 = WanAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=True, eps=1e-6)
        self.attn2 = WanAttention(dim, heads)
        self.norm3 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ffn = WanFeedForward(dim, ffn_dim)

    def forward(self, x, ctx, temb6, rope_tables):
        # temb6: (B, 6, D)
        mods = (self.scale_shift_table + temb6.float()).chunk(6, dim=1)
        shift_sa, scale_sa, gate_sa, shift_ff, scale_ff, gate_ff = mods
        h = self.norm1(x.float()) * (1 + scale_sa) + shift_sa
        x = x + gate_sa * self.attn1(h, rope_tables=rope_tables)
        x = x + self.attn2(self.norm2(x.float()), ctx)
        h = self.norm3(x.float()) * (1 + scale_ff) + shift_ff
        return x + gate_ff * self.ffn(h)


class TorchWanTransformer(nn.Module):
    """Tiny diffusers-convention Wan 2.x T2V with diffusers param names."""

    def __init__(self, in_channels=16, out_channels=16, dim=64, heads=4,
                 num_layers=2, ffn_dim=128, context_dim=48, freq_dim=32,
                 axes_dim=(8, 4, 4), patch_size=(1, 2, 2)):
        super().__init__()
        self.axes_dim = axes_dim
        self.patch_size = patch_size
        self.out_channels = out_channels
        self.freq_dim = freq_dim
        self.patch_embedding = nn.Conv3d(
            in_channels, dim, kernel_size=patch_size, stride=patch_size)
        self.condition_embedder = nn.ModuleDict({
            "time_embedder": nn.ModuleDict({
                "linear_1": nn.Linear(freq_dim, dim),
                "linear_2": nn.Linear(dim, dim),
            }),
            "time_proj": nn.Linear(dim, 6 * dim),
            "text_embedder": nn.ModuleDict({
                "linear_1": nn.Linear(context_dim, dim),
                "linear_2": nn.Linear(dim, dim),
            }),
        })
        self.blocks = nn.ModuleList(
            [WanTransformerBlock(dim, heads, ffn_dim) for _ in range(num_layers)]
        )
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, dim) * 0.02)
        self.norm_out = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        pt, ph, pw = patch_size
        self.proj_out = nn.Linear(dim, pt * ph * pw * out_channels)

    @torch.no_grad()
    def forward(self, latents, timestep, encoder_hidden_states):
        # latents: (B, C, T, H, W); timestep: (B,) scheduler scale
        B, C, T, H, W = latents.shape
        pt, ph, pw = self.patch_size
        gt, gh, gw = T // pt, H // ph, W // pw
        x = self.patch_embedding(latents).flatten(2).transpose(1, 2)  # (B, L, D)

        ce = self.condition_embedder
        temb = ce["time_embedder"]["linear_2"](
            F.silu(ce["time_embedder"]["linear_1"](
                timestep_embedding(timestep, self.freq_dim))))
        temb6 = ce["time_proj"](F.silu(temb)).view(B, 6, -1)
        ctx = ce["text_embedder"]["linear_2"](
            F.gelu(ce["text_embedder"]["linear_1"](encoder_hidden_states),
                   approximate="tanh"))

        tt = torch.arange(gt).repeat_interleave(gh * gw)
        hh = torch.arange(gh).repeat_interleave(gw).repeat(gt)
        ww = torch.arange(gw).repeat(gt * gh)
        ids = torch.stack([tt, hh, ww], dim=-1)
        tables = rope(ids, self.axes_dim)

        for block in self.blocks:
            x = block(x, ctx, temb6, tables)

        shift, scale = (self.scale_shift_table + temb.float()[:, None]).chunk(2, dim=1)
        x = self.norm_out(x.float()) * (1 + scale.squeeze(1)[:, None]) \
            + shift.squeeze(1)[:, None]
        x = self.proj_out(x)
        # unpatchify: (B, gt*gh*gw, pt*ph*pw*C) → (B, C, T, H, W)
        x = x.view(B, gt, gh, gw, pt, ph, pw, self.out_channels)
        x = torch.einsum("bthwpqrc->bctphqwr", x)
        return x.reshape(B, self.out_channels, T, H, W)
