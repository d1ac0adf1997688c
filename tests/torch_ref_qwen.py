"""Independent torch reference of diffusers' ``QwenImageTransformer2DModel``.

Companion to the other ``torch_ref_*`` modules. Qwen-Image is a pure
double-stream MMDiT; the load-bearing conventions that differ from FLUX:

* per-block modulations are ``nn.Sequential(SiLU, Linear(dim, 6·dim))``
  (state-dict key ``img_mod.1`` / ``txt_mod.1``), chunked as TWO
  (shift, scale, gate) triples — attention then MLP;
* a pre-``txt_in`` fp32 RMSNorm (``txt_norm``) on the text features;
* no pooled text vector and no guidance embed — temb is the timestep
  embedding alone;
* attention params use the diffusers joint-attention naming
  (``attn.to_q``/``attn.add_q_proj``/...), per-head RMS qk-norm, txt tokens
  LEAD the joint sequence, RoPE applied after the concat.

RoPE tables are taken as explicit inputs here (like ``torch_ref_flux``):
the id-generation convention is adapter-level and outside this module.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_ref_flux import FeedForward, FluxAttention, apply_rope, rope
from torch_ref_sd3 import RMSNorm, TimestepEmbedder


class QwenImageTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.img_mod = nn.Sequential(nn.SiLU(), nn.Linear(dim, 6 * dim))
        self.txt_mod = nn.Sequential(nn.SiLU(), nn.Linear(dim, 6 * dim))
        self.img_norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.txt_norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn = FluxAttention(dim, heads)
        self.img_norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.txt_norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.img_mlp = FeedForward(dim)
        self.txt_mlp = FeedForward(dim)

    @staticmethod
    def _mod(x, m):
        shift, scale, gate = m.chunk(3, dim=-1)
        return x * (1 + scale[:, None]) + shift[:, None], gate

    def forward(self, img, txt, temb, cos, sin):
        im = self.img_mod(temb)
        tm = self.txt_mod(temb)
        im1, im2 = im.chunk(2, dim=-1)  # (shift, scale, gate) × (attn, mlp)
        tm1, tm2 = tm.chunk(2, dim=-1)
        img_mod, i_gate = self._mod(self.img_norm1(img), im1)
        txt_mod, t_gate = self._mod(self.txt_norm1(txt), tm1)
        img_attn, txt_attn = self.attn(img_mod, txt_mod, cos, sin)
        img = img + i_gate[:, None] * img_attn
        txt = txt + t_gate[:, None] * txt_attn
        h, i_gate2 = self._mod(self.img_norm2(img), im2)
        img = img + i_gate2[:, None] * self.img_mlp(h)
        hc, t_gate2 = self._mod(self.txt_norm2(txt), tm2)
        txt = txt + t_gate2[:, None] * self.txt_mlp(hc)
        return img, txt


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        scale, shift = self.linear(F.silu(emb)).chunk(2, dim=-1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class QwenTimestepProjEmbeddings(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.timestep_embedder = TimestepEmbedder(dim)

    def forward(self, timestep):
        return self.timestep_embedder(timestep)


class TorchQwenImageTransformer(nn.Module):
    """Tiny diffusers-convention Qwen-Image with diffusers param names."""

    def __init__(self, in_channels=16, dim=64, heads=4, num_blocks=2,
                 context_dim=32, axes_dim=(4, 6, 6)):
        super().__init__()
        self.axes_dim = axes_dim
        self.img_in = nn.Linear(in_channels, dim)
        self.txt_norm = RMSNorm(context_dim)
        self.txt_in = nn.Linear(context_dim, dim)
        self.time_text_embed = QwenTimestepProjEmbeddings(dim)
        self.transformer_blocks = nn.ModuleList(
            [QwenImageTransformerBlock(dim, heads) for _ in range(num_blocks)]
        )
        self.norm_out = AdaLayerNormContinuous(dim)
        self.proj_out = nn.Linear(dim, in_channels)

    @torch.no_grad()
    def forward(self, latents, timestep, encoder_hidden_states, img_ids, txt_ids):
        img = self.img_in(latents)
        txt = self.txt_in(self.txt_norm(encoder_hidden_states))
        temb = self.time_text_embed(timestep)
        ids = torch.cat([txt_ids, img_ids], dim=0)
        cos, sin = rope(ids, self.axes_dim)
        for block in self.transformer_blocks:
            img, txt = block(img, txt, temb, cos, sin)
        img = self.norm_out(img, temb)
        return self.proj_out(img)
