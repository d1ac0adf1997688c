"""Qwen2.5-VL vision tower in flax.linen — the Edit-Plus conditioning path.

The reference's Qwen-Image-Edit-Plus feeds condition images through the
VLM's vision tower into the text stream
(``reference qwen_image_edit_plus.py:163-190``: ``processor(text, images)``
→ ``text_encoder(input_ids, pixel_values, image_grid_thw)``). This module
is the TPU-native tower for that role, mirroring the public Qwen2.5-VL
``visual`` graph so upstream weights import leaf-for-leaf:

* patch embed: conv3d (temporal 2 × 14 × 14) == a Dense over the flattened
  patch vector (the host preprocessor emits flattened patches in the
  upstream channel/temporal/pixel order),
* 2-D rotary position embeddings over (h, w) patch coordinates,
* 32 pre-norm blocks (RMSNorm, fused-qkv attention with bias, SwiGLU MLP);
  WINDOWED attention everywhere except ``fullatt_block_indexes`` — tokens
  are re-ordered into 8×8-patch windows by a host-computed permutation and
  windowed layers use a block-diagonal mask,
* merger: RMSNorm → flatten 2×2 merge groups (contiguous after the window
  re-order) → MLP(hidden·4 → hidden·4 → out) with GELU.

The tower runs per image at preprocessing time (frozen, not in the rollout
scan), so a host loop over condition images with one jit per grid size is
the right TPU shape.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# CLIP normalization (Qwen2-VL image processor defaults)
_VL_MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
_VL_STD = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)


@dataclass(frozen=True)
class VLVisionConfig:
    hidden_dim: int = 1280
    out_dim: int = 3584          # LM hidden size (Qwen2.5-VL-7B)
    depth: int = 32
    num_heads: int = 16
    mlp_dim: int = 3420
    patch_size: int = 14
    temporal_patch_size: int = 2
    merge_size: int = 2
    window_size: int = 112       # pixels → 8 patches → 4 merged positions
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rope_theta: float = 10000.0
    in_channels: int = 3
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @staticmethod
    def qwen25_vl(**o) -> "VLVisionConfig":
        return VLVisionConfig(**o)

    @staticmethod
    def tiny(**o) -> "VLVisionConfig":
        base = dict(hidden_dim=32, out_dim=32, depth=2, num_heads=4, mlp_dim=64,
                    fullatt_block_indexes=(1,))
        base.update(o)
        return VLVisionConfig(**base)


# ---------------------------------------------------------------------------
# Host-side preprocessing (the HF Qwen2VLImageProcessor contract)
# ---------------------------------------------------------------------------

def smart_resize(h: int, w: int, factor: int, min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """Round (h, w) to multiples of ``factor`` within the pixel budget."""
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = math.floor(h / beta / factor) * factor
        wb = math.floor(w / beta / factor) * factor
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return int(hb), int(wb)


def _bilinear_resize_chw(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    C, H, W = img.shape
    ys = (np.arange(out_h) + 0.5) * H / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * W / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[None, :, None]
    wx = np.clip(xs - x0, 0, 1)[None, None, :]
    a = img[:, y0][:, :, x0]
    b = img[:, y0][:, :, x1]
    c = img[:, y1][:, :, x0]
    d = img[:, y1][:, :, x1]
    return ((a * (1 - wx) + b * wx) * (1 - wy) + (c * (1 - wx) + d * wx) * wy).astype(
        np.float32
    )


def preprocess_vision_image(
    img_chw: np.ndarray, cfg: VLVisionConfig, max_area: int = 384 * 384
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """(C, H, W) float [0,1] → (n_patches, patch_dim) flattened patches +
    grid (t, h, w), following the upstream processor: aspect-preserving
    resize to ~``max_area`` rounded to ``patch·merge`` multiples, CLIP
    normalization, temporal tiling to 2 frames, and the upstream patch
    flatten order (merge-group major)."""
    C, H, W = img_chw.shape
    factor = cfg.patch_size * cfg.merge_size
    # aspect-preserving fit to the area budget (reference calculate_dimensions)
    tgt_h = math.sqrt(max_area * (H / W))
    tgt_w = tgt_h * W / H
    rh, rw = smart_resize(int(round(tgt_h)), int(round(tgt_w)), factor)
    img = _bilinear_resize_chw(img_chw.astype(np.float32), rh, rw)
    img = (img - _VL_MEAN[:, None, None]) / _VL_STD[:, None, None]
    patches = np.tile(img[None], (cfg.temporal_patch_size, 1, 1, 1))  # (T,C,H,W)
    grid_t = 1
    grid_h, grid_w = rh // cfg.patch_size, rw // cfg.patch_size
    m, p = cfg.merge_size, cfg.patch_size
    patches = patches.reshape(
        grid_t, cfg.temporal_patch_size, C,
        grid_h // m, m, p, grid_w // m, m, p,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, cfg.patch_dim)
    return flat.astype(np.float32), (grid_t, grid_h, grid_w)


def window_layout(grid_thw: Tuple[int, int, int], cfg: VLVisionConfig):
    """Window re-ordering for one image (upstream ``get_window_index``).

    Returns (patch_perm, inv_perm, window_mask):
      * ``patch_perm`` (L,) — token order such that each 2×2 merge group is
        contiguous and groups are grouped into (win×win)-merged-position
        windows. Indexes into the MERGE-GROUP-MAJOR patch sequence the
        upstream image processor emits (``preprocess_vision_image``) —
        group (y, x) row-major over the merged grid, then (m, m) patches
        row-major within the group (upstream ``get_window_index``),
      * ``inv_perm`` — undo permutation for the merged sequence (upstream
        ``reverse_indices``): output lands in merged row-major order,
      * ``window_mask`` (L, L) bool — block-diagonal attention for windowed
        layers (True = may attend).
    """
    t, h, w = grid_thw
    m = cfg.merge_size
    hm, wm = h // m, w // m  # merged grid
    win = cfg.window_size // (cfg.patch_size * m)  # merged positions / window
    # merged-position order: window-major
    order = []
    win_sizes = []
    for wy in range(0, hm, win):
        for wx in range(0, wm, win):
            n = 0
            for y in range(wy, min(wy + win, hm)):
                for x in range(wx, min(wx + win, wm)):
                    order.append(y * wm + x)
                    n += 1
            win_sizes.append(n)
    order = np.asarray(order, np.int64)
    # expand merged positions to their m×m patch indices in the
    # group-major input sequence: group ``mi``'s patches are contiguous
    patch_perm = np.empty(h * w, np.int64)
    k = 0
    for mi in order:
        for d in range(m * m):
            patch_perm[k] = int(mi) * m * m + d
            k += 1
    inv_perm = np.argsort(order)  # merged-sequence undo
    # block-diagonal window mask at PATCH granularity
    L = h * w
    mask = np.zeros((L, L), bool)
    start = 0
    for n in win_sizes:
        span = n * m * m
        mask[start : start + span, start : start + span] = True
        start += span
    return patch_perm, inv_perm, mask


def rot_pos_ids(grid_thw: Tuple[int, int, int], merge_size: int = 2) -> np.ndarray:
    """(L, 2) (h, w) coordinates per patch in the MERGE-GROUP-MAJOR order the
    upstream processor emits patches in (upstream ``rot_pos_emb``:
    ``reshape(h//m, m, w//m, m).permute(0, 2, 1, 3)``)."""
    t, h, w = grid_thw
    m = merge_size
    hh = np.broadcast_to(
        np.arange(h).reshape(h // m, m, 1, 1), (h // m, m, w // m, m))
    ww = np.broadcast_to(
        np.arange(w).reshape(1, 1, w // m, m), (h // m, m, w // m, m))
    hh = hh.transpose(0, 2, 1, 3).reshape(-1)
    ww = ww.transpose(0, 2, 1, 3).reshape(-1)
    out = np.stack([hh, ww], axis=1).astype(np.float32)
    return np.tile(out, (t, 1))


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class _VLRMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + 1e-6) * scale).astype(x.dtype)


class VLVisionBlock(nn.Module):
    cfg: VLVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H, hd = cfg.hidden_dim, cfg.num_heads, cfg.head_dim
        L = x.shape[0]

        h = _VLRMSNorm(D, name="norm1")(x)
        qkv = nn.Dense(3 * D, use_bias=True, dtype=dt, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(L, 3, H, hd), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]  # (L, H, hd)

        def rope(t):
            # upstream rotates with interleave-free half-split on the
            # concatenated (h, w) frequencies
            t1, t2 = jnp.split(t.astype(jnp.float32), 2, axis=-1)
            rot = jnp.concatenate([-t2, t1], axis=-1)
            return (t * cos[:, None, :] + rot * sin[:, None, :]).astype(t.dtype)

        q, k = rope(q), rope(k)
        s = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)
        s = s * (hd ** -0.5)
        s = jnp.where(mask[None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("hqk,khd->qhd", p, v).reshape(L, D)
        x = x + nn.Dense(D, use_bias=True, dtype=dt, name="proj")(o)

        h = _VLRMSNorm(D, name="norm2")(x)
        gate = nn.Dense(cfg.mlp_dim, use_bias=True, dtype=dt, name="gate")(h)
        up = nn.Dense(cfg.mlp_dim, use_bias=True, dtype=dt, name="up")(h)
        x = x + nn.Dense(D, use_bias=True, dtype=dt, name="down")(nn.silu(gate) * up)
        return x


class VLVisionTower(nn.Module):
    """One image per call: flattened patches → merged vision embeds.

    Inputs (host-precomputed for the static grid):
      patches:    (L, patch_dim) in the upstream processor's merge-group-
                  major order (``preprocess_vision_image``)
      pos_hw:     (L, 2) patch (h, w) coordinates (same group-major order)
      patch_perm: (L,) window re-ordering
      window_mask:(L, L) block-diagonal mask for windowed layers
      inv_perm:   (L/merge²,) undo permutation for merged tokens
    Output: (L/merge², out_dim) in merged row-major order.
    """

    cfg: VLVisionConfig

    @nn.compact
    def __call__(self, patches, pos_hw, patch_perm, window_mask, inv_perm):
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = nn.Dense(cfg.hidden_dim, use_bias=False, dtype=dt,
                     name="patch_embed")(patches.astype(dt))

        # 2-D rotary table: half the rotary dims on h, half on w
        half = cfg.head_dim // 2  # rotary dim per token (h half + w half)
        inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, half, 2) / half))
        inv_freq = jnp.asarray(inv_freq, jnp.float32)
        freqs_h = pos_hw[:, 0:1] * inv_freq[None]
        freqs_w = pos_hw[:, 1:2] * inv_freq[None]
        freqs = jnp.concatenate([freqs_h, freqs_w], axis=-1)  # (L, half)
        emb = jnp.concatenate([freqs, freqs], axis=-1)        # (L, head_dim)
        cos, sin = jnp.cos(emb), jnp.sin(emb)

        # window re-order (tokens + rope tables)
        x = x[patch_perm]
        cos, sin = cos[patch_perm], sin[patch_perm]

        full = jnp.ones_like(window_mask)
        for i in range(cfg.depth):
            m = full if i in cfg.fullatt_block_indexes else window_mask
            x = VLVisionBlock(cfg, name=f"block_{i}")(x, cos, sin, m)

        # merger: merge groups are contiguous after the window re-order
        x = _VLRMSNorm(cfg.hidden_dim, name="ln_q")(x)
        g = cfg.merge_size ** 2
        x = x.reshape(x.shape[0] // g, g * cfg.hidden_dim)
        x = nn.Dense(g * cfg.hidden_dim, use_bias=True, dtype=dt, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.out_dim, use_bias=True, dtype=dt, name="merger_fc2")(x)
        return x[inv_perm].astype(jnp.float32)
