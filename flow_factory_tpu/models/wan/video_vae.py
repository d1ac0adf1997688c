"""Causal 3-D (video) VAE in flax.linen.

TPU-native analog of the Wan/LTX causal video VAEs the reference consumes
through diffusers (``src/flow_factory/models/wan/*`` decode/encode paths).
Compression: temporal ×4 with the Wan frame convention ``T_latent = 1 +
(T_pixel − 1)/4`` (front-replicated padding), spatial ×8. Convs are
channel-last NDHWC — the native TPU layout; public API is (B, C, T, H, W)
float in [-1, 1] to match the sample canon.

CAUSAL in time: every temporal convolution pads only on the LEFT
(``pad = (k−1, 0)`` at stride 1, ``(2, 0)`` at stride 2) and the decoder
upsamples with nearest-repeat before a left-padded conv — so pixel frame t
never depends on latent information from frames > t's window, matching the
upstream CausalConv3d property and enabling chunked/streaming decode.

Remaining gap (PARITY.md): upstream-checkpoint weight compatibility (the
exact WanVAE module graph + feat-cache chunking) needs real weights to
validate and is tracked for a later round; the RL math, trainers, and video
plumbing are independent of the VAE internals.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VideoVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    base_channels: int = 96
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    temporal_down: int = 4  # total temporal compression
    scaling_factor: float = 1.0
    shift_factor: float = 0.0
    dtype: str = "float32"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def spatial_down(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)

    @staticmethod
    def wan(**o) -> "VideoVAEConfig":
        return VideoVAEConfig(**o)

    @staticmethod
    def tiny(**o) -> "VideoVAEConfig":
        base = dict(base_channels=8, channel_mults=(1, 2), layers_per_block=1, temporal_down=2)
        base.update(o)
        return VideoVAEConfig(**base)


def causal_conv3d(
    x, features: int, t_stride: int = 1, s_stride: int = 1,
    dtype=jnp.float32, name: str = "conv",
):
    """3×3×3 conv, SAME in space, LEFT-padded (causal) in time."""
    t_pad = 2 if t_stride in (1, 2) else 2  # k=3: covers [i-2, i] at stride 1/2
    return nn.Conv(
        features, (3, 3, 3), strides=(t_stride, s_stride, s_stride),
        padding=((t_pad, 0), (1, 1), (1, 1)), dtype=dtype, name=name,
    )(x)


class ResBlock3D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # per-location channel RMS norm (upstream WanRMS_norm): GroupNorm
        # would pool statistics over the time axis and break causality
        h = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = causal_conv3d(h, self.out_channels, dtype=self.dtype, name="conv1")
        h = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = causal_conv3d(h, self.out_channels, dtype=self.dtype, name="conv2")
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        cfg = self.cfg
        dt = cfg.compute_dtype
        n_spatial = len(cfg.channel_mults) - 1
        n_temporal = {1: 0, 2: 1, 4: 2}[cfg.temporal_down]
        h = causal_conv3d(x, cfg.base_channels, dtype=dt, name="conv_in")
        for i, mult in enumerate(cfg.channel_mults):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block):
                h = ResBlock3D(ch, dtype=dt, name=f"down_{i}_res_{j}")(h)
            if i < n_spatial:
                t_stride = 2 if i < n_temporal else 1
                h = causal_conv3d(
                    h, ch, t_stride=t_stride, s_stride=2, dtype=dt, name=f"down_{i}_conv"
                )
        h = ResBlock3D(h.shape[-1], dtype=dt, name="mid_res")(h)
        h = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_out")(h.astype(jnp.float32))
        h = nn.silu(h)
        return causal_conv3d(h, 2 * cfg.latent_channels, dtype=jnp.float32, name="conv_out")


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, z):  # (B, Tl, hl, wl, Cz)
        cfg = self.cfg
        dt = cfg.compute_dtype
        mults = tuple(reversed(cfg.channel_mults))
        n_spatial = len(cfg.channel_mults) - 1
        n_temporal = {1: 0, 2: 1, 4: 2}[cfg.temporal_down]
        h = causal_conv3d(z, cfg.base_channels * mults[0], dtype=dt, name="conv_in")
        h = ResBlock3D(h.shape[-1], dtype=dt, name="mid_res")(h)
        for i, mult in enumerate(mults):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block + 1):
                h = ResBlock3D(ch, dtype=dt, name=f"up_{i}_res_{j}")(h)
            if i < n_spatial:
                t_up = 2 if i >= n_spatial - n_temporal else 1
                B, T, H, W, C = h.shape
                # nearest-repeat keeps causality: new frame 2t/2t+1 ← frame t
                h = jax.image.resize(h, (B, T * t_up, H * 2, W * 2, C), method="nearest")
                h = causal_conv3d(h, ch, dtype=dt, name=f"up_{i}_conv")
        h = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_out")(h.astype(jnp.float32))
        h = nn.silu(h)
        return causal_conv3d(h, cfg.in_channels, dtype=jnp.float32, name="conv_out")


class VideoVAE(nn.Module):
    """Public API: videos (B, C, T, H, W) in [-1, 1]; latents (B, Tl, hl, wl, Cz)."""

    cfg: VideoVAEConfig

    def setup(self):
        self.encoder = VideoEncoder(self.cfg)
        self.decoder = VideoDecoder(self.cfg)

    def _pad_front(self, x: jax.Array) -> jax.Array:
        """Wan frame convention: replicate frame 0 so T ≡ 0 (mod down)."""
        d = self.cfg.temporal_down
        T = x.shape[1]
        pad = (-T) % d
        if pad:
            x = jnp.concatenate([jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)
        return x

    def encode(
        self, videos: jax.Array, key: Optional[jax.Array] = None, sample: bool = False
    ) -> jax.Array:
        x = jnp.transpose(videos, (0, 2, 3, 4, 1))  # → (B, T, H, W, C)
        x = self._pad_front(x)
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if sample:
            if key is None:
                raise ValueError("key required when sample=True")
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return (z - self.cfg.shift_factor) * self.cfg.scaling_factor

    def decode(self, latents: jax.Array, num_frames: Optional[int] = None) -> jax.Array:
        """Latents → videos (B, C, T, H, W) in [-1, 1]."""
        z = latents / self.cfg.scaling_factor + self.cfg.shift_factor
        video = self.decoder(z)  # (B, T_pad, H, W, C)
        if num_frames is not None and video.shape[1] > num_frames:
            video = video[:, -num_frames:]
        return jnp.transpose(video, (0, 4, 1, 2, 3))

    def decode_chunked(
        self,
        latents: jax.Array,
        chunk: int = 4,
        overlap: int = 8,
        num_frames: Optional[int] = None,
    ) -> jax.Array:
        """Streaming decode: process ``chunk`` latent frames at a time.

        Causality (left-only temporal padding) means a frame's decode depends
        only on ≤ ``overlap`` earlier latent frames (the decoder's temporal
        receptive field); feeding each chunk with that much left context
        reproduces the full decode EXACTLY while peak activation memory drops
        from O(T) to O(chunk + overlap). The reference's Wan VAE streams with
        a feat-cache for the same reason (its CausalConv3d design).
        """
        z = latents / self.cfg.scaling_factor + self.cfg.shift_factor
        Tl = z.shape[1]
        t_up = self.cfg.temporal_down
        outs = []
        for s in range(0, Tl, chunk):
            e = min(s + chunk, Tl)
            lo = max(0, s - overlap)
            seg = self.decoder(z[:, lo:e])  # (B, (e-lo)*t_up, H, W, C)
            outs.append(seg[:, (s - lo) * t_up:])
        video = jnp.concatenate(outs, axis=1)
        if num_frames is not None and video.shape[1] > num_frames:
            video = video[:, -num_frames:]
        return jnp.transpose(video, (0, 4, 1, 2, 3))

    def __call__(self, videos: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return self.decode(self.encode(videos, key=key, sample=key is not None))
