"""Causal 3-D (video) VAE in flax.linen — upstream Wan module graph.

TPU-native re-implementation of the VAE behind the reference Wan adapters
(``src/flow_factory/models/wan/*`` consume diffusers ``AutoencoderKLWan``).
The module graph mirrors the upstream layout leaf-for-leaf so pretrained
checkpoints import through :func:`...utils.checkpoint.wan_vae_key_map`:

* ``WanCausalConv3d`` — temporal LEFT-only zero padding (kernel 3 → pad 2);
  stride-2 temporal convs pad 2 left and none right;
* ``WanRMSNorm`` — per-location channel RMS norm with a ``gamma`` scale
  (upstream normalizes over the channel dim only — GroupNorm would pool
  statistics across time and break causality);
* residual blocks ``norm1/conv1/norm2/conv2[/conv_shortcut]``;
* flat ``down_blocks``/``up_blocks`` ModuleList indexing (resblocks,
  optional attention at configured scales, then a resample per stage);
* mid block ``resnets.0 / attentions.0 / resnets.1`` with per-frame spatial
  attention (1×1-conv qkv/proj);
* ``quant_conv``/``post_quant_conv`` 1×1×1 convs around the latent;
* temporal resampling with the Wan frame convention
  ``T_pixel = 1 + (T_latent − 1) · 4``: stride-2 causal convs down, and a
  ``time_conv`` producing interleaved frame pairs up — the first frame's
  leading twin is dropped so the first latent decodes to ONE frame.

Ordering inside a resample follows upstream: upsample3d runs ``time_conv``
BEFORE the spatial resample, downsample3d runs it AFTER (temporal convs at
the lower spatial resolution). Whole-sequence causal convs replace the
upstream feat-cache frame chunking — an inference-memory optimization, not
a graph difference; :meth:`VideoVAE.decode_chunked` provides the streaming
equivalent (bit-exact given enough left context, pinned by test).

Latent normalization: upstream stores per-channel ``latents_mean/std`` in
the config; they apply as ``z̃ = (z − mean)/std`` after encode and the
inverse before decode (``scaling_factor``/``shift_factor`` cover the
scalar-scale families; both compose).

Public API: videos (B, C, T, H, W) float in [-1, 1]; latents channel-last
(B, Tl, hl, wl, Cz) to match the sample canon.
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
    base_channels: int = 96  # upstream ``base_dim``
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)  # upstream ``dim_mult``
    layers_per_block: int = 2  # upstream ``num_res_blocks``
    temporal_down: int = 4  # total temporal compression (1 | 2 | 4)
    #: stage scales (1, 1/2, ...) that get a spatial attention block after
    #: each residual block (upstream ``attn_scales``; () for Wan 2.1)
    attn_scales: Tuple[float, ...] = ()
    scaling_factor: float = 1.0
    shift_factor: float = 0.0
    #: per-channel latent normalization (upstream ``latents_mean/std``)
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None
    #: Wan 2.2 (TI2V 5B) graph knobs: 2×2 pixel patchify at the VAE boundary
    #: and residual resample stages with param-free avg/dup shortcuts
    spatial_patch: int = 1
    resample_residual: bool = False
    dtype: str = "float32"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def spatial_down(self) -> int:
        return 2 ** (len(self.channel_mults) - 1) * self.spatial_patch

    @property
    def n_temporal(self) -> int:
        return {1: 0, 2: 1, 4: 2}[self.temporal_down]

    def temporal_down_flags(self) -> Tuple[bool, ...]:
        """Per-resample temporal-downsample flags, encoder stage order.

        Upstream Wan 2.1: ``temperal_downsample=[False, True, True]`` — the
        temporal stages are the LAST ``n_temporal`` of the spatial resamples.
        """
        n_spatial = len(self.channel_mults) - 1
        return tuple(i >= n_spatial - self.n_temporal for i in range(n_spatial))

    @staticmethod
    def wan(**o) -> "VideoVAEConfig":
        """Wan 2.1 VAE. ``latents_mean/std`` are the published per-channel
        stats from the diffusers ``AutoencoderKLWan`` config (a real
        checkpoint directory's config.json overrides them,
        ``wan_vae_overrides_from_config``)."""
        base = dict(
            latents_mean=(-0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653,
                          -0.1517, 1.5508, 0.4134, -0.0715, 0.5517, -0.3632,
                          -0.1922, -0.9497, 0.2503, -0.2921),
            latents_std=(2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708,
                         2.6052, 2.0743, 3.2687, 2.1526, 2.8652, 1.5579,
                         1.6382, 1.1253, 2.8251, 1.9160),
        )
        base.update(o)
        return VideoVAEConfig(**base)

    @staticmethod
    def wan22_5b(**o) -> "VideoVAEConfig":
        """Wan 2.2 TI2V-5B VAE: 16×16 spatial (8 conv × 2 patch), ×4
        temporal, 48 latent channels, residual resample stages."""
        base = dict(base_channels=160, latent_channels=48,
                    spatial_patch=2, resample_residual=True)
        base.update(o)
        return VideoVAEConfig(**base)

    @staticmethod
    def tiny(**o) -> "VideoVAEConfig":
        base = dict(base_channels=8, channel_mults=(1, 2), layers_per_block=1, temporal_down=2)
        base.update(o)
        return VideoVAEConfig(**base)


class WanCausalConv3d(nn.Module):
    """Conv3d, SAME in space, LEFT-only zero padding in time."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    t_stride: int = 1
    s_stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        return nn.Conv(
            self.features, self.kernel,
            strides=(self.t_stride, self.s_stride, self.s_stride),
            padding=((kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=self.dtype, name="conv",
        )(x)


class WanRMSNorm(nn.Module):
    """Channel RMS norm with ``gamma`` (upstream ``WanRMS_norm``)."""

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + 1e-12)
        return (y * gamma).astype(x.dtype)


class WanResidualBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = WanRMSNorm(name="norm1")(x)
        h = nn.silu(h.astype(jnp.float32)).astype(dt)
        h = WanCausalConv3d(self.out_channels, dtype=dt, name="conv1")(h)
        h = WanRMSNorm(name="norm2")(h)
        h = nn.silu(h.astype(jnp.float32)).astype(dt)
        h = WanCausalConv3d(self.out_channels, dtype=dt, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = WanCausalConv3d(self.out_channels, kernel=(1, 1, 1), dtype=dt,
                                name="conv_shortcut")(x)
        return x + h


class WanAttentionBlock(nn.Module):
    """Per-frame spatial self-attention (upstream 1×1-conv qkv/proj)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        B, T, H, W, C = x.shape
        dt = self.dtype
        ident = x
        h = WanRMSNorm(name="norm")(x)
        h = h.reshape(B * T, H, W, C)
        qkv = nn.Conv(3 * C, (1, 1), dtype=dt, name="to_qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B * T, H * W, 3 * C), 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) / jnp.sqrt(C), axis=-1
        ).astype(dt)
        h = jnp.einsum("bij,bjc->bic", attn, v).reshape(B * T, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=dt, name="proj")(h)
        return ident + h.reshape(B, T, H, W, C)


class WanResample(nn.Module):
    """Spatial (+ optional temporal) resampling, upstream structure.

    ``resample_1`` is the spatial conv (index 1 of the upstream Sequential —
    index 0 is padding/interpolation); ``time_conv`` handles time.
    """

    mode: str  # downsample2d | downsample3d | upsample2d | upsample3d
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_frame_drop: bool = True):
        dt = self.dtype
        B, T, H, W, C = x.shape
        if self.mode.startswith("upsample"):
            if self.mode == "upsample3d":
                # time first (at low spatial res): C → 2C, interleave to 2T,
                # drop the first twin so the first latent yields ONE frame
                h = WanCausalConv3d(2 * C, kernel=(3, 1, 1), dtype=dt, name="time_conv")(x)
                h = h.reshape(B, T, H, W, 2, C)
                h = jnp.einsum("bthwpc->btphwc", h).reshape(B, 2 * T, H, W, C)
                x = h[:, 1:] if first_frame_drop else h
                T = x.shape[1]
            x = jax.image.resize(x, (B, T, H * 2, W * 2, C), method="nearest")
            x = x.reshape(B * T, H * 2, W * 2, C)
            x = nn.Conv(C // 2, (3, 3), dtype=dt, name="resample_1")(x)
            return x.reshape(B, T, H * 2, W * 2, C // 2)

        # downsample: asymmetric zero pad (0 left, 1 right) + stride-2 conv
        x = x.reshape(B * T, H, W, C)
        x = nn.Conv(C, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                    dtype=dt, name="resample_1")(x)
        x = x.reshape(B, T, H // 2, W // 2, C)
        if self.mode == "downsample3d":
            # causal stride-2 temporal conv: T=1+2k → 1+k
            x = WanCausalConv3d(C, kernel=(3, 1, 1), t_stride=2, dtype=dt,
                                name="time_conv")(x)
        return x


def avg_down_shortcut(x, ft: int, fs: int, out_ch: int):
    """Param-free residual shortcut for Wan 2.2 downsample stages.

    Pixel-unshuffles (time, space) factors into channels, then averages
    channel groups down to ``out_ch`` (upstream ``AvgDown3D``). Time is
    front-replicated to stay causal and keep the 1+(T−1)/ft convention.
    """
    B, T, H, W, C = x.shape
    pad = (-T) % ft
    if pad:
        x = jnp.concatenate([jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)
        T = x.shape[1]
    x = x.reshape(B, T // ft, ft, H // fs, fs, W // fs, fs, C)
    x = jnp.einsum("btphqwrc->bthwpqrc", x).reshape(
        B, T // ft, H // fs, W // fs, ft * fs * fs * C)
    total = ft * fs * fs * C
    if total % out_ch == 0:
        return x.reshape(*x.shape[:-1], out_ch, total // out_ch).mean(-1)
    # channel-widening stage (no resample factors to fold): repeat
    return jnp.repeat(x, out_ch // total, axis=-1)


def dup_up_shortcut(x, ft: int, fs: int, out_ch: int, first_frame_drop: bool):
    """Param-free residual shortcut for Wan 2.2 upsample stages: channel
    repeat then pixel-shuffle into (time, space) (upstream ``DupUp3D``);
    the leading duplicated frames drop at sequence start (frame convention).
    """
    B, T, H, W, C = x.shape
    total = ft * fs * fs * out_ch
    if total % C == 0:
        x = jnp.repeat(x, total // C, axis=-1)  # (B,T,H,W, ft*fs*fs*out_ch)
    else:
        # channel-narrowing stage with no resample factors: group mean
        x = x.reshape(B, T, H, W, total, C // total).mean(-1)
    x = x.reshape(B, T, H, W, ft, fs, fs, out_ch)
    x = jnp.einsum("bthwpqrc->btphqwrc", x).reshape(
        B, T * ft, H * fs, W * fs, out_ch)
    if first_frame_drop and ft > 1:
        x = x[:, ft - 1:]
    return x


class WanMidBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = WanResidualBlock(x.shape[-1], dtype=self.dtype, name="resnets_0")(x)
        x = WanAttentionBlock(dtype=self.dtype, name="attentions_0")(x)
        return WanResidualBlock(x.shape[-1], dtype=self.dtype, name="resnets_1")(x)


class WanResidualDownStage(nn.Module):
    """Wan 2.2 residual encoder stage: resnets → downsample, plus a
    param-free avg shortcut from the stage input (upstream residual
    down block; exact shortcut grouping is best-effort pending real
    weights — see module docstring)."""

    out_channels: int
    num_resnets: int
    mode: str  # downsample2d | downsample3d | none
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for j in range(self.num_resnets):
            h = WanResidualBlock(self.out_channels, dtype=self.dtype,
                                 name=f"resnets_{j}")(h)
        ft = 2 if self.mode == "downsample3d" else 1
        fs = 2 if self.mode != "none" else 1
        if self.mode != "none":
            h = WanResample(self.mode, dtype=self.dtype, name="downsampler")(h)
        return h + avg_down_shortcut(x, ft, fs, self.out_channels)


class VideoEncoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        cfg = self.cfg
        dt = cfg.compute_dtype
        n_spatial = len(cfg.channel_mults) - 1
        t_flags = cfg.temporal_down_flags()
        h = WanCausalConv3d(cfg.base_channels, dtype=dt, name="conv_in")(x)
        if cfg.resample_residual:
            # Wan 2.2: one residual stage per mult (nested scopes)
            for i, mult in enumerate(cfg.channel_mults):
                mode = "none" if i >= n_spatial else (
                    "downsample3d" if t_flags[i] else "downsample2d")
                h = WanResidualDownStage(
                    cfg.base_channels * mult, cfg.layers_per_block, mode,
                    dtype=dt, name=f"down_blocks_{i}")(h)
        else:
            idx = 0
            scale = 1.0
            for i, mult in enumerate(cfg.channel_mults):
                ch = cfg.base_channels * mult
                for _ in range(cfg.layers_per_block):
                    h = WanResidualBlock(ch, dtype=dt, name=f"down_blocks_{idx}")(h)
                    idx += 1
                    if scale in cfg.attn_scales:
                        h = WanAttentionBlock(dtype=dt, name=f"down_blocks_{idx}")(h)
                        idx += 1
                if i < n_spatial:
                    mode = "downsample3d" if t_flags[i] else "downsample2d"
                    h = WanResample(mode, dtype=dt, name=f"down_blocks_{idx}")(h)
                    idx += 1
                    scale /= 2.0
        h = WanMidBlock(dtype=dt, name="mid_block")(h)
        h = WanRMSNorm(name="norm_out")(h)
        h = nn.silu(h.astype(jnp.float32))
        return WanCausalConv3d(2 * cfg.latent_channels, dtype=jnp.float32,
                               name="conv_out")(h)


class WanResidualUpStage(nn.Module):
    """Wan 2.2 residual decoder stage: resnets → upsample, plus a
    param-free dup shortcut from the stage input."""

    out_channels: int  # resnet width; upsample conv halves it on exit
    num_resnets: int
    mode: str  # upsample2d | upsample3d | none
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, first_frame_drop: bool = True):
        h = x
        for j in range(self.num_resnets):
            h = WanResidualBlock(self.out_channels, dtype=self.dtype,
                                 name=f"resnets_{j}")(h)
        ft = 2 if self.mode == "upsample3d" else 1
        fs = 2 if self.mode != "none" else 1
        if self.mode != "none":
            h = WanResample(self.mode, dtype=self.dtype, name="upsampler")(
                h, first_frame_drop=first_frame_drop)
            short_ch = self.out_channels // 2
        else:
            short_ch = self.out_channels
        return h + dup_up_shortcut(x, ft, fs, short_ch, first_frame_drop)


class VideoDecoder(nn.Module):
    cfg: VideoVAEConfig

    @nn.compact
    def __call__(self, z, first_frame_drop: bool = True):  # (B, Tl, hl, wl, Cz)
        cfg = self.cfg
        dt = cfg.compute_dtype
        mults = tuple(reversed(cfg.channel_mults))
        n_spatial = len(cfg.channel_mults) - 1
        # decoder temporal flags are the REVERSED encoder flags: Wan 2.1
        # upsamples time in the FIRST stages (low spatial res)
        t_flags = tuple(reversed(cfg.temporal_down_flags()))
        h = WanCausalConv3d(cfg.base_channels * mults[0], dtype=dt, name="conv_in")(z)
        h = WanMidBlock(dtype=dt, name="mid_block")(h)
        if cfg.resample_residual:
            for i, mult in enumerate(mults):
                mode = "none" if i >= n_spatial else (
                    "upsample3d" if t_flags[i] else "upsample2d")
                h = WanResidualUpStage(
                    cfg.base_channels * mult, cfg.layers_per_block + 1, mode,
                    dtype=dt, name=f"up_blocks_{i}")(h, first_frame_drop)
        else:
            idx = 0
            scale = 1.0 / (2 ** n_spatial)
            for i, mult in enumerate(mults):
                ch = cfg.base_channels * mult
                for _ in range(cfg.layers_per_block + 1):
                    h = WanResidualBlock(ch, dtype=dt, name=f"up_blocks_{idx}")(h)
                    idx += 1
                    if scale in cfg.attn_scales:
                        h = WanAttentionBlock(dtype=dt, name=f"up_blocks_{idx}")(h)
                        idx += 1
                if i < n_spatial:
                    mode = "upsample3d" if t_flags[i] else "upsample2d"
                    h = WanResample(mode, dtype=dt, name=f"up_blocks_{idx}")(
                        h, first_frame_drop=first_frame_drop)
                    idx += 1
                    scale *= 2.0
        h = WanRMSNorm(name="norm_out")(h)
        h = nn.silu(h.astype(jnp.float32))
        return WanCausalConv3d(cfg.in_channels * cfg.spatial_patch ** 2,
                               dtype=jnp.float32, name="conv_out")(h)


class VideoVAE(nn.Module):
    """Public API: videos (B, C, T, H, W) in [-1, 1]; latents (B, Tl, hl, wl, Cz)."""

    cfg: VideoVAEConfig

    def setup(self):
        self.encoder = VideoEncoder(self.cfg)
        self.decoder = VideoDecoder(self.cfg)
        self.quant_conv = WanCausalConv3d(
            2 * self.cfg.latent_channels, kernel=(1, 1, 1), dtype=jnp.float32,
            name="quant_conv")
        self.post_quant_conv = WanCausalConv3d(
            self.cfg.latent_channels, kernel=(1, 1, 1), dtype=jnp.float32,
            name="post_quant_conv")

    # -- latent normalization ------------------------------------------------
    def _normalize(self, z):
        cfg = self.cfg
        if cfg.latents_mean is not None:
            z = (z - jnp.asarray(cfg.latents_mean, z.dtype)) / jnp.asarray(
                cfg.latents_std, z.dtype)
        return (z - cfg.shift_factor) * cfg.scaling_factor

    def _denormalize(self, z):
        cfg = self.cfg
        z = z / cfg.scaling_factor + cfg.shift_factor
        if cfg.latents_mean is not None:
            z = z * jnp.asarray(cfg.latents_std, z.dtype) + jnp.asarray(
                cfg.latents_mean, z.dtype)
        return z

    def _pad_front(self, x: jax.Array) -> jax.Array:
        """Wan frame convention: replicate frame 0 so T ≡ 1 (mod down)."""
        d = self.cfg.temporal_down
        T = x.shape[1]
        pad = (1 - T) % d
        if pad:
            x = jnp.concatenate([jnp.repeat(x[:, :1], pad, axis=1), x], axis=1)
        return x

    def _patchify(self, x):
        p = self.cfg.spatial_patch
        if p == 1:
            return x
        B, T, H, W, C = x.shape
        x = x.reshape(B, T, H // p, p, W // p, p, C)
        return jnp.einsum("bthpwqc->bthwpqc", x).reshape(B, T, H // p, W // p, p * p * C)

    def _unpatchify(self, x):
        p = self.cfg.spatial_patch
        if p == 1:
            return x
        B, T, H, W, C = x.shape
        x = x.reshape(B, T, H, W, p, p, C // (p * p))
        return jnp.einsum("bthwpqc->bthpwqc", x).reshape(B, T, H * p, W * p, C // (p * p))

    def encode(
        self, videos: jax.Array, key: Optional[jax.Array] = None, sample: bool = False
    ) -> jax.Array:
        x = jnp.transpose(videos, (0, 2, 3, 4, 1))  # → (B, T, H, W, C)
        x = self._patchify(self._pad_front(x))
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if sample:
            if key is None:
                raise ValueError("key required when sample=True")
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return self._normalize(z)

    def decode(self, latents: jax.Array, num_frames: Optional[int] = None) -> jax.Array:
        """Latents → videos (B, C, T, H, W) in [-1, 1]; T = 1 + (Tl−1)·down."""
        z = self.post_quant_conv(self._denormalize(latents))
        video = self._unpatchify(self.decoder(z))  # (B, 1 + (Tl-1)·down, H, W, C)
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
        from O(T) to O(chunk + overlap) — the reference's Wan VAE streams
        with a feat-cache for the same reason. Interior latents each decode
        to ``down`` frames; only the sequence-first latent yields one frame,
        so segments starting past 0 keep their last ``(e−s)·down`` frames.
        """
        z = self.post_quant_conv(self._denormalize(latents))
        Tl = z.shape[1]
        d = self.cfg.temporal_down
        outs = []
        for s in range(0, Tl, chunk):
            e = min(s + chunk, Tl)
            lo = max(0, s - overlap)
            seg = self._unpatchify(self.decoder(z[:, lo:e], first_frame_drop=lo == 0))
            keep = (e - s) * d + (1 - d if s == 0 and lo == 0 else 0)
            outs.append(seg[:, seg.shape[1] - keep:])
        video = jnp.concatenate(outs, axis=1)
        if num_frames is not None and video.shape[1] > num_frames:
            video = video[:, -num_frames:]
        return jnp.transpose(video, (0, 4, 1, 2, 3))

    def __call__(self, videos: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return self.decode(self.encode(videos, key=key, sample=key is not None))
