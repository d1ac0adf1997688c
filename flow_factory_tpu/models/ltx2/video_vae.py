"""LTX causal video VAE in flax.linen — upstream LTX-Video module graph.

TPU-native re-implementation of the VAE behind the reference LTX-2 adapters
(``src/flow_factory/models/ltx2/ltx2_t2av.py:516-563`` consumes the diffusers
``AutoencoderKLLTXVideo`` through ``self.pipeline.vae``; spatial compression
32, temporal 8, 128 latent channels, per-channel ``latents_mean/std`` and a
``timestep_conditioning``-gated decoder — all pinned by the reference's own
decode path). The graph here follows the public LTX-Video autoencoder
design, which differs from Wan's (``../wan/video_vae.py``) in every load-
bearing detail:

* **pixel patchify at the VAE boundary** — a 4×4 spatial pixel-unshuffle
  feeds ``conv_in`` (so only 3 stride-2 stages are needed for 32×) and the
  decoder emits ``out_channels·p²`` for the inverse shuffle;
* **replicate (edge) padding in time** — causal convs pad the FRONT with
  copies of the first frame (Wan zero-pads); the encoder is causal, the
  decoder is NOT causal by default (``decoder_causal=False`` upstream) and
  pads time symmetrically;
* **parameter-free RMS norms** (``elementwise_affine=False`` upstream) —
  norms contribute zero leaves to the checkpoint;
* **no attention anywhere** — mid blocks are residual stacks only;
* **joint spatio-temporal stride-(2,2,2) downsamplers** gated per stage by
  ``spatio_temporal_scaling`` (Wan splits spatial and temporal resamples);
* **channel changes live in a dedicated per-stage ``conv_out``/``conv_in``
  resnet**, not in the first resnet of the stage;
* **shared-logvar encoder head**: ``conv_out`` emits ``latent_channels + 1``
  channels; the single last channel is the log-variance, broadcast across
  all latent channels (the upstream encoder repeats it before the diagonal
  Gaussian split);
* **pixel-shuffle upsamplers** (conv to ``C·8`` then depth-to-space over
  (t,h,w), optional residual input-repeat path, per-stage ``upsample_factor``
  channel scaling) with the leading duplicated frame dropped to keep the
  ``T = 1 + (Tl−1)·8`` frame convention;
* **timestep-conditioned decoder** (the reference checks
  ``vae.config.timestep_conditioning`` and passes ``decode_timestep``,
  ``ltx2_t2av.py:536-559``): a learnable ``timestep_scale_multiplier``, one
  sinusoidal→MLP time embedder per conditioned block feeding per-resnet
  ``scale_shift_table`` AdaLN tables (4·C: shift/scale around both norms),
  plus a decoder-level table (2·C) at ``norm_out``;
* **optional decoder noise injection** (``per_channel_scale1/2``): learned
  per-channel amplitudes over fresh spatial noise after each conv.

Top-level time-embedder Linear spellings are best-effort pending real
checkpoints (same policy as ``ltx2_transformer_key_map``); the block/resnet/
conv topology above is pinned by the public LTX-Video design. Latent
normalization: ``z̃ = (z − mean)/std · scaling_factor`` (the reference
decodes with ``latents · std / scaling_factor + mean``,
``ltx2_t2av.py:532-535``).

Public API mirrors :class:`..wan.video_vae.VideoVAE`: videos (B, C, T, H, W)
float in [-1, 1]; latents channel-last (B, Tl, hl, wl, Cz).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LTXVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    #: encoder stage widths; stage i runs at block_out_channels[i] and its
    #: trailing conv_out resnet widens to block_out_channels[i+1]
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    decoder_block_out_channels: Tuple[int, ...] = (512, 512, 256, 128)
    #: per-stage resnet counts; the LAST entry is the encoder mid block
    layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)
    #: per-stage resnet counts; the FIRST entry is the decoder mid block
    decoder_layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)
    #: True → the stage ends in a stride-(2,2,2) causal conv downsampler
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, False)
    decoder_spatio_temporal_scaling: Tuple[bool, ...] = (False, True, True, True)
    #: decoder-only: fresh-noise injection after each conv, per stage
    decoder_inject_noise: Tuple[bool, ...] = (False, False, False, False)
    #: decoder-only: residual input-repeat path inside the upsampler
    upsample_residual: Tuple[bool, ...] = (False, False, False, False)
    #: decoder-only: channel scale applied by the upsampler (out = in·f/8)
    upsample_factor: Tuple[int, ...] = (1, 1, 1, 1)
    timestep_conditioning: bool = False
    patch_size: int = 4
    patch_size_t: int = 1
    resnet_norm_eps: float = 1e-8
    scaling_factor: float = 1.0
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None
    encoder_causal: bool = True
    decoder_causal: bool = False
    dtype: str = "float32"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def spatial_down(self) -> int:
        return self.patch_size * 2 ** sum(self.spatio_temporal_scaling)

    @property
    def temporal_down(self) -> int:
        return self.patch_size_t * 2 ** sum(self.spatio_temporal_scaling)

    @staticmethod
    def ltx2(**o) -> "LTXVideoVAEConfig":
        """LTX-2 geometry: 32× spatial (4 patch × 3 conv), 8× temporal,
        128-ch latents, timestep-conditioned decoder."""
        base = dict(timestep_conditioning=True)
        base.update(o)
        return LTXVideoVAEConfig(**base)

    @staticmethod
    def tiny(**o) -> "LTXVideoVAEConfig":
        base = dict(
            latent_channels=16,
            block_out_channels=(8, 16),
            decoder_block_out_channels=(16, 8),
            layers_per_block=(1, 1, 1),
            decoder_layers_per_block=(1, 1, 1),
            spatio_temporal_scaling=(True, False),
            decoder_spatio_temporal_scaling=(False, True),
            decoder_inject_noise=(False, False),
            upsample_residual=(False, False),
            upsample_factor=(1, 1),
            timestep_conditioning=True,
            patch_size=2,
        )
        base.update(o)
        return LTXVideoVAEConfig(**base)


class LTXCausalConv3d(nn.Module):
    """Conv3d, SAME zero pad in space, REPLICATE pad in time.

    ``causal=True`` puts all temporal padding on the LEFT (copies of the
    first frame); ``causal=False`` splits it symmetrically — the upstream
    default decoder mode.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    causal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        kt, kh, kw = self.kernel
        if kt > 1:
            pads = (kt - 1, 0) if self.causal else ((kt - 1) // 2, kt // 2)
            x = jnp.pad(x, ((0, 0), pads, (0, 0), (0, 0), (0, 0)), mode="edge")
        return nn.Conv(
            self.features, self.kernel, strides=self.stride,
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=self.dtype, name="conv",
        )(x)


def _rms(x: jax.Array, eps: float) -> jax.Array:
    """Parameter-free channel RMS norm (upstream ``elementwise_affine=False``)."""
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


class LTXTimeEmbedder(nn.Module):
    """Sinusoidal(256) → Dense → SiLU → Dense (upstream PixArt-α combined
    timestep embedder; Linear spellings best-effort, see module docstring)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):  # (B,) scaled timesteps
        half = 128
        freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        ang = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb.astype(self.dtype))
        h = nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(h)


class LTXResnetBlock(nn.Module):
    """norm1 → [AdaLN] → SiLU → conv1 → [noise] → norm2 → [AdaLN] → SiLU →
    conv2 → [noise], plus 1×1×1 ``conv_shortcut`` when the width changes.
    Norms carry no parameters; conditioning runs through a per-block
    ``scale_shift_table`` added to the stage's time embedding."""

    out_channels: int
    eps: float
    causal: bool = True
    conditioned: bool = False
    inject_noise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, noise_key=None):
        dt = self.dtype
        C = x.shape[-1]
        shift1 = scale1 = shift2 = scale2 = None
        if self.conditioned and temb is not None:
            # temb (B, 4·C); conditioned blocks keep in == out upstream
            table = self.param(
                "scale_shift_table",
                lambda k, s: jax.random.normal(k, s, jnp.float32) / s[-1] ** 0.5,
                (4, C))
            parts = temb.reshape(temb.shape[0], 4, C) + table[None]
            parts = parts[:, :, None, None, None, :]  # (B,4,1,1,1,C)
            shift1, scale1, shift2, scale2 = (parts[:, i] for i in range(4))

        h = _rms(x, self.eps)
        if scale1 is not None:
            h = h * (1.0 + scale1) + shift1
        h = nn.silu(h.astype(jnp.float32)).astype(dt)
        h = LTXCausalConv3d(self.out_channels, causal=self.causal, dtype=dt,
                            name="conv1")(h)
        if self.inject_noise:
            amp1 = self.param("per_channel_scale1", nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            if noise_key is not None:
                k1, noise_key = jax.random.split(noise_key)
                sp = jax.random.normal(k1, h.shape[2:4], h.dtype)  # (H, W)
                h = h + sp[None, None, :, :, None] * amp1
        h = _rms(h, self.eps)
        if scale2 is not None:
            h = h * (1.0 + scale2) + shift2
        h = nn.silu(h.astype(jnp.float32)).astype(dt)
        h = LTXCausalConv3d(self.out_channels, causal=self.causal, dtype=dt,
                            name="conv2")(h)
        if self.inject_noise:
            amp2 = self.param("per_channel_scale2", nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            if noise_key is not None:
                sp = jax.random.normal(noise_key, h.shape[2:4], h.dtype)
                h = h + sp[None, None, :, :, None] * amp2
        if C != self.out_channels:
            x = LTXCausalConv3d(self.out_channels, kernel=(1, 1, 1),
                                causal=self.causal, dtype=dt,
                                name="conv_shortcut")(x)
        return x + h


class LTXMidBlock(nn.Module):
    """Residual stack (no attention); owns a 4·C time embedder when the
    decoder is timestep-conditioned."""

    num_layers: int
    eps: float
    causal: bool = True
    conditioned: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_scaled=None, noise_key=None):
        temb = None
        if self.conditioned and t_scaled is not None:
            temb = LTXTimeEmbedder(4 * x.shape[-1], dtype=self.dtype,
                                   name="time_embedder")(t_scaled)
        for j in range(self.num_layers):
            x = LTXResnetBlock(x.shape[-1], self.eps, causal=self.causal,
                               conditioned=self.conditioned, dtype=self.dtype,
                               name=f"resnets_{j}")(x, temb)
        return x


class LTXDownBlock(nn.Module):
    """resnets (at in width) → optional stride-(2,2,2) downsampler →
    ``conv_out`` resnet carrying the channel change."""

    out_channels: int
    num_layers: int
    scale: bool
    eps: float
    causal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        for j in range(self.num_layers):
            x = LTXResnetBlock(C, self.eps, causal=self.causal,
                               dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.scale:
            x = LTXCausalConv3d(C, stride=(2, 2, 2), causal=self.causal,
                                dtype=self.dtype, name="downsampler")(x)
        if C != self.out_channels:
            x = LTXResnetBlock(self.out_channels, self.eps, causal=self.causal,
                               dtype=self.dtype, name="conv_out")(x)
        return x


class LTXUpsampler(nn.Module):
    """Causal conv to ``out·8`` channels then depth-to-space over (t, h, w);
    the leading duplicated frame drops to keep the 1+(T−1)·2 convention.
    ``residual=True`` adds a parameter-free input-repeat shuffle path."""

    out_channels: int
    residual: bool = False
    causal: bool = True
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _shuffle(x, out_ch):
        B, T, H, W, _ = x.shape
        x = x.reshape(B, T, H, W, 2, 2, 2, out_ch)
        x = jnp.einsum("bthwpqrc->btphqwrc", x).reshape(
            B, 2 * T, 2 * H, 2 * W, out_ch)
        return x[:, 1:]  # first latent frame decodes to ONE frame

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = LTXCausalConv3d(8 * self.out_channels, causal=self.causal,
                            dtype=self.dtype, name="conv")(x)
        h = self._shuffle(h, self.out_channels)
        if self.residual:
            r = jnp.repeat(x, (8 * self.out_channels) // C, axis=-1)
            h = h + self._shuffle(r, self.out_channels)
        return h


class LTXUpBlock(nn.Module):
    """``conv_in`` resnet (channel change) → upsampler → resnets; owns a
    4·C time embedder when conditioned."""

    out_channels: int
    num_layers: int
    scale: bool
    eps: float
    causal: bool = True
    conditioned: bool = False
    inject_noise: bool = False
    residual: bool = False
    factor: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_scaled=None, noise_key=None):
        # upsample_factor scales the channel change into the upsampler:
        # conv_in targets out·f so the shuffle lands at out (·8/8)
        mid_ch = self.out_channels * self.factor if self.scale else self.out_channels
        if x.shape[-1] != mid_ch:
            x = LTXResnetBlock(mid_ch, self.eps, causal=self.causal,
                               dtype=self.dtype, name="conv_in")(x)
        temb = None
        if self.conditioned and t_scaled is not None:
            temb = LTXTimeEmbedder(4 * self.out_channels, dtype=self.dtype,
                                   name="time_embedder")(t_scaled)
        if self.scale:
            x = LTXUpsampler(self.out_channels, residual=self.residual,
                             causal=self.causal, dtype=self.dtype,
                             name="upsampler")(x)
        for j in range(self.num_layers):
            if noise_key is not None:
                nk, noise_key = jax.random.split(noise_key)
            else:
                nk = None
            x = LTXResnetBlock(self.out_channels, self.eps, causal=self.causal,
                               conditioned=self.conditioned,
                               inject_noise=self.inject_noise, dtype=self.dtype,
                               name=f"resnets_{j}")(x, temb, noise_key=nk)
        return x


class LTXVideoEncoder(nn.Module):
    cfg: LTXVideoVAEConfig

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C·p²) patchified pixels
        cfg = self.cfg
        dt = cfg.compute_dtype
        blocks = cfg.block_out_channels
        h = LTXCausalConv3d(blocks[0], causal=cfg.encoder_causal, dtype=dt,
                            name="conv_in")(x)
        for i in range(len(blocks)):
            out_ch = blocks[i + 1] if i + 1 < len(blocks) else blocks[i]
            h = LTXDownBlock(out_ch, cfg.layers_per_block[i],
                             cfg.spatio_temporal_scaling[i],
                             cfg.resnet_norm_eps, causal=cfg.encoder_causal,
                             dtype=dt, name=f"down_blocks_{i}")(h)
        h = LTXMidBlock(cfg.layers_per_block[-1], cfg.resnet_norm_eps,
                        causal=cfg.encoder_causal, dtype=dt, name="mid_block")(h)
        h = _rms(h, cfg.resnet_norm_eps)
        h = nn.silu(h.astype(jnp.float32)).astype(dt)
        # shared-logvar head: latent_channels + ONE log-variance channel
        return LTXCausalConv3d(cfg.latent_channels + 1, causal=cfg.encoder_causal,
                               dtype=jnp.float32, name="conv_out")(h)


class LTXVideoDecoder(nn.Module):
    cfg: LTXVideoVAEConfig

    @nn.compact
    def __call__(self, z, timestep=None, noise_key=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        blocks = cfg.decoder_block_out_channels
        cond = cfg.timestep_conditioning
        t_scaled = None
        if cond:
            tsm = self.param("timestep_scale_multiplier",
                             nn.initializers.constant(1000.0), (), jnp.float32)
            if timestep is None:
                timestep = jnp.zeros((z.shape[0],), jnp.float32)
            t_scaled = timestep.astype(jnp.float32) * tsm

        h = LTXCausalConv3d(blocks[0], causal=cfg.decoder_causal, dtype=dt,
                            name="conv_in")(z)
        h = LTXMidBlock(cfg.decoder_layers_per_block[0], cfg.resnet_norm_eps,
                        causal=cfg.decoder_causal, conditioned=cond, dtype=dt,
                        name="mid_block")(h, t_scaled)
        for i in range(len(blocks)):
            out_ch = blocks[i + 1] if i + 1 < len(blocks) else blocks[i]
            if noise_key is not None:
                nk, noise_key = jax.random.split(noise_key)
            else:
                nk = None
            h = LTXUpBlock(out_ch, cfg.decoder_layers_per_block[i + 1]
                           if i + 1 < len(cfg.decoder_layers_per_block)
                           else cfg.decoder_layers_per_block[-1],
                           cfg.decoder_spatio_temporal_scaling[i],
                           cfg.resnet_norm_eps, causal=cfg.decoder_causal,
                           conditioned=cond,
                           inject_noise=cfg.decoder_inject_noise[i],
                           residual=cfg.upsample_residual[i],
                           factor=cfg.upsample_factor[i],
                           dtype=dt, name=f"up_blocks_{i}")(h, t_scaled, nk)
        h = _rms(h, cfg.resnet_norm_eps)
        if cond:
            table = self.param(
                "scale_shift_table",
                lambda k, s: jax.random.normal(k, s, jnp.float32) / s[-1] ** 0.5,
                (2, h.shape[-1]))
            temb = LTXTimeEmbedder(2 * h.shape[-1], dtype=dt,
                                   name="time_embedder")(t_scaled)
            parts = temb.reshape(temb.shape[0], 2, h.shape[-1]) + table[None]
            shift, scale = (parts[:, i, None, None, None, :] for i in range(2))
            h = h * (1.0 + scale) + shift
        h = nn.silu(h.astype(jnp.float32))
        return LTXCausalConv3d(cfg.out_channels * cfg.patch_size ** 2,
                               causal=cfg.decoder_causal, dtype=jnp.float32,
                               name="conv_out")(h)


class LTXVideoVAE(nn.Module):
    """Public API: videos (B, C, T, H, W) in [-1, 1]; latents (B, Tl, hl, wl, Cz)."""

    cfg: LTXVideoVAEConfig

    def setup(self):
        self.encoder = LTXVideoEncoder(self.cfg)
        self.decoder = LTXVideoDecoder(self.cfg)

    # -- latent normalization (reference ltx2_t2av.py:532-535) ---------------
    def _normalize(self, z):
        cfg = self.cfg
        if cfg.latents_mean is not None:
            z = (z - jnp.asarray(cfg.latents_mean, z.dtype)) / jnp.asarray(
                cfg.latents_std, z.dtype)
        return z * cfg.scaling_factor

    def _denormalize(self, z):
        cfg = self.cfg
        z = z / cfg.scaling_factor
        if cfg.latents_mean is not None:
            z = z * jnp.asarray(cfg.latents_std, z.dtype) + jnp.asarray(
                cfg.latents_mean, z.dtype)
        return z

    def _patchify(self, x):
        p = self.cfg.patch_size
        if p == 1:
            return x
        B, T, H, W, C = x.shape
        x = x.reshape(B, T, H // p, p, W // p, p, C)
        # channel order (c, ph, pw): matches the upstream permute+flatten so
        # conv_in kernels import without reordering
        x = jnp.einsum("bthpwqc->bthwcpq", x)
        return x.reshape(B, T, H // p, W // p, C * p * p)

    def _unpatchify(self, x):
        p = self.cfg.patch_size
        if p == 1:
            return x
        B, T, H, W, C = x.shape
        x = x.reshape(B, T, H, W, C // (p * p), p, p)
        return jnp.einsum("bthwcpq->bthpwqc", x).reshape(
            B, T, H * p, W * p, C // (p * p))

    def encode(
        self, videos: jax.Array, key: Optional[jax.Array] = None, sample: bool = False
    ) -> jax.Array:
        x = jnp.transpose(videos, (0, 2, 3, 4, 1))  # → (B, T, H, W, C)
        y = self.encoder(self._patchify(x))
        C = self.cfg.latent_channels
        mean, logvar = y[..., :C], y[..., C:C + 1]  # shared log-variance
        z = mean
        if sample:
            if key is None:
                raise ValueError("key required when sample=True")
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                key, mean.shape, mean.dtype)
        return self._normalize(z)

    def decode(
        self,
        latents: jax.Array,
        num_frames: Optional[int] = None,
        timestep: Optional[jax.Array] = None,
        noise_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Latents → videos (B, C, T, H, W); T = 1 + (Tl−1)·temporal_down.

        ``timestep`` is the reference's ``decode_timestep`` (B,) — consumed
        only when the config enables ``timestep_conditioning`` (zeros
        otherwise, matching the reference default of 0.0)."""
        z = self._denormalize(latents)
        if timestep is not None:
            timestep = jnp.atleast_1d(jnp.asarray(timestep, jnp.float32))
        video = self._unpatchify(self.decoder(z, timestep, noise_key))
        if num_frames is not None and video.shape[1] > num_frames:
            video = video[:, -num_frames:]
        return jnp.transpose(video, (0, 4, 1, 2, 3))

    def __call__(self, videos: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return self.decode(self.encode(videos, key=key, sample=key is not None))
