"""AutoencoderKL (image VAE) in flax.linen — channel-last, XLA-fused.

TPU-native equivalent of the diffusers ``AutoencoderKL`` the reference uses
for ``encode_image`` / ``decode_latents`` (``src/flow_factory/models/abc.py``
consumes it via the wrapped pipeline). Convs run channel-last (NHWC) which is
the native TPU layout; the public API takes/returns NCHW to match the sample
canonical form and the safetensors weight layout.

Used by SD3.5 (16-ch latents, scale 1.5305 / shift 0.0609) and FLUX families;
video VAEs (Wan/LTX) get their own module.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609
    use_mid_attention: bool = True
    dtype: str = "float32"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)

    @staticmethod
    def sd3(**overrides) -> "VAEConfig":
        return VAEConfig(**overrides)

    @staticmethod
    def tiny(**overrides) -> "VAEConfig":
        base = dict(base_channels=16, channel_mults=(1, 2), layers_per_block=1, latent_channels=16)
        base.update(overrides)
        return VAEConfig(**base)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(32, C), dtype=jnp.float32, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        s = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * (C**-0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", p, v)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Conv(cfg.base_channels, (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        for i, mult in enumerate(cfg.channel_mults):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, dtype=dt, name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.channel_mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)), dtype=dt, name=f"down_{i}_conv")(h)
        h = ResnetBlock(h.shape[-1], dtype=dt, name="mid_res_1")(h)
        if cfg.use_mid_attention:
            h = AttnBlock(dtype=dt, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=dt, name="mid_res_2")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        mults = tuple(reversed(cfg.channel_mults))
        h = nn.Conv(cfg.base_channels * mults[0], (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], dtype=dt, name="mid_res_1")(h)
        if cfg.use_mid_attention:
            h = AttnBlock(dtype=dt, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=dt, name="mid_res_2")(h)
        for i, mult in enumerate(mults):
            ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, dtype=dt, name=f"up_{i}_res_{j}")(h)
            if i < len(mults) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name=f"up_{i}_conv")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL image autoencoder. Public API is NCHW in [-1, 1] images / latents."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode_moments(self, images_nchw: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Images (B,C,H,W) in [-1,1] → (mean, logvar) each (B,Cz,h,w)."""
        x = jnp.transpose(images_nchw, (0, 2, 3, 1))
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        to_nchw = lambda t: jnp.transpose(t, (0, 3, 1, 2))
        return to_nchw(mean), to_nchw(jnp.clip(logvar, -30.0, 20.0))

    def encode(
        self, images_nchw: jax.Array, key: Optional[jax.Array] = None, sample: bool = True
    ) -> jax.Array:
        """Images → scaled latents (applies scaling/shift factors)."""
        mean, logvar = self.encode_moments(images_nchw)
        z = mean
        if sample:
            if key is None:
                raise ValueError("key required when sample=True")
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return (z - self.cfg.shift_factor) * self.cfg.scaling_factor

    def decode(self, latents_nchw: jax.Array) -> jax.Array:
        """Scaled latents → images (B,C,H,W) in [-1,1]."""
        z = latents_nchw / self.cfg.scaling_factor + self.cfg.shift_factor
        z = jnp.transpose(z, (0, 2, 3, 1))
        img = self.decoder(z)
        return jnp.transpose(img, (0, 3, 1, 2))

    def __call__(self, images_nchw: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return self.decode(self.encode(images_nchw, key=key, sample=key is not None))
