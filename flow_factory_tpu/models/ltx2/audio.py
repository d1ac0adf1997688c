"""Audio latent stack: mel VAE + vocoder (LTX-2 audio path).

TPU-native analog of the reference LTX-2 audio decode chain
(``src/flow_factory/models/ltx2/ltx2_t2av.py:494-594``: audio VAE → mel →
vocoder). All compute is jnp (XLA-fused): STFT via framed matmul against a
DFT basis (MXU-friendly — no custom FFT op needed at mel sizes), conv
encoder/decoder over mel frames, and a transposed-conv vocoder stand-in
producing waveforms.

Canonical audio: (B, C=1, T) float32 in [-1, 1]; latents (B, Tl, Cz).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AudioVAEConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    hop: int = 256
    n_mels: int = 80
    latent_channels: int = 8
    base_channels: int = 32
    temporal_down: int = 4  # mel frames per latent frame
    #: HiFi-GAN generator width/MRF geometry (upstream defaults)
    vocoder_channels: int = 512
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: str = "float32"

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)

    @staticmethod
    def ltx2(**o) -> "AudioVAEConfig":
        return AudioVAEConfig(**o)

    @staticmethod
    def tiny(**o) -> "AudioVAEConfig":
        base = dict(n_fft=256, hop=64, n_mels=16, latent_channels=8, base_channels=8,
                    temporal_down=2, vocoder_channels=16,
                    resblock_kernels=(3,), resblock_dilations=(1, 3))
        base.update(o)
        return AudioVAEConfig(**base)


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-style mel filterbank (host-side constant)."""
    fmin, fmax = 0.0, sr / 2
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    mels = np.linspace(mel(fmin), mel(fmax), n_mels + 2)
    freqs = imel(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, ce, hi = bins[i], bins[i + 1], bins[i + 2]
        if ce > lo:
            fb[i, lo:ce] = (np.arange(lo, ce) - lo) / max(ce - lo, 1)
        if hi > ce:
            fb[i, ce:hi] = (hi - np.arange(ce, hi)) / max(hi - ce, 1)
    return fb


def waveform_to_mel(wave: jax.Array, cfg: AudioVAEConfig) -> jax.Array:
    """(B, T) waveform → (B, frames, n_mels) log-mel via framed DFT matmul."""
    n_fft, hop = cfg.n_fft, cfg.hop
    B, T = wave.shape
    n_frames = max(1, (T - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = wave[:, idx]  # (B, frames, n_fft)
    window = jnp.hanning(n_fft).astype(jnp.float32)
    frames = frames * window
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    angles = -2.0 * np.pi * np.outer(n, k) / n_fft
    dft_re = jnp.asarray(np.cos(angles), jnp.float32)  # (n_fft, bins)
    dft_im = jnp.asarray(np.sin(angles), jnp.float32)
    re = frames @ dft_re
    im = frames @ dft_im
    power = re * re + im * im  # (B, frames, bins)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, n_fft, cfg.n_mels))  # (mels, bins)
    mel = power @ fb.T
    return jnp.log(jnp.maximum(mel, 1e-5))


class AudioEncoder(nn.Module):
    cfg: AudioVAEConfig

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """(B, frames, n_mels) → (B, Tl, 2*latent_channels) moments."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Conv(cfg.base_channels, (5,), padding=2, dtype=dt, name="conv_in")(mel.astype(dt))
        down = {1: 0, 2: 1, 4: 2}[cfg.temporal_down]
        for i in range(down):
            h = nn.silu(h)
            h = nn.Conv(cfg.base_channels * 2, (4,), strides=(2,), padding=1, dtype=dt, name=f"down_{i}")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3,), padding=1, dtype=jnp.float32, name="conv_out")(h)


class AudioDecoder(nn.Module):
    cfg: AudioVAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        """(B, Tl, Cz) → (B, frames, n_mels) mel."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Conv(cfg.base_channels * 2, (3,), padding=1, dtype=dt, name="conv_in")(z.astype(dt))
        down = {1: 0, 2: 1, 4: 2}[cfg.temporal_down]
        for i in range(down):
            h = nn.silu(h)
            h = nn.ConvTranspose(cfg.base_channels, (4,), strides=(2,), padding="SAME", dtype=dt, name=f"up_{i}")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.n_mels, (5,), padding=2, dtype=jnp.float32, name="conv_out")(h)


def vocoder_upsample_rates(hop: int) -> tuple:
    """Factor the hop length into HiFi-GAN upsample stages (largest first):
    256 → (8, 8, 2, 2) — the published HiFi-GAN/universal-vocoder rates."""
    known = {512: (8, 8, 2, 2, 2), 256: (8, 8, 2, 2), 128: (8, 8, 2), 64: (8, 8)}
    if hop in known:
        return known[hop]
    rates = []
    rem = hop
    while rem > 1:
        f = 8 if rem % 8 == 0 else (4 if rem % 4 == 0 else 2)
        rates.append(f)
        rem //= f
    return tuple(rates)


class HiFiGANResBlock(nn.Module):
    """HiFi-GAN MRF ResBlock1: per dilation, LReLU→dilated conv→LReLU→conv
    with a residual add (upstream ``ResBlock1.convs1/convs2``)."""

    channels: int
    kernel: int
    dilations: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, 0.1)
            xt = nn.Conv(self.channels, (self.kernel,), kernel_dilation=(d,),
                         padding="SAME", dtype=self.dtype, name=f"convs1_{j}")(xt)
            xt = jax.nn.leaky_relu(xt, 0.1)
            xt = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                         dtype=self.dtype, name=f"convs2_{j}")(xt)
            x = x + xt
        return x


class Vocoder(nn.Module):
    """Mel → waveform: the HiFi-GAN generator graph.

    Upstream structure (the public HiFi-GAN ``Generator``; the reference's
    LTX-2 pipeline decodes audio "audio_vae → mel → vocoder",
    ``ltx2_t2av.py:494-594``): ``conv_pre`` (k=7) → per upsample stage a
    LReLU + ConvTranspose (k=2·rate, stride=rate, channels halve) followed
    by a multi-receptive-field fusion — the MEAN of ``len(resblock_kernels)``
    ResBlock1 stacks — then LReLU → ``conv_post`` (k=7) → tanh. Weight-norm
    leaves fuse at import (:func:`...utils.checkpoint.fuse_weight_norm`);
    ConvTranspose flip/layout conventions are pinned by shape (exact
    numerics need real weights, same policy as the transformer maps).
    """

    cfg: AudioVAEConfig

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        rates = vocoder_upsample_rates(cfg.hop)
        ch0 = cfg.vocoder_channels
        h = nn.Conv(ch0, (7,), padding=3, dtype=dt, name="conv_pre")(mel.astype(dt))
        for i, u in enumerate(rates):
            ch = max(ch0 // 2 ** (i + 1), 8)
            h = jax.nn.leaky_relu(h, 0.1)
            h = nn.ConvTranspose(ch, (2 * u,), strides=(u,), padding="SAME",
                                 dtype=dt, name=f"ups_{i}")(h)
            acc = None
            for r, k in enumerate(cfg.resblock_kernels):
                y = HiFiGANResBlock(ch, k, cfg.resblock_dilations, dtype=dt,
                                    name=f"resblocks_{i}_{r}")(h)
                acc = y if acc is None else acc + y
            h = acc / float(len(cfg.resblock_kernels))
        h = jax.nn.leaky_relu(h, 0.01)  # upstream uses the default slope here
        wave = nn.Conv(1, (7,), padding=3, dtype=jnp.float32, name="conv_post")(h)
        return jnp.tanh(wave[..., 0])


class AudioVAE(nn.Module):
    """waveform (B, 1, T) in [-1,1] ↔ latents (B, Tl, Cz)."""

    cfg: AudioVAEConfig

    def setup(self):
        self.encoder = AudioEncoder(self.cfg)
        self.decoder = AudioDecoder(self.cfg)
        self.vocoder = Vocoder(self.cfg)

    def encode(self, wave: jax.Array, key: Optional[jax.Array] = None, sample: bool = False) -> jax.Array:
        mel = waveform_to_mel(wave[:, 0], self.cfg)
        moments = self.encoder(mel)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if sample:
            if key is None:
                raise ValueError("key required when sample=True")
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(key, mean.shape)
        return z

    def decode(self, z: jax.Array) -> jax.Array:
        """Latents → waveform (B, 1, T)."""
        mel = self.decoder(z)
        wave = self.vocoder(mel)
        return wave[:, None, :]

    def __call__(self, wave: jax.Array) -> jax.Array:
        return self.decode(self.encode(wave))
