"""Audio / audio-visual rewards: CLAP and ImageBind.

Re-design of the reference audio rewards (``src/flow_factory/rewards/
clap.py``, ``imagebind_reward.py:71-340``). Host-side torch scorers:

* CLAP — text↔audio cosine similarity (LAION-CLAP via transformers).
* ImageBind — audio+video+text tri-modal similarity; requires the
  imagebind package + checkpoint locally.

Both take canonical waveforms (C, T) float32 [-1, 1] from the sample layer
(``use_tensor_inputs`` in the reference; here everything already is arrays).
"""
from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np

from .abc import PointwiseRewardModel

logger = logging.getLogger(__name__)


class CLAPReward(PointwiseRewardModel):
    required_fields = ("audio", "prompt", "audio_sample_rate")

    def setup(self) -> None:
        import torch
        from transformers import ClapModel, ClapProcessor

        path = self.args.model_name_or_path
        if not path:
            raise ValueError("CLAPReward needs model_name_or_path (local CLAP weights, e.g. laion/clap-htsat-unfused snapshot)")
        self._torch = torch
        self.processor = ClapProcessor.from_pretrained(path)
        self.model = ClapModel.from_pretrained(path).eval()

    def compute_reward(self, audio: Sequence[np.ndarray], prompt: Sequence[str],
                       audio_sample_rate: Optional[Sequence[int]] = None, **_) -> np.ndarray:
        torch = self._torch
        sr = int(audio_sample_rate[0]) if audio_sample_rate else 48000
        waves = [np.asarray(a, np.float32).mean(axis=0) for a in audio]  # mono
        inputs = self.processor(
            audios=waves, text=list(prompt), sampling_rate=sr,
            return_tensors="pt", padding=True,
        )
        with torch.no_grad():
            out = self.model(**inputs)
            a = out.audio_embeds / out.audio_embeds.norm(dim=-1, keepdim=True)
            t = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        return (a * t).sum(-1).cpu().numpy().astype(np.float64)


# --- ImageBind input recipe (reference imagebind_reward.py:58-70) ----------
_IB_AUDIO_SAMPLE_RATE = 16_000
_IB_AUDIO_NUM_MEL_BINS = 128
_IB_AUDIO_TARGET_LENGTH = 204
_IB_AUDIO_CLIP_DURATION = 2.0
_IB_AUDIO_CLIPS_PER_SAMPLE = 3
_IB_AUDIO_MEAN = -4.268
_IB_AUDIO_STD = 9.138
_IB_VISION_SIZE = 224
_IB_VISION_MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
_IB_VISION_STD = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)


def compute_clip_starts(duration_s: float, clip_duration: float, num_clips: int):
    """Evenly spaced clip start times (ConstantClipsPerVideoSampler)."""
    if duration_s <= clip_duration:
        return [0.0] * num_clips
    spacing = (duration_s - clip_duration) / max(num_clips - 1, 1)
    return [i * spacing for i in range(num_clips)]


def _resample_linear(wave: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """(T,) mono resample by linear interpolation (host-side, scoring only)."""
    if src_rate == dst_rate:
        return wave
    n_out = int(round(len(wave) * dst_rate / src_rate))
    x_out = np.arange(n_out, dtype=np.float64) * (src_rate / dst_rate)
    return np.interp(x_out, np.arange(len(wave), dtype=np.float64), wave).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def kaldi_fbank(
    wave: np.ndarray,
    sample_rate: int = _IB_AUDIO_SAMPLE_RATE,
    num_mel_bins: int = _IB_AUDIO_NUM_MEL_BINS,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    low_freq: float = 20.0,
) -> np.ndarray:
    """Kaldi-style log-mel filterbank in numpy (→ (num_frames, num_mel_bins)).

    Follows ``torchaudio.compliance.kaldi.fbank(htk_compat=True,
    window_type='hanning', dither=0.0)`` as invoked by the reference
    (``imagebind_reward.py:165-175``): snip-edges framing, per-frame DC
    removal, preemphasis, hanning window, power spectrum, HTK-mel triangular
    filterbank, natural log with kaldi's eps floor.
    """
    wave = np.asarray(wave, np.float64)
    frame_len = int(sample_rate * frame_length_ms / 1000.0)
    shift = int(sample_rate * frame_shift_ms / 1000.0)
    if len(wave) < frame_len:
        wave = np.pad(wave, (0, frame_len - len(wave)))
    num_frames = 1 + (len(wave) - frame_len) // shift
    idx = np.arange(frame_len)[None, :] + shift * np.arange(num_frames)[:, None]
    frames = wave[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)  # remove_dc_offset
    # kaldi preemphasis uses x[i] - a*x[i-1] with reflected first sample
    first = frames[:, :1]
    frames = frames - preemphasis * np.concatenate([first, frames[:, :-1]], axis=1)
    frames = frames * np.hanning(frame_len)[None, :]
    n_fft = 1 << (frame_len - 1).bit_length()  # round_to_power_of_two
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    # HTK-mel triangular filters over FFT bins
    high_freq = sample_rate / 2.0
    mel_pts = np.linspace(
        _hz_to_mel_htk(low_freq), _hz_to_mel_htk(high_freq), num_mel_bins + 2
    )
    hz_pts = _mel_to_hz_htk(mel_pts)
    bin_freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fbank = np.zeros((num_mel_bins, len(bin_freqs)))
    for m in range(num_mel_bins):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_freqs - lo) / (ctr - lo)
        down = (hi - bin_freqs) / (hi - ctr)
        fbank[m] = np.maximum(0.0, np.minimum(up, down))
    mel = spec @ fbank.T
    return np.log(np.maximum(mel, 1.1920928955078125e-07)).astype(np.float32)


def audio_to_melspec(
    wave: np.ndarray, src_rate: int
) -> np.ndarray:
    """(C, T) waveform → (clips=3, 1, 128, 204) normalized mel clips
    (reference ``_preprocess_audio_to_melspec``, imagebind_reward.py:99-148)."""
    wave = np.asarray(wave, np.float32)
    if wave.ndim == 2:
        wave = wave.mean(axis=0)
    wave = _resample_linear(wave, int(src_rate), _IB_AUDIO_SAMPLE_RATE)
    samples_per_clip = int(_IB_AUDIO_CLIP_DURATION * _IB_AUDIO_SAMPLE_RATE)
    duration_s = len(wave) / _IB_AUDIO_SAMPLE_RATE
    clips = []
    for start_s in compute_clip_starts(
        duration_s, _IB_AUDIO_CLIP_DURATION, _IB_AUDIO_CLIPS_PER_SAMPLE
    ):
        start = int(start_s * _IB_AUDIO_SAMPLE_RATE)
        clip = wave[start : start + samples_per_clip]
        if len(clip) < samples_per_clip:
            clip = np.pad(clip, (0, samples_per_clip - len(clip)))
        mel = kaldi_fbank(clip).T  # (128, num_frames)
        n = mel.shape[1]
        if n < _IB_AUDIO_TARGET_LENGTH:
            mel = np.pad(mel, ((0, 0), (0, _IB_AUDIO_TARGET_LENGTH - n)))
        else:
            mel = mel[:, :_IB_AUDIO_TARGET_LENGTH]
        clips.append(((mel - _IB_AUDIO_MEAN) / _IB_AUDIO_STD)[None])  # (1,128,204)
    return np.stack(clips, axis=0).astype(np.float32)


def _resize_short_side(clip: np.ndarray, size: int) -> np.ndarray:
    """(C, T, H, W) bilinear resize so min(H', W') == size."""
    C, T, H, W = clip.shape
    if W <= H:
        new_w, new_h = size, int(H / W * size)
    else:
        new_w, new_h = int(W / H * size), size
    ys = (np.arange(new_h) + 0.5) * H / new_h - 0.5
    xs = (np.arange(new_w) + 0.5) * W / new_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, None, :, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, None, :]
    a = clip[:, :, y0][:, :, :, x0]
    b = clip[:, :, y0][:, :, :, x1]
    c = clip[:, :, y1][:, :, :, x0]
    d = clip[:, :, y1][:, :, :, x1]
    return ((a * (1 - wx) + b * wx) * (1 - wy) + (c * (1 - wx) + d * wx) * wy).astype(
        np.float32
    )


def video_to_clips(video: np.ndarray) -> np.ndarray:
    """(T, C, H, W) frames → (15, C, 2, 224, 224): 5 temporal clips × 2
    frames, short-side-224 resize, CLIP normalization, 3 spatial crops
    (reference ``_preprocess_video``, imagebind_reward.py:196-219)."""
    video = np.asarray(video)
    if video.dtype == np.uint8:
        video = video.astype(np.float32) / 255.0
    video = video.astype(np.float32)
    T = video.shape[0]
    num_clips, fpc = 5, 2
    all_crops = []
    for i in range(num_clips):
        center = int((i + 0.5) * T / num_clips)
        indices = np.linspace(
            max(0, center - fpc // 2), min(T - 1, center + fpc // 2 - 1), fpc
        ).astype(int)
        clip = video[indices].transpose(1, 0, 2, 3)  # (C, fpc, H, W)
        clip = _resize_short_side(clip, _IB_VISION_SIZE)
        clip = (clip - _IB_VISION_MEAN[:, None, None, None]) / _IB_VISION_STD[
            :, None, None, None
        ]
        C, Tc, H, W = clip.shape
        if H > W:
            offsets = [0, (H - _IB_VISION_SIZE) // 2, H - _IB_VISION_SIZE]
            crops = [clip[:, :, y : y + _IB_VISION_SIZE, :] for y in offsets]
        else:
            offsets = [0, (W - _IB_VISION_SIZE) // 2, W - _IB_VISION_SIZE]
            crops = [clip[:, :, :, x : x + _IB_VISION_SIZE] for x in offsets]
        all_crops.extend(crops)
    return np.stack(all_crops, axis=0).astype(np.float32)


def mode_similarity(
    embeddings: dict, mode: str, weights: Optional[dict] = None
) -> np.ndarray:
    """Per-sample cosine similarity by mode (reference ``_compute_similarity``)."""

    def cos(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return (a * b).sum(-1)

    if mode == "audio_video":
        return cos(embeddings["audio"], embeddings["vision"])
    if mode == "text_audio":
        return cos(embeddings["text"], embeddings["audio"])
    if mode == "text_video":
        return cos(embeddings["text"], embeddings["vision"])
    if mode == "all":
        w = weights or {"audio_video": 0.5, "text_audio": 0.25, "text_video": 0.25}
        return (
            w["audio_video"] * cos(embeddings["audio"], embeddings["vision"])
            + w["text_audio"] * cos(embeddings["text"], embeddings["audio"])
            + w["text_video"] * cos(embeddings["text"], embeddings["vision"])
        )
    raise ValueError(
        f"Unknown ImageBind mode {mode!r}; expected audio_video|text_audio|text_video|all"
    )


class ImageBindReward(PointwiseRewardModel):
    """Audio-video semantic alignment via Meta ImageBind.

    Modes (``extra_kwargs['mode']``, reference imagebind_reward.py:71-96):
      * ``audio_video`` (default) — cos(audio, video)
      * ``text_audio`` / ``text_video``
      * ``all`` — weighted sum of all three pairs

    All preprocessing (16 kHz mono → 3×2 s kaldi-fbank mel clips; 5 temporal
    clips × 3 spatial crops of CLIP-normalized 224px frames) is numpy
    host-side — only the ImageBind trunk itself needs the optional
    ``imagebind`` package (CC-BY-NC-SA: non-commercial use only).
    """

    required_fields = ("video", "audio", "prompt", "audio_sample_rate")

    def __init__(self, reward_args):
        super().__init__(reward_args)
        extra = getattr(reward_args, "extra_kwargs", None) or {}
        self.mode = extra.get("mode", "audio_video")
        self.weights = extra.get(
            "weights", {"audio_video": 0.5, "text_audio": 0.25, "text_video": 0.25}
        )

    def setup(self) -> None:
        try:
            import torch
            from imagebind import data as ib_data  # optional dep
            from imagebind.models import imagebind_model
        except Exception as e:
            raise RuntimeError(
                "ImageBindReward needs the `imagebind` package + checkpoint "
                f"(install facebookresearch/ImageBind): {e}"
            )
        logger.warning(
            "ImageBind is CC-BY-NC-SA 4.0 (NonCommercial); commercial use may "
            "violate the license."
        )
        self._torch = torch
        self._ib_data = ib_data
        self.model = imagebind_model.imagebind_huge(pretrained=True).eval()

    def _embed(self, inputs: dict) -> dict:
        """numpy inputs → numpy embeddings through the torch trunk."""
        torch = self._torch
        t_inputs = {k: torch.from_numpy(v) for k, v in inputs.items() if not isinstance(v, torch.Tensor)}
        t_inputs.update({k: v for k, v in inputs.items() if isinstance(v, torch.Tensor)})
        with torch.no_grad():
            emb = self.model(t_inputs)
        return {k: v.float().cpu().numpy() for k, v in emb.items()}

    def compute_reward(self, video, audio, prompt, audio_sample_rate=None, **_) -> np.ndarray:
        sr = int(audio_sample_rate[0]) if audio_sample_rate else _IB_AUDIO_SAMPLE_RATE
        need_text = self.mode in ("text_audio", "text_video", "all")
        need_audio = self.mode in ("audio_video", "text_audio", "all")
        need_video = self.mode in ("audio_video", "text_video", "all")

        inputs = {}
        if need_text:
            inputs["text"] = self._ib_data.load_and_transform_text(list(prompt), "cpu")
        if need_audio:
            inputs["audio"] = np.stack([audio_to_melspec(a, sr) for a in audio])
        if need_video:
            vids = []
            for v in video:
                v = np.asarray(v)
                if v.ndim == 4 and v.shape[-1] in (1, 3):  # (T,H,W,C) → (T,C,H,W)
                    v = v.transpose(0, 3, 1, 2)
                vids.append(video_to_clips(v))
            inputs["vision"] = np.stack(vids)
        emb = self._embed(inputs)
        return mode_similarity(emb, self.mode, self.weights).astype(np.float64)
