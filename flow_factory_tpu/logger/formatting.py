"""Logging payload formatting: grids, videos, tables, scalars.

Counterpart of the reference ``logger/formatting.py:213-615``: sample media →
backend-ready payloads. Image grids with captions, mp4 encoding (with muxed
audio when the sample carries a waveform — reference ``:423-491``), I2V/I2I
condition-vs-result tables, and console scalar summarization.
"""
from __future__ import annotations

import logging
import os
import tempfile
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def make_image_grid(
    images: Sequence[np.ndarray],
    captions: Optional[Sequence[str]] = None,
    cols: int = 4,
    pad: int = 2,
) -> np.ndarray:
    """Canonical (C,H,W) images → one (H',W',3) uint8 grid."""
    imgs = [np.transpose(np.asarray(i), (1, 2, 0)) for i in images]
    imgs = [(np.clip(i, 0, 1) * 255).astype(np.uint8) for i in imgs]
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    cols = min(cols, len(imgs))
    rows = -(-len(imgs) // cols)
    grid = np.full((rows * (h + pad) - pad, cols * (w + pad) - pad, 3), 255, np.uint8)
    for idx, img in enumerate(imgs):
        r, c = divmod(idx, cols)
        grid[r * (h + pad): r * (h + pad) + img.shape[0],
             c * (w + pad): c * (w + pad) + img.shape[1]] = img
    return grid


def save_video_mp4(
    video: np.ndarray,
    path: str,
    fps: int = 8,
    audio: Optional[np.ndarray] = None,
    audio_sample_rate: int = 24000,
) -> Optional[str]:
    """Canonical (T,C,H,W) video → mp4; muxes audio when ffmpeg supports it.

    Returns the written path or None when no video codec is available
    (imageio/ffmpeg are optional at runtime).
    """
    frames = (np.clip(np.transpose(np.asarray(video), (0, 2, 3, 1)), 0, 1) * 255).astype(np.uint8)
    try:
        import imageio.v3 as iio

        iio.imwrite(path, frames, fps=fps, extension=".mp4")
    except Exception as e:
        logger.warning("mp4 encode unavailable (%s); skipping video log", e)
        return None
    if audio is not None:
        try:
            import subprocess
            import soundfile as sf  # optional

            wav = path + ".wav"
            sf.write(wav, np.asarray(audio).T, audio_sample_rate)
            muxed = path + ".muxed.mp4"
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", path, "-i", wav,
                 "-c:v", "copy", "-c:a", "aac", "-shortest", muxed],
                check=True,
            )
            os.replace(muxed, path)
            os.remove(wav)
        except Exception as e:
            logger.warning("audio mux skipped: %s", e)
    return path


def samples_to_media_payload(samples: Sequence[Any], max_items: int = 30) -> Dict[str, Any]:
    """Sample list → {'images': [...], 'videos': [...], 'captions': [...]}.

    Caption carries prompt + reward (reference grid captioning).
    """
    payload: Dict[str, Any] = {"images": [], "videos": [], "audios": [], "captions": []}
    for s in list(samples)[:max_items]:
        cap = (s.prompt or "")[:120]
        r = s.extra_kwargs.get("reward")
        if r is not None:
            cap = f"{cap} | r={r:.4f}"
        payload["captions"].append(cap)
        if getattr(s, "image", None) is not None:
            payload["images"].append(s.image)
        if getattr(s, "video", None) is not None:
            payload["videos"].append((s.video, getattr(s, "audio", None),
                                      getattr(s, "audio_sample_rate", None)))
    return payload


def condition_result_table(samples: Sequence[Any], max_items: int = 16) -> List[Dict[str, Any]]:
    """I2I/I2V rows: condition media + result + prompt + reward
    (reference formatting.py:592-...)."""
    rows = []
    for s in list(samples)[:max_items]:
        rows.append({
            "prompt": s.prompt,
            "reward": s.extra_kwargs.get("reward"),
            "conditions": getattr(s, "images", None) or getattr(s, "condition_video", None),
            "result": s.image if getattr(s, "image", None) is not None else s.video,
        })
    return rows


class LogFormatter:
    """Console scalar summarization (reference ``LogFormatter.to_scalar``)."""

    @staticmethod
    def to_scalar(data: Dict[str, Any]) -> Dict[str, float]:
        out = {}
        for k, v in data.items():
            try:
                arr = np.asarray(v, dtype=np.float64)
            except (TypeError, ValueError):
                continue
            if arr.ndim == 0:
                out[k] = float(arr)
            elif arr.size:
                out[f"{k}_mean"] = float(arr.mean())
        return out
