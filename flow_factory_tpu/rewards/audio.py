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


class ImageBindReward(PointwiseRewardModel):
    """Tri-modal (video + audio + text) similarity.

    Score = mean of pairwise cosine similarities between the three
    modality embeddings (reference imagebind_reward.py aggregation).
    """

    required_fields = ("video", "audio", "prompt", "audio_sample_rate")

    def setup(self) -> None:
        try:
            import torch
            from imagebind.models import imagebind_model  # optional dep
            from imagebind import data as ib_data
        except Exception as e:
            raise RuntimeError(
                "ImageBindReward needs the `imagebind` package + checkpoint "
                f"(install facebookresearch/ImageBind): {e}"
            )
        self._torch = torch
        self._ib_data = ib_data
        self.model = imagebind_model.imagebind_huge(pretrained=True).eval()

    def compute_reward(self, video, audio, prompt, audio_sample_rate=None, **_) -> np.ndarray:
        import tempfile

        torch = self._torch
        ib = self._ib_data
        scores = []
        for vid, aud, p in zip(video, audio, prompt):
            from ..utils.media import to_pil_image

            frames = [to_pil_image(f) for f in vid[:: max(1, len(vid) // 4)]]
            with tempfile.TemporaryDirectory() as td:
                img_paths = []
                for i, f in enumerate(frames):
                    path = f"{td}/f{i}.png"
                    f.save(path)
                    img_paths.append(path)
                inputs = {
                    "vision": ib.load_and_transform_vision_data(img_paths, "cpu"),
                    "text": ib.load_and_transform_text([p], "cpu"),
                }
                with torch.no_grad():
                    emb = self.model(inputs)
                v = emb["vision"].mean(0, keepdim=True)
                t = emb["text"]
                v = v / v.norm(dim=-1, keepdim=True)
                t = t / t.norm(dim=-1, keepdim=True)
                scores.append(float((v * t).sum()))
        return np.asarray(scores, np.float64)
