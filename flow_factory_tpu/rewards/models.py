"""Built-in reward models.

Host-side scorers (reference set: ``src/flow_factory/rewards/`` — pick_score,
clip, ocr, clap, imagebind, vllm judges, remote HTTP, template stubs). This
module carries the core set; heavyweight externals (OCR, CLAP, ImageBind,
vLLM) live in their own modules and degrade with clear errors when their
assets are absent.

``MyReward`` mirrors the reference's template stub
(``rewards/my_reward.py:26-118``) but returns a *deterministic, optimizable*
signal (mean image brightness) instead of zeros so smoke-training runs have a
real gradient direction to follow in tests.
"""
from __future__ import annotations

import logging
from typing import Any, List, Optional, Sequence

import numpy as np

from .abc import GroupwiseRewardModel, PointwiseRewardModel

logger = logging.getLogger(__name__)


class MyReward(PointwiseRewardModel):
    """Template pointwise reward: mean brightness in [0, 1]. Videos score
    as the frame mean (the PickScore convention), so the template works for
    every task family out of the box."""

    required_fields = ("image", "video", "prompt")

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str],
                       video: Optional[Sequence[np.ndarray]] = None, **_) -> np.ndarray:
        out = []
        for i in range(len(prompt)):
            img = image[i] if image is not None else None
            vid = video[i] if video is not None else None
            media = img if img is not None else vid
            out.append(float(np.mean(media)) if media is not None else 0.0)
        return np.asarray(out, np.float64)


class MyGroupReward(GroupwiseRewardModel):
    """Template groupwise reward: intra-group brightness rank in [0, 1]."""

    required_fields = ("image", "prompt")

    def compute_group_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        vals = np.asarray([float(np.mean(img)) if img is not None else 0.0 for img in image])
        order = np.argsort(np.argsort(vals))
        if len(vals) <= 1:
            return np.ones_like(vals)
        return order.astype(np.float64) / (len(vals) - 1)


class PickScoreReward(PointwiseRewardModel):
    """PickScore (CLIP-H) image-text preference scorer.

    Reference ``rewards/pick_score.py:43-141``. Runs on the HOST via torch
    (CPU) — rewards never contend with the TPU rollout. Videos score as the
    frame mean (reference behavior). Requires local weights at
    ``model_name_or_path``.
    """

    required_fields = ("image", "video", "prompt")

    def setup(self) -> None:
        import torch  # host-side torch is baked in (CPU)
        from transformers import AutoModel, AutoProcessor

        path = self.args.model_name_or_path
        if not path:
            raise ValueError(
                "PickScoreReward needs model_name_or_path pointing at local "
                "PickScore weights (e.g. yuvalkirstain/PickScore_v1 snapshot)"
            )
        self._torch = torch
        self.processor = AutoProcessor.from_pretrained(path)
        self.model = AutoModel.from_pretrained(path, torch_dtype=torch.float32).eval()

    def _score_images(self, pil_images: List[Any], prompts: List[str]) -> np.ndarray:
        torch = self._torch
        image_inputs = self.processor(
            images=pil_images, padding=True, truncation=True, max_length=77, return_tensors="pt"
        )
        text_inputs = self.processor(
            text=list(prompts), padding=True, truncation=True, max_length=77, return_tensors="pt"
        )
        with torch.no_grad():
            image_embs = self.model.get_image_features(**image_inputs)
            image_embs = image_embs / image_embs.norm(dim=-1, keepdim=True)
            text_embs = self.model.get_text_features(**text_inputs)
            text_embs = text_embs / text_embs.norm(dim=-1, keepdim=True)
            scores = self.model.logit_scale.exp() * (text_embs * image_embs).sum(-1)
        return scores.cpu().numpy().astype(np.float64)

    def compute_reward(self, prompt: Sequence[str], image=None, video=None, **_) -> np.ndarray:
        from ..utils.media import to_pil_image

        if image is not None and image[0] is not None:
            pils = [to_pil_image(i) for i in image]
            return self._score_images(pils, list(prompt))
        # video: frame-mean score
        out = []
        for vid, p in zip(video, prompt):
            frames = [to_pil_image(f) for f in vid]
            out.append(float(self._score_images(frames, [p] * len(frames)).mean()))
        return np.asarray(out, np.float64)


class PickScoreRankReward(GroupwiseRewardModel, PickScoreReward):
    """Within-group rank reward on PickScore (reference
    ``rewards/pick_score.py:143-246``, ``PickScoreRankRewardModel``).

    Scores a COMPLETE group (K same-prompt samples) with PickScore (frame
    mean for videos), then returns rank-based rewards
    ``argsort(argsort(scores)) / K`` — 0 for the worst sample, (K−1)/K for
    the best. Shares the scoring trunk with :class:`PickScoreReward`.
    """

    reward_type = "groupwise"
    required_fields = ("image", "video", "prompt")

    def compute_group_reward(self, prompt: Sequence[str], image=None, video=None, **_) -> np.ndarray:
        raw = self.compute_reward(prompt, image=image, video=video)
        ranks = np.argsort(np.argsort(raw))
        return ranks.astype(np.float64) / max(1, len(prompt))


class CLIPScoreReward(PointwiseRewardModel):
    """CLIP text-image cosine similarity (reference ``rewards/clip.py``)."""

    required_fields = ("image", "prompt")

    def setup(self) -> None:
        import torch
        from transformers import CLIPModel, CLIPProcessor

        path = self.args.model_name_or_path
        if not path:
            raise ValueError("CLIPScoreReward needs model_name_or_path (local CLIP weights)")
        self._torch = torch
        self.processor = CLIPProcessor.from_pretrained(path)
        self.model = CLIPModel.from_pretrained(path).eval()

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        from ..utils.media import to_pil_image

        torch = self._torch
        inputs = self.processor(
            text=list(prompt), images=[to_pil_image(i) for i in image],
            return_tensors="pt", padding=True, truncation=True,
        )
        with torch.no_grad():
            out = self.model(**inputs)
            img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
            txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        return (img * txt).sum(-1).cpu().numpy().astype(np.float64)


class RemoteReward(PointwiseRewardModel):
    """HTTP reward client (reference ``rewards/my_reward_remote.py:97-252``).

    Wire contract: POST ``{server_url}/compute_reward`` with JSON
    ``{"prompts": [...], "images": [b64 png, ...]}`` → ``{"rewards": [...]}``.
    Retries with backoff; health-checked at setup.
    """

    required_fields = ("image", "prompt")

    def setup(self) -> None:
        if not self.args.server_url:
            raise ValueError("RemoteReward requires server_url")
        import json
        import urllib.request

        self._urllib = urllib.request
        self._json = json
        try:
            req = self._urllib.Request(self.args.server_url.rstrip("/") + "/health")
            self._urllib.urlopen(req, timeout=min(5.0, self.args.timeout))
        except Exception as e:
            logger.warning("Reward server health check failed: %s", e)

    @staticmethod
    def _b64_png(img: np.ndarray) -> str:
        import base64
        import io

        from ..utils.media import to_pil_image

        buf = io.BytesIO()
        to_pil_image(img).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        payload = {
            "prompts": list(prompt),
            "images": [self._b64_png(i) for i in image],
        }
        data = self._json.dumps(payload).encode()
        url = self.args.server_url.rstrip("/") + "/compute_reward"
        last_err: Optional[Exception] = None
        for attempt in range(max(1, self.args.retry_attempts)):
            try:
                req = self._urllib.Request(
                    url, data=data, headers={"Content-Type": "application/json"}
                )
                with self._urllib.urlopen(req, timeout=self.args.timeout) as resp:
                    out = self._json.loads(resp.read())
                return np.asarray(out["rewards"], np.float64)
            except Exception as e:  # pragma: no cover - network
                last_err = e
                logger.warning("Remote reward attempt %d failed: %s", attempt + 1, e)
        raise RuntimeError(f"Remote reward failed after retries: {last_err}")


class RemoteGroupReward(GroupwiseRewardModel, RemoteReward):
    """Groupwise HTTP reward client (reference
    ``my_reward_remote.py:203-260``, ``RemoteGroupwiseRewardModel``):
    one POST per COMPLETE group on the same wire contract — the server sees
    all K same-prompt samples together and may rank/contrast within the
    group. Shares transport (b64 PNG, retries, health check) with
    :class:`RemoteReward`."""

    reward_type = "groupwise"
    required_fields = ("image", "prompt")

    def compute_group_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        return self.compute_reward(image=image, prompt=prompt)
