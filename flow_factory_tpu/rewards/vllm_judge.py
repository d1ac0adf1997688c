"""vLLM / OpenAI-compatible LLM judge rewards.

Re-design of the reference vLLM judges (``src/flow_factory/rewards/
vllm_evaluate.py:116-295`` yes/no-logprob judge; ``rational_rewards_t2i.py``
/ ``rational_rewards_edit.py`` multi-aspect rubric judges). The wire is the
OpenAI-compatible chat completions API of a vLLM server (the reference
launches one via ``scripts/start_vllm_rational_reward.sh``; ours is
``scripts/start_vllm_judge.sh``). Plain stdlib HTTP — no client-package
dependency; requests carry base64 images.
"""
from __future__ import annotations

import base64
import io
import json
import logging
import re
import urllib.request
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .abc import PointwiseRewardModel

logger = logging.getLogger(__name__)

_YESNO_PROMPT = (
    "You are evaluating a generated image. Question: does this image faithfully "
    "depict the prompt: \"{prompt}\"? Answer with exactly one word: yes or no."
)

_RUBRIC_T2I = """Score the image against the prompt "{prompt}" on these aspects,
each 0-10: fidelity (prompt adherence), quality (artifacts, sharpness),
composition (layout, balance). Reply as JSON: {{"fidelity": n, "quality": n, "composition": n}}."""

_RUBRIC_EDIT = """The first image is the source and the second is an edit with
instruction "{prompt}". Score 0-10 each: instruction_following, preservation
(unrelated content unchanged), quality. Reply as JSON:
{{"instruction_following": n, "preservation": n, "quality": n}}."""


def _b64_image(img: np.ndarray) -> str:
    from ..utils.media import to_pil_image

    buf = io.BytesIO()
    to_pil_image(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class VLLMJudgeReward(PointwiseRewardModel):
    """Yes/no judge: reward = P(yes) from token logprobs (reference
    vllm_evaluate.py)."""

    required_fields = ("image", "prompt")
    judge_prompt = _YESNO_PROMPT

    def setup(self) -> None:
        if not self.args.server_url:
            raise ValueError("VLLMJudgeReward requires server_url of a vLLM OpenAI endpoint")
        self.model_name = getattr(self.args, "judge_model", None) or "default"

    def _chat(self, messages: List[dict], logprobs: bool = False) -> dict:
        payload: Dict[str, Any] = {
            "model": self.model_name,
            "messages": messages,
            "max_tokens": 64,
            "temperature": 0.0,
        }
        if logprobs:
            payload.update({"logprobs": True, "top_logprobs": 8, "max_tokens": 1})
        req = urllib.request.Request(
            self.args.server_url.rstrip("/") + "/v1/chat/completions",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        last = None
        for _ in range(max(1, self.args.retry_attempts)):
            try:
                with urllib.request.urlopen(req, timeout=self.args.timeout) as resp:
                    return json.loads(resp.read())
            except Exception as e:  # pragma: no cover - network
                last = e
        raise RuntimeError(f"vLLM judge request failed: {last}")

    def _image_messages(self, imgs: List[np.ndarray], text: str) -> List[dict]:
        content: List[dict] = [
            {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{_b64_image(i)}"}}
            for i in imgs
        ]
        content.append({"type": "text", "text": text})
        return [{"role": "user", "content": content}]

    def _p_yes(self, out: dict) -> float:
        try:
            top = out["choices"][0]["logprobs"]["content"][0]["top_logprobs"]
            p_yes = p_no = 0.0
            for tl in top:
                tok = tl["token"].strip().lower()
                if tok.startswith("yes"):
                    p_yes += float(np.exp(tl["logprob"]))
                elif tok.startswith("no"):
                    p_no += float(np.exp(tl["logprob"]))
            denom = p_yes + p_no
            return p_yes / denom if denom > 0 else 0.5
        except (KeyError, IndexError, TypeError):
            text = out["choices"][0]["message"]["content"].strip().lower()
            return 1.0 if text.startswith("yes") else 0.0

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        scores = []
        for img, p in zip(image, prompt):
            out = self._chat(
                self._image_messages([img], self.judge_prompt.format(prompt=p)), logprobs=True
            )
            scores.append(self._p_yes(out))
        return np.asarray(scores, np.float64)


class RationalRewardT2I(VLLMJudgeReward):
    """Multi-aspect rubric judge → weighted scalar (reference
    rational_rewards_t2i.py:59-432)."""

    required_fields = ("image", "prompt")
    rubric = _RUBRIC_T2I
    aspect_weights = {"fidelity": 0.5, "quality": 0.3, "composition": 0.2}

    def _parse_aspects(self, text: str) -> Dict[str, float]:
        m = re.search(r"\{.*\}", text, re.DOTALL)
        if not m:
            return {}
        try:
            raw = json.loads(m.group(0))
            return {k: float(v) for k, v in raw.items() if isinstance(v, (int, float))}
        except (json.JSONDecodeError, ValueError):
            return {}

    def _score_one(self, imgs: List[np.ndarray], prompt: str) -> float:
        out = self._chat(self._image_messages(imgs, self.rubric.format(prompt=prompt)))
        aspects = self._parse_aspects(out["choices"][0]["message"]["content"])
        if not aspects:
            return 0.0
        total = sum(self.aspect_weights.get(k, 0.0) * v / 10.0 for k, v in aspects.items())
        wsum = sum(self.aspect_weights.get(k, 0.0) for k in aspects)
        return total / wsum if wsum > 0 else float(np.mean(list(aspects.values()))) / 10.0

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        return np.asarray([self._score_one([i], p) for i, p in zip(image, prompt)], np.float64)


class RationalRewardEdit(RationalRewardT2I):
    """Edit-pair rubric judge (reference rational_rewards_edit.py)."""

    required_fields = ("image", "images", "prompt")
    rubric = _RUBRIC_EDIT
    aspect_weights = {"instruction_following": 0.5, "preservation": 0.3, "quality": 0.2}

    def compute_reward(self, image, prompt, images=None, **_) -> np.ndarray:
        scores = []
        for out_img, p, refs in zip(image, prompt, images or [None] * len(image)):
            pair = ([refs[0]] if refs else []) + [out_img]
            scores.append(self._score_one(pair, p))
        return np.asarray(scores, np.float64)
