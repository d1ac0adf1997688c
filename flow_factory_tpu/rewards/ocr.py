"""OCR reward (text-rendering accuracy).

Re-design of the reference OCR reward (``src/flow_factory/rewards/ocr.py:
52-163``): runs an OCR engine on the generated image and scores agreement
with the target text. Host-side worker; engine resolution order:
PaddleOCR → easyocr → pytesseract (all optional deps; a clear error explains
what to install when none is present). Score = 1 − normalized edit distance
between recognized and target text (reference behavior).
"""
from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np

from .abc import PointwiseRewardModel

logger = logging.getLogger(__name__)


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class OCRReward(PointwiseRewardModel):
    required_fields = ("image", "prompt", "target_text")

    def setup(self) -> None:
        self._engine = None
        try:
            from paddleocr import PaddleOCR  # optional

            self._paddle = PaddleOCR(use_angle_cls=False, lang="en", show_log=False)
            self._engine = "paddle"
            return
        except Exception:
            pass
        try:
            import easyocr  # optional

            self._easy = easyocr.Reader(["en"], gpu=False)
            self._engine = "easyocr"
            return
        except Exception:
            pass
        try:
            import pytesseract  # optional

            self._tess = pytesseract
            self._engine = "tesseract"
            return
        except Exception:
            pass
        raise RuntimeError(
            "OCRReward needs an OCR engine: install paddleocr, easyocr, or pytesseract"
        )

    def _recognize(self, img: np.ndarray) -> str:
        from ..utils.media import to_pil_image

        arr = np.asarray(to_pil_image(img))
        if self._engine == "paddle":
            result = self._paddle.ocr(arr, cls=False)
            texts = [line[1][0] for page in (result or []) for line in (page or [])]
            return " ".join(texts)
        if self._engine == "easyocr":
            return " ".join(self._easy.readtext(arr, detail=0))
        return self._tess.image_to_string(arr)

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str],
                       target_text: Optional[Sequence[str]] = None, **_) -> np.ndarray:
        targets = target_text if target_text is not None else prompt
        scores = []
        for img, tgt in zip(image, targets):
            if img is None or not tgt:
                scores.append(0.0)
                continue
            rec = self._recognize(img).strip().lower()
            tgt = str(tgt).strip().lower()
            if not tgt:
                scores.append(0.0)
                continue
            d = _levenshtein(rec, tgt)
            scores.append(max(0.0, 1.0 - d / max(len(tgt), 1)))
        return np.asarray(scores, np.float64)
