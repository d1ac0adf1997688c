"""vLLM / OpenAI-compatible VLM judge rewards — faithful port.

Mirrors the reference judges exactly (rubric text, reply format, parsers,
score aggregation, concurrency semantics):

* ``VLLMJudgeReward``   ← ``vllm_evaluate.py:116-295`` — holistic 5-criteria
  yes/no quality judge; reward = P(yes)/(P(yes)+P(no)) from top-logprobs,
  with an optional case-canonicalizing aggregation and a FIFO score cache.
* ``RationalRewardT2I`` ← ``rational_rewards_t2i.py:59-432`` — 3-aspect
  rubric (Text Faithfulness / Physical and Visual Quality / Text Rendering),
  ``## Score:`` block parser, per-aspect clamp to [1,4], reward =
  (mean−1)/3 ∈ [0,1].
* ``RationalRewardEdit`` ← ``rational_rewards_edit.py`` — 4-aspect edit
  rubric (adds Image Faithfulness), source+edited two-image message.

The wire is the OpenAI-compatible chat-completions API of a vLLM server
(``scripts/start_vllm_judge.sh``). Transport is stdlib ``urllib`` on a
thread pool: ``max_concurrent`` requests genuinely in flight (the reference
uses AsyncOpenAI + an asyncio.Semaphore; a bounded thread pool is the same
contract without the client-package dependency), exponential-backoff
retries on transport errors, parse failures score 0.0.
"""
from __future__ import annotations

import base64
import io
import json
import logging
import math
import re
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .abc import PointwiseRewardModel

logger = logging.getLogger(__name__)


def _b64_image_url(img: np.ndarray) -> str:
    from ..utils.media import to_pil_image

    buf = io.BytesIO()
    to_pil_image(img).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


# =====================================================================
# Rubrics + reply-format contracts (reference rational_rewards_t2i.py /
# rational_rewards_edit.py — the judge checkpoints are TRAINED on these
# exact strings, so they are ported verbatim as data)
# =====================================================================

T2I_SUPPORTED_ASPECTS: Tuple[str, ...] = (
    "text_faithfulness",
    "physical_quality",
    "text_rendering",
)

EDIT_SUPPORTED_ASPECTS: Tuple[str, ...] = (
    "text_faithfulness",
    "image_faithfulness",
    "physical_quality",
    "text_rendering",
)

RATIONAL_T2I_SYSTEM_PROMPT = (
    "You are an expert image generation evaluator. Your task is to evaluate "
    "the quality of a generated image based on a user instruction. Afterwards, "
    "you need to suggest how to refine the original user request to produce "
    "better image generation (if any)."
)

RATIONAL_EDIT_SYSTEM_PROMPT = (
    "You are an expert image editing evaluator. Your task is to evaluate the quality of an edited "
    "image based on a source image and a user instruction. Afterwards, you need to suggest how to "
    "refine the original user request to produce better image edits (if any)."
)

_RUBRIC_TF = """**1. Text Faithfulness** (How accurately does the output follow the instruction?)
- **4 (Full match):** All key elements (objects, colors, actions) are represented exactly as described. No hallucinations or unrequested changes.
- **3 (Minor mismatch):** Most key elements are present, but minor details are missing, incorrect, or slightly inaccurate.
- **2 (Some mismatch):** Some key elements are missing, altered, or interpreted incorrectly.
- **1 (Major deviations):** Key elements are completely missing, altered, or contradicted. Instruction is ignored."""

_RUBRIC_IF = """**2. Image Faithfulness** (How well are the non-edited parts and key input elements preserved?)
- **4 (Uses input fully):** All relevant elements from the input (background, style, lighting, identity) are accurately preserved or transformed as instructed.
- **3 (Minor mismatch):** Most relevant elements are preserved, but a few aspects (e.g., background details, lighting consistency) are missing or incorrectly handled.
- **2 (Partial mismatch):** Some elements are carried over, but key aspects of the original image are lost or distorted.
- **1 (Fails to use input):** Key elements of the input image are ignored, misinterpreted, or destroyed."""


def _rubric_pq(n: int) -> str:
    return f"""**{n}. Physical and Visual Quality** (Technical errors, composition, realism, and physics)
- **4 (No noticeable flaws):** The image is physically plausible (correct lighting, shadows, geometry, anatomy). No visible artifacts (seams, blurring, noise).
- **3 (Minor flaws):** Small inaccuracies that are noticeable but not strongly disruptive (e.g., slight lighting mismatch, minor texture issues).
- **2 (Some flaws):** Clear physical or visual errors that disrupt the image (e.g., incorrect perspective, "floating" objects, wrong shadow direction, obvious seams).
- **1 (Severe flaws):** Major physical/visual errors (e.g., impossible geometry, distorted anatomy, garbled objects, severe artifacts)."""


def _rubric_tr(n: int) -> str:
    return f"""**{n}. Text Rendering** (Only if the instruction involves generating text)
- **4 (Full match):** Text is correct, legible, and integrated well.
- **3 (Mostly match):** Minor misspellings or inconsistent capitalization.
- **2 (Partial match):** Major misspellings or distorted text.
- **1 (Major deviations):** Text is unreadable, severely distorted, or missing. (Use N/A if no text generation is required)."""


def _methodology(kind: str) -> str:
    src = ", source image" if kind == "edit" else ""
    each = "each image" if kind == "edit" else "the generated image"
    task = "image edits" if kind == "edit" else "image generation"
    return f"""### Scoring Methodology (CRITICAL)
During assessment for each aspect, recall the initial user request{src} and the scoring rubrics of the aspect, provide scores with detailed justifications for {each} and reflect fine-grained preferences.
1. **Anchor:** Have a global inspection based on the user request and the resulting generation. Determine the rough integer score level (1, 2, 3, or 4) according to the definitions provided.
2. **Justify and Adjust:** Do careful visual analysis and identify specific flaws in generation. Justify the score with concrete evidence and scoring logic. Fine-tune this anchor score into a float value. Add small increments for exceptional execution or deduct points for specific flaws.
   - *Example:* deduct points from 4.0 for slight flaws if the assessed dimension is close to satisfaction. add increments from 1.0 or 2.0 based on severity of flaws.

Afterwards, try to construct a refined user request that helps the visual generation model to produce better {task}.
Think of the weaknesses identified in the judgement, then map them to instruction details and apply specific fixes.
Provide a final new user request that enrich the initial user request."""


def _output_format(sections: Sequence[Tuple[int, str, bool]], task_word: str) -> str:
    lines = ["Output your evaluation in the following format:",
             "# User Request Analysis",
             "[ understanding the user request, try to analyze or decompose the "
             "user request deeper. Think of what the request might imply or what "
             "needs to be inferred to successfully execute the request. ]",
             "# Detailed Judgement"]
    first = True
    for num, title, optional in sections:
        lines.append(f"{num}. {title}:")
        if first:
            lines.append("## Justification: [ Analysis of the user request and the "
                         "assessment of the resulting generation. How it comes to a "
                         "final score. ]")
            first = False
        else:
            lines.append("## Justification: [ Similar to above. Analysis and assessment. ]")
        lines.append("## Score: [ float score or N/A ]" if optional
                     else "## Score: [ float score ]")
    lines += ["# Summary: [ Summary of the evaluation ]", "",
              "# User Request Refinement:",
              "## Refinement Comments: [Specific suggestions for improving the user request]",
              f"## Refined Request: [The improved, more specific user request for "
              f"{task_word} like a standard user instruction]"]
    return "\n".join(lines)


T2I_SCORING_PROMPT_SUFFIX = "\n\n\n".join([
    "",
    "To do this, you must first assess the image on three critical aspects, "
    "provide justifications and absolute scores in 1-4 scale.\n\n"
    "### Critical Aspects & Scoring Rubric\n"
    + _RUBRIC_TF + "\n\n" + _rubric_pq(2) + "\n\n" + _rubric_tr(3) + "\n\n"
    + _methodology("t2i") + "\n\n"
    + _output_format([(1, "Text Faithfulness", False),
                      (2, "Physical and Visual Quality", False),
                      (3, "Text Rendering", True)], "generation"),
])

EDIT_TASK_GUIDELINE = (
    "To do this, you must first assess the image on four critical aspects, "
    "provide justifications and absolute scores in 1-4 scale.\n\n"
    "### Critical Aspects & Scoring Rubric\n"
    + _RUBRIC_TF + "\n\n" + _RUBRIC_IF + "\n\n" + _rubric_pq(3) + "\n\n"
    + _rubric_tr(4) + "\n\n" + _methodology("edit") + "\n\n"
    + _output_format([(1, "Text Faithfulness", False),
                      (2, "Image Faithfulness", False),
                      (3, "Physical and Visual Quality", False),
                      (4, "Text Rendering", True)], "editing")
)


# =====================================================================
# Reply parsing (reference parse_scores_from_detailed_judgement)
# =====================================================================

def extract_numeric_score(score_value: Any) -> Union[float, str]:
    if score_value is None:
        raise ValueError("expected a score token, got None")
    if score_value == "N/A":
        return "N/A"
    if isinstance(score_value, (int, float)):
        return float(score_value)
    if isinstance(score_value, str):
        match = re.match(r"^\s*(\d+(?:\.\d+)?)", score_value.strip())
        if not match:
            raise ValueError(f"could not extract numeric score from string: {score_value!r}")
        return float(match.group(1))
    raise TypeError(f"unexpected score type {type(score_value).__name__}: {score_value!r}")


def _extract_score_from_block(block_text: str) -> Optional[Union[float, str]]:
    for line in block_text.split("\n"):
        m = re.search(r"(?:##\s*)?Score\s*:\s*(.+)$", line.strip(), re.IGNORECASE)
        if not m:
            continue
        try:
            return extract_numeric_score(m.group(1).strip())
        except (TypeError, ValueError):
            continue
    return None


def parse_scores_from_detailed_judgement(
    detailed_judgement: str,
    section_titles: Sequence[Tuple[str, str]] = (
        ("text_faithfulness", "Text Faithfulness"),
        ("physical_quality", "Physical and Visual Quality"),
        ("text_rendering", "Text Rendering"),
    ),
) -> Dict[str, Optional[Union[float, str]]]:
    """``# Detailed Judgement`` section → {aspect: float | "N/A" | None}.

    Two-stage parse mirroring the reference: numbered-section blocks
    (``1. Text Faithfulness`` …) with ``## Score:`` lines, then a
    header-partition fallback (``Text Faithfulness:`` …) when the numbered
    layout is absent. Content after ``# Summary:`` is ignored.
    """
    result: Dict[str, Optional[Union[float, str]]] = {k: None for k, _ in section_titles}

    content_body = detailed_judgement
    if "# Summary:" in detailed_judgement:
        content_body = detailed_judgement.split("# Summary:")[0]

    section_blocks: Dict[str, str] = {}
    current: Optional[str] = None
    block: List[str] = []
    for raw_line in content_body.split("\n"):
        stripped = raw_line.strip()
        matched = None
        for idx, (key, title) in enumerate(section_titles):
            if stripped.startswith(f"{idx + 1}.") and title in stripped:
                matched = key
                break
        if matched is not None:
            if current:
                section_blocks[current] = "\n".join(block)
            current, block = matched, [raw_line]
        elif current:
            block.append(raw_line)
    if current:
        section_blocks[current] = "\n".join(block)

    if not section_blocks:
        headers = [f"{title}:" for _, title in section_titles]
        if headers[0] in content_body:
            _, _, rest = content_body.partition(headers[0])
            for (key, _), nxt in zip(section_titles, headers[1:] + [None]):
                if nxt is not None and nxt in rest:
                    blk, _, rest = rest.partition(nxt)
                else:
                    blk, rest = rest, ""
                section_blocks[key] = blk

    for key, text in section_blocks.items():
        extracted = _extract_score_from_block(text)
        if extracted is not None:
            result[key] = extracted
    return result


def parse_scores_from_detailed_judgement_edit(
    detailed_judgement: str,
) -> Dict[str, Optional[Union[float, str]]]:
    return parse_scores_from_detailed_judgement(
        detailed_judgement,
        section_titles=(
            ("text_faithfulness", "Text Faithfulness"),
            ("image_faithfulness", "Image Faithfulness"),
            ("physical_quality", "Physical and Visual Quality"),
            ("text_rendering", "Text Rendering"),
        ),
    )


def aggregate_aspect_scores(
    parsed: Dict[str, Optional[Union[float, str]]],
    aspects: Sequence[str],
    supported_aspects: Sequence[str] = T2I_SUPPORTED_ASPECTS,
) -> float:
    """Clamp each numeric aspect to [1,4], skip None/"N/A", reward =
    (mean − 1)/3 clamped to [0,1] (reference aggregate_aspect_scores)."""
    if not aspects:
        raise ValueError("expected non-empty aspects sequence")
    unknown = [a for a in aspects if a not in tuple(supported_aspects)]
    if unknown:
        raise ValueError(f"unknown aspect(s) {unknown!r}; supported: {list(supported_aspects)}")
    scores: List[float] = []
    for aspect in aspects:
        score = parsed.get(aspect)
        if score is None or score == "N/A":
            continue
        if not isinstance(score, (int, float)):
            raise TypeError(f"aspect {aspect!r} parsed to {type(score).__name__}: {score!r}")
        v = float(score)
        if not math.isfinite(v):
            raise ValueError(f"non-finite score for aspect {aspect!r}")
        scores.append(max(1.0, min(4.0, v)))
    if not scores:
        raise ValueError(f"no usable numeric scores for {list(aspects)!r}; parsed={parsed!r}")
    return max(0.0, min(1.0, (sum(scores) / len(scores) - 1.0) / 3.0))


# =====================================================================
# HTTP judge base: bounded-concurrency chat client
# =====================================================================

class _ChatJudgeBase(PointwiseRewardModel):
    """Shared transport: ``max_concurrent`` in-flight chat completions with
    exponential-backoff retries (reference AsyncOpenAI + semaphore contract,
    ``vllm_evaluate.py:164-243``)."""

    def setup(self) -> None:
        if not self.args.server_url:
            raise ValueError(f"{type(self).__name__} requires server_url of a "
                             "vLLM OpenAI-compatible endpoint")
        x = getattr(self.args, "extra_kwargs", None) or {}
        self.model_name = (x.get("vlm_model")
                           or getattr(self.args, "judge_model", None)
                           or self.default_model_name)
        self.max_concurrent = int(x.get("max_concurrent", 8))
        self.max_retries = int(x.get("max_retries", self.args.retry_attempts or 5))
        self.temperature = float(x.get("temperature", 0.1))
        self.max_tokens = int(x.get("max_tokens", 2048))
        self.extra = x
        self._pool = ThreadPoolExecutor(max_workers=max(1, self.max_concurrent))

    default_model_name = "vlm-judge"

    def cleanup(self) -> None:
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)

    # -- transport -----------------------------------------------------
    def _chat_once(self, payload: Dict[str, Any]) -> dict:
        req = urllib.request.Request(
            self.args.server_url.rstrip("/") + "/v1/chat/completions",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.extra.get('api_key', 'EMPTY')}"},
        )
        with urllib.request.urlopen(req, timeout=self.args.timeout) as resp:
            return json.loads(resp.read())

    def _chat_with_retries(self, payload: Dict[str, Any]) -> Optional[dict]:
        last: Optional[BaseException] = None
        for attempt in range(max(1, self.max_retries)):
            try:
                return self._chat_once(payload)
            except Exception as e:  # transport-level: retry with backoff
                last = e
                logger.warning("%s API error (attempt %d/%d): %s",
                               type(self).__name__, attempt + 1, self.max_retries, e)
                if attempt + 1 < self.max_retries:
                    time.sleep(min(2.0 ** attempt, 30.0))
        logger.warning("%s request failed after %d attempts; reward 0.0. Last: %s",
                       type(self).__name__, self.max_retries, last)
        return None

    def _score_batch(self, items: Sequence[Any]) -> np.ndarray:
        futures = [self._pool.submit(self._score_single, *it) for it in items]
        return np.asarray([f.result() for f in futures], np.float64)

    def _score_single(self, *item) -> float:  # pragma: no cover - abstract
        raise NotImplementedError


class VLLMJudgeReward(_ChatJudgeBase):
    """Holistic quality yes/no judge: reward = P(yes)/(P(yes)+P(no)) from
    top-logprobs (reference ``VLMEvaluateRewardModel``). Falls back to text
    match when the server omits logprobs. FIFO-caches by image content."""

    required_fields = ("image", "prompt")
    default_model_name = "Qwen3-VL"

    EVALUATE_PROMPT = (
        "You are an expert image quality assessor. "
        "Evaluate this AI-generated image by considering ALL of the following criteria:\n"
        "1. Naturalness: Does the scene look realistic with correct perspective, shadows, and lighting?\n"
        "2. Artifacts: Is the image free from distortions, blurriness, watermarks, "
        "deformed faces, unusual body parts, or unharmonized subjects?\n"
        "3. Aesthetic Appeal: Does the image exhibit pleasing composition, "
        "color harmony, and visual balance?\n"
        "4. Detail & Clarity: Are textures, edges, and fine details rendered "
        "sharply and coherently without noise or smearing?\n"
        "5. Overall Coherence: Is the image semantically consistent, with all "
        "elements logically fitting together in a unified scene?\n\n"
        "Considering all the above criteria holistically, is this a high-quality image? "
        "Answer Yes or No."
    )

    def setup(self) -> None:
        super().setup()
        self.top_logprobs = int(self.extra.get("top_logprobs", 20))
        self.canonicalize = bool(self.extra.get("canonicalize", False))
        self.max_cache_size = int(self.extra.get("max_cache_size", 1024))
        self._cache: Dict[str, float] = {}

    def _p_yes(self, out: dict) -> float:
        try:
            top = out["choices"][0]["logprobs"]["content"][0]["top_logprobs"]
        except (KeyError, IndexError, TypeError):
            text = str(out["choices"][0]["message"]["content"] or "").strip().lower()
            return 1.0 if text.startswith("yes") else 0.0
        token_probs: Dict[str, float] = {}
        for tl in top:
            tok = str(tl["token"])
            if self.canonicalize:
                tok = tok.strip().lower()
            token_probs[tok] = token_probs.get(tok, 0.0) + float(np.exp(tl["logprob"]))
        p_yes = sum(v for t, v in token_probs.items() if t.strip().lower() == "yes")
        p_no = sum(v for t, v in token_probs.items() if t.strip().lower() == "no")
        total = p_yes + p_no
        return float(p_yes / total) if total > 0 else 0.0

    def _score_single(self, img: np.ndarray, prompt: str) -> float:
        url = _b64_image_url(img)
        key = url[-64:]  # content hash surrogate: tail of the b64 payload
        if key in self._cache:
            return self._cache[key]
        out = self._chat_with_retries({
            "model": self.model_name,
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": url}},
                {"type": "text", "text": self.EVALUATE_PROMPT},
            ]}],
            "max_tokens": 1,
            "temperature": 0.0,
            "logprobs": True,
            "top_logprobs": self.top_logprobs,
        })
        score = 0.0 if out is None else self._p_yes(out)
        if len(self._cache) >= self.max_cache_size:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = score
        return score

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        return self._score_batch(list(zip(image, prompt)))


class RationalRewardT2I(_ChatJudgeBase):
    """3-aspect rubric judge (reference ``RationalRewardsT2IRewardModel``)."""

    required_fields = ("image", "prompt")
    default_model_name = "RationalRewards-8B-T2I"
    supported_aspects = T2I_SUPPORTED_ASPECTS

    def setup(self) -> None:
        super().setup()
        raw = self.extra.get("aspects")
        self.aspects: Tuple[str, ...] = (
            tuple(str(a) for a in raw) if raw else self.supported_aspects)
        unknown = [a for a in self.aspects if a not in self.supported_aspects]
        if unknown:
            raise ValueError(f"unsupported aspect(s) {unknown!r}; "
                             f"allowed: {list(self.supported_aspects)}")

    def _messages(self, prompt: str, image: np.ndarray, **_) -> List[dict]:
        return [
            {"role": "system", "content": RATIONAL_T2I_SYSTEM_PROMPT},
            {"role": "user", "content": [
                {"type": "text", "text": f"User Instruction: {prompt}\n"
                                         "You are provided with one image:\n"
                                         "1. Generated Image "},
                {"type": "image_url", "image_url": {"url": _b64_image_url(image)}},
                {"type": "text", "text": T2I_SCORING_PROMPT_SUFFIX},
            ]},
        ]

    def _parse(self, text: str) -> Dict[str, Optional[Union[float, str]]]:
        return parse_scores_from_detailed_judgement(text)

    def _score_single(self, prompt: str, image: np.ndarray, *extra_imgs) -> float:
        out = self._chat_with_retries({
            "model": self.model_name,
            "messages": self._messages(prompt, image, *extra_imgs),
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        })
        if out is None:
            return 0.0
        content = out["choices"][0]["message"]["content"]
        if content is None or not str(content).strip():
            logger.warning("%s: empty assistant content; reward 0.0", type(self).__name__)
            return 0.0
        try:
            parsed = self._parse(str(content))
            return aggregate_aspect_scores(parsed, self.aspects, self.supported_aspects)
        except (TypeError, ValueError) as e:
            logger.warning("%s: parse/aggregate failed (%s); reward 0.0",
                           type(self).__name__, e)
            return 0.0

    def compute_reward(self, image: Sequence[np.ndarray], prompt: Sequence[str], **_) -> np.ndarray:
        return self._score_batch(list(zip(prompt, image)))


class RationalRewardEdit(RationalRewardT2I):
    """4-aspect edit judge over (source, edited) image pairs (reference
    ``RationalRewardsEditRewardModel``)."""

    required_fields = ("image", "images", "prompt")
    default_model_name = "RationalRewards-8B-Edit"
    supported_aspects = EDIT_SUPPORTED_ASPECTS

    def _messages(self, prompt: str, image: np.ndarray, source: np.ndarray) -> List[dict]:
        return [
            {"role": "system", "content": RATIONAL_EDIT_SYSTEM_PROMPT},
            {"role": "user", "content": [
                {"type": "text", "text": f"User Instruction: {prompt}\n"
                                         "You are provided with two images:\n"
                                         "1. Source Image "},
                {"type": "image_url", "image_url": {"url": _b64_image_url(source)}},
                {"type": "text", "text": "\n2. Edited Image "},
                {"type": "image_url", "image_url": {"url": _b64_image_url(image)}},
                {"type": "text",
                 "text": "\n\nGive your analysis and judgement following "
                         "guidelines in the system prompt. \n\n" + EDIT_TASK_GUIDELINE},
            ]},
        ]

    def _parse(self, text: str) -> Dict[str, Optional[Union[float, str]]]:
        return parse_scores_from_detailed_judgement_edit(text)

    def compute_reward(self, image, prompt, images=None, **_) -> np.ndarray:
        items = []
        for out_img, p, refs in zip(image, prompt, images or [None] * len(image)):
            if not refs:
                raise ValueError("RationalRewardEdit requires a source image "
                                 "per sample (sample.images)")
            src = refs[0] if isinstance(refs, (list, tuple)) else refs
            items.append((p, out_img, src))
        return self._score_batch(items)
