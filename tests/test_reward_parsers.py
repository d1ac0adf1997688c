"""LLM-judge response parsing (no network).

The rubric parsers mirror the reference exactly
(``rational_rewards_t2i.py:91-204``, ``rational_rewards_edit.py:135-210``);
concurrency + HTTP behavior is covered by ``test_judge_rewards.py``.
"""
import numpy as np
import pytest

from flow_factory_tpu.hparams.reward_args import RewardArguments
from flow_factory_tpu.rewards.vllm_judge import (
    RationalRewardT2I,
    VLLMJudgeReward,
    aggregate_aspect_scores,
    extract_numeric_score,
    parse_scores_from_detailed_judgement,
    parse_scores_from_detailed_judgement_edit,
)


def _judge(cls):
    j = cls(RewardArguments(name="j", reward_model="x", server_url="http://x"))
    j.setup()
    return j


def test_p_yes_from_logprobs():
    j = _judge(VLLMJudgeReward)
    out = {"choices": [{"logprobs": {"content": [{"top_logprobs": [
        {"token": "Yes", "logprob": np.log(0.6)},
        {"token": "no", "logprob": np.log(0.2)},
        {"token": "maybe", "logprob": np.log(0.2)},
    ]}]}, "message": {"content": "yes"}}]}
    assert abs(j._p_yes(out) - 0.75) < 1e-6  # 0.6 / (0.6+0.2)


def test_p_yes_text_fallback():
    j = _judge(VLLMJudgeReward)
    out = {"choices": [{"message": {"content": "No, the image does not."}}]}
    assert j._p_yes(out) == 0.0


_T2I_REPLY = """# User Request Analysis
The request asks for a red cube.
# Detailed Judgement
1. Text Faithfulness:
## Justification: The cube is red and present.
## Score: 3.5
2. Physical and Visual Quality:
## Justification: Some artifacts near the edges.
## Score: 2.8
3. Text Rendering:
## Justification: No text was requested.
## Score: N/A
# Summary: Decent generation.

# User Request Refinement:
## Refinement Comments: specify lighting
## Refined Request: A red cube under studio lighting
"""


def test_rubric_parse_sections_and_na():
    parsed = parse_scores_from_detailed_judgement(_T2I_REPLY)
    assert parsed["text_faithfulness"] == 3.5
    assert parsed["physical_quality"] == 2.8
    assert parsed["text_rendering"] == "N/A"
    # (mean(3.5, 2.8) - 1) / 3
    r = aggregate_aspect_scores(
        parsed, ("text_faithfulness", "physical_quality", "text_rendering"))
    assert abs(r - ((3.15 - 1.0) / 3.0)) < 1e-9


def test_rubric_parse_header_fallback():
    text = """Text Faithfulness:
Score: 4
Physical and Visual Quality:
Score: 3
Text Rendering:
Score: N/A"""
    parsed = parse_scores_from_detailed_judgement(text)
    assert parsed["text_faithfulness"] == 4.0
    assert parsed["physical_quality"] == 3.0
    assert parsed["text_rendering"] == "N/A"


def test_edit_rubric_parses_four_aspects():
    text = """# Detailed Judgement
1. Text Faithfulness:
## Score: 4
2. Image Faithfulness:
## Score: 3
3. Physical and Visual Quality:
## Score: 2
4. Text Rendering:
## Score: 1
# Summary: mixed."""
    parsed = parse_scores_from_detailed_judgement_edit(text)
    assert parsed == {"text_faithfulness": 4.0, "image_faithfulness": 3.0,
                      "physical_quality": 2.0, "text_rendering": 1.0}


def test_aggregate_clamps_and_validates():
    parsed = {"text_faithfulness": 9.0, "physical_quality": 0.2,
              "text_rendering": None}
    # clamps to [1, 4]: mean(4, 1) = 2.5 -> 0.5
    assert aggregate_aspect_scores(
        parsed, ("text_faithfulness", "physical_quality")) == 0.5
    with pytest.raises(ValueError):
        aggregate_aspect_scores(parsed, ("bogus_aspect",))
    with pytest.raises(ValueError):
        aggregate_aspect_scores({"text_faithfulness": None},
                                ("text_faithfulness",))


def test_extract_numeric_score_forms():
    assert extract_numeric_score("3.5 / 4") == 3.5
    assert extract_numeric_score(2) == 2.0
    assert extract_numeric_score("N/A") == "N/A"
    with pytest.raises(ValueError):
        extract_numeric_score("no digits")


def test_scheduler_x0_velocity_roundtrip():
    import jax.numpy as jnp

    from flow_factory_tpu.scheduler import convert_velocity_to_x0, convert_x0_to_velocity

    x = jnp.ones((2, 4)) * 3.0
    v = jnp.ones((2, 4)) * 0.5
    x0 = convert_velocity_to_x0(v, x, 0.8)
    v2 = convert_x0_to_velocity(x0, x, 0.8)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-6)
