"""LLM-judge response parsing (no network)."""
import numpy as np

from flow_factory_tpu.hparams.reward_args import RewardArguments
from flow_factory_tpu.rewards.vllm_judge import RationalRewardT2I, VLLMJudgeReward


def _judge(cls):
    return cls(RewardArguments(name="j", reward_model="x", server_url="http://x"))


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


def test_rubric_parse_and_weighting():
    j = _judge(RationalRewardT2I)
    aspects = j._parse_aspects('blah {"fidelity": 8, "quality": 6, "composition": 10} done')
    assert aspects == {"fidelity": 8.0, "quality": 6.0, "composition": 10.0}
    assert j._parse_aspects("no json here") == {}


def test_scheduler_x0_velocity_roundtrip():
    import jax.numpy as jnp

    from flow_factory_tpu.scheduler import convert_velocity_to_x0, convert_x0_to_velocity

    x = jnp.ones((2, 4)) * 3.0
    v = jnp.ones((2, 4)) * 0.5
    x0 = convert_velocity_to_x0(v, x, 0.8)
    v2 = convert_x0_to_velocity(x0, x, 0.8)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-6)
