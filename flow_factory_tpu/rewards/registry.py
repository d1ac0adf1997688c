"""Reward model registry (reference: ``src/flow_factory/rewards/registry.py``)."""
from __future__ import annotations

import importlib
from typing import Type

_REWARD_REGISTRY = {
    "MyReward": "flow_factory_tpu.rewards.models:MyReward",
    "MyGroupReward": "flow_factory_tpu.rewards.models:MyGroupReward",
    "PickScore": "flow_factory_tpu.rewards.models:PickScoreReward",
    "PickScoreRank": "flow_factory_tpu.rewards.models:PickScoreRankReward",
    "CLIPScore": "flow_factory_tpu.rewards.models:CLIPScoreReward",
    "Remote": "flow_factory_tpu.rewards.models:RemoteReward",
    "MyRewardRemote": "flow_factory_tpu.rewards.models:RemoteReward",
    "RemoteGroup": "flow_factory_tpu.rewards.models:RemoteGroupReward",
    "MyGroupRewardRemote": "flow_factory_tpu.rewards.models:RemoteGroupReward",
    "OCR": "flow_factory_tpu.rewards.ocr:OCRReward",
    "CLAP": "flow_factory_tpu.rewards.audio:CLAPReward",
    "ImageBind": "flow_factory_tpu.rewards.audio:ImageBindReward",
    "PickScoreNative": "flow_factory_tpu.rewards.clip_native:NativeCLIPReward",
    "CLIPNative": "flow_factory_tpu.rewards.clip_native:NativeCLIPReward",
    "VLLMEvaluate": "flow_factory_tpu.rewards.vllm_judge:VLLMJudgeReward",
    "RationalRewardT2I": "flow_factory_tpu.rewards.vllm_judge:RationalRewardT2I",
    "RationalRewardEdit": "flow_factory_tpu.rewards.vllm_judge:RationalRewardEdit",
    # reference registry spellings (reference rewards/registry.py:35-37)
    "vllm_evaluate": "flow_factory_tpu.rewards.vllm_judge:VLLMJudgeReward",
    "rational_rewards_t2i": "flow_factory_tpu.rewards.vllm_judge:RationalRewardT2I",
    "rational_rewards_edit": "flow_factory_tpu.rewards.vllm_judge:RationalRewardEdit",
}


def resolve_reward_class(name: str) -> Type:
    target = _REWARD_REGISTRY.get(name, name)
    if ":" in target:
        module_name, cls_name = target.split(":")
    elif "." in target:
        module_name, cls_name = target.rsplit(".", 1)
    else:
        raise KeyError(f"Unknown reward_model {name!r}; known: {sorted(_REWARD_REGISTRY)}")
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


def register_reward(key: str, target: str) -> None:
    _REWARD_REGISTRY[key] = target


def available_rewards():
    return dict(_REWARD_REGISTRY)
