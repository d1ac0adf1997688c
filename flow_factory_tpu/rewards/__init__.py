from .abc import BaseRewardModel, GroupwiseRewardModel, PointwiseRewardModel
from .loader import MultiRewardLoader
from .models import (CLIPScoreReward, MyGroupReward, MyReward, PickScoreRankReward,
                     PickScoreReward, RemoteReward)
from .registry import available_rewards, register_reward, resolve_reward_class
from .reward_processor import RewardBuffer, RewardProcessor

__all__ = [
    "BaseRewardModel",
    "PointwiseRewardModel",
    "GroupwiseRewardModel",
    "RewardProcessor",
    "RewardBuffer",
    "MultiRewardLoader",
    "MyReward",
    "MyGroupReward",
    "PickScoreReward",
    "PickScoreRankReward",
    "CLIPScoreReward",
    "RemoteReward",
    "resolve_reward_class",
    "register_reward",
    "available_rewards",
]
