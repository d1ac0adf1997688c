"""Reward-curve regression: multi-epoch tiny GRPO must IMPROVE the reward.

The BASELINE "reward-curve parity" metric had no CI proxy (VERDICT round-1
weak #10 / next #10): test_e2e_grpo runs one epoch only. This runs several
epochs of GRPO on the brightness reward at tiny scale and asserts the
policy actually climbs — the end-to-end learning-signal check (advantages →
clipped ratios → LoRA updates → brighter decodes).
"""
import os

import numpy as np
import pytest

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.trainers import load_trainer

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _cfg(tmp_path):
    return Arguments.from_dict({
        "data": {"dataset_dir": os.path.join(FIXTURES, "tiny_prompts"),
                 "cache_dir": str(tmp_path / "cache")},
        "model": {"model_type": "sd3-5", "model_name_or_path": "tiny",
                  "finetune_type": "lora", "lora_rank": 4, "lora_alpha": 8,
                  "attn_backend": "native", "master_dtype": "float32",
                  "inference_dtype": "float32"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 3, "sde_steps": [0, 1, 2, 3]},
        "train": {"trainer_type": "grpo", "resolution": 32,
                  "num_inference_steps": 4, "guidance_scale": 1.0,
                  "per_device_batch_size": 4, "group_size": 4,
                  "unique_sample_num_per_epoch": 2,
                  "latent_storage_dtype": "fp32", "max_epochs": 6,
                  "learning_rate": 5e-3, "ema_decay": 0,
                  "num_inner_epochs": 2, "adv_clip_range": [-5, 5],
                  "clip_range": [-0.2, 0.2]},
        "eval": {"eval_freq": 0},
        "log": {"run_name": "curve", "save_dir": str(tmp_path / "saves"),
                "save_freq": 0},
        "rewards": [{"name": "brightness", "reward_model": "MyReward"}],
    })


def test_grpo_reward_improves_over_epochs(tmp_path):
    trainer = load_trainer(_cfg(tmp_path))
    ta = trainer.training_args
    curve = []
    for epoch in range(6):
        trainer.scheduler.set_seed(ta.seed + epoch)
        samples = trainer.sample(epoch)
        trainer.prepare_feedback(samples)
        curve.append(float(np.mean([s.extra_kwargs["reward"] for s in samples])))
        trainer.optimize(samples, epoch)
    # the policy must climb: late-phase mean reward above the start, and the
    # overall trend positive (guards against oscillation around the start)
    early = np.mean(curve[:2])
    late = np.mean(curve[-2:])
    trend = np.polyfit(np.arange(len(curve)), curve, 1)[0]
    assert late > early, f"reward did not improve: {curve}"
    assert trend > 0, f"non-positive reward trend: {curve}"
