"""BASELINE.json must-run configs, end to end at tiny scale.

The driver-supplied targets name five runnable configs (BASELINE.md §North
star): (1) SD3.5-M GRPO + PickScore — covered by test_e2e_grpo — plus
(2) FLUX.1 LoRA DPO, (3) Wan2.1 T2V GRPO, (4) FLUX.1-Kontext I2I editing
RL (multi-ref images), (5) LTX-2 T2AV joint RL. Each runs sample →
feedback → optimize for one epoch on tiny geometry and must produce finite
metrics.
"""
import os

import numpy as np
import pytest

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.trainers import load_trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _cfg(model_type, trainer_type, tmp_path, dataset=None, train_extra=None):
    cfg = {
        "data": {"dataset_dir": dataset or os.path.join(FIXTURES, "tiny_prompts"),
                 "cache_dir": str(tmp_path / "cache")},
        "model": {"model_type": model_type, "model_name_or_path": "tiny",
                  "finetune_type": "lora", "lora_rank": 2, "lora_alpha": 4,
                  "attn_backend": "native", "master_dtype": "float32",
                  "inference_dtype": "float32"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": trainer_type, "resolution": 32,
                  "num_inference_steps": 4, "guidance_scale": 1.0,
                  "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2,
                  "latent_storage_dtype": "fp32", "max_epochs": 1,
                  "learning_rate": 1e-3, "ema_decay": 0,
                  "num_train_timesteps": 2, **(train_extra or {})},
        "eval": {"eval_freq": 0},
        "log": {"run_name": "baseline-smoke", "save_dir": str(tmp_path / "saves"),
                "save_freq": 0},
        "rewards": [{"name": "brightness", "reward_model": "MyReward"}],
    }
    return Arguments.from_dict(cfg)


def _run_epoch(config):
    trainer = load_trainer(config)
    trainer.scheduler.set_seed(trainer.training_args.seed)
    samples = trainer.sample(epoch=0)
    ta = trainer.training_args
    assert len(samples) == ta.unique_sample_num_per_epoch * ta.group_size
    metrics = trainer.prepare_feedback(samples)
    assert np.isfinite(metrics["reward/mean"])
    loss_info = trainer.optimize(samples, epoch=0)
    for k, v in loss_info.items():
        assert np.all(np.isfinite(np.asarray(v, dtype=np.float64))), (k, v)
    assert trainer.global_step >= 1
    return trainer, loss_info


def test_flux1_lora_dpo_epoch(tmp_path):
    _run_epoch(_cfg("flux1", "dpo", tmp_path, train_extra={"beta": 100.0}))


def test_wan_t2v_grpo_epoch(tmp_path):
    _run_epoch(_cfg("wan2-t2v", "grpo", tmp_path))


def test_kontext_i2i_grpo_epoch(tmp_path):
    """Editing RL with multi-ref condition images loaded from the dataset
    (BASELINE config #4; dataset/multi_ref_image ships the assets)."""
    _run_epoch(_cfg("flux1-kontext", "grpo", tmp_path,
                    dataset=os.path.join(REPO, "dataset", "multi_ref_image")))


def test_ltx2_t2av_grpo_epoch(tmp_path):
    _run_epoch(_cfg("ltx2-t2av", "grpo", tmp_path))
