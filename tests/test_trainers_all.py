"""Smoke the full algorithm suite (GRPO-Guard, DPO, NFT, AWM, DGPO, CRD).

One tiny adapter instance is shared across trainers so the transformer jit
cache is reused; each algorithm runs sample → feedback → optimize for one
epoch and must produce finite metrics with its expected init-state values
(policy == reference at step 0).
"""
import os

import numpy as np
import pytest

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.trainers.registry import resolve_trainer_class

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

BASE = {
    "data": {"dataset_dir": os.path.join(FIXTURES, "tiny_prompts")},
    "model": {"model_type": "sd3-5", "model_name_or_path": "tiny", "finetune_type": "lora",
              "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
              "master_dtype": "float32", "inference_dtype": "float32"},
    "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                  "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
    "train": {"resolution": 32, "num_inference_steps": 4, "guidance_scale": 1.0,
              "per_device_batch_size": 2, "group_size": 2, "unique_sample_num_per_epoch": 2,
              "latent_storage_dtype": "fp32", "max_epochs": 1, "learning_rate": 1e-3,
              "ema_decay": 0, "num_train_timesteps": 2},
    "eval": {"eval_freq": 0},
    "log": {"run_name": "smoke", "save_freq": 0},
    "rewards": [{"name": "brightness", "reward_model": "MyReward"}],
}

TRAINER_OVERRIDES = {
    "grpo_guard": {},
    "dpo": {"beta": 100.0},
    "nft": {"nft_beta": 1.0},
    "awm": {"awm_weighting": "t"},
    "dgpo": {"dpo_beta": 10.0, "clip_dsm": True, "kl_beta": 0.01},
    "crd": {"crd_beta": 1.0, "kl_beta": 0.01, "weight_temp": 0.0,
            "old_model_decay": "0-0.5-0.01-0.9"},
}


def _config(trainer_type, tmp_path):
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in BASE.items()}
    cfg["train"] = dict(BASE["train"])
    cfg["train"]["trainer_type"] = trainer_type
    cfg["train"].update(TRAINER_OVERRIDES[trainer_type])
    cfg["data"] = dict(BASE["data"])
    cfg["data"]["cache_dir"] = str(tmp_path / "cache")
    cfg["log"] = dict(BASE["log"])
    cfg["log"]["save_dir"] = str(tmp_path / "saves")
    cfg["rewards"] = [dict(r) for r in BASE["rewards"]]
    return Arguments.from_dict(cfg)


@pytest.fixture(scope="module")
def shared_adapter(tmp_path_factory):
    config = _config("grpo_guard", tmp_path_factory.mktemp("adapter"))
    return load_adapter(config)


@pytest.mark.parametrize("trainer_type", list(TRAINER_OVERRIDES))
def test_trainer_one_epoch(trainer_type, shared_adapter, tmp_path):
    config = _config(trainer_type, tmp_path)
    # share the adapter across algorithms: re-point its config at this run
    # and reset the LoRA tree so each algorithm starts from policy == ref
    shared_adapter.config = config
    shared_adapter.training_args = config.training_args
    shared_adapter._setup_trainable()
    shared_adapter._named_stores.clear()
    shared_adapter.ema = None
    cls = resolve_trainer_class(trainer_type)
    trainer = cls(config, shared_adapter)
    trainer.scheduler.set_seed(config.training_args.seed)

    samples = trainer.sample(0)
    assert samples and all(s.all_latents is not None for s in samples)
    metrics = trainer.prepare_feedback(samples)
    assert np.isfinite(metrics["reward/mean"])
    info = trainer.optimize(samples, 0)
    assert info, f"{trainer_type} produced no loss info"
    for k, v in info.items():
        assert v is None or np.isfinite(v), (trainer_type, k, v)

    if trainer_type == "grpo_guard":
        # guard ratio == 1 at init (replay consistency incl. mean-drift term)
        assert info["train/ratio_mean"] == pytest.approx(1.0, abs=1e-3)
    if trainer_type == "dpo":
        # policy == ref at init ⇒ loss = log 2
        assert info["train/loss"] == pytest.approx(np.log(2.0), abs=1e-4)
    if trainer_type == "dgpo":
        # sigmoid(0) group weights at init
        assert info["train/group_weight_mean"] == pytest.approx(0.5, abs=1e-4)
        assert info["train/kl"] == pytest.approx(0.0, abs=1e-6)
    if trainer_type == "crd":
        # snapshots equal current weights at init
        assert info["train/r_theta_mean"] == pytest.approx(0.0, abs=1e-5)
