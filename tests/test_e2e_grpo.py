"""End-to-end GRPO smoke: the CPU-runnable BASELINE.json config #1 analog.

Runs the full stack (config → adapter → preprocess → rollout → rewards →
advantages → PPO optimize) on the tiny SD3.5 for one epoch and checks the
reference's key runtime self-check: replayed ratio == 1 at epoch start
(SURVEY.md §4.2) plus metric sanity.
"""
import os

import numpy as np
import pytest

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.trainers import load_trainer

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    config = Arguments.load_from_yaml(os.path.join(FIXTURES, "smoke_grpo.yaml"))
    config.training_args.max_epochs = 1
    config.data_args.cache_dir = str(tmp_path_factory.mktemp("cache"))
    config.log_args.save_dir = str(tmp_path_factory.mktemp("saves"))
    return load_trainer(config)


def test_one_epoch(trainer):
    trainer.scheduler.set_seed(trainer.training_args.seed)
    samples = trainer.sample(epoch=0)
    ta = trainer.training_args
    assert len(samples) == ta.unique_sample_num_per_epoch * ta.group_size
    metrics = trainer.prepare_feedback(samples)
    assert "reward/mean" in metrics and np.isfinite(metrics["reward/mean"])
    advs = [s.extra_kwargs["advantage"] for s in samples]
    assert np.isfinite(advs).all()

    loss_info = trainer.optimize(samples, epoch=0)
    # train-inference consistency: before any gradient step the replayed
    # ratio must be exactly 1 (the reference's core invariant)
    assert loss_info["train/ratio_mean"] == pytest.approx(1.0, abs=1e-4)
    assert loss_info["train/clip_frac"] == pytest.approx(0.0, abs=1e-6)
    assert loss_info["train/grad_norm"] > 0
    assert np.isfinite(loss_info["train/loss"])
    assert trainer.global_step >= 1


def test_group_members_share_unique_id(trainer):
    samples = trainer.reward_buffer.samples or trainer.sample(epoch=1)
    uids = {}
    for s in samples:
        uids.setdefault(s.unique_id, 0)
        uids[s.unique_id] += 1
    # every uid group is a multiple of K (same prompt drawn twice as a
    # "unique" merges two groups when M exceeds the tiny fixture dataset)
    K = trainer.training_args.group_size
    assert all(n % K == 0 for n in uids.values())


def test_evaluate_pipelined(trainer):
    """Eval pass rides the same deferred-dispatch pipeline as sampling:
    every test batch materializes, rewards score pointwise-only, metrics
    are finite (reference grpo.py:94-138)."""
    assert trainer.test_loader is not None
    metrics = trainer.evaluate(epoch=0)
    assert np.isfinite(metrics["eval/reward_mean"])
    assert np.isfinite(metrics["eval/reward_std"])


def test_one_epoch_fp16_storage_wire(tmp_path):
    """fp16 latent storage: the optimize path ships trajectory tensors in
    the storage dtype and wire-safe context embeds in the inference dtype
    (halved H2D). Both casts are exact round trips / first-use-identical,
    so the replayed ratio must still be 1 (stage_trajectory docstring)."""
    config = Arguments.load_from_yaml(os.path.join(FIXTURES, "smoke_grpo.yaml"))
    config.training_args.max_epochs = 1
    config.training_args.latent_storage_dtype = "fp16"
    config.data_args.cache_dir = str(tmp_path / "cache")
    config.log_args.save_dir = str(tmp_path / "saves")
    tr = load_trainer(config)
    assert tr.adapter.wire_context_keys  # SD3 stages its sequence context
    tr.scheduler.set_seed(tr.training_args.seed)
    samples = tr.sample(epoch=0)
    tr.prepare_feedback(samples)
    loss_info = tr.optimize(samples, epoch=0)
    assert loss_info["train/ratio_mean"] == pytest.approx(1.0, abs=1e-3)
    assert loss_info["train/clip_frac"] == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(loss_info["train/loss"])
