"""Preemption-safe checkpointing (beyond the reference — SURVEY.md §5 lists
the reference's failure handling as minimal, with no elastic recovery).

TPU pods receive SIGTERM on maintenance/preemption events. The trainer's
handler sets a flag; ``check_preempt()`` polls it at rollout-batch and
micro-batch boundaries, raising ``PreemptionRequested`` which ``start()``
converts into a full-state save under ``<save_dir>/<run>/preempt`` with
"redo the interrupted epoch" semantics (recorded epoch = last COMPLETED).
"""
import os
import signal

import numpy as np
import pytest

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.trainers import load_trainer
from flow_factory_tpu.trainers.abc import PreemptionRequested

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _make_config(tmp_path, run_name):
    config = Arguments.load_from_yaml(os.path.join(FIXTURES, "smoke_grpo.yaml"))
    config.training_args.max_epochs = 2
    config.data_args.cache_dir = str(tmp_path / "cache")
    config.log_args.save_dir = str(tmp_path / "saves")
    config.log_args.run_name = run_name
    return config


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("preempt")


@pytest.fixture(autouse=True)
def _restore_sigterm():
    """Never leak a trainer's SIGTERM handler into the rest of the pytest
    process (an absorbed TERM would defeat the CI runner's own timeout)."""
    prev = signal.getsignal(signal.SIGTERM)
    yield
    signal.signal(signal.SIGTERM, prev)


def test_sigterm_sets_flag_not_kill(workdir):
    trainer = load_trainer(_make_config(workdir, "sig"))
    assert not trainer._preempt_requested
    os.kill(os.getpid(), signal.SIGTERM)  # handler absorbs it — process survives
    assert trainer._preempt_requested
    with pytest.raises(PreemptionRequested):
        trainer.check_preempt()


def test_mid_epoch_preempt_saves_and_resumes(workdir):
    config = _make_config(workdir, "preempt_run")
    trainer = load_trainer(config)

    # preempt "arrives" after sampling epoch 0: the optimize loop's first
    # micro-batch boundary must convert it into a state save + clean exit
    orig = trainer.prepare_feedback

    def hooked(samples):
        trainer.request_preempt()
        return orig(samples)

    trainer.prepare_feedback = hooked
    trainer.start()

    pdir = os.path.join(config.log_args.save_dir, "preempt_run", "preempt")
    assert os.path.isdir(os.path.join(pdir, "train_state"))
    assert os.path.exists(os.path.join(pdir, "adapter_config.json"))
    # no optimizer step ran for the interrupted epoch
    assert trainer.global_step == 0

    # resume: train_state auto-detected (wins over the LoRA layout) and the
    # interrupted epoch re-runs from its start
    resumed_cfg = _make_config(workdir, "preempt_resume")
    resumed_cfg.model_args.resume_path = pdir
    resumed = load_trainer(resumed_cfg)
    assert resumed.epoch == 0  # completed_epoch was -1 → redo epoch 0
    assert resumed.global_step == 0
    resumed.start()
    assert resumed.epoch == 1  # both epochs ran to completion
    assert resumed.global_step >= 1
    final = os.path.join(resumed_cfg.log_args.save_dir, "preempt_resume")
    assert not os.path.exists(os.path.join(final, "preempt"))


def test_preempt_epoch_semantics(workdir):
    """Preempt AFTER epoch 0 completes → recorded epoch 0, resume at epoch 1."""
    config = _make_config(workdir, "preempt_after_epoch")
    trainer = load_trainer(config)
    orig_opt = trainer.optimize

    def hooked(samples, epoch):
        out = orig_opt(samples, epoch)
        trainer.request_preempt()  # flag set between epochs
        return out

    trainer.optimize = hooked
    trainer.start()
    assert trainer.epoch == 1  # epoch 0 finished; epoch 1 was cut at its head
    pdir = os.path.join(config.log_args.save_dir, "preempt_after_epoch", "preempt")

    resumed_cfg = _make_config(workdir, "preempt_after_epoch_resume")
    resumed_cfg.model_args.resume_path = pdir
    resumed = load_trainer(resumed_cfg)
    assert resumed.epoch == 1  # epoch 0 completed pre-preempt
    assert resumed.global_step == trainer.global_step
    # optimizer state round-trips exactly
    a = np.asarray(
        next(iter(jax_leaves(trainer.opt_state))), np.float32)
    b = np.asarray(
        next(iter(jax_leaves(resumed.opt_state))), np.float32)
    assert a.shape == b.shape


def jax_leaves(tree):
    import jax

    return [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "shape")]
