"""Full GRPO EPOCH bench: sample → feedback → optimize wall-clock.

The third level of the performance story (docs/performance.md): bench.py
times the end-to-end rollout, scripts/bench_train.py the training step;
this script times one whole GRPO epoch at the SD3.5-M reference geometry —
rollout batches, reward scoring, advantage computation, and the per-
timestep optimize loop with gradient accumulation.

Scope notes (documented exclusions):
* text encoding is stubbed with seeded random embeds — preprocessing is
  computed once and cached across epochs in real runs (the reference's
  fingerprint cache; ours in data/dataset.py), so it does not belong to
  steady-state epoch time;
* the reward model is the built-in brightness scorer (negligible cost) —
  external reward services are workload-dependent and overlap the rollout
  via the async buffer anyway.

Usage: python scripts/bench_epoch.py            (real chip)
       BENCH_FORCE_CPU=1 python scripts/bench_epoch.py   (tiny smoke)
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    from flow_factory_tpu.parallel.dist import set_world_size_override

    set_world_size_override(1)

    import __graft_entry__ as g
    from flow_factory_tpu.trainers import load_trainer

    if on_tpu:
        B, res, steps, group = 8, 512, 10, 8
        config = g._make_config(tiny=False, load_components=["transformer", "vae"])
        config.model_args.extra_kwargs["init_on_device"] = True
    else:
        B, res, steps, group = 2, 32, 4, 2
        config = g._make_config(tiny=True)
    # brightness reward (negligible host cost — see module docstring)
    from flow_factory_tpu.hparams.reward_args import MultiRewardArguments

    config.reward_args = MultiRewardArguments.from_list(
        [{"name": "brightness", "reward_model": "MyReward"}])
    ta = config.training_args
    ta.resolution = res
    ta.num_inference_steps = steps
    ta.per_device_batch_size = B
    ta.group_size = group
    # ≥64 samples (8 rollout batches) by default so the pipeline's unhidden
    # endpoints (first dispatch, last fetch) amortize — a 2-batch epoch
    # measures endpoints, not steady state (VERDICT r3 Weak #4 / Next #3);
    # the reference geometry is 1,152 samples/epoch
    ta.unique_sample_num_per_epoch = int(
        os.environ.get("BENCH_EPOCH_UNIQUE", "8" if on_tpu else "2"))
    ta.enable_gradient_checkpointing = on_tpu
    config.data_args.dataset_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "tiny_prompts")

    # build the adapter first and stub text encoding BEFORE the trainer's
    # dataloader preprocessing runs (see module docstring)
    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.trainers.registry import resolve_trainer_class

    adapter = load_adapter(config)
    tcfg = adapter.component_configs["transformer"]
    ctx_len = 333 if on_tpu else 16
    rng = np.random.default_rng(0)

    def fake_preprocess(batch, **_):
        n = len(batch["prompt"])
        mk = lambda *shape: rng.standard_normal(shape).astype(np.float32)
        return {
            "prompt_embeds": mk(n, ctx_len, tcfg.context_dim),
            "pooled_prompt_embeds": mk(n, tcfg.pooled_dim),
            "negative_prompt_embeds": mk(n, ctx_len, tcfg.context_dim),
            "negative_pooled_prompt_embeds": mk(n, tcfg.pooled_dim),
        }

    adapter.preprocess_func = fake_preprocess
    trainer = resolve_trainer_class(ta.trainer_type)(config, adapter)

    trainer.scheduler.set_seed(ta.seed)

    def one_epoch(epoch: int):
        t0 = time.perf_counter()
        samples = trainer.sample(epoch)
        t1 = time.perf_counter()
        trainer.prepare_feedback(samples)
        t2 = time.perf_counter()
        trainer.optimize(samples, epoch)
        t3 = time.perf_counter()
        return len(samples), t1 - t0, t2 - t1, t3 - t2

    one_epoch(0)  # warmup/compile
    n, ts, tf, to = one_epoch(1)
    total = ts + tf + to
    print(json.dumps({
        "metric": "sd35m_grpo_epoch_s" if on_tpu else "sd35m_grpo_epoch_s[cpu-tiny]",
        "value": round(total, 3),
        "unit": "s/epoch",
        "samples": n,
        "sample_s": round(ts, 3),
        "feedback_s": round(tf, 3),
        "optimize_s": round(to, 3),
        "samples_per_sec_epoch": round(n / total, 4),
    }))


if __name__ == "__main__":
    main()
