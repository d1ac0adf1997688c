"""Benchmark harness — prints ONE JSON line for the driver.

Measures the GRPO hot path on the flagship SD3.5-medium geometry
(BASELINE.md workload #1): the CFG-doubled MMDiT denoise step + FlowMatch-SDE
transition with log-prob, i.e. the op that dominates rollout wall-clock
(rollout = 10 such steps; reference geometry
``examples/grpo/lora/sd3_5/default.yaml``).

Metric: rollout samples/sec/chip at 512px, 10-step Euler SDE.
vs_baseline: PER-CHIP ratio against an H100 running the reference at the
same geometry. The reference publishes no numbers (BASELINE.md), so the
denominator is a fixed documented estimate: 122 TFLOP/sample (20 CFG
forwards × 2 × 2.24B params × 1357 tokens [1024 image patches + 333 text])
at 40% MFU on 989 bf16 TFLOP/s ⇒ 3.2 samples/s/H100. Note the silicon gap:
one v5e chip has 197 peak bf16 TFLOP/s (1/5 of an H100), so per-chip parity
is not the right lens — per-peak-FLOP efficiency is (see
docs/performance.md: this harness sustains ~80% MFU vs the estimated 40%).
"""
from __future__ import annotations

import json
import os
import time

H100_BASELINE_SAMPLES_PER_SEC = 3.2  # documented estimate (see module docstring)


def main() -> None:
    import jax

    # Persistent compilation cache: through the remote-compile relay a cold
    # SD3.5-M rollout compile is ~5-10 min; a cache hit replays in seconds.
    # Survives across processes (and driver rounds) in the repo tree.
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")))
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU fallback: tiny geometry, still exercises the same code path.
        jax.config.update("jax_platforms", "cpu")

    from flow_factory_tpu.parallel.dist import set_world_size_override

    set_world_size_override(1)

    import __graft_entry__ as g

    if on_tpu:
        B, res, steps = int(os.environ.get("BENCH_BATCH", "8")), 512, 10
        config = g._make_config(tiny=False, load_components=["transformer"])
        config.model_args.extra_kwargs["init_on_device"] = True
    else:
        B, res, steps = 2, 32, 4
        config = g._make_config(tiny=True)

    from flow_factory_tpu.models import load_adapter

    adapter = load_adapter(config)
    tcfg = adapter.component_configs["transformer"]
    h, w, c = adapter.latent_shape(res, res)
    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (B, h, w, c), jnp.float32)
    ctx_len = 333 if on_tpu else 16
    embeds = {
        "prompt_embeds": jax.random.normal(key, (B, ctx_len, tcfg.context_dim), jnp.float32),
        "pooled_prompt_embeds": jax.random.normal(key, (B, tcfg.pooled_dim), jnp.float32),
        "negative_prompt_embeds": jax.random.normal(key, (B, ctx_len, tcfg.context_dim), jnp.float32),
        "negative_pooled_prompt_embeds": jax.random.normal(key, (B, tcfg.pooled_dim), jnp.float32),
    }

    frozen = adapter.frozen_velocity_params()

    def denoise_step(trainable, frozen, x, k):
        return adapter._forward_impl(
            trainable, frozen, x, None,
            jnp.full((B,), 800.0), jnp.full((B,), 0.8), jnp.full((B,), 0.72),
            jnp.full((B,), 0.7),
            embeds, jnp.float32(4.5), jnp.float32(0.95), k,
            do_cfg=True, compute_log_prob=True, dynamics_type="Flow-SDE",
        ).next_latents

    step = jax.jit(denoise_step)
    # warmup/compile
    out = step(adapter.trainable, frozen, latents, key)
    jax.block_until_ready(out)

    # best-of-N trials to absorb relay jitter. Each trial ends with a
    # device_get of a scalar REDUCED FROM the chained output: through the
    # remote-chip relay, block_until_ready alone under-synchronizes and
    # reports impossible rates — the host round-trip of a data-dependent
    # scalar is the only trustworthy fence.
    n_trials, n_iters = 3, 2 * steps
    best_dt = float("inf")
    for trial in range(n_trials):
        t0 = time.perf_counter()
        x = latents
        for i in range(n_iters):
            x = step(adapter.trainable, frozen, x, jax.random.fold_in(key, trial * n_iters + i))
        float(jax.device_get(jnp.sum(x)))
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)

    rollout_time = best_dt * steps  # one sample trajectory = `steps` denoise steps
    samples_per_sec = B / rollout_time

    print(json.dumps({
        "metric": "sd35m_grpo_rollout_samples_per_sec_per_chip" if on_tpu
                  else "sd35m_grpo_rollout_samples_per_sec_per_chip[cpu-tiny]",
        "value": round(samples_per_sec, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / H100_BASELINE_SAMPLES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
