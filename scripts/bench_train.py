"""SD3.5-M GRPO TRAINING-step bench (the optimize() hot path).

One gradient step at the reference geometry (BASELINE.md workload #1):
512px, micro-batch 4, CFG-doubled forward, remat (gradient checkpointing),
Pallas flash attention backward, PPO clipped loss, adamw LoRA update.
Scalar-fenced best-of-3 (docs/performance.md methodology).

Usage: MB=4 python scripts/bench_train.py
"""
from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import optax

from flow_factory_tpu.parallel.dist import set_world_size_override


def main() -> None:
    set_world_size_override(1)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as g
    from flow_factory_tpu.models import load_adapter

    MB = int(os.environ.get("MB", "4"))
    if on_tpu:
        res, ctx_len = 512, 333
        config = g._make_config(tiny=False, load_components=["transformer"])
        config.model_args.extra_kwargs["init_on_device"] = True
    else:
        MB, res, ctx_len = 2, 32, 16
        config = g._make_config(tiny=True)
    config.training_args.enable_gradient_checkpointing = True

    adapter = load_adapter(config)
    adapter.train()
    tcfg = adapter.component_configs["transformer"]
    h, w, c = adapter.latent_shape(res, res)
    key = jax.random.PRNGKey(0)
    rngs = [jax.random.fold_in(key, i) for i in range(8)]
    batch = {
        "latents": jax.random.normal(rngs[0], (MB, h, w, c), jnp.float32),
        "next_latents": jax.random.normal(rngs[1], (MB, h, w, c), jnp.float32),
        "timestep": jnp.full((MB,), 800.0),
        "sigma": jnp.full((MB,), 0.8),
        "sigma_next": jnp.full((MB,), 0.72),
        "noise_level": jnp.full((MB,), 0.7),
        "guidance_scale": jnp.float32(4.5),
        "sigma_max": jnp.float32(0.95),
        "old_log_prob": jax.random.normal(rngs[2], (MB,)),
        "advantage": jax.random.normal(rngs[3], (MB,)),
        "prompt_embeds": jax.random.normal(rngs[4], (MB, ctx_len, tcfg.context_dim)),
        "pooled_prompt_embeds": jax.random.normal(rngs[5], (MB, tcfg.pooled_dim)),
        "negative_prompt_embeds": jax.random.normal(rngs[6], (MB, ctx_len, tcfg.context_dim)),
        "negative_pooled_prompt_embeds": jax.random.normal(rngs[7], (MB, tcfg.pooled_dim)),
    }

    optimizer = optax.adamw(3e-4)
    opt_state = optimizer.init(adapter.trainable)
    frozen = adapter.frozen_velocity_params()

    def train_step(trainable, frozen, opt_state, batch):
        def loss_fn(tr):
            out = adapter.training_forward(tr, batch, compute_log_prob=True, frozen=frozen)
            ratio = jnp.exp(out.log_prob - batch["old_log_prob"])
            adv = jnp.clip(batch["advantage"], -5.0, 5.0)
            return jnp.mean(jnp.maximum(-adv * ratio,
                                        -adv * jnp.clip(ratio, 0.9999, 1.0001)))

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 2))
    tr, os_, loss = step(adapter.trainable, frozen, opt_state, batch)
    print(f"compile ok, loss={float(loss):.5f}", flush=True)

    n_iters, best = 6, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            tr, os_, loss = step(tr, frozen, os_, batch)
        float(jax.device_get(loss))
        best = min(best, (time.perf_counter() - t0) / n_iters)

    print(json.dumps({
        "metric": "sd35m_grpo_train_step_ms" if on_tpu else "sd35m_grpo_train_step_ms[cpu-tiny]",
        "value": round(best * 1e3, 1),
        "unit": "ms/step",
        "micro_batch": MB,
    }))


if __name__ == "__main__":
    main()
