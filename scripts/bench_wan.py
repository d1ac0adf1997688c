"""Wan2.1-1.3B T2V rollout bench (BASELINE.md workload #2 geometry).

Default mode times the jitted rollout scan ONLY — inputs pre-staged on
device, chained trials fenced by ``device_get`` of a data-dependent scalar
(the docs/performance.md methodology). ``E2E=1`` times the FULL
``adapter.inference()`` instead: scan + trajectory buffers + causal-3D-VAE
decode + host materialization (loads the VAE component too).

Usage:  B=8 ATTN=flash python scripts/bench_wan.py
        B=8 E2E=1 python scripts/bench_wan.py
Current v5e-1 numbers (docs/performance.md): scan B=8 flash 5.261
samples/s/chip (152.1 ms/step, head-major projections + fused qk-norm
flash); round-3: 4.79 (167.1); pre-HeadProj: B=8 flash 4.09, B=16 flash
3.68, B=8 native 3.33.
"""
import os, sys, time, json
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
import jax.numpy as jnp

from flow_factory_tpu.parallel.dist import set_world_size_override
set_world_size_override(1)

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.utils.trajectory import build_store_maps
from flow_factory_tpu.utils.base import derive_key

B = int(os.environ.get("B", "8"))
backend = os.environ.get("ATTN", "flash")
E2E = bool(os.environ.get("E2E"))
steps = 10
cfg = Arguments.from_dict({
    "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
    "model": {"model_type": "wan2-t2v", "model_name_or_path": "", "variant": "1.3b",
              "finetune_type": "lora", "lora_rank": 32, "lora_alpha": 64,
              "attn_backend": backend, "master_dtype": "float32",
              "inference_dtype": "bfloat16",
              "load_components": (["transformer", "vae"] if os.environ.get("E2E") else ["transformer"]),
              "init_on_device": True},
    "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                  "num_sde_steps": 1, "sde_steps": [1, 2, 3]},
    "train": {"trainer_type": "grpo", "resolution": 256, "num_inference_steps": steps,
              "guidance_scale": 5.0, "per_device_batch_size": B, "group_size": 8,
              "unique_sample_num_per_epoch": 1, "ema_decay": 0},
    "eval": {}, "log": {}, "rewards": [],
})
print("backend:", jax.default_backend(), "| B:", B, "| attn:", backend, flush=True)
adapter = load_adapter(cfg)
adapter.rollout()
tcfg = adapter.component_configs["transformer"]
tl, h, w, c = adapter.latent_shape(256, 256, 5)
print("latent:", (tl, h, w, c), "video tokens:",
      tl * (h // tcfg.patch_size[1]) * (w // tcfg.patch_size[2]), flush=True)

rng = np.random.default_rng(0)
key = derive_key("rollout", 0)
keys = jax.random.split(key, B)
x0 = jax.vmap(lambda k: jax.random.normal(k, (tl, h, w, c), jnp.float32))(keys)
x0 = adapter.cast_latents(x0)
embeds = {
    "prompt_embeds": jax.device_put(jnp.asarray(
        rng.standard_normal((B, 512, tcfg.context_dim)).astype(np.float32))),
    "negative_prompt_embeds": jax.device_put(jnp.asarray(
        rng.standard_normal((B, 512, tcfg.context_dim)).astype(np.float32))),
}
timesteps = adapter.scheduler.set_timesteps(steps)
sigmas = jnp.asarray(adapter.scheduler.sigmas)
noise_levels = jnp.asarray(adapter.scheduler.get_noise_levels())
maps = build_store_maps([-1], steps)
trainable = adapter.trainable
frozen = adapter.frozen_velocity_params()

def roll(x, seed_key):
    return adapter.rollout_compute(
        trainable, frozen, x, embeds, jnp.float32(5.0), sigmas,
        jnp.asarray(timesteps), noise_levels,
        jnp.asarray(maps.latent_store_slot), jnp.asarray(maps.logprob_store_slot),
        seed_key,
        do_cfg=True, compute_log_prob=True,
        dynamics_type=adapter.scheduler.dynamics_type,
        num_latent_slots=maps.num_latent_slots,
        num_logprob_slots=maps.num_logprob_slots, store_means=False)

if E2E:
    np_embeds = {k: np.asarray(v) for k, v in embeds.items()}

    def run_e2e(seed, defer=False):
        return adapter.inference(
            prompt=["bench"] * B, compute_log_prob=True, trajectory_indices=[-1],
            seed=seed, height=256, width=256, num_frames=5,
            num_inference_steps=steps, guidance_scale=5.0, defer=defer, **np_embeds)

    print("compiling e2e...", flush=True)
    t0 = time.perf_counter()
    s_list = run_e2e(0)
    float(np.sum(s_list[-1].all_latents[-1]))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    # pipelined stream, as the trainer sample loop runs it (depth 2 default,
    # training_args.pipeline_depth): keep two dispatched batches in flight
    from collections import deque

    depth = max(1, int(os.environ.get("FFT_PIPELINE_DEPTH", "2")))
    n_stream = int(os.environ.get("BENCH_STREAM", "4"))
    t0 = time.perf_counter()
    pending, n_done = deque(), 0
    for trial in range(n_stream):
        pending.append(run_e2e(trial + 1, defer=True))
        if len(pending) > depth:
            out = pending.popleft().materialize()
            float(np.sum(out[-1].all_latents[-1]))
            n_done += len(out)
    while pending:
        out = pending.popleft().materialize()
        float(np.sum(out[-1].all_latents[-1]))
        n_done += len(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"wan_rollout_e2e_samples_per_sec_per_chip": round(n_done / dt, 3),
                      "stream_s": round(dt, 3), "stream_batches": n_stream,
                      "batch": B, "attn": backend}),
          flush=True)
    raise SystemExit(0)

if os.environ.get("COSTCHECK"):
    # XLA-verified FLOPs for one CFG-doubled velocity call, to ground the
    # Wan MFU claim the same way scripts/bench_reconcile.py grounds
    # SD3.5-M's. cost_analysis INCLUDES Pallas custom-call flops via the
    # flash kernel's pl.CostEstimate, which reports TRUE unpadded attention
    # flops — the total is the honest algorithmic count as-is.
    merged = adapter.merged_params("transformer")
    t_arr = jnp.full((B,), 500.0, jnp.float32)

    def vel(m, x, t, e):
        return adapter._velocity(m, x, t, e, jnp.float32(5.0), do_cfg=True)

    ca = jax.jit(vel).lower(merged, x0, t_arr, embeds).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    print(json.dumps({"xla_flops_per_velocity_call": flops,
                      "flops_per_step_tf": round(flops / 1e12, 2)}), flush=True)

print("compiling...", flush=True)
t0 = time.perf_counter()
xf, lb, pb, mb = roll(x0, jax.random.fold_in(key, 1))
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

n_chain = 3
best = float("inf")
for trial in range(3):
    t0 = time.perf_counter()
    x = x0
    for i in range(n_chain):
        x, lb, pb, mb = roll(x, jax.random.fold_in(key, 10 + trial * n_chain + i))
    float(jax.device_get(jnp.sum(x)))
    best = min(best, (time.perf_counter() - t0) / n_chain)

sps = B / best
print(json.dumps({"wan_rollout_scan_samples_per_sec_per_chip": round(sps, 3),
                  "ms_per_step": round(1000 * best / steps, 1),
                  "batch": B, "attn": backend}), flush=True)
