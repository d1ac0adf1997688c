"""Decompose the e2e rollout stream into device/wire legs (round 4).

The reconcile harness gives two endpoints: the velocity-only kernel
ceiling (2.26 samples/s at HEAD) and the pipelined e2e stream (1.78).
The ~0.95 s/batch-8 gap has four candidate owners; this script measures
each under the same device_get fence so the e2e optimization work
(VERDICT r3 Next #8) attacks measured legs, not guesses:

  scan        — the full jitted rollout scan (velocity + sde_step +
                log-prob + trajectory-buffer scatter + RNG), fenced on
                x_final. scan − ceiling = SDE/storage overhead.
  decode      — the bf16 VAE decode of one batch, fenced on device.
  h2d         — staging the CFG context embeds (bf16 wire) + pooled fp32,
                fenced via a device reduction.
  fetch       — the materialize-side D2H: trajectory buffers (fp16 wire),
                log-probs, fp32 images.
  sequential  — full inference() incl. host sample construction.
  pipelined   — the bench.py stream at BENCH_STREAM batches.

Run on the real chip (uses the persistent compile cache):
    python scripts/bench_e2e_legs.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")))
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    from flow_factory_tpu.parallel.dist import set_world_size_override

    set_world_size_override(1)
    import __graft_entry__ as g

    def fence(x):
        return float(jax.device_get(jnp.sum(x) if hasattr(x, "dtype") else x))

    def timed(fn, trials=3):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    if on_tpu:
        B, res, steps = int(os.environ.get("BENCH_BATCH", "8")), 512, 10
        config = g._make_config(tiny=False, load_components=["transformer", "vae"])
        config.model_args.extra_kwargs["init_on_device"] = True
    else:
        B, res, steps = 2, 32, 4
        config = g._make_config(tiny=True)
    config.training_args.num_inference_steps = steps
    config.training_args.resolution = res

    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.utils.trajectory import compute_trajectory_indices

    adapter = load_adapter(config)
    adapter.rollout()
    tcfg = adapter.component_configs["transformer"]
    key = jax.random.PRNGKey(0)
    ctx_len = 333 if on_tpu else 16
    embeds_np = dict(
        prompt_embeds=np.asarray(jax.random.normal(
            key, (B, ctx_len, tcfg.context_dim), jnp.float32)),
        pooled_prompt_embeds=np.asarray(jax.random.normal(
            key, (B, tcfg.pooled_dim), jnp.float32)),
        negative_prompt_embeds=np.asarray(jax.random.normal(
            jax.random.fold_in(key, 1), (B, ctx_len, tcfg.context_dim), jnp.float32)),
        negative_pooled_prompt_embeds=np.asarray(jax.random.normal(
            jax.random.fold_in(key, 2), (B, tcfg.pooled_dim), jnp.float32)),
    )
    adapter.scheduler.set_timesteps(steps, seq_len=(res // 16) ** 2)
    traj = compute_trajectory_indices(adapter.scheduler.train_timesteps, steps)
    report = {"batch": B, "resolution": res, "steps": steps}

    # ---- leg: H2D context staging -------------------------------------
    def h2d():
        e = {
            "prompt_embeds": adapter.stage_context(embeds_np["prompt_embeds"]),
            "pooled_prompt_embeds": jnp.asarray(embeds_np["pooled_prompt_embeds"]),
            "negative_prompt_embeds": adapter.stage_context(
                embeds_np["negative_prompt_embeds"]),
            "negative_pooled_prompt_embeds": jnp.asarray(
                embeds_np["negative_pooled_prompt_embeds"]),
        }
        for v in e.values():
            v.block_until_ready()
        fence(e["prompt_embeds"][0, 0, :8].astype(jnp.float32))
        return e

    dev_embeds = h2d()  # warm
    report["h2d_context_s"] = round(timed(h2d), 4)
    ctx_bytes = sum(v.size * v.dtype.itemsize
                    for k, v in dev_embeds.items())
    report["h2d_context_mb"] = round(ctx_bytes / 1e6, 1)

    # ---- leg: full rollout scan (velocity + sde + buffers) ------------
    from flow_factory_tpu.models.sd3.adapter import build_store_maps

    maps = build_store_maps(traj, steps)
    h, w, c = adapter.latent_shape(res, res)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    x0 = jax.vmap(lambda k: jax.random.normal(k, (h, w, c), jnp.float32))(keys)
    x0 = adapter.cast_latents(x0)
    sigmas = jnp.asarray(adapter.scheduler.sigmas)
    timesteps = jnp.asarray(adapter.scheduler.set_timesteps(
        steps, seq_len=(res // 16) ** 2))
    noise_levels = jnp.asarray(adapter.scheduler.get_noise_levels())
    lat_slot = jnp.asarray(maps.latent_store_slot)
    lp_slot = jnp.asarray(maps.logprob_store_slot)
    frozen = adapter.frozen_velocity_params()

    def scan():
        x_final, lat_buf, lp_buf, _ = adapter.rollout_compute(
            adapter.trainable, frozen, x0, dev_embeds, jnp.float32(4.5),
            sigmas, timesteps, noise_levels, lat_slot, lp_slot,
            jax.random.PRNGKey(2),
            do_cfg=True, compute_log_prob=True,
            dynamics_type=adapter.scheduler.dynamics_type,
            num_latent_slots=maps.num_latent_slots,
            num_logprob_slots=maps.num_logprob_slots,
        )
        fence(x_final[0, 0, 0, :8])
        return x_final, lat_buf, lp_buf

    x_final, lat_buf, lp_buf = scan()  # warm/compile
    report["scan_device_s"] = round(timed(scan), 4)

    # ---- leg: VAE decode ----------------------------------------------
    def decode():
        img = adapter.decode_latents(x_final, fetch=False)
        fence(img[0, 0, 0, :8])
        return img

    images_dev = decode()  # warm
    report["decode_device_s"] = round(timed(decode), 4)

    # ---- leg: D2H fetch (buffers + log-probs + images) ----------------
    def fetch():
        lat_np = adapter.fetch_batch(lat_buf, 1)
        lp_np = adapter.fetch_batch(lp_buf, 1)
        img_np = adapter.fetch_batch(images_dev, 0)
        return lat_np.nbytes + lp_np.nbytes + img_np.nbytes

    d2h_bytes = fetch()  # warm
    report["fetch_d2h_s"] = round(timed(fetch), 4)
    report["fetch_d2h_mb"] = round(d2h_bytes / 1e6, 1)

    # ---- leg: full sequential inference() ------------------------------
    def rollout(seed, defer=False):
        return adapter.inference(
            prompt=["bench"] * B, compute_log_prob=True,
            trajectory_indices=traj, seed=seed, height=res, width=res,
            num_inference_steps=steps, guidance_scale=4.5, defer=defer,
            **embeds_np,
        )

    rollout(0)  # warm
    def seq():
        out = rollout(1)
        float(np.sum(out[-1].all_latents[-1]))

    report["sequential_batch_s"] = round(timed(seq), 4)

    # ---- leg: pipelined stream -----------------------------------------
    n_stream = int(os.environ.get("BENCH_STREAM", "8" if on_tpu else "4"))
    t0 = time.perf_counter()
    pending, n_done = None, 0
    for trial in range(1, n_stream + 1):
        nxt = rollout(trial, defer=True)
        if pending is not None:
            out = pending.materialize()
            float(np.sum(out[-1].all_latents[-1]))
            n_done += len(out)
        pending = nxt
    out = pending.materialize()
    float(np.sum(out[-1].all_latents[-1]))
    n_done += len(out)
    dt = time.perf_counter() - t0
    report["pipelined_samples_per_sec"] = round(n_done / dt, 4)
    report["pipelined_batch_s"] = round(dt / n_stream, 4)
    report["stream_batches"] = n_stream

    # derived
    report["scan_minus_ceiling_note"] = (
        "scan_device_s - (B / kernel_ceiling_sps) = SDE/buffer overhead; "
        "see bench_reconcile for the ceiling")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
