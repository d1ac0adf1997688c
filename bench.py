"""Benchmark harness — prints ONE JSON line (stdout) for the driver.

Measures the REAL GRPO rollout workload on the flagship SD3.5-medium
geometry (BASELINE.md workload #1): `adapter.inference()` END TO END —
the jitted `lax.scan` over 10 CFG-doubled MMDiT denoise steps with
FlowMatch-SDE log-probs, slot-mapped trajectory buffers (the GRPO training
subset), 512px VAE decode, and the host fetch that materializes the
samples. This is rollout throughput, not the denoise-kernel ceiling (the
kernel microbench lives on stderr as a secondary line; the training-step
bench is `scripts/bench_train.py`, the full-epoch bench
`scripts/bench_epoch.py` — see docs/performance.md for the 3-level table).

Metric: rollout samples/sec/chip at 512px, 10-step Euler SDE, batch 8.
vs_baseline: PER-CHIP ratio against an H100 running the reference at the
same geometry. The reference publishes no numbers (BASELINE.md), so the
denominator is a fixed documented estimate under the XLA-verified FLOP
model (48.97 TFLOP/sample, `scripts/bench_reconcile.py` — the round-2
122 TFLOP parametric model over-counted 2.5×): 40% MFU on 989 bf16
TFLOP/s ⇒ 8.1 samples/s/H100. One v5e chip has 174-177 MEASURED peak bf16
TFLOP/s (18% of an H100), so per-chip parity is not the right lens —
per-peak-FLOP efficiency is: 63.6% measured MFU (vs the 174 TF/s measured-peak floor) here vs ≤40% estimated
there (docs/performance.md).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

H100_BASELINE_SAMPLES_PER_SEC = 8.1  # documented estimate (see module docstring)

_phase = {"name": "init", "t0": time.time()}


def _start_heartbeat() -> threading.Event:
    """stderr heartbeat so a driver log shows progress during the (possibly
    ~20 min cold) relay compile instead of dead silence (VERDICT r4 Next #1a)."""
    stop = threading.Event()

    def run() -> None:
        while not stop.wait(30.0):
            print(f"[bench {time.time() - _phase['t0']:.0f}s] phase={_phase['name']}",
                  file=sys.stderr, flush=True)

    threading.Thread(target=run, daemon=True).start()
    return stop


def main() -> None:
    _start_heartbeat()
    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU fallback: tiny geometry, still exercises the same code path.
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: through the remote-compile relay a cold
    # SD3.5-M rollout compile is ~20 min; a cache hit replays in seconds.
    # CPU cache is machine-keyed (AOT entries don't port across hosts).
    from flow_factory_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache("tpu" if on_tpu else "cpu")  # honors JAX_COMPILATION_CACHE_DIR
    import jax.numpy as jnp
    import numpy as np

    from flow_factory_tpu.parallel.dist import set_world_size_override

    set_world_size_override(1)

    import __graft_entry__ as g

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

    _phase["name"] = "load-adapter"
    adapter = load_adapter(config)
    adapter.rollout()
    tcfg = adapter.component_configs["transformer"]
    key = jax.random.PRNGKey(0)
    ctx_len = 333 if on_tpu else 16
    embeds = dict(
        prompt_embeds=np.asarray(
            jax.random.normal(key, (B, ctx_len, tcfg.context_dim), jnp.float32)),
        pooled_prompt_embeds=np.asarray(
            jax.random.normal(key, (B, tcfg.pooled_dim), jnp.float32)),
        negative_prompt_embeds=np.asarray(
            jax.random.normal(jax.random.fold_in(key, 1),
                              (B, ctx_len, tcfg.context_dim), jnp.float32)),
        negative_pooled_prompt_embeds=np.asarray(
            jax.random.normal(jax.random.fold_in(key, 2),
                              (B, tcfg.pooled_dim), jnp.float32)),
    )
    adapter.scheduler.set_timesteps(steps, seq_len=(res // 16) ** 2)
    traj = compute_trajectory_indices(adapter.scheduler.train_timesteps, steps)

    def rollout(seed: int, defer: bool = False):
        # the GRPO sampling stage, end to end: scan rollout + trajectory
        # buffers + log-probs + VAE decode + host materialization
        return adapter.inference(
            prompt=["bench"] * B,
            compute_log_prob=True,
            trajectory_indices=traj,
            seed=seed,
            height=res, width=res, num_inference_steps=steps,
            guidance_scale=4.5,
            defer=defer,
            **embeds,
        )

    _phase["name"] = "warmup-compile"
    samples = rollout(0)  # warmup/compile
    assert len(samples) == B and samples[0].image is not None
    _phase["name"] = "stream"

    # Software-pipelined stream, exactly as GRPOTrainer.sample runs it:
    # dispatch batch b+1 BEFORE materializing batch b, so batch b's host
    # fetch overlaps batch b+1's device compute (models/abc.py:PendingRollout).
    # 12 batches (BENCH_STREAM to override): the reference epoch geometry
    # streams 144 batches, so the unoverlapped first/last fetch must be
    # amortized, not dominant.
    n_stream = int(os.environ.get("BENCH_STREAM", "12" if on_tpu else "6"))
    metric_name = ("sd35m_grpo_rollout_e2e_samples_per_sec_per_chip" if on_tpu
                   else "sd35m_grpo_rollout_e2e_samples_per_sec_per_chip[cpu-tiny]")

    def emit(rate: float, provisional: bool = False) -> None:
        # ONE complete JSON line per call, flushed immediately: the driver
        # parses the LAST complete line, so a provisional flush early in the
        # stream turns a timeout-kill into a real (slightly pessimistic)
        # number instead of rc=124/parsed:null (VERDICT r4 Next #1a).
        rec = {
            "metric": metric_name,
            "value": round(rate, 4),
            "unit": "samples/s/chip",
            "vs_baseline": round(rate / H100_BASELINE_SAMPLES_PER_SEC, 4),
            "baseline_note": "denominator is a documented ESTIMATE "
                             "(8.1 samples/s = 40% MFU H100; see docstring)",
        }
        if provisional:
            rec["provisional"] = True
        print(json.dumps(rec), flush=True)

    # pipeline depth 2 — the trainer default (training_args.pipeline_depth):
    # two dispatched batches stay in flight so the device never drains while
    # a fetch rides the wire (round 5: 64-sample epoch 86.1 → 59.5 s)
    from collections import deque

    depth = max(1, int(os.environ.get("BENCH_PIPELINE_DEPTH", "2")))
    prov_at = min(3, n_stream - 1)  # batches materialized before the early flush
    t0 = time.perf_counter()
    pending = deque()
    n_done = 0
    n_mat = 0
    for trial in range(1, n_stream + 1):
        pending.append(rollout(trial, defer=True))
        if len(pending) > depth:
            out = pending.popleft().materialize()
            # materialize() returns host numpy — the fetch IS the fence;
            # touch a data-dependent scalar anyway for belt-and-braces
            float(np.sum(out[-1].all_latents[-1]))
            n_done += len(out)
            n_mat += 1
            if n_mat == prov_at:
                emit(n_done / (time.perf_counter() - t0), provisional=True)
    while pending:
        out = pending.popleft().materialize()
        float(np.sum(out[-1].all_latents[-1]))
        n_done += len(out)
    stream_dt = time.perf_counter() - t0

    samples_per_sec = n_done / stream_dt
    emit(samples_per_sec)
    print(json.dumps({
        "detail": "pipelined adapter.inference() stream: scan + buffers + decode + "
                  "host fetch, dispatch b+1 before materializing b (trainer loop)",
        "batch": B, "resolution": res, "steps": steps, "stream_batches": n_stream,
        "stream_s": round(stream_dt, 3),
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
