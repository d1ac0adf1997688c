"""On-chip profile of the SD3.5-M denoise step — where do the non-matmul
~180 ms/step go? (docs/performance.md §Step profile: kernel ceiling is 60%
MFU; ideal matmul time is ~270 ms of the measured ~451 ms per CFG-doubled
velocity call.)

Traces `jax.profiler` around chained velocity calls, then parses the
chrome-trace export and aggregates device-track op durations by HLO
category (fusion kinds, convolution/dot, custom-call = Pallas flash,
copy/transpose, all-reduce, ...). Through the relay the FIRST profile
session can take minutes — budget >400 s (CLAUDE.md).

Usage: python scripts/profile_step.py           (real chip)
       PROFILE_ATTN=native python scripts/profile_step.py
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(logdir: str, min_ms: float = 0.5):
    """Sum device-track event durations by normalized op name."""
    paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device pids (process_name metadata mentioning TPU / device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA Op" in n}
    buckets = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0)) / 1e3  # µs → ms
        # strip SSA numbering: fusion.123 → fusion; %dot.4 → dot
        base = re.sub(r"[%]?([a-zA-Z_\-]+)[.\d]*$", r"\1", name.split("/")[-1])
        buckets[base] += dur
        total += dur
    rows = [(n, round(d, 1), round(100 * d / max(total, 1e-9), 1))
            for n, d in buckets.most_common() if d >= min_ms]
    return {"device_tracks": sorted(pid_names[p] for p in dev_pids),
            "total_device_ms": round(total, 1), "rows": rows}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")))
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
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
    attn = os.environ.get("PROFILE_ATTN")
    if attn:
        config.model_args.attn_backend = attn
    config.training_args.num_inference_steps = steps
    config.training_args.resolution = res

    from flow_factory_tpu.models import load_adapter

    adapter = load_adapter(config)
    adapter.rollout()
    tcfg = adapter.component_configs["transformer"]
    key = jax.random.PRNGKey(0)
    ctx_len = 333 if on_tpu else 16
    dev_embeds = dict(
        prompt_embeds=jax.random.normal(key, (B, ctx_len, tcfg.context_dim), jnp.float32),
        pooled_prompt_embeds=jax.random.normal(key, (B, tcfg.pooled_dim), jnp.float32),
        negative_prompt_embeds=jax.random.normal(
            jax.random.fold_in(key, 1), (B, ctx_len, tcfg.context_dim), jnp.float32),
        negative_pooled_prompt_embeds=jax.random.normal(
            jax.random.fold_in(key, 2), (B, tcfg.pooled_dim), jnp.float32),
    )
    h, w, c = adapter.latent_shape(res, res)
    lat = jnp.zeros((B, h, w, c), jnp.float32)
    t_arr = jnp.full((B,), 500.0, jnp.float32)
    merged = adapter.merged_params("transformer")

    @jax.jit
    def denoise_chain(m, x, t, e):
        def body(i, x):
            v = adapter._velocity(m, x, t, e, jnp.float32(4.5), do_cfg=True)
            return x - 0.05 * v

        return jax.lax.fori_loop(0, steps, body, x)

    def fence(x):
        return float(jax.device_get(jnp.sum(x)))

    fence(denoise_chain(merged, lat, t_arr, dev_embeds))  # warm/compile
    logdir = os.environ.get("PROFILE_DIR", "/tmp/fft_step_profile")
    jax.profiler.start_trace(logdir)
    fence(denoise_chain(merged, lat, t_arr, dev_embeds))
    jax.profiler.stop_trace()

    report = aggregate_trace(logdir)
    report["steps_per_trace"] = steps
    report["attn_backend"] = attn or "flash(default)"
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
