"""Wan-14B per-chip perf grounding on v5e-1 (VERDICT round-1 item 6).

The 14B transformer does NOT fit one v5e chip: 14B params × 2 B (bf16) =
28 GB vs 16 GB HBM — the BASELINE geometry needs ≥2 chips for weights alone
(the v5p-64 projection shards it trivially). To still ground the projection
in MEASURED 14B-layer silicon numbers, this script times the EXACT 14B
block geometry (hidden 5120, ffn 13824, 40 heads — ``WanConfig.wan21_14b``)
at the BASELINE rollout sequence length, on a depth-reduced stack that
fits (N layers instead of 40), and reports:

  * measured ms per 14B block (fwd, CFG-doubled, micro-batch 1),
  * extrapolated ms/denoise-step for the full 40-layer model
    (= 40 × block + measured embed/head overhead),
  * implied samples/s/chip at the 480p×81f 28-step geometry IF the weights
    were resident (i.e. the ≥2-chip per-chip rate).

Every Wan2.1-14B block is identical, so block-time × depth extrapolation
is exact up to one embed/head term, which is measured separately via a
depth-1 vs depth-N difference.

Usage: python scripts/bench_wan14b.py              (real chip)
       BENCH_FORCE_CPU=1 DEPTH=2 SEQ=128 python scripts/bench_wan14b.py
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

import jax.numpy as jnp
import numpy as np


def time_stack(depth: int, seq: int, ctx: int, on_tpu: bool):
    """Best-of-3 fenced seconds per CFG-doubled forward of a depth-`depth`
    14B-geometry Wan stack at sequence length `seq`."""
    from flow_factory_tpu.models.wan.transformer import WanConfig, WanTransformer

    if on_tpu:
        cfg = WanConfig.wan21_14b(num_layers=depth, dtype="bfloat16",
                                  attn_backend="flash")
    else:
        cfg = WanConfig.tiny(num_layers=depth)
    model = WanTransformer(cfg)
    pt, ph, pw = cfg.patch_size
    # factor seq into a (t, h, w) patch grid: t fixed by the video length
    t_p = 21 if on_tpu else 2  # (81 frames → 21 latent frames)
    hw = seq // t_p
    h_p = int(np.sqrt(hw))
    w_p = hw // h_p
    x = jnp.zeros((2, t_p * pt, h_p * ph, w_p * pw, cfg.in_channels), cfg.compute_dtype)
    tt = jnp.full((2,), 800.0)
    context = jnp.zeros((2, ctx, cfg.context_dim), cfg.compute_dtype)
    params = model.init(jax.random.PRNGKey(0), x, tt, context)["params"]
    if on_tpu:
        # rollout holds weights in bf16; fp32 init copies would OOM at depth 4
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, tt, context))
    out = fwd(params, x)
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = fwd(params, x)
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        best = min(best, time.perf_counter() - t0)
    n_tokens = t_p * h_p * w_p
    del params
    return best, n_tokens


def main() -> None:
    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    # BASELINE Wan geometry: 480×832, 81 frames → latent 21×60×104 → patch
    # (1,2,2) → 21×30×52 = 32760 tokens. Fit HBM via DEPTH env (weights for
    # N layers + activations must fit 16 GB: 4 layers ≈ 2.8 GB weights).
    depth = int(os.environ.get("DEPTH", "4" if on_tpu else "2"))
    seq = int(os.environ.get("SEQ", str(21 * 30 * 52) if on_tpu else "128"))
    ctx = 512 if on_tpu else 16
    full_depth = 40 if on_tpu else 2

    t_deep, n_tokens = time_stack(depth, seq, ctx, on_tpu)
    t_shallow, _ = time_stack(1, seq, ctx, on_tpu)
    per_block = (t_deep - t_shallow) / max(depth - 1, 1)
    overhead = max(t_shallow - per_block, 0.0)
    step_s = full_depth * per_block + overhead  # one CFG-doubled denoise fwd
    steps = 28  # BASELINE Wan eval/rollout steps (UniPC grid)
    samples_per_sec = 1.0 / (steps * step_s)

    print(json.dumps({
        "metric": "wan14b_block_extrapolated_step_ms" if on_tpu
                  else "wan14b_block_extrapolated_step_ms[cpu-tiny]",
        "value": round(step_s * 1e3, 2),
        "unit": "ms/denoise-step (CFG-doubled, micro-batch 1)",
        "per_block_ms": round(per_block * 1e3, 3),
        "embed_head_overhead_ms": round(overhead * 1e3, 3),
        "tokens": n_tokens,
        "depth_measured": depth,
        "implied_samples_per_sec_per_chip_at_28steps": round(samples_per_sec, 5),
        "note": "14B bf16 weights (28 GB) exceed one v5e's 16 GB HBM; "
                "block geometry measured exactly, depth extrapolated",
    }))


if __name__ == "__main__":
    main()
