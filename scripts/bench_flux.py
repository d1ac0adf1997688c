"""FLUX.1-dev per-chip perf grounding on v5e-1.

The 12B transformer does not fit one v5e chip (12B × 2 B bf16 = 24 GB vs
16 GB HBM), so — like ``bench_wan14b.py`` — this times the EXACT dev block
geometry (hidden 3072, 24 heads, mlp ×4) at the BASELINE rollout sequence
(512px → 1024 packed image tokens + 512 T5 tokens) on depth-reduced
stacks, and solves per-DOUBLE-block and per-SINGLE-block times from three
stack timings (the two block types differ, so one difference is not
enough):

    t(2d,4s) − t(1d,2s) = 1·double + 2·single
    t(1d,4s) − t(1d,2s) = 2·single

Full model = 19 double + 38 single (+ measured embed/head overhead).
FLUX.1-dev is guidance-distilled (guidance embedding, no CFG doubling),
so the forward is timed at the rollout micro-batch directly.

Usage: python scripts/bench_flux.py                     (real chip)
       BENCH_FORCE_CPU=1 SEQ=64 python scripts/bench_flux.py
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


def time_stack(n_double: int, n_single: int, B: int, s_img: int, s_txt: int, on_tpu: bool):
    from flow_factory_tpu.models.flux.transformer import FluxConfig, FluxTransformer

    if on_tpu:
        cfg = FluxConfig.flux1_dev(
            num_double_blocks=n_double, num_single_blocks=n_single,
            dtype="bfloat16", attn_backend="flash")
    else:
        cfg = FluxConfig.tiny(num_double_blocks=n_double, num_single_blocks=n_single)
    model = FluxTransformer(cfg)
    latents = jnp.zeros((B, s_img, cfg.in_channels), cfg.compute_dtype)
    tt = jnp.full((B,), 800.0)
    context = jnp.zeros((B, s_txt, cfg.context_dim), cfg.compute_dtype)
    pooled = jnp.zeros((B, cfg.pooled_dim), cfg.compute_dtype)
    side = int(np.sqrt(s_img))
    ii, jj = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    img_ids = jnp.asarray(
        np.stack([np.zeros(s_img), ii.reshape(-1), jj.reshape(-1)], -1), jnp.float32)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)
    guidance = jnp.full((B,), 3.5) if cfg.guidance_embeds else None
    params = model.init(jax.random.PRNGKey(0), latents, tt, context, pooled,
                        img_ids, txt_ids, guidance)["params"]
    if on_tpu:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    fwd = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, tt, context, pooled, img_ids, txt_ids, guidance))
    out = fwd(params, latents)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(params, latents)
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        best = min(best, time.perf_counter() - t0)
    del params
    return best


def main() -> None:
    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    B = int(os.environ.get("B", "8" if on_tpu else "2"))
    s_img = int(os.environ.get("SEQ", "1024" if on_tpu else "64"))
    s_txt = 512 if on_tpu else 16
    D = 3072 if on_tpu else 64
    n_double_full, n_single_full = 19, 38
    steps = 10

    t_a = time_stack(2, 4, B, s_img, s_txt, on_tpu)  # 2d + 4s
    t_b = time_stack(1, 2, B, s_img, s_txt, on_tpu)  # 1d + 2s
    t_c = time_stack(1, 4, B, s_img, s_txt, on_tpu)  # 1d + 4s
    per_single = max((t_c - t_b) / 2, 0.0)
    per_double = max((t_a - t_b) - 2 * per_single, 0.0)
    overhead = max(t_b - per_double - 2 * per_single, 0.0)
    step_s = n_double_full * per_double + n_single_full * per_single + overhead
    samples_per_sec = B / (steps * step_s)

    # FLOP model (per token, per block, fwd): double = qkvo 4·2·D² per stream
    # + 2 FFNs 2·2·D·4D; single = fused 2·D·7D + 2·5D·D; attention ≈ 4·S·D
    S = s_img + s_txt
    fl_double = S * (4 * 2 * D * D + 2 * 2 * D * 4 * D) * 2 + 4 * S * S * D * 2
    fl_single = S * (2 * D * 7 * D + 2 * 5 * D * D) + 4 * S * S * D
    step_flops = B * (n_double_full * fl_double + n_single_full * fl_single)
    mfu = step_flops / step_s / 197e12 if on_tpu else 0.0

    print(json.dumps({
        "metric": "flux1dev_block_extrapolated_step_ms" if on_tpu
                  else "flux1dev_block_extrapolated_step_ms[cpu-tiny]",
        "value": round(step_s * 1e3, 2),
        "unit": "ms/denoise-step (guidance-distilled, batch %d)" % B,
        "per_double_block_ms": round(per_double * 1e3, 3),
        "per_single_block_ms": round(per_single * 1e3, 3),
        "embed_head_overhead_ms": round(overhead * 1e3, 3),
        "implied_samples_per_sec_per_chip_at_10steps": round(samples_per_sec, 4),
        "mfu_est": round(mfu, 3),
        "note": "12B bf16 weights (24 GB) exceed one v5e's 16 GB HBM; "
                "block geometry measured exactly, depth extrapolated",
    }))


if __name__ == "__main__":
    main()
