"""End-to-end parity vs an independent torch reference (VERDICT r4 Next #4).

diffusers is not installed in this environment, so the reference's L3 method
(seed-matched diff against the torch pipeline,
``/root/reference/.agents/knowledge/topics/parity_testing.md``) is realized
against ``tests/torch_ref_sd3.py`` — a from-scratch torch implementation of
the diffusers ``SD3Transformer2DModel`` conventions with diffusers parameter
naming. The torch state dict flows through the SAME key map real SD3.5
checkpoints use (``utils/checkpoint.py:sd3_transformer_key_map``, strict
mode), so this validates, end to end and independently of our own goldens:

* the key map + layout transposes (torch Linear/Conv → flax),
* the flax MMDiT-X graph (incl. the scale-first AdaLayerNormContinuous and
  the parallel dual-attention branch — both round-5 fixes this test pinned),
* the FlowMatch-Euler dynamic-shift sigma schedule,
* the full CFG rollout loop: 4-step ODE trajectory diff < 1e-4 fp32.
"""
import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from torch_ref_sd3 import TorchSD3Transformer

DEPTH, DUAL = 2, (0,)


def _import_into_flax(tm):
    from flow_factory_tpu.models.sd3.transformer import MMDiTConfig, SD3Transformer
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        sd3_transformer_key_map,
    )

    cfg = MMDiTConfig.tiny(dtype="float32", attn_backend="native",
                           context_dim=48, pooled_dim=40)  # adapter tiny preset dims
    fm = SD3Transformer(cfg)
    template = fm.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2 * cfg.patch_size, 2 * cfg.patch_size, cfg.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, 4, cfg.context_dim)),
        jnp.zeros((1, cfg.pooled_dim)),
    )["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_diffusers_params(
        sd,
        sd3_transformer_key_map(DEPTH, DUAL),
        template,
        raw_map={"pos_embed.pos_embed": "pos_embed/pos_embed"},
        strict=True,  # every torch key consumed, every flax leaf filled
        component="transformer",
    )
    return fm, params


def _rand_inputs(B=2, H=16, W=16, L=6, seed=3):
    rng = np.random.default_rng(seed)
    return {
        "latents": rng.standard_normal((B, 16, H, W)).astype(np.float32),
        "t": np.asarray([437.0, 801.0][:B], np.float32),
        "ctx": rng.standard_normal((B, L, 48)).astype(np.float32),
        "pooled": rng.standard_normal((B, 40)).astype(np.float32),
    }


def test_single_forward_parity_through_key_map():
    torch.manual_seed(0)
    tm = TorchSD3Transformer(context_dim=48, pooled_dim=40)
    fm, params = _import_into_flax(tm)
    inp = _rand_inputs()
    theirs = tm(
        torch.from_numpy(inp["latents"]),
        torch.from_numpy(inp["t"]),
        torch.from_numpy(inp["ctx"]),
        torch.from_numpy(inp["pooled"]),
    ).numpy()  # (B, C, H, W)
    ours = np.asarray(
        fm.apply(
            {"params": params},
            jnp.asarray(np.transpose(inp["latents"], (0, 2, 3, 1))),
            jnp.asarray(inp["t"]),
            jnp.asarray(inp["ctx"]),
            jnp.asarray(inp["pooled"]),
        )
    ).transpose(0, 3, 1, 2)
    diff = np.max(np.abs(ours - theirs))
    assert diff < 2e-5, f"single-forward max|Δ| = {diff}"


def test_flux_single_forward_parity_through_key_map():
    """FLUX.1 tiny: torch reference (diffusers naming) → key map (incl. the
    single-block qkv+mlp fusion) → flax forward. Validates the double/single
    block graphs, the multi-axis interleaved-pair RoPE, and the scale-first
    norm_out against an independent implementation."""
    from torch_ref_flux import TorchFluxTransformer
    from flow_factory_tpu.models.flux.transformer import FluxConfig, FluxTransformer
    from flow_factory_tpu.utils.checkpoint import (
        flux_transformer_key_map,
        fuse_flux_single_block_qkv_mlp,
        import_diffusers_params,
    )

    torch.manual_seed(1)
    tm = TorchFluxTransformer()
    cfg = FluxConfig.tiny(dtype="float32", attn_backend="native")
    fm = FluxTransformer(cfg)

    B, L_img, L_txt = 2, 12, 5
    rng = np.random.default_rng(5)
    lat = rng.standard_normal((B, L_img, cfg.in_channels)).astype(np.float32)
    ctx = rng.standard_normal((B, L_txt, cfg.context_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, cfg.pooled_dim)).astype(np.float32)
    t = np.asarray([315.0, 777.0], np.float32)
    guid = np.asarray([3.5, 3.5], np.float32)
    img_ids = np.stack([np.zeros(L_img), np.arange(L_img) // 4, np.arange(L_img) % 4],
                       axis=1).astype(np.int32)
    txt_ids = np.zeros((L_txt, 3), np.int32)

    template = fm.init(
        jax.random.PRNGKey(0),
        jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(pooled),
        jnp.asarray(img_ids), jnp.asarray(txt_ids), jnp.asarray(guid),
    )["params"]
    sd = fuse_flux_single_block_qkv_mlp(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, 2)
    params = import_diffusers_params(
        sd, flux_transformer_key_map(2, 2), template, strict=True, component="flux")

    theirs = tm(
        torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx),
        torch.from_numpy(pooled), torch.from_numpy(img_ids.astype(np.float32)),
        torch.from_numpy(txt_ids.astype(np.float32)), torch.from_numpy(guid),
    ).numpy()
    ours = np.asarray(fm.apply(
        {"params": params},
        jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(pooled),
        jnp.asarray(img_ids), jnp.asarray(txt_ids), jnp.asarray(guid),
    ))
    diff = np.max(np.abs(ours - theirs))
    assert diff < 2e-5, f"flux single-forward max|Δ| = {diff}"


def test_flux_full_rollout_trajectory_parity():
    """FLUX.1 tiny: adapter.inference() 4-step guidance-distilled ODE rollout
    vs a straight-line torch loop over the same imported weights — covers the
    latent packing order, latent_image_ids generation, the mu-shifted
    schedule at the packed seq_len, and the guidance-embed wiring that the
    single-forward test takes as explicit inputs."""
    from torch_ref_flux import TorchFluxTransformer
    from flow_factory_tpu.hparams.args import Arguments
    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.parallel.dist import set_world_size_override
    from flow_factory_tpu.utils.checkpoint import (
        flux_transformer_key_map,
        fuse_flux_single_block_qkv_mlp,
        import_diffusers_params,
    )

    set_world_size_override(1)
    B, res, steps, g = 2, 32, 4, 3.5
    config = Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": "flux1", "model_name_or_path": "tiny",
                  "finetune_type": "lora", "lora_rank": 4, "lora_alpha": 8,
                  "attn_backend": "native", "master_dtype": "float32",
                  "inference_dtype": "float32"},
        "scheduler": {"dynamics_type": "ODE", "noise_level": 0.0,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": res,
                  "num_inference_steps": steps, "guidance_scale": g,
                  "per_device_batch_size": 1, "group_size": 2,
                  "unique_sample_num_per_epoch": 1,
                  "latent_storage_dtype": "fp32", "ema_decay": 0},
        "eval": {}, "log": {}, "rewards": [],
    })
    adapter = load_adapter(config)

    torch.manual_seed(4)
    tm = TorchFluxTransformer()
    sd = fuse_flux_single_block_qkv_mlp(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, 2)
    params = import_diffusers_params(
        sd, flux_transformer_key_map(2, 2), adapter.params["transformer"],
        strict=True, component="flux")
    adapter.params["transformer"] = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(13)
    tcfg = adapter.component_configs["transformer"]
    embeds = {
        "prompt_embeds": rng.standard_normal((B, 5, tcfg.context_dim)).astype(np.float32),
        "pooled_prompt_embeds": rng.standard_normal((B, tcfg.pooled_dim)).astype(np.float32),
    }
    adapter.rollout()
    samples = adapter.inference(
        prompt=["parity"] * B,
        compute_log_prob=False,
        trajectory_indices="all",
        seed=23,
        height=res, width=res, num_inference_steps=steps,
        guidance_scale=g,
        decode=False,
        **embeds,
    )
    traj = np.stack([np.asarray(s.all_latents, np.float32) for s in samples])  # (B, T+1, L, Cp)
    assert traj.shape[1] == steps + 1

    lh, lw, _ = adapter.latent_shape(res, res)
    sig_ref = _reference_sigmas(steps, seq_len=(lh // 2) * (lw // 2))
    np.testing.assert_allclose(
        np.asarray(samples[0].extra_kwargs["sigmas"], np.float32), sig_ref, atol=1e-6)

    # independent recompute of the RoPE ids (diffusers latent_image_ids)
    rows, cols = lh // 2, lw // 2
    img_ids = np.zeros((rows * cols, 3), np.float32)
    img_ids[:, 1] = np.repeat(np.arange(rows), cols)
    img_ids[:, 2] = np.tile(np.arange(cols), rows)
    txt_ids = np.zeros((5, 3), np.float32)

    x = torch.from_numpy(traj[:, 0])  # packed (B, L, Cp)
    ctx_t = torch.from_numpy(embeds["prompt_embeds"])
    pool_t = torch.from_numpy(embeds["pooled_prompt_embeds"])
    guid = torch.full((B,), g)
    worst = 0.0
    for i in range(steps):
        t = torch.full((B,), float(sig_ref[i]) * 1000.0)
        v = tm(x, t, ctx_t, pool_t, torch.from_numpy(img_ids),
               torch.from_numpy(txt_ids), guid)
        x = x + v * (float(sig_ref[i + 1]) - float(sig_ref[i]))
        worst = max(worst, float(np.max(np.abs(traj[:, i + 1] - x.numpy()))))
    assert worst < 1e-4, f"flux trajectory max|Δ| = {worst}"


def test_wan_single_forward_parity_through_key_map():
    """Wan 2.x tiny: torch reference (diffusers naming) → key map → flax.
    Validates the 3-D patch embed import, ACROSS-HEADS qk-norm (round-5
    fix: γ shape (D,), normalized over all heads — original WanRMSNorm(dim)),
    the scale_shift_table modulation order, 3-D RoPE, and the shift-first
    head table."""
    from torch_ref_wan import TorchWanTransformer
    from flow_factory_tpu.models.wan.transformer import WanConfig, WanTransformer
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        wan_transformer_key_map,
    )

    torch.manual_seed(2)
    tm = TorchWanTransformer()
    cfg = WanConfig.tiny(dtype="float32", attn_backend="native")
    fm = WanTransformer(cfg)

    B, T, H, W = 2, 2, 4, 4
    rng = np.random.default_rng(9)
    lat = rng.standard_normal((B, 16, T, H, W)).astype(np.float32)
    ctx = rng.standard_normal((B, 5, cfg.context_dim)).astype(np.float32)
    t = np.asarray([612.0, 88.0], np.float32)

    template = fm.init(
        jax.random.PRNGKey(0),
        jnp.asarray(np.transpose(lat, (0, 2, 3, 4, 1))),
        jnp.asarray(t), jnp.asarray(ctx),
    )["params"]
    km, raw = wan_transformer_key_map(2)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_diffusers_params(
        sd, km, template, raw_map=raw, strict=True, component="wan")

    theirs = tm(
        torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx)
    ).numpy()  # (B, C, T, H, W)
    ours = np.asarray(fm.apply(
        {"params": params},
        jnp.asarray(np.transpose(lat, (0, 2, 3, 4, 1))),
        jnp.asarray(t), jnp.asarray(ctx),
    )).transpose(0, 4, 1, 2, 3)
    diff = np.max(np.abs(ours - theirs))
    assert diff < 2e-5, f"wan single-forward max|Δ| = {diff}"


def test_qwen_image_single_forward_parity_through_key_map():
    """Qwen-Image tiny: torch reference (diffusers naming — Sequential
    img_mod/txt_mod packing TWO (shift, scale, gate) triples, pre-txt_in
    RMSNorm, timestep-only temb) → key map → our FluxTransformer-with-
    txt_norm expression of the graph."""
    from torch_ref_qwen import TorchQwenImageTransformer
    from flow_factory_tpu.models.flux.transformer import FluxConfig, FluxTransformer
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        qwen_image_transformer_key_map,
    )

    torch.manual_seed(6)
    tm = TorchQwenImageTransformer()
    cfg = FluxConfig.tiny(
        dtype="float32", attn_backend="native", pooled_dim=0,
        guidance_embeds=False, num_single_blocks=0, num_double_blocks=2,
        context_dim=32, txt_norm=True,
    )
    fm = FluxTransformer(cfg)

    B, L_img, L_txt = 2, 12, 5
    rng = np.random.default_rng(11)
    lat = rng.standard_normal((B, L_img, cfg.in_channels)).astype(np.float32)
    ctx = rng.standard_normal((B, L_txt, cfg.context_dim)).astype(np.float32)
    t = np.asarray([250.0, 905.0], np.float32)
    img_ids = np.stack([np.zeros(L_img), np.arange(L_img) // 4, np.arange(L_img) % 4],
                       axis=1).astype(np.int32)
    txt_ids = np.stack([np.arange(L_txt)] * 3, axis=1).astype(np.int32)

    template = fm.init(
        jax.random.PRNGKey(0),
        jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx), None,
        jnp.asarray(img_ids), jnp.asarray(txt_ids),
    )["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_diffusers_params(
        sd, qwen_image_transformer_key_map(2), template,
        strict=True, component="qwen-image")

    theirs = tm(
        torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx),
        torch.from_numpy(img_ids.astype(np.float32)),
        torch.from_numpy(txt_ids.astype(np.float32)),
    ).numpy()
    ours = np.asarray(fm.apply(
        {"params": params},
        jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx), None,
        jnp.asarray(img_ids), jnp.asarray(txt_ids),
    ))
    diff = np.max(np.abs(ours - theirs))
    assert diff < 2e-5, f"qwen-image single-forward max|Δ| = {diff}"


@pytest.mark.parametrize("solver_order,T", [(2, 6), (3, 8)])
def test_unipc_eval_matches_torch_reference(solver_order, T):
    """The scan-compatible UniPC(bh2) eval sampler (explicit carry +
    host-precomputed order schedule, scheduler/unipc.py) vs an independent
    stateful reimplementation of the diffusers algorithm
    (torch_ref_unipc.py): identical trajectories for a deterministic
    pseudo-model, through the warm-up ramp, the corrector, and the
    lower_order_final taper — orders 2 and 3."""
    from torch_ref_unipc import TorchUniPC
    from flow_factory_tpu.scheduler.flow_match_euler import build_flow_match_sigmas
    from flow_factory_tpu.scheduler.unipc import (
        compute_unipc_orders,
        init_unipc_carry,
        unipc_eval_step,
    )

    sigmas = build_flow_match_sigmas(T, shift=3.0)  # Wan-style static shift
    rng = np.random.default_rng(3)
    W = (rng.standard_normal((8, 8)) * 0.2).astype(np.float32)

    def vel(x, sigma):  # deterministic pseudo-model of (sample, σ)
        return x @ W + np.float32(sigma) * 0.1

    x0 = rng.standard_normal((2, 8)).astype(np.float32)

    ref = TorchUniPC(sigmas, solver_order=solver_order)
    x_ref = x0.copy()
    for i in range(T):
        x_ref = ref.step(vel(x_ref, sigmas[i]), x_ref)

    pred, corr = compute_unipc_orders(T, solver_order)
    carry = init_unipc_carry(jnp.asarray(x0))
    for i in range(T):
        v = vel(np.asarray(carry.x, np.float32), sigmas[i])
        carry, _ = unipc_eval_step(
            carry, jnp.asarray(v), sigmas[i], sigmas[i + 1],
            jnp.int32(pred[i]), jnp.int32(corr[i]),
        )
    np.testing.assert_allclose(
        np.asarray(carry.x), x_ref, rtol=3e-4, atol=3e-5,
        err_msg=f"UniPC order-{solver_order} trajectory diverged")


def _reference_sigmas(T: int, seq_len: int) -> np.ndarray:
    """Dynamic-shift FlowMatch schedule, reimplemented from the diffusers
    semantics (independent of scheduler/flow_match_euler.py)."""
    m = (1.15 - 0.5) / (4096 - 256)
    mu = seq_len * m + (0.5 - m * 256)
    sig = np.linspace(1.0, 1.0 / T, T, dtype=np.float64)
    sig = math.exp(mu) / (math.exp(mu) + (1.0 / sig - 1.0))
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def test_full_rollout_trajectory_parity():
    """adapter.inference() 4-step CFG ODE rollout vs a straight-line torch
    loop over the same imported weights, same x0, same embeds."""
    import __graft_entry__ as g
    from flow_factory_tpu.models import load_adapter
    from flow_factory_tpu.parallel.dist import set_world_size_override

    set_world_size_override(1)
    B, res, steps, gscale = 2, 32, 4, 2.0
    config = g._make_config(tiny=True)
    config.scheduler_args.dynamics_type = "ODE"
    config.scheduler_args.noise_level = 0.0
    config.training_args.num_inference_steps = steps
    config.training_args.resolution = res
    adapter = load_adapter(config)

    torch.manual_seed(0)
    tm = TorchSD3Transformer(context_dim=48, pooled_dim=40)
    _, params = _import_into_flax(tm)
    adapter.params["transformer"] = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(7)
    tcfg = adapter.component_configs["transformer"]
    embeds = {
        "prompt_embeds": rng.standard_normal((B, 6, tcfg.context_dim)).astype(np.float32),
        "pooled_prompt_embeds": rng.standard_normal((B, tcfg.pooled_dim)).astype(np.float32),
        "negative_prompt_embeds": rng.standard_normal((B, 6, tcfg.context_dim)).astype(np.float32),
        "negative_pooled_prompt_embeds": rng.standard_normal((B, tcfg.pooled_dim)).astype(np.float32),
    }
    adapter.rollout()
    samples = adapter.inference(
        prompt=["parity"] * B,
        compute_log_prob=False,
        trajectory_indices="all",
        seed=11,
        height=res, width=res, num_inference_steps=steps,
        guidance_scale=gscale,
        decode=False,
        **embeds,
    )
    assert len(samples) == B
    traj = np.stack([np.asarray(s.all_latents, np.float32) for s in samples])  # (B, T+1, H, W, C)
    assert traj.shape[1] == steps + 1

    # schedule: independent recompute must match the scheduler's
    # (seq_len = patchified token count, the diffusers SD3 image_seq_len)
    lh, lw, _ = adapter.latent_shape(res, res)
    p = tcfg.patch_size
    sig_ref = _reference_sigmas(steps, seq_len=(lh // p) * (lw // p))
    sig_ours = np.asarray(samples[0].extra_kwargs["sigmas"], np.float32)
    np.testing.assert_allclose(sig_ours, sig_ref, atol=1e-6)

    # torch loop from the SAME x0
    x = torch.from_numpy(np.transpose(traj[:, 0], (0, 3, 1, 2)))  # (B, C, H, W)
    ctx_t = torch.from_numpy(embeds["prompt_embeds"])
    nctx_t = torch.from_numpy(embeds["negative_prompt_embeds"])
    pool_t = torch.from_numpy(embeds["pooled_prompt_embeds"])
    npool_t = torch.from_numpy(embeds["negative_pooled_prompt_embeds"])
    worst = 0.0
    for i in range(steps):
        t = torch.full((B,), float(sig_ref[i]) * 1000.0)
        v_cond = tm(x, t, ctx_t, pool_t)
        v_uncond = tm(x, t, nctx_t, npool_t)
        v = v_uncond + gscale * (v_cond - v_uncond)
        x = x + v * (float(sig_ref[i + 1]) - float(sig_ref[i]))
        ours_i = np.transpose(traj[:, i + 1], (0, 3, 1, 2))
        worst = max(worst, float(np.max(np.abs(ours_i - x.numpy()))))
    assert worst < 1e-4, f"trajectory max|Δ| = {worst}"
