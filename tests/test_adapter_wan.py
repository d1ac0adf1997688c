"""Wan T2V adapter: 5-D video latents, UniPC scheduler, replay invariant."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.samples import stack_samples
from flow_factory_tpu.scheduler.unipc import UniPCSDEScheduler, init_unipc_carry, unipc_eval_step


@pytest.fixture(scope="module")
def adapter():
    cfg = Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": "wan2-t2v", "model_name_or_path": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "float32"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 4,
                  "guidance_scale": 5.0, "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2, "latent_storage_dtype": "fp32",
                  "num_frames": 5},
        "eval": {}, "log": {}, "rewards": [],
    })
    return load_adapter(cfg)


def test_uses_unipc_scheduler(adapter):
    assert isinstance(adapter.scheduler, UniPCSDEScheduler)


def test_video_rollout_and_replay(adapter):
    adapter.rollout()
    samples = adapter.inference(prompt=["a cat runs", "a dog jumps"], compute_log_prob=True, seed=0)
    s = samples[0]
    assert s.video.shape == (5, 3, 32, 32)
    assert s.all_latents.ndim == 5  # (S, T', h, w, c)
    b = stack_samples(samples)
    sig, nl = s.extra_kwargs["sigmas"], s.extra_kwargs["noise_levels"]
    i = int(np.nonzero(nl)[0][0])
    li, lni, lpi = s.latent_index_map[i], s.latent_index_map[i + 1], s.log_prob_index_map[i]
    batch = {
        "latents": jnp.asarray(b["all_latents"][:, li]),
        "next_latents": jnp.asarray(b["all_latents"][:, lni]),
        "timestep": jnp.full((2,), float(s.timesteps[i])),
        "sigma": jnp.full((2,), float(sig[i])),
        "sigma_next": jnp.full((2,), float(sig[i + 1])),
        "noise_level": jnp.full((2,), float(nl[i])),
        "guidance_scale": jnp.float32(5.0),
        "sigma_max": jnp.float32(sig[1]),
        "prompt_embeds": jnp.asarray(b["prompt_embeds"]),
        "negative_prompt_embeds": jnp.asarray(b["negative_prompt_embeds"]),
    }
    out = adapter.training_forward(adapter.trainable, batch)
    ratio = np.exp(np.asarray(out.log_prob) - b["log_probs"][:, lpi])
    np.testing.assert_allclose(ratio, 1.0, atol=1e-4)


def test_bf16_host_staged_context_keeps_replay_ratio():
    """`stage_context` ships UMT5 embeds over the wire in the compute dtype
    (bf16). Host-side rne cast == device-side rne cast, so the rollout
    (bf16-staged) and replay (fp32-staged, cast at first use) must still
    land on IDENTICAL log-probs: ratio == 1."""
    cfg = Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": "wan2-t2v", "model_name_or_path": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "bfloat16"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 4,
                  "guidance_scale": 5.0, "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2, "latent_storage_dtype": "fp32",
                  "num_frames": 5},
        "eval": {}, "log": {}, "rewards": [],
    })
    bf16_adapter = load_adapter(cfg)
    bf16_adapter.rollout()
    emb = bf16_adapter.stage_context(np.ones((2, 8, 16), np.float32) * 1.00390625)
    assert emb.dtype == jnp.bfloat16  # narrow staging actually happened
    samples = bf16_adapter.inference(
        prompt=["a cat runs", "a dog jumps"], compute_log_prob=True, seed=0)
    s = samples[0]
    b = stack_samples(samples)
    sig, nl = s.extra_kwargs["sigmas"], s.extra_kwargs["noise_levels"]
    i = int(np.nonzero(nl)[0][0])
    li, lni, lpi = s.latent_index_map[i], s.latent_index_map[i + 1], s.log_prob_index_map[i]
    batch = {
        "latents": jnp.asarray(b["all_latents"][:, li]),
        "next_latents": jnp.asarray(b["all_latents"][:, lni]),
        "timestep": jnp.full((2,), float(s.timesteps[i])),
        "sigma": jnp.full((2,), float(sig[i])),
        "sigma_next": jnp.full((2,), float(sig[i + 1])),
        "noise_level": jnp.full((2,), float(nl[i])),
        "guidance_scale": jnp.float32(5.0),
        "sigma_max": jnp.float32(sig[1]),
        # replay stages fp32, exactly as the trainers do
        "prompt_embeds": jnp.asarray(b["prompt_embeds"], jnp.float32),
        "negative_prompt_embeds": jnp.asarray(b["negative_prompt_embeds"], jnp.float32),
    }
    out = bf16_adapter.training_forward(bf16_adapter.trainable, batch)
    ratio = np.exp(np.asarray(out.log_prob) - b["log_probs"][:, lpi])
    np.testing.assert_allclose(ratio, 1.0, atol=1e-4)


def test_video_vae_roundtrip_shapes(adapter):
    v = np.random.rand(1, 5, 3, 32, 32).astype(np.float32)
    z = adapter.encode_video(v)
    # tiny VAE: temporal /2 (front-padded to 6), spatial /2
    assert z.shape == (1, 3, 16, 16, 16)
    dec = adapter.decode_latents(jnp.asarray(z), num_frames=5)
    assert dec.shape == (1, 5, 3, 32, 32)


def _run_unipc(v_of_sigma_x, sigmas, x, solver_order=2):
    """Drive unipc_eval_step over a σ grid with the order schedule."""
    from flow_factory_tpu.scheduler.unipc import compute_unipc_orders

    n = len(sigmas) - 1
    pred, corr = compute_unipc_orders(n, solver_order)
    carry = init_unipc_carry(x)
    for i in range(n):
        v = v_of_sigma_x(float(sigmas[i]), carry.x)
        carry, _ = unipc_eval_step(
            carry, v, jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
            jnp.int32(pred[i]), jnp.int32(corr[i]),
        )
    return carry.x


def test_unipc_exact_on_constant_field():
    """Constant velocity ⇒ exact linear solution; UniPC must land on it."""
    x = jnp.full((1, 4), 1.0)
    sigmas = np.linspace(1.0, 0.0, 9)
    out = _run_unipc(lambda s, x_: jnp.full_like(x_, 2.0), sigmas, x)
    np.testing.assert_allclose(np.asarray(out), -1.0, atol=1e-4)


def test_unipc_beats_euler_on_curved_field():
    """dx/dσ = σ (analytic x(0) = x(1) − 1/2): order-2 UniPC error < Euler."""
    n = 8
    sigmas = np.linspace(1.0, 0.0, n + 1)
    x = jnp.full((1, 1), 1.0)
    out = _run_unipc(lambda s, x_: jnp.full_like(x_, s), sigmas, x)
    x_euler = x
    for i in range(n):
        x_euler = x_euler + jnp.full_like(x_euler, float(sigmas[i])) * float(
            sigmas[i + 1] - sigmas[i]
        )
    exact = 1.0 - 0.5
    assert abs(float(out[0, 0]) - exact) < abs(float(x_euler[0, 0]) - exact)


class _DiffusersUniPCOracle:
    """Independent stateful numpy transcription of diffusers'
    UniPCMultistepScheduler (bh2, predict_x0, flow matching: α=1−σ) — the
    parity oracle VERDICT #9 asks for."""

    def __init__(self, sigmas, solver_order=2, lower_order_final=True):
        self.sigmas = np.asarray(sigmas, np.float64)
        self.order = solver_order
        self.lower_order_final = lower_order_final
        self.model_outputs = [None] * solver_order
        self.timestep_sigmas = [None] * solver_order
        self.lower_order_nums = 0
        self.step_index = 0
        self.last_sample = None
        self.this_order = None

    @staticmethod
    def _lam(s):
        s = np.clip(s, 1e-6, 1 - 1e-6)
        return np.log((1 - s) / s)

    def _coeffs(self, h, order, rks):
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        fact = 1
        rks = np.asarray(rks, np.float64)
        for i in range(1, order + 1):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * fact / B_h)
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        return h_phi_1, B_h, np.stack(R), np.asarray(b)

    def _uni_p(self, m0, x, order):
        s0, t = self.sigmas[self.step_index], self.sigmas[self.step_index + 1]
        lam_t, lam_s0 = self._lam(t), self._lam(s0)
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.timestep_sigmas[-(i + 1)]
            mi = self.model_outputs[-(i + 1)]
            rk = (self._lam(si) - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        h_phi_1, B_h, R, b = self._coeffs(h, order, rks)
        alpha_t = 1 - t
        x_t_ = (max(t, 1e-6) / max(s0, 1e-6)) * x - alpha_t * h_phi_1 * m0
        if D1s:
            if order == 2:
                rhos_p = np.asarray([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            res = sum(r * d for r, d in zip(rhos_p, D1s))
        else:
            res = 0
        return x_t_ - alpha_t * B_h * res

    def _uni_c(self, model_t, last_sample, this_sample, order):
        s0, t = self.sigmas[self.step_index - 1], self.sigmas[self.step_index]
        lam_t, lam_s0 = self._lam(t), self._lam(s0)
        m0 = self.model_outputs[-1]
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.timestep_sigmas[-(i + 1)]
            mi = self.model_outputs[-(i + 1)]
            rk = (self._lam(si) - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        h_phi_1, B_h, R, b = self._coeffs(h, order, rks)
        alpha_t = 1 - t
        x_t_ = (max(t, 1e-6) / max(s0, 1e-6)) * last_sample - alpha_t * h_phi_1 * m0
        if order == 1:
            rhos_c = np.asarray([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)
        corr = sum(r * d for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0
        D1_t = model_t - m0
        return x_t_ - alpha_t * B_h * (corr + rhos_c[-1] * D1_t)

    def step(self, v, sample):
        sigma = self.sigmas[self.step_index]
        m = sample - sigma * v  # x0 prediction (flow matching)
        if self.step_index > 0 and self.last_sample is not None:
            sample = self._uni_c(m, self.last_sample, sample, self.this_order)
        self.model_outputs = self.model_outputs[1:] + [m]
        self.timestep_sigmas = self.timestep_sigmas[1:] + [sigma]
        n = len(self.sigmas) - 1
        this_order = min(self.order, n - self.step_index) if self.lower_order_final else self.order
        self.this_order = min(this_order, self.lower_order_nums + 1)
        self.last_sample = sample
        out = self._uni_p(m, sample, self.this_order)
        self.lower_order_nums = min(self.lower_order_nums + 1, self.order)
        self.step_index += 1
        return out


@pytest.mark.parametrize("solver_order", [1, 2, 3])
def test_unipc_matches_diffusers_oracle(solver_order):
    """Eval trajectory == independent diffusers-formula oracle at fp32
    (VERDICT round-1 item 9) for orders 1-3, on a nonlinear field."""
    rng = np.random.default_rng(0)
    n = 10
    sigmas = np.linspace(1.0, 0.0, n + 1)
    x0 = rng.normal(size=(2, 6)).astype(np.float32)

    def field(s, x):
        # nonlinear in σ and x: exercises the multistep differences
        return np.sin(3 * s) * np.asarray(x) + s**2

    oracle = _DiffusersUniPCOracle(sigmas, solver_order=solver_order)
    xo = np.asarray(x0, np.float64)
    for i in range(n):
        xo = oracle.step(field(sigmas[i], xo), xo)

    from flow_factory_tpu.scheduler.unipc import compute_unipc_orders

    pred, corr = compute_unipc_orders(n, solver_order)
    carry = init_unipc_carry(jnp.asarray(x0))
    for i in range(n):
        v = jnp.asarray(field(sigmas[i], np.asarray(carry.x)), jnp.float32)
        carry, _ = unipc_eval_step(
            carry, v, jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1]),
            jnp.int32(pred[i]), jnp.int32(corr[i]),
        )
    np.testing.assert_allclose(np.asarray(carry.x), xo, rtol=2e-4, atol=2e-4)


def test_eval_rollout_uses_unipc(adapter):
    adapter.eval()
    s1 = adapter.inference(prompt=["same"], compute_log_prob=False,
                           trajectory_indices=None, seed=3)
    s2 = adapter.inference(prompt=["same"], compute_log_prob=False,
                           trajectory_indices=None, seed=3)
    np.testing.assert_allclose(s1[0].video, s2[0].video, atol=1e-6)
    adapter.train()
    # train-mode rollouts (Euler SDE) must differ from eval UniPC rollouts
    s3 = adapter.inference(prompt=["same"], compute_log_prob=True,
                           trajectory_indices=None, seed=3)
    assert not np.allclose(s1[0].video, s3[0].video, atol=1e-4)


def test_per_frame_timesteps_expand():
    """Wan2.2 TI2V-style expand_timesteps: (B, gt) per-frame timesteps.
    Uniform per-frame t must reproduce the scalar-t path exactly; a t=0
    conditioned first frame must change only that frame less... (sanity:
    outputs differ and are finite)."""
    from flow_factory_tpu.models.wan.transformer import WanConfig, WanTransformer

    cfg = WanConfig.tiny(dtype="float32", attn_backend="native")
    model = WanTransformer(cfg)
    pt, ph, pw = cfg.patch_size
    B, gt = 2, 4
    lat = jax.random.normal(jax.random.key(0), (B, gt * pt, 2 * ph, 2 * pw, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(1), (B, 3, cfg.context_dim))
    params = model.init(jax.random.key(2), lat, jnp.zeros((B,)), ctx)["params"]

    t_scalar = jnp.full((B,), 700.0)
    t_frames = jnp.full((B, gt), 700.0)
    out_scalar = model.apply({"params": params}, lat, t_scalar, ctx)
    out_frames = model.apply({"params": params}, lat, t_frames, ctx)
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_frames), atol=1e-5)

    # conditioned first frame at t=0 (TI2V): output changes, stays finite
    t_cond = t_frames.at[:, 0].set(0.0)
    out_cond = model.apply({"params": params}, lat, t_cond, ctx)
    assert np.all(np.isfinite(np.asarray(out_cond)))
    assert not np.allclose(np.asarray(out_cond), np.asarray(out_frames))
    # later-frame outputs shift only via attention mixing; first frame must
    # differ substantially (its own modulation changed)
    d_first = np.abs(np.asarray(out_cond - out_frames))[:, :pt].mean()
    assert d_first > 0


def test_video_vae_causality():
    """Causal VAE: frame t's encoding/decoding never sees future frames.

    Wan frame convention (temporal_down=2): T=7 pixel frames → 4 latent
    frames; latent 0 ← frame 0, latent i ← frames (2i−1, 2i)."""
    import jax
    from flow_factory_tpu.models.wan.video_vae import VideoVAEConfig, VideoVAE

    cfg = VideoVAEConfig.tiny()
    vae = VideoVAE(cfg)
    rng = np.random.default_rng(0)
    v1 = jnp.asarray(rng.standard_normal((1, 3, 7, 16, 16)), jnp.float32)
    v2 = v1.at[:, :, 5:].set(jnp.asarray(rng.standard_normal((1, 3, 2, 16, 16)), jnp.float32))
    params = vae.init(jax.random.key(0), v1)["params"]

    z1 = vae.apply({"params": params}, v1, method=VideoVAE.encode)
    z2 = vae.apply({"params": params}, v2, method=VideoVAE.encode)
    assert z1.shape[1] == 4  # 1 + (7-1)/2
    # perturbing pixel frames 5,6 may only change the last latent frame
    np.testing.assert_allclose(np.asarray(z1[:, :3]), np.asarray(z2[:, :3]), atol=1e-6)
    assert not np.allclose(np.asarray(z1[:, 3]), np.asarray(z2[:, 3]))

    # decode causality: perturbing the last latent frame leaves earlier
    # pixel frames untouched (decode of 4 latents → 1 + 3·2 = 7 frames)
    d1 = vae.apply({"params": params}, z1, method=VideoVAE.decode)
    assert d1.shape[2] == 7
    z1p = z1.at[:, 3].add(1.0)
    d2 = vae.apply({"params": params}, z1p, method=VideoVAE.decode)
    np.testing.assert_allclose(np.asarray(d1[:, :, :5]), np.asarray(d2[:, :, :5]), atol=1e-6)
    assert not np.allclose(np.asarray(d1[:, :, 5:]), np.asarray(d2[:, :, 5:]))


def test_video_vae_chunked_decode_exact():
    """Streaming decode == full decode, thanks to causality."""
    import jax
    from flow_factory_tpu.models.wan.video_vae import VideoVAEConfig, VideoVAE

    cfg = VideoVAEConfig.tiny()
    vae = VideoVAE(cfg)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((1, 3, 13, 16, 16)), jnp.float32)
    params = vae.init(jax.random.key(0), v)["params"]
    z = vae.apply({"params": params}, v, method=VideoVAE.encode)  # (1, 7, 8, 8, c)
    assert z.shape[1] == 7

    full = vae.apply({"params": params}, z, method=VideoVAE.decode)
    assert full.shape[2] == 13
    for chunk in (1, 2, 4):
        stream = vae.apply(
            {"params": params}, z, chunk, 8, method=VideoVAE.decode_chunked
        )
        assert stream.shape == full.shape
        np.testing.assert_allclose(np.asarray(stream), np.asarray(full), atol=1e-5)
    # too-small overlap must actually differ (the test is not vacuous)
    approx = vae.apply({"params": params}, z, 1, 0, method=VideoVAE.decode_chunked)
    assert not np.allclose(np.asarray(approx), np.asarray(full), atol=1e-5)


def test_wan_vae_key_map_full_coverage():
    """Upstream AutoencoderKLWan graph: every leaf (incl. quant convs, RMS
    gammas, time convs, mid attention) is covered by the key map; conv layout
    transposes round-trip."""
    import jax
    from flow_factory_tpu.models.wan.video_vae import VideoVAEConfig, VideoVAE
    from flow_factory_tpu.utils.checkpoint import import_diffusers_params, wan_vae_key_map
    from test_utils_aux import _synth_torch_state_dict

    cfg = VideoVAEConfig.tiny(attn_scales=(1.0,))
    vae = VideoVAE(cfg)
    v = jnp.zeros((1, 3, 5, 16, 16), jnp.float32)
    template = vae.init(jax.random.key(0), v)["params"]
    km, rm = wan_vae_key_map(
        cfg.channel_mults, cfg.layers_per_block, cfg.temporal_down,
        cfg.attn_scales, cfg.base_channels,
    )
    sd = _synth_torch_state_dict(template, km, raw_map=rm, seed=21)
    out = import_diffusers_params(sd, km, template, raw_map=rm)
    import numpy as _np
    for (path, before), (_, after) in zip(
        jax.tree_util.tree_flatten_with_path(template)[0],
        jax.tree_util.tree_flatten_with_path(out)[0],
    ):
        assert not _np.array_equal(_np.asarray(before), _np.asarray(after)), path
    # conv3d transpose convention: torch (out,in,kt,kh,kw) → flax (kt,kh,kw,in,out)
    w = sd["encoder.conv_in.weight"]
    _np.testing.assert_allclose(
        _np.asarray(out["encoder"]["conv_in"]["conv"]["kernel"]),
        _np.transpose(w, (2, 3, 4, 1, 0)), atol=1e-6)
    # the imported VAE must run: encode → decode round trip
    dec = vae.apply({"params": out}, v)
    assert dec.shape == v.shape


def test_wan22_residual_vae_variant():
    """Wan 2.2 graph knobs: 2x2 patchify + residual avg/dup-shortcut stages.
    Causality, the frame convention, exact streaming decode, and key-map
    coverage all must hold for the residual variant too."""
    import jax
    from flow_factory_tpu.models.wan.video_vae import VideoVAEConfig, VideoVAE
    from flow_factory_tpu.utils.checkpoint import import_diffusers_params, wan_vae_key_map
    from test_utils_aux import _synth_torch_state_dict

    cfg = VideoVAEConfig.tiny(spatial_patch=2, resample_residual=True,
                              channel_mults=(1, 2), temporal_down=2)
    vae = VideoVAE(cfg)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((1, 3, 7, 16, 16)), jnp.float32)
    params = vae.init(jax.random.key(0), v)["params"]

    z = vae.apply({"params": params}, v, method=VideoVAE.encode)
    # spatial: 16 / (2 conv-down=2 * patch=2) = 4; temporal: 1+(7-1)/2 = 4
    assert z.shape == (1, 4, 4, 4, cfg.latent_channels), z.shape
    dec = vae.apply({"params": params}, z, method=VideoVAE.decode)
    assert dec.shape == (1, 3, 7, 16, 16)

    # encode causality: perturbing frames 5,6 only changes the last latent
    v2 = v.at[:, :, 5:].set(jnp.asarray(rng.standard_normal((1, 3, 2, 16, 16)), jnp.float32))
    z2 = vae.apply({"params": params}, v2, method=VideoVAE.encode)
    np.testing.assert_allclose(np.asarray(z[:, :3]), np.asarray(z2[:, :3]), atol=1e-6)
    assert not np.allclose(np.asarray(z[:, 3]), np.asarray(z2[:, 3]))

    # decode causality through the dup shortcuts
    zp = z.at[:, 3].add(1.0)
    d2 = vae.apply({"params": params}, zp, method=VideoVAE.decode)
    np.testing.assert_allclose(np.asarray(dec[:, :, :5]), np.asarray(d2[:, :, :5]), atol=1e-6)

    # streaming decode stays exact
    full = vae.apply({"params": params}, z, method=VideoVAE.decode)
    stream = vae.apply({"params": params}, z, 2, 8, method=VideoVAE.decode_chunked)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full), atol=1e-5)

    # key-map coverage (nested residual-stage paths)
    km, rm = wan_vae_key_map(cfg.channel_mults, cfg.layers_per_block,
                             cfg.temporal_down, cfg.attn_scales,
                             cfg.base_channels, residual=True)
    sd = _synth_torch_state_dict(params, km, raw_map=rm, seed=31)
    out = import_diffusers_params(sd, km, params, raw_map=rm)
    for (path, before), (_, after) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(out)[0],
    ):
        assert not np.array_equal(np.asarray(before), np.asarray(after)), path
