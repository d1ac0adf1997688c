"""LTX causal video VAE: the upstream AutoencoderKLLTXVideo graph contract.

The reference LTX-2 adapters consume this VAE through the diffusers pipeline
(``ltx2_t2av.py:516-563``): 32x spatial / 8x temporal compression, 128-ch
latents, per-channel latents_mean/std, and a ``timestep_conditioning``-gated
decoder fed ``decode_timestep``. These tests pin our re-implementation's
geometry, causality, conditioning, and checkpoint-import coverage.
"""
import jax
import jax.numpy as jnp
import numpy as np

from flow_factory_tpu.models.ltx2.video_vae import LTXVideoVAE, LTXVideoVAEConfig

from test_utils_aux import _synth_torch_state_dict


def _tiny_vae(**o):
    cfg = LTXVideoVAEConfig.tiny(**o)
    vae = LTXVideoVAE(cfg)
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)), jnp.float32)
    params = vae.init(jax.random.key(0), v)["params"]
    return cfg, vae, v, params


def test_shapes_and_frame_convention():
    """patchify x conv compression: spatial 4 (2 patch x 1 conv), temporal 2;
    T = 1 + (Tl - 1) * temporal_down round-trips."""
    cfg, vae, v, params = _tiny_vae()
    assert cfg.spatial_down == 4 and cfg.temporal_down == 2
    z = vae.apply({"params": params}, v, method=LTXVideoVAE.encode)
    assert z.shape == (1, 3, 4, 4, cfg.latent_channels), z.shape
    d = vae.apply({"params": params}, z, method=LTXVideoVAE.decode)
    assert d.shape == (1, 3, 5, 16, 16)
    # single-frame encode works (I2AV first-frame conditioning path)
    z1 = vae.apply({"params": params}, v[:, :, :1], method=LTXVideoVAE.encode)
    assert z1.shape == (1, 1, 4, 4, cfg.latent_channels)


def test_encoder_causality_replicate_pad():
    """The encoder is causal (replicate front padding): perturbing late
    frames leaves earlier latent frames bit-identical."""
    cfg, vae, v, params = _tiny_vae()
    rng = np.random.default_rng(9)
    z = vae.apply({"params": params}, v, method=LTXVideoVAE.encode)
    v2 = v.at[:, :, 3:].set(jnp.asarray(rng.standard_normal((1, 3, 2, 16, 16)), jnp.float32))
    z2 = vae.apply({"params": params}, v2, method=LTXVideoVAE.encode)
    np.testing.assert_allclose(np.asarray(z[:, :2]), np.asarray(z2[:, :2]), atol=1e-6)
    assert not np.allclose(np.asarray(z[:, 2]), np.asarray(z2[:, 2]))


def test_shared_logvar_sampling():
    """The encoder head emits latent_channels + ONE shared log-variance
    channel (upstream broadcasts it across the Gaussian split): sampling
    noise must be modulated identically across channels."""
    cfg, vae, v, params = _tiny_vae()
    z_mean = vae.apply({"params": params}, v, method=LTXVideoVAE.encode)
    z_s = vae.apply({"params": params}, v, jax.random.key(1), True,
                    method=LTXVideoVAE.encode)
    assert z_s.shape == z_mean.shape
    assert not np.allclose(np.asarray(z_s), np.asarray(z_mean))


def test_timestep_conditioned_decode():
    """decode_timestep flows through per-block time embedders + AdaLN tables;
    None defaults to zeros (the reference's decode_timestep=0.0 default)."""
    cfg, vae, v, params = _tiny_vae()
    assert cfg.timestep_conditioning
    z = vae.apply({"params": params}, v, method=LTXVideoVAE.encode)
    d_none = vae.apply({"params": params}, z, method=LTXVideoVAE.decode)
    d_zero = vae.apply({"params": params}, z, None, jnp.zeros((1,)),
                       method=LTXVideoVAE.decode)
    np.testing.assert_allclose(np.asarray(d_none), np.asarray(d_zero), atol=1e-6)
    d_one = vae.apply({"params": params}, z, None, jnp.ones((1,)),
                      method=LTXVideoVAE.decode)
    assert not np.allclose(np.asarray(d_none), np.asarray(d_one), atol=1e-5)


def test_latent_normalization_stats():
    """Per-channel latents_mean/std: encode normalizes, decode denormalizes
    (reference order: latents * std / scaling_factor + mean)."""
    cfg, vae, v, params = _tiny_vae()
    import dataclasses as dc

    C = cfg.latent_channels
    mean = tuple(float(x) for x in np.linspace(-0.5, 0.5, C))
    std = tuple(float(x) for x in np.linspace(0.8, 1.6, C))
    cfg2 = dc.replace(cfg, latents_mean=mean, latents_std=std, scaling_factor=0.7)
    vae2 = LTXVideoVAE(cfg2)
    z_raw = vae.apply({"params": params}, v, method=LTXVideoVAE.encode)
    z_norm = vae2.apply({"params": params}, v, method=LTXVideoVAE.encode)
    np.testing.assert_allclose(
        np.asarray(z_norm),
        (np.asarray(z_raw) - np.asarray(mean)) / np.asarray(std) * 0.7,
        atol=1e-5)
    d1 = vae.apply({"params": params}, z_raw, method=LTXVideoVAE.decode)
    d2 = vae2.apply({"params": params}, z_norm, method=LTXVideoVAE.decode)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


def test_key_map_full_coverage_conditioned():
    """Every leaf — convs, channel-change conv_in/conv_out resnets,
    downsampler/upsampler convs, AdaLN scale_shift_tables, time embedders,
    timestep_scale_multiplier, per_channel noise amplitudes — is covered."""
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        ltx_video_vae_key_map,
        pop_ltx_vae_latent_stats,
    )

    cfg, vae, v, params = _tiny_vae(
        decoder_inject_noise=(True, True), upsample_residual=(False, True))
    km, rm = ltx_video_vae_key_map(cfg)
    sd = _synth_torch_state_dict(params, km, raw_map=rm, seed=41)
    # stats buffers ride the upstream state dict; they pop into config
    sd["latents_mean"] = np.zeros((cfg.latent_channels,), np.float32)
    sd["latents_std"] = np.ones((cfg.latent_channels,), np.float32)
    sd, mean, std = pop_ltx_vae_latent_stats(sd)
    assert len(mean) == cfg.latent_channels and len(std) == cfg.latent_channels
    out = import_diffusers_params(sd, km, params, raw_map=rm)
    for (path, before), (_, after) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(out)[0],
    ):
        assert not np.array_equal(np.asarray(before), np.asarray(after)), path
    # the imported VAE must run end to end
    d = vae.apply({"params": out}, v)
    assert d.shape == v.shape


def test_upsample_factor_variant():
    """upsample_factor > 1 folds the channel change into the upsampler
    (the 0.9.x big-decoder layout); geometry and key-map coverage hold."""
    from flow_factory_tpu.utils.checkpoint import (
        import_diffusers_params,
        ltx_video_vae_key_map,
    )

    cfg = LTXVideoVAEConfig.tiny(
        decoder_block_out_channels=(16, 4),
        upsample_factor=(1, 2), upsample_residual=(False, True))
    vae = LTXVideoVAE(cfg)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)), jnp.float32)
    params = vae.init(jax.random.key(0), v)["params"]
    z = vae.apply({"params": params}, v, method=LTXVideoVAE.encode)
    d = vae.apply({"params": params}, z, method=LTXVideoVAE.decode)
    assert d.shape == v.shape
    km, rm = ltx_video_vae_key_map(cfg)
    sd = _synth_torch_state_dict(params, km, raw_map=rm, seed=43)
    out = import_diffusers_params(sd, km, params, raw_map=rm)
    for (path, before), (_, after) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(out)[0],
    ):
        assert not np.array_equal(np.asarray(before), np.asarray(after)), path


def test_overrides_from_config_reverses_decoder_lists():
    """Diffusers stores decoder lists in encoder orientation; our config is
    decoder forward order."""
    from flow_factory_tpu.utils.checkpoint import ltx_video_vae_overrides_from_config

    o = ltx_video_vae_overrides_from_config({
        "_class_name": "AutoencoderKLLTXVideo",
        "latent_channels": 128,
        "block_out_channels": [128, 256, 512, 512],
        "decoder_block_out_channels": [128, 256, 512, 512],
        "layers_per_block": [4, 3, 3, 3, 4],
        "spatio_temporal_scaling": [True, True, True, False],
        "decoder_spatio_temporal_scaling": [True, True, True, False],
        "decoder_inject_noise": [False, False, False, False],
        "upsample_residual": [False, False, False, False],
        "upsample_factor": [1, 1, 1, 1],
        "timestep_conditioning": True,
        "patch_size": 4, "patch_size_t": 1,
        "resnet_norm_eps": 1e-8, "scaling_factor": 1.0,
        "encoder_causal": True, "decoder_causal": False,
    })
    assert o["decoder_block_out_channels"] == (512, 512, 256, 128)
    assert o["decoder_spatio_temporal_scaling"] == (False, True, True, True)
    assert o["timestep_conditioning"] is True
    cfg = LTXVideoVAEConfig(**o)
    assert cfg.spatial_down == 32 and cfg.temporal_down == 8


def test_hifigan_vocoder_graph_and_key_map():
    """The vocoder is the public HiFi-GAN generator graph: conv_pre, per-rate
    ConvTranspose upsamplers, MRF resblock mean, conv_post/tanh; hop-length
    upsampling exact; weight-norm pairs fuse; key map covers every leaf."""
    from flow_factory_tpu.models.ltx2.audio import (
        AudioVAEConfig,
        Vocoder,
        vocoder_upsample_rates,
    )
    from flow_factory_tpu.utils.checkpoint import (
        fuse_weight_norm,
        hifigan_vocoder_key_map,
        import_diffusers_params,
    )

    cfg = AudioVAEConfig.tiny()
    assert vocoder_upsample_rates(256) == (8, 8, 2, 2)  # published rates
    assert vocoder_upsample_rates(cfg.hop) == (8, 8)
    voc = Vocoder(cfg)
    mel = jnp.zeros((2, 6, cfg.n_mels), jnp.float32)
    params = voc.init(jax.random.key(0), mel)["params"]
    wave = voc.apply({"params": params}, mel)
    assert wave.shape == (2, 6 * cfg.hop)  # exact hop upsampling
    assert np.all(np.abs(np.asarray(wave)) <= 1.0)

    # weight-norm fusing: w == g * v / ||v||
    v = np.arange(24, dtype=np.float32).reshape(2, 3, 4) + 1
    g = np.asarray([[[2.0]], [[3.0]]], np.float32)
    fused = fuse_weight_norm({"x.weight_g": g, "x.weight_v": v})
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(fused["x.weight"], g * v / norm, rtol=1e-6)

    # full-coverage import of the vocoder subtree (torch layouts: conv1d
    # (out,in,k); ConvTranspose (in,out,k) pre-swapped by the adapter's
    # preprocess — emulated here)
    km = hifigan_vocoder_key_map(cfg)
    template = {"vocoder": params}  # match the AudioVAE scope nesting
    rng = np.random.default_rng(11)
    sd = {}
    import jax as _jax
    flat = _jax.tree_util.tree_flatten_with_path(template)[0]
    shapes = {"/".join(str(getattr(p, "key", p)) for p in path): np.asarray(x).shape
              for path, x in flat}
    for tk, our in km.items():
        kshape = shapes[f"{our}/kernel"]  # (k, in, out)
        sd[f"{tk}.weight"] = rng.standard_normal(
            (kshape[2], kshape[1], kshape[0])).astype(np.float32)
        sd[f"{tk}.bias"] = rng.standard_normal(shapes[f"{our}/bias"]).astype(np.float32)
    out = import_diffusers_params(sd, km, template)
    for (path, before), (_, after) in zip(
        _jax.tree_util.tree_flatten_with_path(template)[0],
        _jax.tree_util.tree_flatten_with_path(out)[0],
    ):
        assert not np.array_equal(np.asarray(before), np.asarray(after)), path
    # imported vocoder still runs
    w2 = voc.apply({"params": out["vocoder"]}, mel)
    assert w2.shape == wave.shape
