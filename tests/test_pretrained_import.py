"""End-to-end pretrained-checkpoint import: a diffusers-layout directory
(torch-layout safetensors under <path>/transformer) loads into the adapter
at construction via the per-family key maps."""
import os

import numpy as np
import pytest

import jax

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from test_utils_aux import _synth_torch_state_dict


def _cfg(model_type, path, extra_model=None):
    return Arguments.from_dict({
        "data": {},
        "model": {"model_type": model_type, "model_name_or_path": path,
                  "variant": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "float32",
                  **(extra_model or {})},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 3,
                  "guidance_scale": 1.0, "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2, "latent_storage_dtype": "fp32"},
        "eval": {}, "log": {}, "rewards": [],
    })


def test_sd3_checkpoint_dir_import(tmp_path):
    from safetensors.numpy import save_file

    from flow_factory_tpu.utils.checkpoint import sd3_transformer_key_map

    ref = load_adapter(_cfg("sd3-5", "tiny"))
    cfg = ref.component_configs["transformer"]
    key_map = sd3_transformer_key_map(cfg.depth, cfg.dual_attention_layers)
    sd = _synth_torch_state_dict(ref.params["transformer"], key_map, seed=11)

    ckpt = tmp_path / "sd35-tiny"
    (ckpt / "transformer").mkdir(parents=True)
    save_file(sd, str(ckpt / "transformer" / "diffusion_pytorch_model.safetensors"))

    adapter = load_adapter(_cfg("sd3-5", str(ckpt)))
    # mapped leaves must differ from the reference random init (imported),
    # and the imported dense kernels must equal the transposed torch weights
    k_t = np.asarray(adapter.params["transformer"]["context_embedder"]["kernel"])
    np.testing.assert_allclose(k_t, sd["context_embedder.weight"].T, atol=1e-6)
    r_t = np.asarray(ref.params["transformer"]["context_embedder"]["kernel"])
    assert not np.allclose(k_t, r_t)

    # the loaded adapter must run end-to-end
    samples = adapter.inference(prompt=["a"], compute_log_prob=True, seed=0)
    assert np.all(np.isfinite(samples[0].log_probs))


def test_wan_checkpoint_dir_import(tmp_path):
    from safetensors.numpy import save_file

    from flow_factory_tpu.utils.checkpoint import wan_transformer_key_map

    ref = load_adapter(_cfg("wan2-t2v", "tiny"))
    cfg = ref.component_configs["transformer"]
    km, rm = wan_transformer_key_map(cfg.num_layers)
    pt, ph, pw = cfg.patch_size
    sd = _synth_torch_state_dict(
        ref.params["transformer"], km, raw_map=rm,
        conv_specs={"patch_embedding": (cfg.hidden_dim, cfg.in_channels, pt, ph, pw)},
        seed=12,
    )
    ckpt = tmp_path / "wan-tiny"
    (ckpt / "transformer").mkdir(parents=True)
    save_file(sd, str(ckpt / "transformer" / "diffusion_pytorch_model.safetensors"))

    adapter = load_adapter(_cfg("wan2-t2v", str(ckpt)))
    got = np.asarray(adapter.params["transformer"]["head_table"])
    np.testing.assert_allclose(got, sd["scale_shift_table"], atol=1e-6)


def test_sd3_full_pipeline_import(tmp_path):
    """Transformer + CLIP-L + CLIP-G + T5 all import from one checkpoint dir."""
    from safetensors.numpy import save_file

    from flow_factory_tpu.utils.checkpoint import (
        clip_text_encoder_key_map,
        sd3_transformer_key_map,
        t5_encoder_key_map,
    )


    ref = load_adapter(_cfg("sd3-5", "tiny"))
    ckpt = tmp_path / "sd35-full"
    specs = {
        "transformer": (sd3_transformer_key_map(
            ref.component_configs["transformer"].depth,
            ref.component_configs["transformer"].dual_attention_layers),
            {"pos_embed.pos_embed": "pos_embed/pos_embed"}),
    }
    for comp in ("text_encoder", "text_encoder_2"):
        km, rm = clip_text_encoder_key_map(ref.component_configs[comp].num_layers)
        specs[comp] = (km, rm)
    km, rm = t5_encoder_key_map(ref.component_configs["text_encoder_3"].num_layers)
    specs["text_encoder_3"] = (km, rm)
    from flow_factory_tpu.utils.checkpoint import vae_key_map

    vcfg = ref.component_configs["vae"]
    specs["vae"] = (vae_key_map(vcfg.channel_mults, vcfg.layers_per_block,
                                vcfg.use_mid_attention), None)

    sds = {}
    for i, (comp, (km, rm)) in enumerate(specs.items()):
        sd = _synth_torch_state_dict(ref.params[comp], km, raw_map=rm, seed=20 + i)
        (ckpt / comp).mkdir(parents=True)
        save_file(sd, str(ckpt / comp / "model.safetensors"))
        sds[comp] = sd

    adapter = load_adapter(_cfg("sd3-5", str(ckpt)))
    # embeddings copied verbatim (no transpose)
    np.testing.assert_allclose(
        np.asarray(adapter.params["text_encoder"]["token_embedding"]["embedding"]),
        sds["text_encoder"]["text_model.embeddings.token_embedding.weight"], atol=1e-6)
    # T5 layer norm rides raw_map onto the 'weight' leaf
    np.testing.assert_allclose(
        np.asarray(adapter.params["text_encoder_3"]["block_0"]["ln1"]["weight"]),
        sds["text_encoder_3"]["encoder.block.0.layer.0.layer_norm.weight"], atol=1e-6)
    # linear transpose on a CLIP projection
    np.testing.assert_allclose(
        np.asarray(adapter.params["text_encoder"]["layer_0"]["q_proj"]["kernel"]),
        sds["text_encoder"]["text_model.encoder.layers.0.self_attn.q_proj.weight"].T,
        atol=1e-6)
    # encode + inference run end-to-end on the imported pipeline
    samples = adapter.inference(prompt=["hello"], compute_log_prob=True, seed=0)
    assert np.all(np.isfinite(samples[0].log_probs))


def test_wan_vae_config_json_self_configures(tmp_path):
    """A diffusers-layout checkpoint dir with vae/config.json reconfigures
    the VAE graph + per-channel latent normalization (upstream
    AutoencoderKLWan config keys, incl. the 'temperal_downsample' spelling
    and Wan 2.2 patch/residual knobs)."""
    import json

    ckpt = tmp_path / "wan-ck"
    (ckpt / "vae").mkdir(parents=True)
    mean = [0.1] * 8
    std = [2.0] * 8
    (ckpt / "vae" / "config.json").write_text(json.dumps({
        "_class_name": "AutoencoderKLWan",
        "base_dim": 8, "z_dim": 8, "dim_mult": [1, 2], "num_res_blocks": 1,
        "attn_scales": [], "temperal_downsample": [True],
        "patch_size": 2, "is_residual": True,
        "latents_mean": mean, "latents_std": std,
    }))

    adapter = load_adapter(_cfg("wan2-t2v", str(ckpt)))
    vcfg = adapter.component_configs["vae"]
    assert vcfg.base_channels == 8 and vcfg.latent_channels == 8
    assert vcfg.channel_mults == (1, 2) and vcfg.temporal_down == 2
    assert vcfg.spatial_patch == 2 and vcfg.resample_residual
    assert vcfg.latents_mean == tuple(mean) and vcfg.latents_std == tuple(std)
    assert vcfg.spatial_down == 4  # 2 conv-down x 2 patch

    # normalization actually applies: encode then denormalized decode runs
    v = np.random.default_rng(0).random((1, 5, 3, 32, 32)).astype(np.float32)
    z = adapter.encode_video(v)
    assert z.shape[-1] == 8 and np.all(np.isfinite(z))
    dec = adapter.decode_latents(jax.numpy.asarray(z), num_frames=5)
    assert dec.shape == (1, 5, 3, 32, 32)

    # explicit vae_overrides still win over config.json
    cfg2 = _cfg("wan2-t2v", str(ckpt), extra_model={"vae_overrides": {"spatial_patch": 1}})
    adapter2 = load_adapter(cfg2)
    assert adapter2.component_configs["vae"].spatial_patch == 1


def test_transformer_config_json_self_configures(tmp_path):
    """transformer/config.json (diffusers keys) reconfigures the DiT preset:
    a 3-layer checkpoint config widens the tiny 2-layer preset and still
    rolls out end-to-end."""
    import json

    ckpt = tmp_path / "sd35-ck"
    (ckpt / "transformer").mkdir(parents=True)
    (ckpt / "transformer" / "config.json").write_text(json.dumps({
        "_class_name": "SD3Transformer2DModel",
        "num_layers": 3, "num_attention_heads": 4, "attention_head_dim": 16,
        "in_channels": 16, "patch_size": 2,
        "joint_attention_dim": 48, "pooled_projection_dim": 40,
        "pos_embed_max_size": 32, "dual_attention_layers": [0],
        "qk_norm": "rms_norm",
    }))
    adapter = load_adapter(_cfg("sd3-5", str(ckpt)))
    tcfg = adapter.component_configs["transformer"]
    assert tcfg.depth == 3 and tcfg.hidden_dim == 64
    assert tcfg.dual_attention_layers == (0,)
    samples = adapter.inference(prompt=["x"], compute_log_prob=True, seed=0)
    assert np.all(np.isfinite(samples[0].log_probs))


def test_encoder_and_vae_config_json_self_configure(tmp_path):
    """text_encoder*/config.json (transformers keys) and vae/config.json
    (AutoencoderKL keys) reconfigure the encoders/VAE; the adapter still
    encodes + rolls out."""
    import json

    ckpt = tmp_path / "sd35-enc-ck"
    # CLIP-L: deepen to 3 layers, keep tiny dims (hidden 16, heads 2, proj 16)
    (ckpt / "text_encoder").mkdir(parents=True)
    (ckpt / "text_encoder" / "config.json").write_text(json.dumps({
        "model_type": "clip_text_model", "vocab_size": 1000,
        "hidden_size": 16, "num_hidden_layers": 3, "num_attention_heads": 2,
        "projection_dim": 16, "eos_token_id": 2, "hidden_act": "gelu",
    }))
    # T5: deepen to 3 layers, keep tiny dims (d_model 48, heads 2, d_kv 8)
    (ckpt / "text_encoder_3").mkdir(parents=True)
    (ckpt / "text_encoder_3" / "config.json").write_text(json.dumps({
        "model_type": "umt5", "vocab_size": 1000, "d_model": 48, "d_ff": 64,
        "num_layers": 3, "num_heads": 2, "d_kv": 8,
    }))
    (ckpt / "vae").mkdir(parents=True)
    (ckpt / "vae" / "config.json").write_text(json.dumps({
        "_class_name": "AutoencoderKL", "in_channels": 3, "latent_channels": 16,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "scaling_factor": 0.5, "shift_factor": 0.25,
        "mid_block_add_attention": True,
    }))

    adapter = load_adapter(_cfg("sd3-5", str(ckpt)))
    assert adapter.component_configs["text_encoder"].num_layers == 3
    assert adapter.component_configs["text_encoder"].hidden_act == "gelu"
    assert adapter.component_configs["text_encoder_3"].num_layers == 3
    vcfg = adapter.component_configs["vae"]
    assert vcfg.scaling_factor == 0.5 and vcfg.shift_factor == 0.25
    assert vcfg.channel_mults == (1, 2) and vcfg.layers_per_block == 1
    samples = adapter.inference(prompt=["y"], compute_log_prob=True, seed=0)
    assert samples[0].image.shape == (3, 32, 32)
    assert np.all(np.isfinite(samples[0].log_probs))


def test_lm_overrides_qwen_detection():
    """Qwen2.x configs enable attn biases; Llama-layout ones don't; GQA and
    derived head_dim map through."""
    from flow_factory_tpu.utils.checkpoint import lm_overrides_from_config

    q = lm_overrides_from_config({
        "model_type": "qwen2_5_vl", "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "intermediate_size": 128, "vocab_size": 1000, "rope_theta": 10000.0,
    })
    assert q["attn_bias"] is True and q["head_dim"] == 16
    l = lm_overrides_from_config({
        "model_type": "mistral", "hidden_size": 64, "num_attention_heads": 4,
        "head_dim": 16,
    })
    assert l["attn_bias"] is False


def test_ltx2_and_z_image_transformer_overrides():
    """LTX-2 (LTXVideoTransformer3DModel spellings) and Z-Image (both
    diffusers- and Lumina-style spellings) transformer config.json keys
    reshape the presets; packed in_channels scales by patch_size^2."""
    from flow_factory_tpu.models.ltx2.transformer import LTX2Config
    from flow_factory_tpu.models.z_image.transformer import ZImageConfig
    from flow_factory_tpu.utils.checkpoint import (
        ltx2_transformer_overrides_from_config,
        z_image_transformer_overrides_from_config,
    )
    import dataclasses as dc

    o = ltx2_transformer_overrides_from_config({
        "num_layers": 28, "num_attention_heads": 32, "attention_head_dim": 64,
        "cross_attention_dim": 4096, "in_channels": 128,
        "audio_in_channels": 128, "rope_theta": 10000.0,
    })
    cfg = dc.replace(LTX2Config.tiny(), **o)
    assert cfg.num_layers == 28 and cfg.hidden_dim == 2048
    assert cfg.video_channels == 128 and cfg.audio_channels == 128
    # context_dim intentionally NOT taken from cross_attention_dim: the
    # adapter reconciles it from the text encoder's hidden size
    assert "context_dim" not in o

    z1 = z_image_transformer_overrides_from_config({
        "hidden_size": 3072, "n_layers": 38, "n_heads": 24,
        "cap_feat_dim": 2560, "in_channels": 16, "patch_size": 2,
        "axes_dim_rope": [16, 56, 56],
    })
    z2 = z_image_transformer_overrides_from_config({
        "num_layers": 38, "num_attention_heads": 24, "attention_head_dim": 128,
        "joint_attention_dim": 2560, "in_channels": 16, "patch_size": 2,
        "axes_dims_rope": [16, 56, 56],
    })
    for z in (z1, z2):
        cfg = dc.replace(ZImageConfig.tiny(), **z)
        assert cfg.num_layers == 38 and cfg.hidden_dim == 3072
        assert cfg.in_channels == 64  # 16 unpacked x 2x2 patch
        assert cfg.context_dim == 2560 and cfg.axes_dim == (16, 56, 56)


def test_strict_import_flags_misspelled_checkpoint(tmp_path):
    """A deliberately misspelled checkpoint key must abort a strict load
    with BOTH the unmatched key and the init-left leaf named (VERDICT r2
    Next #7)."""
    from safetensors.numpy import save_file

    from flow_factory_tpu.utils.checkpoint import sd3_transformer_key_map

    ref = load_adapter(_cfg("sd3-5", "tiny"))
    cfg = ref.component_configs["transformer"]
    key_map = sd3_transformer_key_map(cfg.depth, cfg.dual_attention_layers)
    sd = _synth_torch_state_dict(ref.params["transformer"], key_map, seed=13)
    # misspell one key the way a stale key map would experience it
    sd["context_embedderX.weight"] = sd.pop("context_embedder.weight")

    ckpt = tmp_path / "sd35-misspelled"
    (ckpt / "transformer").mkdir(parents=True)
    save_file(sd, str(ckpt / "transformer" / "diffusion_pytorch_model.safetensors"))

    with pytest.raises(ValueError) as ei:
        load_adapter(_cfg("sd3-5", str(ckpt), extra_model={"strict_import": True}))
    msg = str(ei.value)
    assert "context_embedderX.weight" in msg      # the unmatched checkpoint key
    assert "context_embedder/kernel" in msg       # the leaf left at init

    # non-strict (default) still loads and only warns
    adapter = load_adapter(_cfg("sd3-5", str(ckpt)))
    assert adapter is not None


def test_strict_import_scope_ignores_sibling_component_keys():
    """Keys claimed by a sibling component sharing the directory (Qwen LM +
    vision tower in text_encoder/) must not fail the strict check when an
    unmatched_scope is set."""
    import jax
    import jax.numpy as jnp

    from flow_factory_tpu.utils.checkpoint import import_diffusers_params

    template = {"lin": {"kernel": np.zeros((4, 8), np.float32),
                        "bias": np.zeros((8,), np.float32)}}
    sd = {
        "mod.weight": np.ones((8, 4), np.float32),
        "mod.bias": np.zeros((8,), np.float32),
        "visual.tower.weight": np.ones((3, 3), np.float32),  # sibling's key
    }
    out = import_diffusers_params(
        sd, {"mod": "lin"}, template, strict=True,
        unmatched_scope=r"^mod\.")
    np.testing.assert_allclose(out["lin"]["kernel"], np.ones((4, 8)))

    with pytest.raises(ValueError):
        import_diffusers_params(sd, {"mod": "lin"}, template, strict=True)
