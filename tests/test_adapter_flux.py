"""FLUX.1-tiny adapter: packing, rollout, replay-ratio invariant, training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.samples import stack_samples


@pytest.fixture(scope="module")
def adapter():
    cfg = Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": "flux1", "model_name_or_path": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "float32"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 4,
                  "guidance_scale": 3.5, "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2, "latent_storage_dtype": "fp32"},
        "eval": {}, "log": {}, "rewards": [],
    })
    return load_adapter(cfg)


def test_pack_roundtrip(adapter):
    x = jnp.arange(2 * 8 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 8, 4)
    packed = adapter.pack_latents(x)
    assert packed.shape == (2, 16, 16)
    np.testing.assert_array_equal(np.asarray(adapter.unpack_latents(packed, 8, 8)), np.asarray(x))


def test_rollout_replay_ratio(adapter):
    adapter.rollout()
    samples = adapter.inference(prompt=["a cat", "a dog"], compute_log_prob=True, seed=0)
    s = samples[0]
    assert s.image.shape == (3, 32, 32)
    assert s.all_latents.ndim == 3  # (S, L, C) packed tokens
    b = stack_samples(samples)
    sig, nl = s.extra_kwargs["sigmas"], s.extra_kwargs["noise_levels"]
    for i in range(len(s.timesteps)):
        if nl[i] == 0:
            continue
        li, lni, lpi = s.latent_index_map[i], s.latent_index_map[i + 1], s.log_prob_index_map[i]
        batch = {
            "latents": jnp.asarray(b["all_latents"][:, li]),
            "next_latents": jnp.asarray(b["all_latents"][:, lni]),
            "timestep": jnp.full((2,), float(s.timesteps[i])),
            "sigma": jnp.full((2,), float(sig[i])),
            "sigma_next": jnp.full((2,), float(sig[i + 1])),
            "noise_level": jnp.full((2,), float(nl[i])),
            "guidance_scale": jnp.float32(3.5),
            "sigma_max": jnp.float32(sig[1]),
            "prompt_embeds": jnp.asarray(b["prompt_embeds"]),
            "pooled_prompt_embeds": jnp.asarray(b["pooled_prompt_embeds"]),
            "img_ids": jnp.asarray(b["img_ids"]),
            "txt_ids": jnp.asarray(b["txt_ids"]),
        }
        out = adapter.training_forward(adapter.trainable, batch)
        ratio = np.exp(np.asarray(out.log_prob) - b["log_probs"][:, lpi])
        np.testing.assert_allclose(ratio, 1.0, atol=1e-4)


def test_lora_targets_resolved(adapter):
    # double blocks q/k/v/ff + single blocks linear1/2 must be LoRA'd
    paths = set(adapter.trainable["transformer"].keys())
    assert any("double_0/img_q" in p for p in paths)
    assert any("single_0/linear1" in p for p in paths)
    g = jax.grad(
        lambda tr: adapter.training_velocity(tr, {
            "latents": jnp.zeros((1, 16, 16)),
            "timestep": jnp.full((1,), 500.0),
            "guidance_scale": jnp.float32(3.5),
            "prompt_embeds": jnp.zeros((1, 4, 48)),
            "pooled_prompt_embeds": jnp.zeros((1, 16)),
            "img_ids": jnp.asarray(adapter.latent_image_ids(8, 8)),
            "txt_ids": jnp.zeros((4, 3)),
        }).sum()
    )(adapter.trainable)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
