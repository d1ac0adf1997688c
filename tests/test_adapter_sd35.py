"""SD3.5-tiny adapter: rollout, replay-ratio invariant, LoRA/EMA/ref/checkpoint."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.samples import stack_samples


@pytest.fixture(scope="module")
def adapter():
    cfg = Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": "sd3-5", "model_name_or_path": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "float32"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 4,
                  "guidance_scale": 2.0, "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2, "latent_storage_dtype": "fp32",
                  "ema_decay": 0.9, "ema_update_interval": 1},
        "eval": {}, "log": {}, "rewards": [],
    })
    return load_adapter(cfg)


def _replay_batch(samples, i, g=2.0):
    s = samples[0]
    b = stack_samples(samples)
    sig = s.extra_kwargs["sigmas"]
    nl = s.extra_kwargs["noise_levels"]
    li, lni, lpi = s.latent_index_map[i], s.latent_index_map[i + 1], s.log_prob_index_map[i]
    B = len(samples)
    return {
        "latents": jnp.asarray(b["all_latents"][:, li]),
        "next_latents": jnp.asarray(b["all_latents"][:, lni]),
        "timestep": jnp.full((B,), float(s.timesteps[i])),
        "sigma": jnp.full((B,), float(sig[i])),
        "sigma_next": jnp.full((B,), float(sig[i + 1])),
        "noise_level": jnp.full((B,), float(nl[i])),
        "guidance_scale": jnp.float32(g),
        "sigma_max": jnp.float32(sig[1]),
        "prompt_embeds": jnp.asarray(b["prompt_embeds"]),
        "pooled_prompt_embeds": jnp.asarray(b["pooled_prompt_embeds"]),
        "negative_prompt_embeds": jnp.asarray(b["negative_prompt_embeds"]),
        "negative_pooled_prompt_embeds": jnp.asarray(b["negative_pooled_prompt_embeds"]),
    }, b["log_probs"][:, lpi]


def test_rollout_and_replay_ratio(adapter):
    adapter.rollout()
    samples = adapter.inference(prompt=["a cat", "a dog"], compute_log_prob=True, seed=0)
    s = samples[0]
    assert s.image.shape == (3, 32, 32)
    assert s.all_latents.shape[0] == 5  # T+1 stored positions ('all')
    assert s.log_probs.shape == (4,)
    assert s.unique_id != samples[1].unique_id

    # the core invariant: replayed log-prob reproduces the rollout log-prob
    for i in range(4):
        if s.extra_kwargs["noise_levels"][i] == 0:
            continue  # zero-noise steps carry no trainable log-prob by design
        batch, old_lp = _replay_batch(samples, i)
        out = adapter.training_forward(adapter.trainable, batch)
        ratio = np.exp(np.asarray(out.log_prob) - old_lp)
        np.testing.assert_allclose(ratio, 1.0, atol=1e-4)


def test_bf16_host_staged_context_keeps_replay_ratio():
    """SD3 sequence context ships over the wire in the compute dtype
    (stage_context in inference): the transformer's first use is
    `.astype(dt)` into context_embedder, so host rne cast == device rne
    cast and the bf16-staged rollout must replay (fp32-staged, as the
    trainers stage) to IDENTICAL log-probs: ratio == 1."""
    cfg = Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": "sd3-5", "model_name_or_path": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "bfloat16"},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 4,
                  "guidance_scale": 2.0, "per_device_batch_size": 2, "group_size": 2,
                  "unique_sample_num_per_epoch": 2, "latent_storage_dtype": "fp32"},
        "eval": {}, "log": {}, "rewards": [],
    })
    bf16_adapter = load_adapter(cfg)
    bf16_adapter.rollout()
    emb = bf16_adapter.stage_context(np.ones((2, 8, 16), np.float32) * 1.00390625)
    assert emb.dtype == jnp.bfloat16  # narrow staging actually happened
    samples = bf16_adapter.inference(prompt=["a cat", "a dog"], compute_log_prob=True, seed=0)
    s = samples[0]
    nl = s.extra_kwargs["noise_levels"]
    i = int(np.nonzero(nl)[0][0])
    batch, old_lp = _replay_batch(samples, i)
    # replay stages fp32, exactly as the trainers do
    batch["prompt_embeds"] = jnp.asarray(np.asarray(batch["prompt_embeds"]), jnp.float32)
    batch["negative_prompt_embeds"] = jnp.asarray(
        np.asarray(batch["negative_prompt_embeds"]), jnp.float32)
    out = bf16_adapter.training_forward(bf16_adapter.trainable, batch)
    ratio = np.exp(np.asarray(out.log_prob) - old_lp)
    np.testing.assert_allclose(ratio, 1.0, atol=1e-4)


def test_eval_mode_is_deterministic_ode(adapter):
    adapter.eval()
    s1 = adapter.inference(prompt=["same prompt"], compute_log_prob=False,
                           trajectory_indices=None, seed=5)
    s2 = adapter.inference(prompt=["same prompt"], compute_log_prob=False,
                           trajectory_indices=None, seed=5)
    np.testing.assert_allclose(s1[0].image, s2[0].image, atol=1e-6)
    adapter.train()


def test_lora_grads_flow_on_sde_steps(adapter):
    adapter.rollout()
    samples = adapter.inference(prompt=["a cat", "a dog"], compute_log_prob=True, seed=1)
    nl = samples[0].extra_kwargs["noise_levels"]
    sde_i = int(np.nonzero(nl)[0][0])
    batch, _ = _replay_batch(samples, sde_i)

    def loss_fn(tr):
        return -adapter.training_forward(tr, batch).log_prob.mean()

    g = jax.grad(loss_fn)(adapter.trainable)
    gnorm = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(g))
    assert gnorm > 0


def test_ref_trainable_is_zero_lora(adapter):
    ref = adapter.ref_trainable()
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(ref))


def test_ema_and_named_snapshots(adapter):
    adapter.post_init()  # ema_decay=0.9 in fixture config
    assert adapter.ema is not None
    before = jax.tree.leaves(adapter.ema.params)[0].copy()
    adapter.trainable = jax.tree.map(lambda x: x + 1.0, adapter.trainable)
    adapter.ema_step()
    after = jax.tree.leaves(adapter.ema.params)[0]
    assert float(jnp.abs(after - before).max()) > 0

    adapter.add_named_parameters("snap")
    snap = adapter.get_named_parameters("snap")
    leaf_t = jax.tree.leaves(adapter.trainable)[0]
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(snap)[0]), np.asarray(leaf_t), rtol=1e-6)
    adapter.update_named_parameters("snap", blend=0.5)
    adapter.remove_named_parameters("snap")
    assert not adapter.has_named_parameters("snap")


def test_checkpoint_roundtrip(adapter, tmp_path):
    d = str(tmp_path / "ckpt")
    adapter.save_checkpoint(d, model_only=True, save_ema=False)
    assert os.path.exists(os.path.join(d, "adapter_config.json"))
    orig = jax.tree.leaves(adapter.trainable)[0].copy()
    adapter.trainable = jax.tree.map(lambda x: x * 0.0, adapter.trainable)
    adapter.load_checkpoint(d)
    restored = jax.tree.leaves(adapter.trainable)[0]
    np.testing.assert_allclose(np.asarray(restored), np.asarray(orig), rtol=1e-6)


def test_full_state_checkpoint_resume(adapter, tmp_path):
    """model_only=False: orbax train state roundtrip incl. extra state."""
    d = str(tmp_path / "state_ckpt")
    adapter.save_checkpoint(
        d, model_only=False, save_ema=False,
        extra_state={"epoch": 3, "global_step": 7},
    )
    orig = jax.tree.leaves(adapter.trainable)[0].copy()
    adapter.trainable = jax.tree.map(lambda x: x * 0.0, adapter.trainable)
    adapter.load_checkpoint(d, resume_type="state")
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(adapter.trainable)[0]), np.asarray(orig), rtol=1e-6
    )
    assert adapter._restored_state["epoch"] == 3
    assert adapter._restored_state["global_step"] == 7


def test_export_merged_lora_to_full(adapter, tmp_path):
    """LoRA deltas merged into frozen weights == the merged forward params;
    the export uses the full-checkpoint layout (LoRA→full migration)."""
    d = str(tmp_path / "merged")
    # give the LoRA a nonzero delta so the merge is observable
    adapter.trainable = jax.tree.map(
        lambda x: x + 0.01 if x.ndim >= 1 else x, adapter.trainable
    )
    adapter.export_merged(d, save_ema=False)
    assert os.path.exists(os.path.join(d, "model_index.json"))
    from safetensors.numpy import load_file

    exported = load_file(os.path.join(d, "transformer.safetensors"))
    merged = adapter.merged_params("transformer")
    # spot-check one LoRA-targeted kernel equals frozen + a@b·scale
    key = next(k for k in exported if k.endswith("attn/to_q/kernel"))
    path_parts = key.split("/")
    node = merged
    for p in path_parts:
        node = node[p]
    np.testing.assert_allclose(exported[key], np.asarray(node), atol=1e-6)
    frozen_node = adapter.params["transformer"]
    for p in path_parts:
        frozen_node = frozen_node[p]
    assert not np.allclose(exported[key], np.asarray(frozen_node))
