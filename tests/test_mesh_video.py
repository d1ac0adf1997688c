"""Video families under a multi-device mesh: TP+FSDP sharded rollout and
gradients for Wan T2V and LTX-2 T2AV.

The BASELINE target runs Wan on a v5p-64 mesh; these tests pin that the
5-D-latent scan, the UniPC-SDE geometry, and the dual-modality LTX-2 scan
all compile and execute under ``Mesh(replica=2, fsdp=2, tensor=2)`` with
kernels actually sharded over the tensor axis (same contract as the SD3.5
coverage in test_mesh_tp.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.parallel.mesh import TENSOR_AXIS, MeshConfig, create_mesh
from flow_factory_tpu.samples import stack_samples


def _cfg(model_type):
    return Arguments.from_dict({
        "data": {"dataset_dir": "tests/fixtures/tiny_prompts"},
        "model": {"model_type": model_type, "model_name_or_path": "tiny",
                  "finetune_type": "lora", "lora_rank": 2, "lora_alpha": 4,
                  "master_dtype": "float32", "inference_dtype": "float32",
                  "fsdp_size": 2, "tensor_size": 2},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32,
                  "num_inference_steps": 4, "guidance_scale": 2.0,
                  "per_device_batch_size": 1, "group_size": 4,
                  "unique_sample_num_per_epoch": 1, "ema_decay": 0},
        "eval": {}, "log": {}, "rewards": [],
    })


def _replay_batch(adapter, samples, extra=()):
    b = stack_samples(samples)
    s = samples[0]
    sig, nl = s.extra_kwargs["sigmas"], s.extra_kwargs["noise_levels"]
    i = int(np.nonzero(nl)[0][0])
    li, lni = s.latent_index_map[i], s.latent_index_map[i + 1]
    B = len(samples)
    batch = {
        "latents": jnp.asarray(b["all_latents"][:, li]),
        "next_latents": jnp.asarray(b["all_latents"][:, lni]),
        "timestep": jnp.full((B,), float(s.timesteps[i])),
        "sigma": jnp.full((B,), float(sig[i])),
        "sigma_next": jnp.full((B,), float(sig[i + 1])),
        "noise_level": jnp.full((B,), float(nl[i])),
        "guidance_scale": jnp.float32(2.0),
        "sigma_max": jnp.float32(sig[1]),
    }
    for k in extra:
        if k in b and b[k] is not None:
            batch[k] = jnp.asarray(b[k])
    for ek in adapter.embed_keys:
        if ek in b and b[ek] is not None:
            batch[ek] = jnp.asarray(b[ek])
    return adapter.shard_batch(batch)


def test_wan_t2v_mesh_rollout_and_grad():
    mesh = create_mesh(MeshConfig(fsdp_size=2, tensor_size=2))
    adapter = load_adapter(_cfg("wan2-t2v"), mesh=mesh)
    qkv = adapter.params["transformer"]["block_0"]["sa_q"]["kernel"]
    assert TENSOR_AXIS in str(qkv.sharding.spec)

    adapter.rollout()
    samples = adapter.inference(prompt=["a"] * 4, compute_log_prob=True,
                                seed=0, trajectory_indices="all", decode=False)
    assert len(samples) == 4
    batch = _replay_batch(adapter, samples)
    g = jax.grad(lambda tr: -adapter.training_forward(tr, batch).log_prob.mean())(
        adapter.trainable)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_ltx2_t2av_mesh_rollout_and_grad():
    mesh = create_mesh(MeshConfig(fsdp_size=2, tensor_size=2))
    adapter = load_adapter(_cfg("ltx2-t2av"), mesh=mesh)
    qkv = adapter.params["transformer"]["block_0"]["sa_q"]["kernel"]
    assert TENSOR_AXIS in str(qkv.sharding.spec)

    adapter.rollout()
    samples = adapter.inference(prompt=["a"] * 4, compute_log_prob=True,
                                seed=0, trajectory_indices="all", decode=False)
    assert len(samples) == 4
    batch = _replay_batch(adapter, samples)
    b = stack_samples(samples)
    s = samples[0]
    li = s.latent_index_map[int(np.nonzero(s.extra_kwargs["noise_levels"])[0][0])]
    batch.update(adapter.shard_batch(
        {"audio_latents": jnp.asarray(b["audio_all_latents"][:, li])}))
    g = jax.grad(lambda tr: -adapter.training_forward(tr, batch).log_prob.mean())(
        adapter.trainable)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_wan_ring_attention_backend_rollout():
    """``attn_backend: ring`` — sequence parallelism over the tensor axis
    (VERDICT round-1 item 7). The ring rollout must (a) run under the mesh
    with TP head-sharding disabled, and (b) match the native-attention
    rollout numerically (ring attention is exact full attention)."""
    cfg_ring = _cfg("wan2-t2v")
    cfg_ring.model_args.attn_backend = "ring"
    mesh = create_mesh(MeshConfig(fsdp_size=2, tensor_size=2))
    adapter = load_adapter(cfg_ring, mesh=mesh)
    # tensor axis repurposed for sequence: kernels must NOT be head-sharded
    qkv = adapter.params["transformer"]["block_0"]["sa_q"]["kernel"]
    assert TENSOR_AXIS not in str(qkv.sharding.spec)

    adapter.rollout()
    samples = adapter.inference(prompt=["a boat"] * 4, compute_log_prob=True, seed=11)
    assert np.all(np.isfinite(samples[0].log_probs))

    # same seed, native backend, no mesh → must match (loose: bf16-free fp32
    # rollout, ring merge reassociates the softmax)
    cfg_native = _cfg("wan2-t2v")
    cfg_native.model_args.attn_backend = "native"
    ref_adapter = load_adapter(cfg_native)
    ref_adapter.rollout()
    ref = ref_adapter.inference(prompt=["a boat"] * 4, compute_log_prob=True, seed=11)
    np.testing.assert_allclose(
        samples[0].all_latents[-1], ref[0].all_latents[-1], atol=5e-3, rtol=1e-3
    )
