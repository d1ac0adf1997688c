"""Tensor + FSDP parallelism on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flow_factory_tpu.hparams.args import Arguments
from flow_factory_tpu.models import load_adapter
from flow_factory_tpu.parallel.dist import set_world_size_override
from flow_factory_tpu.parallel.mesh import MeshConfig, TENSOR_AXIS, create_mesh


@pytest.fixture(autouse=True)
def _world():
    set_world_size_override(8)
    yield
    set_world_size_override(None)


def _cfg(tensor_size):
    return Arguments.from_dict({
        "data": {},
        "model": {"model_type": "sd3-5", "model_name_or_path": "tiny", "finetune_type": "lora",
                  "lora_rank": 4, "lora_alpha": 8, "attn_backend": "native",
                  "master_dtype": "float32", "inference_dtype": "float32",
                  "tensor_size": tensor_size},
        "scheduler": {"dynamics_type": "Flow-SDE", "noise_level": 0.7,
                      "num_sde_steps": 2, "sde_steps": [0, 1, 2]},
        "train": {"trainer_type": "grpo", "resolution": 32, "num_inference_steps": 3,
                  "guidance_scale": 1.0, "per_device_batch_size": 1, "group_size": 8,
                  "unique_sample_num_per_epoch": 1, "latent_storage_dtype": "fp32"},
        "eval": {}, "log": {}, "rewards": [],
    })


def test_tensor_parallel_rollout_and_grad():
    mesh = create_mesh(MeshConfig(fsdp_size=2, tensor_size=2))
    assert dict(mesh.shape) == {"replica": 2, "fsdp": 2, "tensor": 2}
    adapter = load_adapter(_cfg(tensor_size=2), mesh=mesh)

    # qkv kernels must actually be sharded over the tensor axis
    sharded = adapter.params["transformer"]["block_0"]["attn"]["to_q"]["kernel"]
    spec = sharded.sharding.spec
    assert TENSOR_AXIS in str(spec)

    adapter.rollout()
    samples = adapter.inference(prompt=["a"] * 4, compute_log_prob=True, seed=0,
                                trajectory_indices="all")
    assert len(samples) == 4

    # grad step over the TP+FSDP mesh
    from flow_factory_tpu.samples import stack_samples

    b = stack_samples(samples)
    s = samples[0]
    sig, nl = s.extra_kwargs["sigmas"], s.extra_kwargs["noise_levels"]
    i = int(np.nonzero(nl)[0][0])
    li, lni = s.latent_index_map[i], s.latent_index_map[i + 1]
    batch = adapter.shard_batch({
        "latents": jnp.asarray(b["all_latents"][:, li]),
        "next_latents": jnp.asarray(b["all_latents"][:, lni]),
        "timestep": jnp.full((4,), float(s.timesteps[i])),
        "sigma": jnp.full((4,), float(sig[i])),
        "sigma_next": jnp.full((4,), float(sig[i + 1])),
        "noise_level": jnp.full((4,), float(nl[i])),
        "guidance_scale": jnp.float32(1.0),
        "sigma_max": jnp.float32(sig[1]),
        "prompt_embeds": jnp.asarray(b["prompt_embeds"]),
        "pooled_prompt_embeds": jnp.asarray(b["pooled_prompt_embeds"]),
    })
    g = jax.grad(lambda tr: -adapter.training_forward(tr, batch).log_prob.mean())(adapter.trainable)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
