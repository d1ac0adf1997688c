"""flow_factory_tpu — a TPU-native (JAX/XLA/Pallas/pjit) online-RL post-training
framework for diffusion / flow-matching generators.

Re-designed from scratch for TPU hardware with the capabilities of the
Flow-Factory reference framework (reference: /root/reference):

- rollout sampling as a single jitted ``lax.scan`` over denoise steps with
  per-step log-probabilities (the RL-math heart),
- Pallas flash attention on the MXU for the DiT hot loop,
- parallelism as declarative ``jax.sharding`` over a 2-D device mesh
  (``replica`` × ``fsdp``) instead of DDP/DeepSpeed/FSDP wrappers,
- LoRA / EMA / reference-policy / parameter snapshots as functional pytree
  transforms instead of in-place weight swapping,
- host-side async reward scoring batched against the rollout queue.
"""

__version__ = "0.1.0"
