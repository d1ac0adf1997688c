"""AWM (Advantage-Weighted Matching) trainer (decoupled paradigm).

Re-design of the reference AWM trainer (``src/flow_factory/trainers/awm.py``).
The "log-prob" is a weighted negative matching loss
(``awm.py:284-330``):

    lp = −mean((v_θ(x_t,t) − (ε − x1))²)   weighted by
        Uniform | ·σ | ·σ² | huber: −(√(−lp+1e−10)−1e−5)·σ |
        ghuber: −((−lp+ε)^p − ε^p)·σ/p

PPO-clipped ratio of weighted matching "log-probs" between the current and
the sampling policy (per-batch precompute interleave, ``awm.py:470-...``),
plus optional frozen-ref KL and EMA-KL in velocity space.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..samples import BaseSample
from ..utils.base import derive_key, derive_seed
from .decoupled import DecoupledTrainer

logger = logging.getLogger(__name__)


def weighted_log_prob(v_pred, target, t, weighting: str, ghuber_power: float):
    """(B,) weighted matching log-prob (reference awm.py:284-330)."""
    d = (v_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    lp = -jnp.mean(d.reshape(d.shape[0], -1), axis=-1)
    sigma = jnp.clip(t / 1000.0, 0.0, 1.0)
    if weighting == "Uniform":
        return lp
    if weighting == "t":
        return lp * sigma
    if weighting == "t**2":
        return lp * sigma**2
    if weighting == "huber":
        return -(jnp.sqrt(-lp + 1e-10) - 1e-5) * sigma
    if weighting == "ghuber":
        eps = 1e-10
        return -((( -lp + eps) ** ghuber_power) - eps**ghuber_power) * sigma / ghuber_power
    raise ValueError(f"Unknown AWM weighting {weighting!r}")


class AWMTrainer(DecoupledTrainer):
    def sample(self, epoch: int, trainable=None) -> List[BaseSample]:
        if getattr(self.training_args, "off_policy", False) and self.adapter.ema is not None:
            trainable = self.adapter.ema_trainable
        return super().sample(epoch, trainable=trainable)

    def _sampling_trainable(self):
        if getattr(self.training_args, "off_policy", False) and self.adapter.ema is not None:
            return self.adapter.ema_trainable
        return self.adapter.trainable

    def optimize(self, samples: List[BaseSample], epoch: int) -> Dict[str, float]:
        ta = self.training_args
        T = ta.get_num_train_timesteps(self.config)
        kl_beta = float(getattr(ta, "kl_beta", 0.0))
        ema_kl_beta = float(getattr(ta, "ema_kl_beta", 0.0))
        ref_trainable = self.adapter.ref_trainable() if kl_beta > 0 else None
        frozen = self.adapter.frozen_velocity_params()
        shard = self.adapter.shard_batch
        infos = []

        for inner in range(ta.num_inner_epochs):
            for bi, (mb, batch_np) in enumerate(self.iter_micro_batches(samples, epoch, inner)):
                clean = self.clean_latent_tree(batch_np)  # {latents[, audio_latents]}
                embeds = self.batch_embeds(batch_np)
                adv = jnp.asarray([s.extra_kwargs["advantage"] for s in mb], jnp.float32)
                g = jnp.float32(mb[0].extra_kwargs.get("guidance_scale", ta.guidance_scale))
                all_t = self.sample_timesteps(len(mb), derive_seed("awm_t", ta.seed, epoch, inner, bi))

                # precompute old weighted log-probs under the sampling policy
                sampling_tr = self._sampling_trainable()
                noises, old_lps = [], []
                for t_idx in range(T):
                    t = jnp.asarray(all_t[t_idx])
                    key = derive_key("awm_noise", ta.seed, epoch, inner, bi, t_idx)
                    noise = self.tree_normal(key, clean)
                    x_t = self.tree_noised(clean, noise, t)
                    fwd = shard({**embeds, **x_t, "timestep": t, "guidance_scale": g})
                    old_v = self.adapter.training_velocity_tree(sampling_tr, fwd)
                    # old_v is GLOBAL under multi-process meshes — the target
                    # operands must be globally assembled too (mixing a
                    # global (B_global, ...) with process-local (B_local, ...)
                    # raises); shard() is a no-op-cost device_put single-process
                    tgt = shard({"noise": noise, "clean": clean})
                    old_lp = weighted_log_prob(
                        self.tree_flat(old_v),
                        self.tree_flat(tgt["noise"]) - self.tree_flat(tgt["clean"]),
                        t, ta.awm_weighting, ta.ghuber_power,
                    )
                    noises.append(noise)
                    old_lps.append(jax.lax.stop_gradient(old_lp))

                ema_trainable = (
                    self.adapter.ema_trainable if (ema_kl_beta > 0 and self.adapter.ema) else None
                )
                for t_idx in range(T):
                    t = jnp.asarray(all_t[t_idx])
                    batch = dict(
                        clean=clean,
                        noise=noises[t_idx],
                        old_log_prob=old_lps[t_idx],
                        timestep=t,
                        advantage=adv,
                        guidance_scale=g,
                        **embeds,
                    )
                    batch = shard(batch)
                    (loss, aux), grads = self._grad_fn(
                        self.adapter.trainable, frozen, batch, ref_trainable, ema_trainable
                    )
                    self.accumulate_grads(grads)
                    infos.append(dict(aux))  # device scalars — fetched once at epoch end (no per-step sync)
                    if self._accum_count >= ta.gradient_accumulation_steps:
                        infos[-1]["train/grad_norm"] = self.apply_accumulated()
        if self._accum_count > 0:
            infos[-1]["train/grad_norm"] = self.apply_accumulated()
        return self.aggregate_infos(infos)

    @property
    def _grad_fn(self):
        if not hasattr(self, "_cached_grad_fn"):
            ta = self.training_args
            clip_lo, clip_hi = ta.clip_range
            adv_lo, adv_hi = ta.adv_clip_range
            kl_beta = float(getattr(ta, "kl_beta", 0.0))
            ema_kl_beta = float(getattr(ta, "ema_kl_beta", 0.0))
            weighting, ghp = ta.awm_weighting, ta.ghuber_power
            adapter = self.adapter

            from .decoupled import DecoupledTrainer as _DT

            def loss_fn(trainable, frozen, batch, ref_trainable, ema_trainable):
                clean_t, noise_t, t = batch["clean"], batch["noise"], batch["timestep"]
                x_t_tree = _DT.tree_noised(clean_t, noise_t, t)
                v = _DT.tree_flat(adapter.training_velocity_tree(
                    trainable, {**batch, **x_t_tree}, frozen=frozen
                ))
                clean, noise = _DT.tree_flat(clean_t), _DT.tree_flat(noise_t)
                lp = weighted_log_prob(v, noise - clean, t, weighting, ghp)

                ratio = jnp.exp(lp - batch["old_log_prob"])
                adv = jnp.clip(batch["advantage"], adv_lo, adv_hi)
                unclipped = -adv * ratio
                clipped = -adv * jnp.clip(ratio, 1.0 + clip_lo, 1.0 + clip_hi)
                loss = jnp.mean(jnp.maximum(unclipped, clipped))
                aux = {
                    "train/loss": loss,
                    "train/ratio_mean": jnp.mean(ratio),
                    "train/clip_frac": jnp.mean(
                        ((ratio < 1.0 + clip_lo) | (ratio > 1.0 + clip_hi)).astype(jnp.float32)
                    ),
                    "train/matching_lp": jnp.mean(lp),
                }
                if kl_beta > 0 and ref_trainable is not None:
                    ref_v = jax.lax.stop_gradient(_DT.tree_flat(
                        adapter.training_velocity_tree(
                            ref_trainable, {**batch, **x_t_tree}, frozen=frozen
                        )
                    ))
                    kl = jnp.mean((v - ref_v) ** 2)
                    loss = loss + kl_beta * kl
                    aux["train/kl"] = kl
                if ema_kl_beta > 0 and ema_trainable is not None:
                    ema_v = jax.lax.stop_gradient(_DT.tree_flat(
                        adapter.training_velocity_tree(
                            ema_trainable, {**batch, **x_t_tree}, frozen=frozen
                        )
                    ))
                    ekl = jnp.mean((v - ema_v) ** 2)
                    loss = loss + ema_kl_beta * ekl
                    aux["train/ema_kl"] = ekl
                aux["train/total_loss"] = loss
                return loss, aux

            self._cached_grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        return self._cached_grad_fn
