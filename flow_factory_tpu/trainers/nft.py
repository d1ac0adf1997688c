"""DiffusionNFT trainer (decoupled paradigm).

Re-design of the reference NFT trainer (``src/flow_factory/trainers/nft.py``).
Rollout stores only the final latent; optional off-policy sampling under EMA
(``nft.py:74-81``). Per micro-batch: precompute old velocity predictions
under the SAMPLING policy at freshly drawn (t, ε) (``nft.py:355-377``), then
train per timestep under the current policy with the contrastive NFT loss
(``nft.py:399-431``):

    v⁺ = β·v_new + (1−β)·v_old          v⁻ = (1+β)·v_old − β·v_new
    x0(v) = x_t − σ·v
    L = [ r·‖x0(v⁺)−x1‖²/w⁺ + (1−r)·‖x0(v⁻)−x1‖²/w⁻ ] / β · adv_hi
    r = clamp(adv/(2·adv_hi) + ½, 0, 1)   (advantage → [0,1] reward)

with per-sample mean-abs normalizers w (stop-gradient) and optional v-space
KL against the reference policy.
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


class NFTTrainer(DecoupledTrainer):
    def sample(self, epoch: int, trainable=None) -> List[BaseSample]:
        # off-policy: rollout under EMA weights (reference nft.py:74-81,231-233)
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
                t_seed = derive_seed("nft_t", ta.seed, epoch, inner, bi)
                all_t = self.sample_timesteps(len(mb), t_seed)  # (T, B)

                # ---- precompute old velocity preds under the sampling policy
                sampling_tr = self._sampling_trainable()
                noises, old_vs = [], []
                for t_idx in range(T):
                    t = jnp.asarray(all_t[t_idx])
                    key = derive_key("nft_noise", ta.seed, epoch, inner, bi, t_idx)
                    noise = self.tree_normal(key, clean)
                    x_t = self.tree_noised(clean, noise, t)
                    fwd = shard({**embeds, **x_t, "timestep": t, "guidance_scale": g})
                    old_v = self.adapter.training_velocity_tree(sampling_tr, fwd)
                    noises.append(noise)
                    old_vs.append(jax.lax.stop_gradient(old_v))

                # ---- train per timestep under the current policy
                for t_idx in range(T):
                    t = jnp.asarray(all_t[t_idx])
                    batch = dict(
                        clean=clean,
                        noise=noises[t_idx],
                        old_v=old_vs[t_idx],
                        timestep=t,
                        advantage=adv,
                        guidance_scale=g,
                        **embeds,
                    )
                    batch = shard(batch)
                    (loss, aux), grads = self._grad_fn(
                        self.adapter.trainable, frozen, batch, ref_trainable
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
            nft_beta = float(ta.nft_beta)
            adv_lo, adv_hi = ta.adv_clip_range
            kl_beta = float(getattr(ta, "kl_beta", 0.0))
            adapter = self.adapter

            def normalized_mse(x0_pred, clean):
                w = jax.lax.stop_gradient(
                    jnp.maximum(
                        jnp.mean(
                            jnp.abs(x0_pred - clean).reshape(clean.shape[0], -1), axis=-1
                        ),
                        1e-5,
                    )
                ).reshape(-1, *([1] * (clean.ndim - 1)))
                d = (x0_pred - clean) ** 2 / w
                return jnp.mean(d.reshape(clean.shape[0], -1), axis=-1)

            from .decoupled import DecoupledTrainer as _DT

            def loss_fn(trainable, frozen, batch, ref_trainable):
                clean_t, noise_t, t = batch["clean"], batch["noise"], batch["timestep"]
                x_t_tree = _DT.tree_noised(clean_t, noise_t, t)
                new_v_tree = adapter.training_velocity_tree(
                    trainable, {**batch, **x_t_tree}, frozen=frozen
                )
                # loss math runs on the flattened concat of all latent streams
                # (identical semantics to the reference's unified tensor)
                clean, noise = _DT.tree_flat(clean_t), _DT.tree_flat(noise_t)
                new_v, old_v = _DT.tree_flat(new_v_tree), _DT.tree_flat(batch["old_v"])
                sigma = (t / 1000.0).reshape(-1, *([1] * (clean.ndim - 1)))
                x_t = (1.0 - sigma) * clean + sigma * noise

                adv = jnp.clip(batch["advantage"], adv_lo, adv_hi)
                r = jnp.clip((adv / adv_hi) / 2.0 + 0.5, 0.0, 1.0)

                pos = nft_beta * new_v + (1.0 - nft_beta) * old_v
                neg = (1.0 + nft_beta) * old_v - nft_beta * new_v
                pos_loss = normalized_mse(x_t - sigma * pos, clean)
                neg_loss = normalized_mse(x_t - sigma * neg, clean)

                per_sample = (r * pos_loss + (1.0 - r) * neg_loss) / nft_beta
                loss = jnp.mean(per_sample) * adv_hi
                aux = {
                    "train/loss": loss,
                    "train/positive_loss": jnp.mean(pos_loss),
                    "train/negative_loss": jnp.mean(neg_loss),
                    "train/reward_r_mean": jnp.mean(r),
                }
                if kl_beta > 0 and ref_trainable is not None:
                    ref_v = jax.lax.stop_gradient(_DT.tree_flat(
                        adapter.training_velocity_tree(
                            ref_trainable, {**batch, **x_t_tree}, frozen=frozen
                        )
                    ))
                    kl = jnp.mean((new_v - ref_v) ** 2)
                    loss = loss + kl_beta * kl
                    aux["train/kl"] = kl
                aux["train/total_loss"] = loss
                return loss, aux

            self._cached_grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        return self._cached_grad_fn
