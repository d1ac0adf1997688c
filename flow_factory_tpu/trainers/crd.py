"""CRD trainer — Contrastive/Centered Reward Distillation (decoupled).

Re-design of the reference CRD (``src/flow_factory/trainers/crd.py``).
Maintains two named parameter snapshots blended toward current weights per
epoch on ``"start-startval-slope-endval"`` schedules (``crd.py:67-105,
380-432``):

    _crd_old      — implicit-reward anchor   (old_model_decay)
    _crd_sampling — rollout policy           (sampling_model_decay)

Per train timestep: implicit reward
``r_θ = −(‖v_θ−v*‖² − ‖v_old−v*‖²)`` (optionally mean-abs-normalized,
``adaptive_logp``) is matched against centered external rewards; the
centering weights come from uniform / hard positive-negative pools /
softmax(adv/T) depending on ``weight_temp`` (``crd.py:522-633``); KL to the
(optionally CFG'd, ``kl_cfg``) frozen teacher, optionally reward-adaptive.

Centering statistics use the full micro-batch, which under the
single-controller model spans all local replicas (the reference's
``accelerator.gather`` collapses into the jitted global-batch mean).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..samples import BaseSample
from ..utils.base import derive_key, derive_seed
from .decoupled import DecoupledTrainer

logger = logging.getLogger(__name__)

# (start_step, start_value, slope, end_value) — reference crd.py:50-64
_DECAY_PRESETS = {
    0: (0, 0.0, 0.0, 0.0),
    1: (0, 0.0, 0.001, 0.5),
    2: (75, 0.0, 0.0075, 0.999),
    3: (0, 1.0, 0.0, 1.0),
    4: (0, 0.0, 0.02, 0.99),
    5: (0, 0.0, 0.01, 0.5),
    6: (0, 0.0, 0.0075, 0.999),
    "none": (0, 0.0, 0.0, 0.0),
    "slow": (0, 0.0, 0.001, 0.5),
    "medium": (75, 0.0, 0.0075, 0.999),
    "offline": (0, 1.0, 0.0, 1.0),
    "fast": (0, 0.0, 0.02, 0.99),
    "moderate": (0, 0.0, 0.01, 0.5),
}


def compute_decay(step: int, decay_type: Union[str, int, float]) -> float:
    """Piecewise-linear decay from a preset key or 'start-val-slope-end' string."""
    if isinstance(decay_type, str):
        try:
            decay_type = int(decay_type)
        except ValueError:
            pass
    if isinstance(decay_type, float):
        return decay_type
    if decay_type in _DECAY_PRESETS:
        start_step, start_value, slope, end_value = _DECAY_PRESETS[decay_type]
    elif isinstance(decay_type, str) and "-" in decay_type:
        parts = decay_type.split("-")
        if len(parts) != 4:
            raise ValueError(
                f"Decay string must be 'start_step-start_value-slope-end_value', got {decay_type!r}"
            )
        start_step, start_value, slope, end_value = (
            int(float(parts[0])), float(parts[1]), float(parts[2]), float(parts[3])
        )
    else:
        raise ValueError(f"Invalid decay_type {decay_type!r}")
    if step < start_step:
        return start_value
    return min(start_value + (step - start_step) * slope, end_value)


class CRDTrainer(DecoupledTrainer):
    OLD = "_crd_old"
    SAMPLING = "_crd_sampling"

    def __init__(self, config, adapter):
        super().__init__(config, adapter)
        self.adapter.add_named_parameters(self.OLD)
        self.adapter.add_named_parameters(self.SAMPLING)
        self.adapter.init_ref_parameters()

    # ------------------------------------------------------------------
    def sample(self, epoch: int, trainable=None) -> List[BaseSample]:
        return super().sample(
            epoch, trainable=self.adapter.get_named_parameters(self.SAMPLING)
        )

    def _blend(self, name: str, decay: float) -> None:
        if decay <= 0.0:
            self.adapter.set_named_parameters(name)
        elif decay >= 1.0:
            pass
        else:
            self.adapter.update_named_parameters(name, blend=decay)

    def update_snapshots(self) -> None:
        ta = self.training_args
        self._blend(self.OLD, compute_decay(self.global_step, ta.old_model_decay))
        self._blend(self.SAMPLING, compute_decay(self.global_step, ta.sampling_model_decay))

    def start(self) -> None:
        # snapshot blending happens per epoch (reference crd.py:375-377);
        # hook via the template by wrapping optimize.
        super().start()

    # ------------------------------------------------------------------
    def optimize(self, samples: List[BaseSample], epoch: int) -> Dict[str, float]:
        ta = self.training_args
        T = ta.get_num_train_timesteps(self.config)
        shard = self.adapter.shard_batch
        infos = []
        ref_trainable = self.adapter.ref_trainable()
        frozen = self.adapter.frozen_velocity_params()
        old_trainable = (
            self.adapter.get_named_parameters(self.OLD)
            if ta.use_old_for_loss else ref_trainable
        )
        B = self.micro_batch_size
        # in-order indices, cycle-padded so remainder samples still contribute
        idx = list(range(len(samples)))
        if idx and len(idx) % B:
            idx += idx[: B - len(idx) % B]
        for inner in range(ta.num_inner_epochs):
            # CRD keeps sample order (same-prompt grouping aids centering)
            for bi in range(0, len(idx) - B + 1, B):
                mb = [samples[i] for i in idx[bi : bi + B]]
                from ..samples import stack_samples

                batch_np = stack_samples(mb)
                clean = self.clean_latent_tree(batch_np)  # {latents[, audio_latents]}
                embeds = self.batch_embeds(batch_np)
                adv = jnp.asarray([s.extra_kwargs["advantage"] for s in mb], jnp.float32)
                g = jnp.float32(mb[0].extra_kwargs.get("guidance_scale", ta.guidance_scale))
                all_t = self.sample_timesteps(len(mb), derive_seed("crd_t", ta.seed, epoch, inner, bi))

                # precompute old-model predictions at the same (t, ε)
                noises, old_vs = [], []
                for t_idx in range(T):
                    t = jnp.asarray(all_t[t_idx])
                    key = derive_key("crd_noise", ta.seed, epoch, inner, bi, t_idx)
                    noise = self.tree_normal(key, clean)
                    x_t = self.tree_noised(clean, noise, t)
                    fwd = shard({**embeds, **x_t, "timestep": t, "guidance_scale": g})
                    fwd_uncfg = {k: v for k, v in fwd.items() if not k.startswith("negative_")}
                    old_v = self.adapter.training_velocity_tree(old_trainable, fwd_uncfg)
                    noises.append(noise)
                    old_vs.append(jax.lax.stop_gradient(old_v))

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
        self.update_snapshots()
        return self.aggregate_infos(infos)

    # ------------------------------------------------------------------
    @property
    def _grad_fn(self):
        if not hasattr(self, "_cached_grad_fn"):
            ta = self.training_args
            crd_beta = float(ta.crd_beta)
            loss_type = ta.crd_loss_type
            adaptive = bool(ta.adaptive_logp)
            weight_temp = float(ta.weight_temp)
            adv_lo, adv_hi = ta.adv_clip_range
            kl_beta = float(ta.kl_beta)
            kl_cfg = float(ta.kl_cfg)
            reward_adaptive_kl = bool(ta.reward_adaptive_kl)
            adapter = self.adapter
            sg = jax.lax.stop_gradient

            def centered_loss(adv01, r_theta, weights):
                adv_avg = jnp.sum(adv01 * weights)
                r_avg = jnp.sum(sg(r_theta) * weights)
                Rc = adv01 - adv_avg
                Rtc = r_theta - r_avg
                if loss_type == "bce":
                    logits = crd_beta * Rtc
                    targets = jax.nn.sigmoid(sg(Rc))
                    return jnp.mean(
                        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                    )
                return jnp.mean((crd_beta * Rtc - Rc) ** 2)

            from .decoupled import DecoupledTrainer as _DT

            def loss_fn(trainable, frozen, batch, ref_trainable):
                clean_t, noise_t, t = batch["clean"], batch["noise"], batch["timestep"]
                x_t_tree = _DT.tree_noised(clean_t, noise_t, t)
                target = _DT.tree_flat(noise_t) - _DT.tree_flat(clean_t)
                fwd = {**batch, **x_t_tree}
                fwd_uncfg = {k: v for k, v in fwd.items() if not k.startswith("negative_")}
                v = _DT.tree_flat(
                    adapter.training_velocity_tree(trainable, fwd_uncfg, frozen=frozen)
                )
                old_v = _DT.tree_flat(batch["old_v"])

                if adaptive:
                    wt = sg(jnp.maximum(jnp.mean(
                        jnp.abs(v - target).reshape(v.shape[0], -1), axis=-1), 1e-5)
                    ).reshape(-1, *([1] * (v.ndim - 1)))
                    wo = sg(jnp.maximum(jnp.mean(
                        jnp.abs(old_v - target).reshape(v.shape[0], -1), axis=-1), 1e-5)
                    ).reshape(-1, *([1] * (v.ndim - 1)))
                    r_theta_map = -((v - target) ** 2 / wt - (old_v - target) ** 2 / wo)
                else:
                    r_theta_map = -((v - target) ** 2 - (old_v - target) ** 2)
                r_theta = jnp.mean(r_theta_map.reshape(v.shape[0], -1), axis=-1)

                adv = jnp.clip(batch["advantage"], adv_lo, adv_hi)
                adv01 = jnp.clip((adv / adv_hi) / 2.0 + 0.5, 0.0, 1.0)

                n = adv01.shape[0]
                if weight_temp < 0:  # uniform single-direction
                    w = jnp.full((n,), 1.0 / n)
                    ori = centered_loss(adv01, r_theta, w)
                else:
                    if weight_temp == 0:  # hard pools
                        pos_mask = adv > 0
                        neg_mask = adv < 0
                        wp = jnp.where(
                            jnp.any(pos_mask),
                            jax.nn.softmax(jnp.where(pos_mask, adv01, -jnp.inf)),
                            jnp.full((n,), 1.0 / n),
                        )
                        wm = jnp.where(
                            jnp.any(neg_mask),
                            jax.nn.softmax(jnp.where(neg_mask, adv01, -jnp.inf)),
                            jnp.full((n,), 1.0 / n),
                        )
                    else:
                        wp = jax.nn.softmax(adv01 / weight_temp)
                        wm = jax.nn.softmax(-adv01 / weight_temp)
                    ori = 0.5 * centered_loss(adv01, r_theta, wp) + 0.5 * centered_loss(
                        adv01, r_theta, wm
                    )

                loss = ori * adv_hi / max(crd_beta, 1e-8)
                aux = {
                    "train/loss": loss,
                    "train/unweighted_policy_loss": ori,
                    "train/r_theta_mean": jnp.mean(r_theta),
                }

                if kl_beta > 0:
                    if kl_cfg > 1.0 and "negative_prompt_embeds" in fwd:
                        ref_fwd = {**fwd, "guidance_scale": jnp.float32(kl_cfg)}
                    else:
                        ref_fwd = fwd_uncfg
                    ref_v = sg(_DT.tree_flat(
                        adapter.training_velocity_tree(ref_trainable, ref_fwd, frozen=frozen)
                    ))
                    kl = jnp.mean((v - ref_v).reshape(v.shape[0], -1) ** 2, axis=-1)
                    if reward_adaptive_kl:
                        base_beta = 1e-4
                        min_coef = base_beta / max(kl_beta, 1e-8)
                        kl_loss = kl_beta * jnp.mean((min_coef + adv01 * (1 - min_coef)) * kl)
                    else:
                        kl_loss = kl_beta * jnp.mean(kl)
                    loss = loss + kl_loss
                    aux["train/kl"] = jnp.mean(kl)
                    aux["train/old_deviate"] = jnp.mean((v - old_v) ** 2)
                aux["train/total_loss"] = loss
                return loss, aux

            self._cached_grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        return self._cached_grad_fn
