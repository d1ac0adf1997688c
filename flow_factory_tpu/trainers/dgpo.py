"""DGPO trainer — group-level preference optimization (decoupled).

Re-design of the reference DGPO (``src/flow_factory/trainers/dgpo.py``).
Contract: ``GroupDistributedSampler`` (forced by config resolution) — every
replica yields the SAME prompt sequence, so each micro-batch holds complete
groups once all replicas are accounted for.

Per inner-epoch, per micro-batch, per train timestep t (shared across ranks,
seeded from (seed, epoch, inner, TAG)):

    ε_g   per-group shared noise seeded from (seed, epoch, inner, uid)      [dgpo.py:403-447]
    x_t   = (1−σ)·x1 + σ·ε_g,  v* = ε_g − x1
    dsm   = ‖v_θ(x_t) − v*‖²  (per sample, guidance 1.0 — no CFG)
    pref  = adv·β_dpo·(sg(dsm) − ref_dsm)/K                                 [dgpo.py:448-468]
    w_g   = σ(Σ_group pref)        — the ONLY group-level reduction          [dgpo.py:490-530]
    L     = mean(w_g · adv · dsm)  (+ PPO-style DSM/KL clipping vs ema_ref,
            + KL vs frozen ref with optional kl_cfg CFG teacher)

TPU note: the reference needs scatter_add + a cross-rank ``accelerator.reduce``
because each rank sees only its group slice. Here ``shard_batch`` builds a
globally-sharded batch (process-local rows on multi-controller pods), so the
jitted ``segment_sum`` over it IS the group reduction — XLA inserts the
cross-host collective; group ids are consistent across processes because
the distributed sampler yields the same prompt sequence on every replica.

``ema_ref`` (fast old-policy snapshot, TDM-R1 dynamic reference) is a named
parameter store blended toward current weights per optimizer step with
``decay = min(max_decay, ramp_rate·step)``; after ``switch_ema_ref`` steps the
rollout itself samples under it.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..samples import BaseSample
from ..utils.base import derive_key, derive_seed
from ..utils.noise_schedule import TimeSampler
from .decoupled import DecoupledTrainer

logger = logging.getLogger(__name__)

_TAG_SHARED_T = 1
_TAG_SHARED_NOISE = 2


class DGPOTrainer(DecoupledTrainer):
    EMA_REF = "ema_ref"

    def __init__(self, config, adapter):
        super().__init__(config, adapter)
        ta = self.training_args
        self.dpo_beta = float(ta.dpo_beta)
        self._requires_ema_ref = bool(ta.clip_dsm or ta.clip_kl or ta.use_ema_ref)
        if self._requires_ema_ref:
            self.adapter.add_named_parameters(self.EMA_REF)
        if ta.requires_ref_model:
            self.adapter.init_ref_parameters()

    # ------------------------------------------------------------------
    def _sampling_trainable(self) -> Optional[Dict[str, Any]]:
        ta = self.training_args
        if self.global_step > ta.switch_ema_ref and self._requires_ema_ref:
            return self.adapter.get_named_parameters(self.EMA_REF)
        if ta.off_policy and self.adapter.ema is not None:
            return self.adapter.ema_trainable
        return None

    def sample(self, epoch: int, trainable=None) -> List[BaseSample]:
        return super().sample(epoch, trainable=self._sampling_trainable())

    def _update_ema_ref(self) -> None:
        if not self._requires_ema_ref:
            return
        ta = self.training_args
        decay = min(float(ta.ema_ref_max_decay), float(ta.ema_ref_ramp_rate) * self.global_step)
        self.adapter.update_named_parameters(self.EMA_REF, blend=decay)

    @staticmethod
    def _uid_int(uid: str) -> int:
        return int(uid[:16], 16)

    def _shared_timesteps(self, epoch: int, inner: int) -> np.ndarray:
        """(T,) — identical on every process (seeded, no broadcast)."""
        seed = derive_seed(self.training_args.seed, epoch, inner, _TAG_SHARED_T)
        return self.sample_timesteps(1, seed)[:, 0]

    def _shared_noise(
        self, mb: List[BaseSample], clean: Dict[str, jnp.ndarray], epoch: int, inner: int
    ) -> Dict[str, jnp.ndarray]:
        """Per-unique-id shared (timestep-invariant) noise, per latent stream."""
        out: Dict[str, jnp.ndarray] = {}
        for li, bk in enumerate(sorted(clean)):
            shape = clean[bk].shape[1:]
            cache: Dict[str, jnp.ndarray] = {}
            rows = []
            for s in mb:
                if s.unique_id not in cache:
                    key = derive_key(
                        self.training_args.seed, epoch, inner,
                        self._uid_int(s.unique_id), _TAG_SHARED_NOISE,
                    )
                    cache[s.unique_id] = jax.random.normal(
                        jax.random.fold_in(key, li), shape, jnp.float32
                    )
                rows.append(cache[s.unique_id])
            out[bk] = jnp.stack(rows, axis=0)
        return out

    @staticmethod
    def _group_ids(mb: List[BaseSample]):
        uid_order: Dict[str, int] = {}
        ids = []
        for s in mb:
            if s.unique_id not in uid_order:
                uid_order[s.unique_id] = len(uid_order)
            ids.append(uid_order[s.unique_id])
        return np.asarray(ids, np.int32), len(uid_order)

    # ------------------------------------------------------------------
    def optimize(self, samples: List[BaseSample], epoch: int) -> Dict[str, float]:
        ta = self.training_args
        T = ta.get_num_train_timesteps(self.config)
        shard = self.adapter.shard_batch
        infos = []
        ref_trainable = self.adapter.ref_trainable()
        frozen = self.adapter.frozen_velocity_params()
        for inner in range(ta.num_inner_epochs):
            shared_t = self._shared_timesteps(epoch, inner)  # (T,)
            for bi, (mb, batch_np) in enumerate(self.iter_micro_batches(samples, epoch, inner)):
                clean = self.clean_latent_tree(batch_np)  # {latents[, audio_latents]}
                embeds = self.batch_embeds(batch_np)
                adv_raw = jnp.asarray([s.extra_kwargs["advantage"] for s in mb], jnp.float32)
                adv = jnp.clip(adv_raw, ta.adv_clip_range[0], ta.adv_clip_range[1])
                group_ids_np, num_groups = self._group_ids(mb)
                group_ids = jnp.asarray(group_ids_np)
                if ta.use_shared_noise:
                    noise = self._shared_noise(mb, clean, epoch, inner)
                else:
                    key = derive_key("dgpo_noise", ta.seed, epoch, inner, bi)
                    noise = self.tree_normal(key, clean)

                ema_ref_tr = (
                    self.adapter.get_named_parameters(self.EMA_REF)
                    if self._requires_ema_ref else None
                )
                for t_idx in range(T):
                    t = jnp.full((len(mb),), float(shared_t[t_idx]))
                    batch = dict(
                        clean=clean,
                        noise=noise,
                        timestep=t,
                        advantage=adv,
                        group_ids=group_ids,
                        guidance_scale=jnp.float32(1.0),
                        **embeds,
                    )
                    batch = shard(batch)
                    (loss, aux), grads = self._grad_fn(
                        self.adapter.trainable, frozen, batch, ref_trainable, ema_ref_tr, num_groups
                    )
                    self.accumulate_grads(grads)
                    infos.append(dict(aux))  # device scalars — fetched once at epoch end (no per-step sync)
                    if self._accum_count >= ta.gradient_accumulation_steps:
                        infos[-1]["train/grad_norm"] = self.apply_accumulated()
                        self._update_ema_ref()
        if self._accum_count > 0:
            infos[-1]["train/grad_norm"] = self.apply_accumulated()
            self._update_ema_ref()
        return self.aggregate_infos(infos)

    # ------------------------------------------------------------------
    @property
    def _grad_fn(self):
        if not hasattr(self, "_cached_grad_fn"):
            ta = self.training_args
            dpo_beta = self.dpo_beta
            K = float(ta.group_size)
            clip_lo, clip_hi = ta.clip_range
            kl_beta = float(ta.kl_beta)
            kl_cfg = float(ta.kl_cfg)
            clip_dsm, clip_kl = bool(ta.clip_dsm), bool(ta.clip_kl)
            use_ema_ref = bool(ta.use_ema_ref)
            adapter = self.adapter
            sg = jax.lax.stop_gradient

            def per_sample_mse(a, b):
                d = (a - b).reshape(a.shape[0], -1)
                return jnp.mean(d * d, axis=-1)

            from .decoupled import DecoupledTrainer as _DT

            def loss_fn(trainable, frozen, batch, ref_trainable, ema_ref_tr, num_groups):
                clean_t, noise_t, t = batch["clean"], batch["noise"], batch["timestep"]
                x_t_tree = _DT.tree_noised(clean_t, noise_t, t)
                target = _DT.tree_flat(noise_t) - _DT.tree_flat(clean_t)
                fwd = {**batch, **x_t_tree, "guidance_scale": jnp.float32(1.0)}
                # model/old forwards run WITHOUT CFG (reference guidance 1.0):
                # dropping the negative embeds makes do_cfg resolve statically.
                fwd_uncfg = {k: v for k, v in fwd.items() if not k.startswith("negative_")}

                model_v = _DT.tree_flat(
                    adapter.training_velocity_tree(trainable, fwd_uncfg, frozen=frozen)
                )
                dsm = per_sample_mse(model_v, target)

                old_v = None
                if ema_ref_tr is not None and (clip_dsm or clip_kl or use_ema_ref):
                    old_v = sg(_DT.tree_flat(
                        adapter.training_velocity_tree(ema_ref_tr, fwd_uncfg, frozen=frozen)
                    ))

                ref_v = None
                if kl_beta > 0 or not use_ema_ref:
                    if kl_cfg > 1.0 and "negative_prompt_embeds" in fwd:
                        ref_fwd = {**fwd, "guidance_scale": jnp.float32(kl_cfg)}
                    else:
                        ref_fwd = fwd_uncfg
                    ref_v = sg(_DT.tree_flat(
                        adapter.training_velocity_tree(ref_trainable, ref_fwd, frozen=frozen)
                    ))

                ref_dgpo_v = old_v if use_ema_ref else ref_v
                ref_dsm = sg(per_sample_mse(ref_dgpo_v, target))
                adv = batch["advantage"]

                # PPO-style DSM clip vs old policy (dgpo.py:642-671)
                should_clip = None
                if (clip_dsm or clip_kl) and old_v is not None:
                    old_dsm = per_sample_mse(old_v, target)
                    ratio = jnp.exp(-sg(dsm) + old_dsm)
                    should_clip = jnp.where(
                        adv > 0, ratio > 1.0 + clip_hi, ratio < 1.0 + clip_lo
                    )
                    if clip_dsm:
                        dsm = jnp.where(should_clip, sg(dsm), dsm)

                # group preference → sigmoid weights (the single group reduction)
                pref = adv * dpo_beta * (sg(dsm) - ref_dsm) / K
                group_sums = jax.ops.segment_sum(pref, batch["group_ids"], num_segments=num_groups)
                group_w = sg(jax.nn.sigmoid(group_sums))[batch["group_ids"]]
                dgpo_loss = jnp.mean(group_w * adv * dsm)

                loss = dgpo_loss
                aux = {
                    "train/loss": dgpo_loss,
                    "train/dsm_mean": jnp.mean(dsm),
                    "train/group_weight_mean": jnp.mean(group_w),
                    "train/pref_mean": jnp.mean(pref),
                }
                if should_clip is not None:
                    aux["train/clip_ratio"] = jnp.mean(should_clip.astype(jnp.float32))
                if kl_beta > 0:
                    kl = per_sample_mse(model_v, ref_v)
                    if clip_kl and should_clip is not None:
                        kl = jnp.where(should_clip, sg(kl), kl)
                    kl_loss = kl_beta * jnp.mean(kl)
                    loss = loss + kl_loss
                    aux["train/kl"] = jnp.mean(kl)
                aux["train/total_loss"] = loss
                return loss, aux

            self._cached_grad_fn = jax.jit(
                jax.value_and_grad(loss_fn, has_aux=True), static_argnums=(5,)
            )
        return self._cached_grad_fn
