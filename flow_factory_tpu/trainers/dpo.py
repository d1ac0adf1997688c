"""Diffusion-DPO trainer (decoupled paradigm).

Re-design of the reference DPO trainer (``src/flow_factory/trainers/dpo.py``).
Pairs are formed per prompt-group from argmax/argmin advantage
(``dpo.py:322-352``); the loss is the flow-matching DPO objective
(``dpo.py:565-610``):

    err(θ, x) = MSE(v_θ(x_t, t), ε − x0)      shared ε across chosen/rejected
    loss = −log σ( −β/2 · [(err_w(θ) − err_w(ref)) − (err_l(θ) − err_l(ref))] )

with fresh timesteps per pair batch via ``TimeSampler`` (logit-normal /
uniform, ``dpo.py:433-462``) and the reference policy = zero-LoRA (or frozen
snapshot) — no weight swapping, just a second pytree through the same pure
forward.

Distribution note (reference ``dpo.py:230-297,355-430``): with the
``group_contiguous`` sampler groups are rank-local, so pairs form locally and
only the per-process pair COUNTS are aligned (cycle-pad to the max, template
broadcast when a process has zero). With ``distributed_k_repeat`` a group's K
copies are SCATTERED across processes, so every process host-allgathers the
full sample set, forms the identical global pair list, takes its
``[rank::world]`` stride, and cycle-pads to ``ceil(n/world)`` — every process
then runs the same number of optimize steps (collective lockstep).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.dist import get_num_processes, get_rank, host_allgather_objects
from ..samples import BaseSample
from ..utils.base import derive_key, derive_seed
from .decoupled import DecoupledTrainer

logger = logging.getLogger(__name__)


class DPOTrainer(DecoupledTrainer):
    def prepare_feedback(self, samples: List[BaseSample]) -> Dict[str, float]:
        metrics = super().prepare_feedback(samples)
        return metrics

    # ------------------------------------------------------------------
    @staticmethod
    def _pairs_from_advantages(samples: List[BaseSample]):
        """Per-group (chosen, rejected) by advantage argmax/argmin.

        Deterministic in the input order, so every process running this over
        the same gathered sample list forms the identical pair list
        (reference ``_form_pairs_from_advantages``, dpo.py:322-358)."""
        groups: Dict[str, List[BaseSample]] = {}
        for s in samples:
            groups.setdefault(s.unique_id, []).append(s)
        pairs = []
        for uid, members in groups.items():
            if len(members) < 2:
                continue
            advs = np.asarray([m.extra_kwargs["advantage"] for m in members])
            if advs.max() - advs.min() < 1e-9:
                continue  # degenerate group: no preference signal
            pairs.append((members[int(advs.argmax())], members[int(advs.argmin())]))
        return pairs

    def _form_pairs(self, samples: List[BaseSample]):
        """Pair formation + cross-process lockstep alignment.

        Mirrors reference dpo.py:246-297: distributed_k_repeat ⇒ gather all
        samples, form global pairs, stride-shard + cycle-pad; otherwise form
        locally and align only the counts (dpo.py:360-429)."""
        ws = get_num_processes()
        distributed = (
            ws > 1
            and self.config.data_args.sampler_type == "distributed_k_repeat"
        )
        if not distributed:
            pairs = self._pairs_from_advantages(samples)
            stat_pairs = pairs
            if ws > 1:
                pairs = self._align_pair_counts(pairs, ws)
        else:
            gathered = host_allgather_objects(list(samples))
            global_samples = [s for rank_list in gathered for s in rank_list]
            all_pairs = self._pairs_from_advantages(global_samples)
            n = len(all_pairs)
            if n and n < ws:
                raise RuntimeError(
                    "DPO (distributed_k_repeat): need at least one pair per "
                    f"process for balanced sharding; got {n} pairs over {ws} "
                    "processes. Increase unique prompts per epoch or use "
                    "sampler_type group_contiguous."
                )
            mine = all_pairs[get_rank()::ws]
            stat_pairs = mine
            target = -(-n // ws) if n else 0
            if mine and len(mine) < target:
                logger.warning(
                    "DPO: cycled local pair shard %d -> %d for per-process "
                    "lockstep (distributed_k_repeat)", len(mine), target)
                mine = (mine * target)[:target]
            pairs = mine
        self._pair_metrics = self._pair_stats(stat_pairs, ws)
        return pairs

    @staticmethod
    def _align_pair_counts(pairs, ws: int):
        """group_contiguous multi-process: cycle-pad local pairs to the max
        count across processes; a process with ZERO pairs pads from a
        template pair fetched from the first non-empty process (reference
        ``_align_dpo_pairs_across_ranks``, dpo.py:360-429)."""
        counts = [c for lst in host_allgather_objects([len(pairs)]) for c in lst]
        max_cnt = max(counts)
        if max_cnt == 0:
            return pairs
        if min(counts) == 0:
            # some process is empty: every non-empty process contributes its
            # first pair; empty ones pick the first non-empty process's
            templates = host_allgather_objects([pairs[0]] if pairs else [])
            if not pairs:
                template = next(lst[0] for lst in templates if lst)
                logger.warning(
                    "DPO: no local pairs on this process; padding %d steps "
                    "with a broadcast template pair", max_cnt)
                return [template] * max_cnt
        if len(pairs) < max_cnt:
            logger.warning(
                "DPO: cycled local pairs %d -> %d to match the widest "
                "process", len(pairs), max_cnt)
            pairs = (pairs * max_cnt)[:max_cnt]
        return pairs

    @staticmethod
    def _pair_stats(stat_pairs, ws: int) -> Dict[str, float]:
        """Globally-reduced DPO pair statistics (reference dpo.py:298-318),
        computed over UNPADDED pairs only."""
        n = len(stat_pairs)
        ca = np.asarray([p[0].extra_kwargs["advantage"] for p in stat_pairs], np.float64)
        ra = np.asarray([p[1].extra_kwargs["advantage"] for p in stat_pairs], np.float64)
        local = np.array([float(n), ca.sum() if n else 0.0, ra.sum() if n else 0.0],
                         np.float64)
        if ws > 1:
            total = np.sum([row for lst in host_allgather_objects([local])
                            for row in lst], axis=0)
        else:
            total = local
        out = {"train/dpo_num_pairs": float(total[0])}
        if total[0] > 0:
            out["train/dpo_chosen_adv_mean"] = float(total[1] / total[0])
            out["train/dpo_rejected_adv_mean"] = float(total[2] / total[0])
            out["train/dpo_adv_margin_mean"] = float((total[1] - total[2]) / total[0])
        return out

    def optimize(self, samples: List[BaseSample], epoch: int) -> Dict[str, float]:
        ta = self.training_args
        pairs = self._form_pairs(samples)
        if not pairs:
            # lockstep-consistent: pair counts were aligned across processes,
            # so either every process has pairs or none does
            logger.warning("DPO: no usable pairs this epoch")
            return dict(getattr(self, "_pair_metrics", {}))
        ref_trainable = self.adapter.ref_trainable()
        frozen = self.adapter.frozen_velocity_params()
        T = ta.get_num_train_timesteps(self.config)
        B = max(1, min(self.micro_batch_size, len(pairs)))
        # mesh data axes require a divisible batch: ties/short groups can
        # drop pairs to a count the data axes cannot split — round the
        # micro-batch UP and cycle-pad (the reference pads/cycles the same
        # way for rank lockstep, dpo.py:355-430)
        mesh = getattr(self.adapter, "mesh", None)
        if mesh is not None:
            d = mesh.shape["replica"] * mesh.shape["fsdp"]
            B = -(-B // d) * d
        shard = self.adapter.shard_batch
        infos = []

        for inner in range(ta.num_inner_epochs):
            rng = np.random.default_rng(derive_seed("dpo_shuffle", ta.seed, epoch, inner))
            perm = rng.permutation(len(pairs))
            for start in range(0, len(pairs), B):
                chunk = [pairs[i] for i in perm[start : start + B]]
                if len(chunk) < B:  # cycle to keep shapes static (reference pads/cycles)
                    chunk = chunk + [pairs[perm[i % len(perm)]]
                                     for i in range(B - len(chunk))]
                chosen = [c for c, _ in chunk]
                rejected = [r for _, r in chunk]
                from ..samples import stack_samples

                cb, rb = stack_samples(chosen), stack_samples(rejected)
                chosen_lat = self.clean_latent_tree(cb)   # {latents[, audio_latents]}
                rejected_lat = self.clean_latent_tree(rb)
                embeds = self.batch_embeds(cb)

                t_seed = derive_seed("dpo_t", ta.seed, epoch, inner, start)
                all_t = self.sample_timesteps(len(chunk), t_seed)  # (T, B)
                for t_idx in range(T):
                    t = jnp.asarray(all_t[t_idx])
                    key = derive_key("dpo_noise", ta.seed, epoch, inner, start, t_idx)
                    noise = self.tree_normal(key, chosen_lat)  # shared ε across the pair
                    batch = dict(
                        chosen=chosen_lat,
                        rejected=rejected_lat,
                        noise=noise,
                        timestep=t,
                        guidance_scale=jnp.float32(
                            chosen[0].extra_kwargs.get("guidance_scale", ta.guidance_scale)
                        ),
                        **embeds,
                    )
                    batch = shard(batch)
                    (loss, aux), grads = self._grad_fn(
                        self.adapter.trainable, frozen, batch, ref_trainable
                    )
                    self.accumulate_grads(grads)
                    infos.append(dict(aux))  # device scalars — fetched once at epoch end (no per-step sync)
                    if self._accum_count >= ta.gradient_accumulation_steps:
                        gn = self.apply_accumulated()
                        infos[-1]["train/grad_norm"] = gn
        if self._accum_count > 0:
            infos[-1]["train/grad_norm"] = self.apply_accumulated()
        out = self.aggregate_infos(infos)
        out.update(getattr(self, "_pair_metrics", {}))
        return out

    # ------------------------------------------------------------------
    @property
    def _grad_fn(self):
        if not hasattr(self, "_cached_grad_fn"):
            ta = self.training_args
            beta = float(ta.beta)
            adapter = self.adapter

            from .decoupled import DecoupledTrainer as _DT

            def loss_fn(trainable, frozen, batch, ref_trainable):
                t, noise = batch["timestep"], batch["noise"]
                xw = _DT.tree_noised(batch["chosen"], noise, t)
                xl = _DT.tree_noised(batch["rejected"], noise, t)
                noise_f = _DT.tree_flat(noise)
                target_w = noise_f - _DT.tree_flat(batch["chosen"])
                target_l = noise_f - _DT.tree_flat(batch["rejected"])

                def err(tr, x_tree, target):
                    v = _DT.tree_flat(adapter.training_velocity_tree(
                        tr, {**batch, **x_tree}, frozen=frozen
                    ))
                    d = v - target
                    return jnp.mean(d * d, axis=-1)

                tw = err(trainable, xw, target_w)
                tl = err(trainable, xl, target_l)
                rw = jax.lax.stop_gradient(err(ref_trainable, xw, target_w))
                rl = jax.lax.stop_gradient(err(ref_trainable, xl, target_l))

                inside = -0.5 * beta * ((tw - rw) - (tl - rl))
                loss = -jnp.mean(jax.nn.log_sigmoid(inside))
                implicit_w = -0.5 * beta * (tw - rw)
                implicit_l = -0.5 * beta * (tl - rl)
                aux = {
                    "train/loss": loss,
                    "train/theta_w_err": jnp.mean(tw),
                    "train/theta_l_err": jnp.mean(tl),
                    "train/implicit_acc": jnp.mean((implicit_w > implicit_l).astype(jnp.float32)),
                    "train/implicit_margin": jnp.mean(implicit_w - implicit_l),
                }
                return loss, aux

            self._cached_grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        return self._cached_grad_fn
