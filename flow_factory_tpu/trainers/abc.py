"""BaseTrainer: sample → feedback → optimize epoch scaffolding.

TPU-native re-design of the reference trainer base
(``src/flow_factory/trainers/abc.py``). What changes:

* Optimizer is an optax chain (clip-by-global-norm → AdamW) over the
  trainable pytree; optimizer state is just another pytree (shardable with
  NamedSharding — ZeRO without a framework, SURVEY.md §2.2).
* ``accelerator.prepare``/DDP wrapping disappears: parallelism is input +
  param shardings; XLA inserts grad reductions.
* Gradient accumulation is an explicit fp32 grad-sum pytree (the reference
  relies on accelerate's accumulate() context, ``trainers/abc.py:232``).
* The async-reward race-free protocol collapses to host-side thread pools
  (samples are host numpy before ``add_samples`` — same ordering guarantee
  as the reference's D2H-then-record-event rule, ``trainers/abc.py:365-388``).
"""
from __future__ import annotations

import functools
import logging
import os
import time
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..advantage import AdvantageProcessor
from ..data import get_dataloader
from ..logger import load_logger
from ..models.abc import BaseAdapter
from ..rewards import MultiRewardLoader, RewardBuffer
from ..samples import BaseSample

logger = logging.getLogger(__name__)


def gather_eval_reward_metrics(samples: List["BaseSample"]) -> Dict[str, float]:
    """Eval reward stats gathered ACROSS processes, per reward model.

    Reference grpo.py:126-137 (``accelerator.gather`` + per-model mean/std;
    VERDICT r4 Missing #3). Collective: every process must call this with
    its local eval samples; all return identical global metrics."""
    from ..parallel.dist import get_num_processes, host_allgather_objects

    local_rows = [
        (float(s.extra_kwargs.get("reward", 0.0)),
         {k: float(v) for k, v in s.extra_kwargs.get("rewards", {}).items()})
        for s in samples
    ]
    if get_num_processes() > 1:
        rows = [r for lst in host_allgather_objects(local_rows) for r in lst]
    else:
        rows = local_rows
    rewards = np.asarray([r[0] for r in rows])
    metrics = {
        "eval/reward_mean": float(rewards.mean()) if len(rewards) else 0.0,
        "eval/reward_std": float(rewards.std()) if len(rewards) else 0.0,
        "eval/num_samples": float(len(rewards)),
    }
    names = sorted({k for _, d in rows for k in d})
    for name in names:
        vals = np.asarray([d.get(name, 0.0) for _, d in rows])
        metrics[f"eval/reward/{name}/mean"] = float(vals.mean())
        metrics[f"eval/reward/{name}/std"] = float(vals.std())
    return metrics


class PreemptionRequested(Exception):
    """Raised at a safe step boundary after a preemption signal arrived."""


class BaseTrainer(ABC):
    def __init__(self, config, adapter: BaseAdapter):
        self.config = config
        self.adapter = adapter
        self.training_args = config.training_args
        self.eval_args = config.eval_args
        self.log_args = config.log_args
        self.scheduler = adapter.scheduler
        self.epoch = 0
        self.global_step = 0

        from ..parallel.dist import get_num_processes, get_world_size

        self.local_replicas = max(1, get_world_size() // get_num_processes())
        #: per-process micro-batch = per-replica batch × local replicas
        self.micro_batch_size = self.training_args.per_device_batch_size * self.local_replicas

        self._init_dataloader()
        self._init_optimizer()
        self._init_rewards()
        self.logger_backend = load_logger(
            config.log_args, config.log_args.run_name, is_main_process=jax.process_index() == 0
        )
        self.adapter.post_init()
        self._restore_state_if_any()

        self._preempt_requested = False
        if getattr(self.log_args, "save_on_preempt", True):
            self._install_preempt_handler()

    # ------------------------------------------------------------------
    # Init stages (reference _initialization, trainers/abc.py:235-273)
    # ------------------------------------------------------------------
    def _init_dataloader(self) -> None:
        self.train_loader, self.test_loader = get_dataloader(
            self.config, self.adapter.preprocess_func
        )

    def _init_optimizer(self) -> None:
        ta = self.training_args
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(ta.max_grad_norm),
            optax.adamw(
                learning_rate=ta.learning_rate,
                b1=ta.adam_betas[0],
                b2=ta.adam_betas[1],
                eps=ta.adam_epsilon,
                weight_decay=ta.adam_weight_decay,
            ),
        )
        self.opt_state = self.optimizer.init(self.adapter.trainable)
        self._accum_grads = None
        self._accum_count = 0

    def _init_rewards(self) -> None:
        ta = self.training_args
        loader = MultiRewardLoader()
        train_models = loader.load(self.config.reward_args)
        eval_models = (
            loader.load(self.config.eval_reward_args)
            if self.config.eval_reward_args
            else train_models
        )
        distributed_groups = self.config.data_args.sampler_type == "distributed_k_repeat"
        self.reward_buffer = RewardBuffer(
            train_models,
            group_size=ta.group_size,
            distributed_groups=distributed_groups,
            reward_weights=self.config.reward_args.reward_weights if self.config.reward_args else None,
        )
        self.eval_reward_buffer = RewardBuffer(
            eval_models,
            group_size=ta.group_size,
            distributed_groups=False,
            reward_weights=(
                self.config.eval_reward_args.reward_weights
                if self.config.eval_reward_args
                else (self.config.reward_args.reward_weights if self.config.reward_args else None)
            ),
        )
        self.advantage_processor = AdvantageProcessor(
            group_size=ta.group_size,
            aggregation=getattr(ta, "advantage_aggregation", "sum"),
            std_mode="global" if getattr(ta, "global_std", True) else "per_group",
            reward_weights=self.config.reward_args.reward_weights if self.config.reward_args else None,
            distributed_groups=distributed_groups,
        )

    # ------------------------------------------------------------------
    # Optimizer mechanics
    # ------------------------------------------------------------------
    def accumulate_grads(self, grads: Any) -> None:
        # Whole-tree jitted accumulate: an eager tree.map here would dispatch
        # one op PER LEAF per grad step (hundreds of latency-bound relay round
        # trips each); the jitted versions are one call, with the previous
        # accumulator donated in place.
        if self._accum_grads is None:
            self._accum_grads = _accum_init_jit(grads)
        else:
            self._accum_grads = _accum_add_jit(self._accum_grads, grads)
        self._accum_count += 1

    def apply_accumulated(self):
        """Average accumulated grads, step the optimizer.

        Returns the grad norm as a DEVICE scalar — converting to float here
        would block the host on the optimizer step and serialize dispatch;
        trainers fetch all step metrics once per epoch in aggregate_infos.
        """
        if self._accum_grads is None or self._accum_count == 0:
            return None
        trainable, self.opt_state, gnorm = _apply_updates_jit(
            self.optimizer, self.adapter.trainable, self.opt_state,
            self._accum_grads, self._accum_count,
        )
        self.adapter.trainable = trainable
        self._accum_grads = None
        self._accum_count = 0
        self.global_step += 1
        return gnorm

    # ------------------------------------------------------------------
    # Epoch template (reference start(), grpo.py:60-91)
    # ------------------------------------------------------------------
    #: batch keys the trainers pass explicitly (everything else in the
    #: preprocessed batch — cond_latents/cond_ids, images, image_embeds,
    #: cond_tokens/cond_mask, condition_video... — forwards to inference so
    #: conditioned families actually roll out conditioned)
    _STD_BATCH_KEYS = frozenset({
        "prompt", "prompt_embeds", "pooled_prompt_embeds",
        "negative_prompt_embeds", "negative_pooled_prompt_embeds",
    })
    #: trainer-controlled inference kwargs a dataset column must not override
    _RESERVED_BATCH_KEYS = frozenset({
        "seed", "keys", "key", "trainable", "compute_log_prob",
        "trajectory_indices", "store_means", "num_inference_steps", "decode",
    })

    def condition_kwargs(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        def is_path_field(v) -> bool:
            # raw record media columns are file paths — preprocessing already
            # folded them into cond_latents/image_embeds etc., don't re-load
            if isinstance(v, str):
                return True
            if isinstance(v, (list, tuple)):
                inner = next((x for x in v if x is not None), None)
                return is_path_field(inner) if inner is not None else False
            return False

        return {
            k: v for k, v in batch.items()
            if k not in self._STD_BATCH_KEYS and k not in self._RESERVED_BATCH_KEYS
            and v is not None and not is_path_field(v)
        }

    # ------------------------------------------------------------------
    # Preemption-safe checkpointing (beyond the reference — TPU pods get
    # SIGTERM on maintenance/preemption events). The handler only sets a
    # flag; trainers poll ``check_preempt()`` at rollout-batch and
    # micro-batch boundaries so the in-flight jitted step always completes
    # and the saved state is a consistent step boundary.
    # ------------------------------------------------------------------
    def _install_preempt_handler(self) -> None:
        import signal

        def _handler(signum, frame):
            self._preempt_requested = True
            logger.warning(
                "Signal %d received — will checkpoint and exit at the next "
                "step boundary", signum)

        try:
            self._prev_sigterm = signal.signal(signal.SIGTERM, _handler)
        except ValueError:  # not the main thread (e.g. under a test runner)
            self._prev_sigterm = None

    def _uninstall_preempt_handler(self) -> None:
        import signal

        prev = getattr(self, "_prev_sigterm", None)
        if prev is not None:
            try:
                signal.signal(signal.SIGTERM, prev)
            except ValueError:
                pass
            self._prev_sigterm = None

    def request_preempt(self) -> None:
        """Programmatic equivalent of the SIGTERM handler (also useful for
        host-agent integrations that learn of preemption via other channels)."""
        self._preempt_requested = True

    def check_preempt(self) -> None:
        if self._preempt_requested:
            raise PreemptionRequested()

    def _preempt_save(self, save_dir: str) -> str:
        """Full-state save with 'redo the interrupted epoch' semantics: the
        recorded epoch is ``self.epoch - 1`` (= last COMPLETED epoch), so a
        resume re-runs the interrupted epoch from its start — valid because
        samplers/schedulers are seed-deterministic per epoch and rollout
        samples are regenerated, not replayed."""
        path = os.path.join(save_dir, "preempt")
        self.save_checkpoint(path, model_only=False, completed_epoch=self.epoch - 1)
        logger.warning("Preemption checkpoint written to %s — exiting", path)
        return path

    def start(self) -> None:
        ta = self.training_args
        max_epochs = ta.max_epochs or 1
        save_dir = os.path.join(self.log_args.save_dir, self.log_args.run_name)
        for epoch in range(self.epoch, max_epochs):
            self.epoch = epoch
            t0 = time.time()
            self.scheduler.set_seed(ta.seed + epoch)

            if self.log_args.save_freq and epoch > 0 and epoch % self.log_args.save_freq == 0:
                self.save_checkpoint(os.path.join(save_dir, f"epoch_{epoch}"))
            try:
                self.check_preempt()
                if self.eval_args.eval_freq and epoch % self.eval_args.eval_freq == 0 and self.test_loader:
                    self.evaluate(epoch)

                profile_dir = getattr(self.log_args, "profile_dir", None)
                if profile_dir and epoch == 1:
                    # profile the second epoch (first is compile-dominated)
                    from ..utils.memory_tracker import trace

                    with trace(profile_dir, annotate=f"epoch_{epoch}"):
                        samples, metrics, loss_info = self._run_epoch_phases(epoch)
                else:
                    samples, metrics, loss_info = self._run_epoch_phases(epoch)
            except PreemptionRequested:
                self._preempt_save(save_dir)
                self.cleanup()
                self._uninstall_preempt_handler()
                return
            self.adapter.ema_step(epoch)

            payload = {**metrics, **loss_info, "time/epoch_s": time.time() - t0}
            if self.logger_backend:
                self.logger_backend.log_data(payload, epoch)
                n_media = getattr(self.log_args, "log_train_samples", 0)
                if n_media:
                    from ..logger.formatting import samples_to_media_payload

                    media = samples_to_media_payload(samples, n_media)
                    if media["images"]:
                        self.logger_backend.log_images(
                            "train/samples", media["images"], media["captions"], step=epoch
                        )
                    if media["videos"]:
                        self.logger_backend.log_videos(
                            "train/samples", media["videos"], media["captions"], step=epoch
                        )
        # final save
        if self.log_args.save_freq:
            self.save_checkpoint(os.path.join(save_dir, "final"))
        if self.logger_backend:
            self.logger_backend.finish()
        self._uninstall_preempt_handler()

    def _run_epoch_phases(self, epoch: int):
        """sample → feedback → optimize, with opt-in per-stage HBM snapshots
        (env ``FFT_MEMORY_PROFILE=1``; pprof dumps via
        ``FFT_MEMORY_PROFILE_DIR`` — reference per-stage GPUMemoryTracker,
        ``utils/memory_tracker.py:27-508``)."""
        mem = None
        if os.environ.get("FFT_MEMORY_PROFILE") or getattr(
                self.log_args, "memory_profile", False):
            if not hasattr(self, "_memory_profiler"):
                from ..utils.memory_tracker import MemoryProfiler

                self._memory_profiler = MemoryProfiler()
            mem = self._memory_profiler
        if mem is None:
            samples = self.sample(epoch)
            metrics = self.prepare_feedback(samples)
            loss_info = self.optimize(samples, epoch)
            return samples, metrics, loss_info
        with mem.stage(f"epoch{epoch}/sample"):
            samples = self.sample(epoch)
        mem.tensors.track_samples(f"epoch{epoch}/samples", samples)
        with mem.stage(f"epoch{epoch}/feedback"):
            metrics = self.prepare_feedback(samples)
        with mem.stage(f"epoch{epoch}/optimize"):
            loss_info = self.optimize(samples, epoch)
        mem.log_report()
        return samples, metrics, loss_info

    @abstractmethod
    def sample(self, epoch: int) -> List[BaseSample]: ...

    def prepare_feedback(self, samples: List[BaseSample]) -> Dict[str, float]:
        self.reward_buffer.finalize()
        metrics = self.advantage_processor.compute_advantages(samples)
        return metrics

    @abstractmethod
    def optimize(self, samples: List[BaseSample], epoch: int) -> Dict[str, float]: ...

    # ------------------------------------------------------------------
    # Evaluation (reference grpo.py:94-138)
    # ------------------------------------------------------------------
    def evaluate(self, epoch: int) -> Dict[str, float]:
        if self.test_loader is None:
            return {}
        from ..models.abc import PendingRollout

        self.adapter.eval()
        ea = self.eval_args
        all_samples: List[BaseSample] = []
        pending: Optional[PendingRollout] = None
        for batch in self.test_loader:
            from ..utils.base import keys_for_prompts

            keys = keys_for_prompts(batch["prompt"], ea.seed or 0)
            out = self.adapter.inference(
                prompt=batch["prompt"],
                prompt_embeds=batch.get("prompt_embeds"),
                pooled_prompt_embeds=batch.get("pooled_prompt_embeds"),
                negative_prompt_embeds=batch.get("negative_prompt_embeds"),
                negative_pooled_prompt_embeds=batch.get("negative_pooled_prompt_embeds"),
                height=ea.height,
                width=ea.width,
                num_inference_steps=ea.num_inference_steps,
                guidance_scale=ea.guidance_scale,
                compute_log_prob=False,
                trajectory_indices=None,
                keys=keys,
                trainable=self.adapter.ema_trainable,
                defer=True,
                **{k: v for k, v in self.condition_kwargs(batch).items()
                   if k not in ("height", "width", "guidance_scale")},
            )
            # drop tail-batch padding rows (SequentialLoader pads to the
            # local-replica multiple so batch sharding divides)
            pad = int(batch.get("_num_pad") or 0)
            if pad:
                from ..models.abc import finish_rollout

                out = finish_rollout(out, lambda s, p=pad: s[: len(s) - p])
            # software-pipelined like the sample loops: materialize batch
            # b-1 while batch b's dispatched compute runs
            if isinstance(out, PendingRollout):
                if pending is not None:
                    samples = pending.materialize()
                    self.eval_reward_buffer.add_samples(samples)
                    all_samples.extend(samples)
                pending = out
            else:
                self.eval_reward_buffer.add_samples(out)
                all_samples.extend(out)
        if pending is not None:
            samples = pending.materialize()
            self.eval_reward_buffer.add_samples(samples)
            all_samples.extend(samples)
        # eval generates 1 sample/prompt — groups never complete, so score
        # pointwise models only (reference grpo.py:123 finalize split)
        self.eval_reward_buffer.finalize(split="pointwise")
        metrics = gather_eval_reward_metrics(all_samples)
        if self.logger_backend:
            self.logger_backend.log_data(metrics, epoch)
            from ..logger.formatting import samples_to_media_payload

            media = samples_to_media_payload(all_samples, 16)
            if media["images"]:
                self.logger_backend.log_images(
                    "eval/samples", media["images"], media["captions"], step=epoch
                )
            if media["videos"]:
                self.logger_backend.log_videos(
                    "eval/samples", media["videos"], media["captions"], step=epoch
                )
            # conditioned tasks (i2i/i2v): log condition media alongside results
            from ..logger.formatting import condition_result_table

            rows = condition_result_table(all_samples, 16)
            cond_imgs, cond_caps = [], []
            for r in rows:
                conds = r["conditions"]
                if conds is None:
                    continue
                for c in conds if isinstance(conds, (list, tuple)) else [conds]:
                    if isinstance(c, np.ndarray) and c.ndim == 3:
                        cond_imgs.append(c)
                        cond_caps.append(f"{r['prompt']} | r={r['reward']}")
            if cond_imgs:
                self.logger_backend.log_images(
                    "eval/conditions", cond_imgs, cond_caps, step=epoch
                )
        self.eval_reward_buffer.clear()
        self.adapter.train()
        return metrics

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------
    def save_checkpoint(
        self,
        save_dir: str,
        model_only: Optional[bool] = None,
        completed_epoch: Optional[int] = None,
    ) -> None:
        self.adapter.save_checkpoint(
            save_dir,
            model_only=self.log_args.save_model_only if model_only is None else model_only,
            extra_state={"opt_state": self.opt_state,
                         "epoch": self.epoch if completed_epoch is None else completed_epoch,
                         "global_step": self.global_step},
        )
        logger.info("Saved checkpoint to %s", save_dir)

    def _restore_state_if_any(self) -> None:
        state = getattr(self.adapter, "_restored_state", None)
        if state:
            if "opt_state" in state:
                # orbax round-trips optax's namedtuple states as generic
                # containers; restore by leaf order into the live treedef
                leaves_t, treedef = jax.tree_util.tree_flatten(self.opt_state)
                leaves_s = jax.tree_util.tree_leaves(state["opt_state"])
                if len(leaves_s) == len(leaves_t):
                    def _like(t, s):
                        if not hasattr(t, "dtype"):
                            return s
                        # detour via numpy: orbax hands back arrays committed
                        # to one device, and jnp.asarray preserves commitment
                        arr = jnp.asarray(np.asarray(s), t.dtype)
                        # mesh-placed template leaves get their sharding back;
                        # uncommitted leaves (e.g. optax's scalar counts) stay
                        # uncommitted so jit may co-locate them freely
                        if getattr(t, "committed", False):
                            arr = jax.device_put(arr, t.sharding)
                        return arr

                    self.opt_state = jax.tree_util.tree_unflatten(
                        treedef, [_like(t, s) for t, s in zip(leaves_t, leaves_s)]
                    )
                else:
                    logger.warning(
                        "Checkpoint optimizer state has %d leaves but the live "
                        "optimizer has %d — optimizer state NOT restored "
                        "(weights/epoch still are)", len(leaves_s), len(leaves_t))
            self.epoch = int(state.get("epoch", 0)) + 1
            self.global_step = int(state.get("global_step", 0))
            logger.info("Resumed at epoch %d (global step %d)", self.epoch, self.global_step)

    def cleanup(self) -> None:
        self.reward_buffer.cleanup()
        self.eval_reward_buffer.cleanup()
        if self.logger_backend:
            self.logger_backend.finish()


# ---------------------------------------------------------------------------
# Jitted optimizer step (shared by all trainers)
# ---------------------------------------------------------------------------

@jax.jit
def _accum_init_jit(grads):
    return jax.tree.map(lambda g: g.astype(jnp.float32), grads)


@functools.partial(jax.jit, donate_argnums=(0,))
def _accum_add_jit(accum, grads):
    return jax.tree.map(lambda a, g: a + g.astype(jnp.float32), accum, grads)


@functools.partial(jax.jit, static_argnums=(0,))
def _apply_updates_jit(optimizer, trainable, opt_state, accum_grads, count):
    grads = jax.tree.map(lambda g: g / count, accum_grads)
    gnorm = optax.global_norm(grads)
    updates, opt_state = optimizer.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return trainable, opt_state, gnorm
