"""L1-L4 numerical parity harness.

Implements the reference's 4-layer parity methodology
(``/root/reference/.agents/knowledge/topics/parity_testing.md`` — config
diff, per-component forwards, seed-matched single step, full-loop
generation) as a runnable, family-agnostic harness over the public adapter
API:

* **L1 config** — dump every component config (dataclass fields) and diff.
* **L2 components** — deterministic seeded probes through each component:
  text encoders (``encode_prompt``), VAE decode (``decode_latents``), VAE
  encode (``encode_video`` / image helpers where present), scheduler
  (sigma grid + one pure ``sde_step``), transformer
  (``training_velocity``/``training_velocity_tree`` at fixed latents/t).
* **L3 single step** — seed-matched ``training_forward`` on a stored
  rollout transition: log-prob, next-latents statistics.
* **L4 full loop** — a tiny seeded ``inference()``: final latents and
  decoded output statistics.

Two workflows:

1. **Golden regression** (runs in CI now): ``record`` against a
   deterministic adapter (seeded random init or a synthesized checkpoint)
   writes an ``.npz`` golden; ``check`` re-runs the probes and compares.
   Any graph/key-map/scheduler regression shows up as a max-abs-diff.
2. **Upstream parity** (when real weights are available): build the
   adapter from a diffusers checkpoint directory, ``record`` probe
   outputs, and compare against activations dumped from the upstream
   torch pipeline with ``scripts/dump_reference_activations.py`` run on
   the SAME probe inputs (the probe-input convention below is the
   contract). L2 components are expected to match fp32 within 1e-4;
   L3/L4 within sampler tolerance.

Probe-input convention (shared with the torch dump script):
  * prompt:      ``PROBE_PROMPTS``
  * latents/t:   ``np.random.default_rng(PROBE_SEED)`` draws in the order
                 produced by :meth:`ParityHarness.record` (documented per
                 probe in the code below).
  * condition media (conditioned families only — Kontext, Edit-Plus,
    Wan-I2V, Wan-V2V, LTX-2 I2AV): ``np.random.default_rng(PROBE_COND_SEED)``
    uniform [0,1) draws — one ``(3, res, res)`` image per prompt when the
    adapter's ``inference`` takes ``images``, one ``(num_frames, 3, res,
    res)`` clip per prompt when it takes ``condition_video``. Drawn in
    prompt order, image before video if an adapter ever takes both.
"""
from __future__ import annotations

import dataclasses
import inspect
import json
import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

PROBE_SEED = 20260817
PROBE_COND_SEED = PROBE_SEED + 1
PROBE_PROMPTS = ["a red cube on a blue table"]

#: default per-level absolute tolerances (fp32). Golden-regression runs use
#: the same backend, so these mostly absorb XLA scheduling nondeterminism;
#: upstream-parity runs inherit them unless overridden on the CLI.
DEFAULT_TOLERANCES = {"L1": 0.0, "L2": 1e-4, "L3": 1e-3, "L4": 1e-3}


@dataclasses.dataclass
class ParityReport:
    passed: bool
    failures: List[str]
    max_diffs: Dict[str, float]
    missing: List[str]
    extra: List[str]

    def summary(self) -> str:
        lines = [f"parity: {'PASS' if self.passed else 'FAIL'}"]
        for k in sorted(self.max_diffs):
            lines.append(f"  {k}: max|Δ|={self.max_diffs[k]:.3e}")
        for f in self.failures:
            lines.append(f"  FAIL {f}")
        for m in self.missing:
            lines.append(f"  MISSING {m}")
        for e in self.extra:
            lines.append(f"  EXTRA {e}")
        return "\n".join(lines)


def _stats(name: str, arr: np.ndarray, record: Dict[str, np.ndarray],
           full: bool = False) -> None:
    """Store either the full tensor (small) or summary stats + a stride
    sample (large) under ``name``."""
    arr = np.asarray(arr, np.float32)
    if full or arr.size <= 4096:
        record[name] = arr
    else:
        record[f"{name}.shape"] = np.asarray(arr.shape, np.int64)
        record[f"{name}.mean"] = np.float32(arr.mean())
        record[f"{name}.std"] = np.float32(arr.std())
        flat = arr.reshape(-1)
        record[f"{name}.sample"] = flat[:: max(1, flat.size // 1024)][:1024]


class ParityHarness:
    """Runs the L1-L4 probes over one adapter instance."""

    def __init__(self, adapter, levels: Tuple[int, ...] = (1, 2, 3, 4)):
        self.adapter = adapter
        self.levels = set(levels)

    # ------------------------------------------------------------------
    # L1: config dump
    # ------------------------------------------------------------------
    def config_dump(self) -> Dict[str, Any]:
        out = {}
        for comp, cfg in getattr(self.adapter, "component_configs", {}).items():
            if dataclasses.is_dataclass(cfg):
                d = dataclasses.asdict(cfg)
            elif hasattr(cfg, "__dict__"):
                d = dict(cfg.__dict__)
            else:
                d = {"repr": repr(cfg)}
            out[comp] = {k: v for k, v in sorted(d.items())
                         if isinstance(v, (int, float, str, bool, tuple, list, type(None)))}
        return out

    # ------------------------------------------------------------------
    # Probe condition media (conditioned families)
    # ------------------------------------------------------------------
    def probe_condition_kwargs(self) -> Dict[str, Any]:
        """Deterministic condition media for families whose ``inference``
        REQUIRES it, keyed off the explicit signature (``images`` /
        ``condition_video``). Base T2I/T2V families take neither and get
        an unconditioned probe. See the probe-input convention above."""
        ta = self.adapter.training_args
        try:
            params = inspect.signature(self.adapter.inference).parameters
        except (TypeError, ValueError):  # pragma: no cover - builtins only
            return {}
        rng = np.random.default_rng(PROBE_COND_SEED)
        h, w = int(ta.height), int(ta.width)
        kwargs: Dict[str, Any] = {}
        if "images" in params:
            kwargs["images"] = [rng.random((3, h, w)).astype(np.float32)
                                for _ in PROBE_PROMPTS]
        if "condition_video" in params:
            frames = int(getattr(ta, "num_frames", None) or 5)
            kwargs["condition_video"] = [
                rng.random((frames, 3, h, w)).astype(np.float32)
                for _ in PROBE_PROMPTS]
        return kwargs

    # ------------------------------------------------------------------
    # Probe runner
    # ------------------------------------------------------------------
    def record(self) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
        """Run all selected probes; returns (tensor record, json manifest)."""
        import jax
        import jax.numpy as jnp

        adapter = self.adapter
        ta = adapter.training_args
        rec: Dict[str, np.ndarray] = {}
        manifest: Dict[str, Any] = {
            "model_type": getattr(adapter.model_args, "model_type", "?"),
            "probe_seed": PROBE_SEED,
            "prompts": PROBE_PROMPTS,
            "levels": sorted(self.levels),
        }

        if 1 in self.levels:
            manifest["config"] = self.config_dump()

        rng = np.random.default_rng(PROBE_SEED)

        # ---- L4 first: the tiny generation also supplies realistically-
        # shaped latents for the L2 transformer / L3 replay probes ---------
        samples = None
        if self.levels & {2, 3, 4}:
            adapter.rollout()
            cond_kwargs = self.probe_condition_kwargs()
            manifest["condition_probes"] = sorted(cond_kwargs)
            samples = adapter.inference(
                prompt=list(PROBE_PROMPTS),
                compute_log_prob=True,
                trajectory_indices="all",
                seed=PROBE_SEED,
                **cond_kwargs,
            )
            adapter.train()
        if 4 in self.levels and samples is not None:
            s = samples[0]
            _stats("L4/final_latents", s.all_latents[-1], rec, full=True)
            media = getattr(s, "image", None)
            if media is None:
                media = getattr(s, "video", None)
            if media is not None:
                _stats("L4/decoded", np.asarray(media, np.float32), rec)
            if getattr(s, "audio", None) is not None:
                _stats("L4/audio", np.asarray(s.audio, np.float32), rec)
            if s.log_probs is not None:
                _stats("L4/log_probs", np.asarray(s.log_probs, np.float32), rec, full=True)

        # ---- L2: per-component forwards ----------------------------------
        if 2 in self.levels:
            # (a) text encoders
            embeds = adapter.encode_prompt(list(PROBE_PROMPTS))
            for k, v in sorted(embeds.items()):
                if v is not None:
                    _stats(f"L2/encode_prompt/{k}", np.asarray(v, np.float32), rec)

            # (b) scheduler: sigma grid + one pure SDE step on fixed vectors
            sched = adapter.scheduler
            sched.set_timesteps(ta.num_inference_steps, seq_len=256)
            rec["L2/scheduler/sigmas"] = np.asarray(sched.sigmas, np.float32)
            rec["L2/scheduler/timesteps"] = np.asarray(sched.timesteps, np.float32)
            from ..scheduler.flow_match_euler import sde_step

            lat = rng.standard_normal((1, 16), dtype=np.float32)
            vel = rng.standard_normal((1, 16), dtype=np.float32)
            out = sde_step(
                jnp.asarray(vel), jnp.asarray(lat),
                jnp.float32(sched.sigmas[1]), jnp.float32(sched.sigmas[2]),
                dynamics_type=sched.dynamics_type, noise_level=sched.noise_level,
                key=jax.random.key(PROBE_SEED), compute_log_prob=True,
                sigma_max=jnp.float32(sched.sigmas[1]),
            )
            rec["L2/scheduler/sde_next_latents"] = np.asarray(out.next_latents, np.float32)
            rec["L2/scheduler/sde_log_prob"] = np.asarray(out.log_prob, np.float32)

            # (c) transformer: velocity at the rollout's first stored latents.
            # Batch assembly mirrors the trainers' replay path exactly
            # (stack_samples → embed_keys / trajectory_batch_keys), so
            # conditioned families (cond_latents/cond_mask/...) batch
            # correctly too.
            if samples is not None:
                from ..samples import stack_samples as _stack

                s = samples[0]
                sb = _stack([s])
                lat0 = jnp.asarray(s.all_latents[:1], jnp.float32)  # first slot as batch of 1
                batch = {"timestep": jnp.asarray([float(sched.timesteps[0])]),
                         "guidance_scale": jnp.float32(1.0)}
                for ek in adapter.embed_keys:
                    v = sb.get(ek)
                    if v is None:
                        v = embeds.get(ek)
                    if v is not None:
                        batch[ek] = jnp.asarray(v)
                lat_tree = {"latents": lat0}
                for bk, sk in adapter.trajectory_batch_keys.items():
                    extra = s.extra_kwargs.get(sk)
                    if extra is not None:
                        lat_tree[bk] = jnp.asarray(extra[:1], jnp.float32)
                vel_tree = adapter.training_velocity_tree(
                    adapter.trainable, {**batch, **lat_tree}
                )
                for k in sorted(vel_tree):
                    _stats(f"L2/transformer/velocity_{k}",
                           np.asarray(vel_tree[k], np.float32), rec)

            # (d) VAE decode: decode the L4 final latent deterministically
            if samples is not None and hasattr(adapter, "decode_latents"):
                try:
                    fin = jnp.asarray(samples[0].all_latents[-1:], jnp.float32)
                    dec = adapter.decode_latents(fin)
                    _stats("L2/vae/decode", np.asarray(dec, np.float32), rec)
                except Exception as e:  # geometry-specific decoders may need kwargs
                    manifest.setdefault("skipped", []).append(f"L2/vae/decode: {e}")

            # (e) VAE encode where the adapter exposes one
            if hasattr(adapter, "encode_video"):
                try:
                    vid = rng.random((1, 5, 3, ta.resolution, ta.resolution)).astype(np.float32)
                    z = adapter.encode_video(vid)
                    if z is not None:
                        _stats("L2/vae/encode_video", np.asarray(z, np.float32), rec)
                except Exception as e:
                    manifest.setdefault("skipped", []).append(f"L2/vae/encode_video: {e}")

        # ---- L3: seed-matched single training step -----------------------
        if 3 in self.levels and samples is not None:
            s = samples[0]
            from ..samples import stack_samples
            from ..utils.trajectory import compute_trajectory_indices

            sched = adapter.scheduler
            b = stack_samples([s])
            li_map, lp_map = s.latent_index_map, s.log_prob_index_map
            t_idx = int(np.asarray(sched.train_timesteps)[0])
            li, lni, lpi = int(li_map[t_idx]), int(li_map[t_idx + 1]), int(lp_map[t_idx])
            batch = {
                "latents": jnp.asarray(b["all_latents"][:, li], jnp.float32),
                "next_latents": jnp.asarray(b["all_latents"][:, lni], jnp.float32),
                "timestep": jnp.asarray([float(np.asarray(sched.timesteps)[t_idx])]),
                "sigma": jnp.asarray([float(np.asarray(sched.sigmas)[t_idx])]),
                "sigma_next": jnp.asarray([float(np.asarray(sched.sigmas)[t_idx + 1])]),
                "noise_level": jnp.asarray(
                    [float(np.asarray(sched.get_noise_levels())[t_idx])]),
                "guidance_scale": jnp.float32(1.0),
                "sigma_max": jnp.float32(np.asarray(sched.sigmas)[1]),
            }
            for ek in adapter.embed_keys:
                if ek in b and b[ek] is not None:
                    batch[ek] = jnp.asarray(b[ek], jnp.float32)
            for bk, sk in adapter.trajectory_batch_keys.items():
                if sk in b and b[sk] is not None:
                    batch[bk] = jnp.asarray(b[sk], jnp.float32)[:, li]
            out = adapter.training_forward(adapter.trainable, batch, compute_log_prob=True)
            rec["L3/log_prob"] = np.asarray(out.log_prob, np.float32)
            _stats("L3/next_latents_mean", np.asarray(out.next_latents_mean, np.float32), rec)
            if lpi >= 0 and s.log_probs is not None:
                # replay invariance: training log-prob == rollout log-prob
                rec["L3/rollout_log_prob"] = np.asarray(
                    s.log_probs[lpi : lpi + 1], np.float32)

        return rec, manifest

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        rec, manifest = self.record()
        np.savez_compressed(path, **rec)
        with open(str(path) + ".json", "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        logger.info("Recorded %d parity tensors to %s", len(rec), path)

    def check(self, golden_path: str,
              tolerances: Optional[Dict[str, float]] = None) -> ParityReport:
        rec, manifest = self.record()
        golden = dict(np.load(golden_path, allow_pickle=False))
        tol = dict(DEFAULT_TOLERANCES)
        tol.update(tolerances or {})
        report = compare_records(golden, rec, tol)
        # L1: config diff vs recorded manifest
        if 1 in self.levels:
            try:
                with open(str(golden_path) + ".json") as f:
                    gm = json.load(f)
                diffs = _diff_config(gm.get("config", {}), manifest.get("config", {}))
                if diffs:
                    report.failures.extend(f"L1 config: {d}" for d in diffs)
                    report.passed = False
            except FileNotFoundError:
                report.missing.append("golden manifest (.json)")
        return report


def _diff_config(a: Dict[str, Any], b: Dict[str, Any]) -> List[str]:
    diffs = []
    for comp in sorted(set(a) | set(b)):
        ca, cb = a.get(comp), b.get(comp)
        if ca is None or cb is None:
            diffs.append(f"{comp}: present only in {'golden' if cb is None else 'current'}")
            continue
        for k in sorted(set(ca) | set(cb)):
            if k not in ca:
                # config field added AFTER the golden was recorded: schema
                # growth, not drift — the tensor levels prove whether the
                # new knob's default preserved behavior
                continue
            va, vb = ca.get(k), cb.get(k)
            # json round-trips tuples to lists
            norm = lambda v: list(v) if isinstance(v, (tuple, list)) else v
            if norm(va) != norm(vb):
                diffs.append(f"{comp}.{k}: {va!r} != {vb!r}")
    return diffs


def compare_records(golden: Dict[str, np.ndarray], current: Dict[str, np.ndarray],
                    tolerances: Dict[str, float]) -> ParityReport:
    failures, max_diffs = [], {}
    missing = sorted(set(golden) - set(current))
    extra = sorted(set(current) - set(golden))
    for k in sorted(set(golden) & set(current)):
        g, c = np.asarray(golden[k]), np.asarray(current[k])
        level = k.split("/", 1)[0]
        t = tolerances.get(level, 1e-4)
        if g.shape != c.shape:
            failures.append(f"{k}: shape {g.shape} != {c.shape}")
            continue
        d = float(np.max(np.abs(g.astype(np.float64) - c.astype(np.float64)))) if g.size else 0.0
        max_diffs[k] = d
        if d > t:
            failures.append(f"{k}: max|Δ|={d:.3e} > tol {t:.1e}")
    passed = not failures and not missing
    return ParityReport(passed=passed, failures=failures, max_diffs=max_diffs,
                        missing=missing, extra=extra)
