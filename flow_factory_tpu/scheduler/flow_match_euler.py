"""FlowMatch-Euler SDE scheduler — pure-functional TPU implementation.

Re-derives the reference's four stochastic dynamics
(``src/flow_factory/scheduler/flow_match_euler_discrete.py:243-438``) as a
single pure function `sde_step` suitable for use inside a jitted
``lax.scan`` rollout *and* inside the per-timestep training forward, so the
train-inference consistency invariant (replayed ratio == 1) holds by
construction: both phases execute the same fp32 math and the same
storage-dtype round-trip.

Dynamics (σ = t/1000, dt = σ_next − σ < 0, v = noise_pred):

  ODE:       x' = x + v·dt                                    (deterministic)
  Flow-SDE:  σ_t = sqrt(σ/(1−σ))·η ;
             mean = x·(1 + σ_t²/(2σ)·dt) + v·(1 + σ_t²(1−σ)/(2σ))·dt ;
             x' = mean + σ_t·sqrt(−dt)·ε            (Flow-GRPO Eq. 9)
  Dance-SDE: σ_t = η (constant);
             mean = x + (v + ½η²·(x − x0(1−σ))/σ²)·dt ;  x0 = x − σv
  CPS:       σ_t = σ'·sin(η·π/2);  x0 = x − σv;  x1 = x + v(1−σ);
             mean = x0(1−σ') + x1·sqrt(σ'² − σ_t²);  x' = mean + σ_t·ε

Log-prob is the Gaussian log-density of x' under (mean, scale), mean-reduced
over non-batch dims (CPS uses the negative MSE surrogate, as in the
reference).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .abc import DynamicsType, SDEStepOutput

LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Sigma schedule construction (host-side, numpy)
# ---------------------------------------------------------------------------

def calculate_shift(
    seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Resolution-dependent mu for exponential timestep shifting.

    Mirrors reference ``flow_match_euler_discrete.py:37-47``: linear
    interpolation of the log-shift between a base and max sequence length.
    """
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return seq_len * m + b


def build_flow_match_sigmas(
    num_inference_steps: int,
    shift: float = 1.0,
    use_dynamic_shifting: bool = False,
    mu: Optional[float] = None,
    sigmas: Optional[np.ndarray] = None,
    shift_terminal: Optional[float] = None,
    num_train_timesteps: int = 1000,
) -> np.ndarray:
    """Build the (T+1,) sigma schedule incl. terminal 0.

    Matches diffusers' FlowMatchEulerDiscreteScheduler.set_timesteps
    semantics: linspace(1, 1/T) warped by either the exponential dynamic
    shift (``mu``) or the static linear shift, with optional terminal
    stretching. ``timesteps = sigmas[:-1] * num_train_timesteps``.
    """
    if sigmas is None:
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps, dtype=np.float64)
    else:
        sigmas = np.asarray(sigmas, dtype=np.float64)

    if use_dynamic_shifting:
        if mu is None:
            raise ValueError("`mu` must be provided when use_dynamic_shifting=True")
        sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)

    if shift_terminal is not None:
        # Stretch the schedule so the final sigma lands on ``shift_terminal``
        # (diffusers' stretch_shift_to_terminal semantics).
        one_minus = 1.0 - sigmas
        scale = one_minus[-1] / (1.0 - shift_terminal)
        sigmas = 1.0 - one_minus / scale

    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


# ---------------------------------------------------------------------------
# Pure step math (device-side)
# ---------------------------------------------------------------------------

def _bcast(x: Union[float, jax.Array], ref: jax.Array) -> jax.Array:
    """Broadcast a scalar or (B,)-vector to (B, 1, ..., 1) like ``ref``."""
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 0:
        return x
    return x.reshape(x.shape[0], *([1] * (ref.ndim - 1)))


def _mean_over_nonbatch(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def sde_step(
    noise_pred: jax.Array,
    latents: jax.Array,
    sigma: Union[float, jax.Array],
    sigma_next: Union[float, jax.Array],
    *,
    dynamics_type: DynamicsType = "Flow-SDE",
    noise_level: Union[float, jax.Array] = 0.0,
    key: Optional[jax.Array] = None,
    next_latents: Optional[jax.Array] = None,
    compute_log_prob: bool = True,
    storage_dtype: jnp.dtype = jnp.bfloat16,
    sigma_max: Union[float, jax.Array] = 0.999,
    token_mask: Optional[jax.Array] = None,
) -> SDEStepOutput:
    """One (possibly stochastic) Euler step of the flow ODE/SDE with log-prob.

    Pure function: sampling mode (``next_latents=None``) draws the transition
    noise from ``key`` and round-trips the result through ``storage_dtype``
    (the train-inference consistency guard — reference
    ``flow_match_euler_discrete.py:306-313,360-362``); replay mode
    (``next_latents`` given) evaluates the log-prob of the stored transition
    under the current policy. All math is fp32 regardless of input dtypes.

    ``sigma``/``sigma_next``/``noise_level`` may be python floats, scalars, or
    per-sample (B,) arrays. ``dynamics_type`` is static (trace-time branch).

    ``token_mask`` (broadcastable to ``latents``; 1.0 = generated, 0.0 =
    hard-conditioned) freezes conditioned tokens — they never step (output
    keeps the input value) and contribute nothing to the log-prob, matching
    the reference I2AV frame-slicing (``ltx2_i2av.py``: the scheduler runs
    on generated frames only and frame 0 is re-concatenated).
    """
    in_dtype = latents.dtype
    v = noise_pred.astype(jnp.float32)
    x = latents.astype(jnp.float32)
    stored = None if next_latents is None else next_latents.astype(jnp.float32)

    sigma = _bcast(sigma, x)
    sigma_next = _bcast(sigma_next, x)
    noise_level = _bcast(noise_level, x)
    dt = sigma_next - sigma  # negative

    def fresh_noise():
        if key is None:
            raise ValueError("`key` is required when sampling (next_latents=None)")
        return jax.random.normal(key, v.shape, dtype=jnp.float32)

    def _reduce_lp(lp):
        if token_mask is None:
            return _mean_over_nonbatch(lp)
        tm = jnp.broadcast_to(token_mask.astype(jnp.float32), lp.shape)
        nb = tuple(range(1, lp.ndim))
        return jnp.sum(lp * tm, axis=nb) / jnp.maximum(jnp.sum(tm, axis=nb), 1.0)

    log_prob = None

    if dynamics_type == "ODE":
        mean = x + v * dt
        std_dev_t = jnp.zeros_like(sigma)
        out = mean if stored is None else stored
        if stored is None:
            out = out.astype(storage_dtype).astype(jnp.float32)
        if compute_log_prob:
            log_prob = jnp.zeros((x.shape[0],), dtype=jnp.float32)

    elif dynamics_type == "Flow-SDE":
        sigma_max_b = _bcast(sigma_max, x)
        sigma_eff = jnp.where(sigma == 1.0, sigma_max_b, sigma)
        std_dev_t = jnp.sqrt(sigma / (1.0 - sigma_eff)) * noise_level
        mean = x * (1.0 + std_dev_t**2 / (2.0 * sigma) * dt) + v * (
            1.0 + std_dev_t**2 * (1.0 - sigma) / (2.0 * sigma)
        ) * dt
        if stored is None:
            out = mean + std_dev_t * jnp.sqrt(-dt) * fresh_noise()
            out = out.astype(storage_dtype).astype(jnp.float32)
        else:
            out = stored
        if compute_log_prob:
            # Clamp the scale so zero-noise steps give finite (meaningless but
            # harmless) values instead of NaN; they are never gated into training.
            scale = jnp.maximum(std_dev_t * jnp.sqrt(-dt), 1e-12)
            lp = (
                -((jax.lax.stop_gradient(out) - mean) ** 2) / (2.0 * scale**2)
                - jnp.log(scale)
                - LOG_SQRT_2PI
            )
            log_prob = _reduce_lp(lp)

    elif dynamics_type == "Dance-SDE":
        x0 = x - sigma * v
        std_dev_t = noise_level
        log_term = 0.5 * noise_level**2 * (x - x0 * (1.0 - sigma)) / sigma**2
        mean = x + (v + log_term) * dt
        if stored is None:
            out = mean + std_dev_t * jnp.sqrt(-dt) * fresh_noise()
            out = out.astype(storage_dtype).astype(jnp.float32)
        else:
            out = stored
        if compute_log_prob:
            # Clamp the scale so zero-noise steps give finite (meaningless but
            # harmless) values instead of NaN; they are never gated into training.
            scale = jnp.maximum(std_dev_t * jnp.sqrt(-dt), 1e-12)
            lp = (
                -((jax.lax.stop_gradient(out) - mean) ** 2) / (2.0 * scale**2)
                - jnp.log(scale)
                - LOG_SQRT_2PI
            )
            log_prob = _reduce_lp(lp)

    elif dynamics_type == "CPS":
        std_dev_t = sigma_next * jnp.sin(noise_level * jnp.pi / 2.0)
        x0 = x - sigma * v
        x1 = x + v * (1.0 - sigma)
        mean = x0 * (1.0 - sigma_next) + x1 * jnp.sqrt(sigma_next**2 - std_dev_t**2)
        if stored is None:
            out = mean + std_dev_t * fresh_noise()
            out = out.astype(storage_dtype).astype(jnp.float32)
        else:
            out = stored
        if compute_log_prob:
            log_prob = _reduce_lp(-((jax.lax.stop_gradient(out) - mean) ** 2))

    else:
        raise ValueError(f"Unknown dynamics_type: {dynamics_type!r}")

    if token_mask is not None:
        # hard-conditioned tokens never step (reference I2AV frame freezing)
        tm = token_mask.astype(jnp.float32)
        out = tm * out + (1.0 - tm) * x
        mean = tm * mean + (1.0 - tm) * x

    if not compute_log_prob:
        log_prob = None

    return SDEStepOutput(
        next_latents=out.astype(in_dtype) if in_dtype != jnp.float32 else out,
        next_latents_mean=mean,
        std_dev_t=std_dev_t,
        dt=dt,
        log_prob=log_prob,
        noise_pred=v,
    )


def convert_velocity_to_x0(v: jax.Array, latents: jax.Array, sigma) -> jax.Array:
    """x0 = x − σ·v (flow-matching data prediction; reference LTX-2 helpers
    ``ltx2_t2av.py:597-632`` use this to mix guidance terms in x0 space)."""
    sigma = _bcast(sigma, latents)
    return latents.astype(jnp.float32) - sigma * v.astype(jnp.float32)


def convert_x0_to_velocity(x0: jax.Array, latents: jax.Array, sigma) -> jax.Array:
    """v = (x − x0)/σ — inverse of :func:`convert_velocity_to_x0`."""
    sigma = jnp.maximum(_bcast(sigma, latents), 1e-6)
    return (latents.astype(jnp.float32) - x0.astype(jnp.float32)) / sigma


# ---------------------------------------------------------------------------
# Stateful host-side schedule wrapper
# ---------------------------------------------------------------------------

class FlowMatchEulerSDE:
    """Host-side schedule state + pure-math dispatch.

    Holds the sigma/timestep grid, the SDE-step subset drawn per epoch seed,
    and train/eval mode. All device math goes through :func:`sde_step`.

    Mirrors reference ``FlowMatchEulerDiscreteSDEScheduler``
    (``scheduler/flow_match_euler_discrete.py:86-241``): the stochastic
    step-subset selection (``current_sde_steps``), per-timestep noise gating,
    and the eval → ODE switch.
    """

    def __init__(
        self,
        noise_level: float = 0.7,
        sde_steps: Optional[Sequence[int]] = None,
        num_sde_steps: Optional[int] = None,
        seed: int = 42,
        dynamics_type: DynamicsType = "Flow-SDE",
        num_train_timesteps: int = 1000,
        shift: float = 1.0,
        use_dynamic_shifting: bool = False,
        base_image_seq_len: int = 256,
        max_image_seq_len: int = 4096,
        base_shift: float = 0.5,
        max_shift: float = 1.15,
        shift_terminal: Optional[float] = None,
    ):
        assert noise_level >= 0, "Noise level must be non-negative."
        self.noise_level = noise_level
        self._sde_steps = None if sde_steps is None else np.asarray(sde_steps, dtype=np.int64)
        self._num_sde_steps = num_sde_steps
        self.seed = seed
        self.dynamics_type: DynamicsType = dynamics_type
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.use_dynamic_shifting = use_dynamic_shifting
        self.base_image_seq_len = base_image_seq_len
        self.max_image_seq_len = max_image_seq_len
        self.base_shift = base_shift
        self.max_shift = max_shift
        self.shift_terminal = shift_terminal
        self._is_eval = False

        self.sigmas: Optional[np.ndarray] = None  # (T+1,) incl. terminal 0
        self.timesteps: Optional[np.ndarray] = None  # (T,) in [0, num_train_timesteps]

    # -- mode management ---------------------------------------------------
    @property
    def is_eval(self) -> bool:
        return self._is_eval

    def eval(self):
        self._is_eval = True

    def train(self, mode: bool = True):
        self._is_eval = not mode

    def rollout(self, mode: bool = True):
        self.train(mode=mode)

    def set_seed(self, seed: int):
        self.seed = seed

    # -- schedule ------------------------------------------------------------
    def set_timesteps(
        self,
        num_inference_steps: int,
        seq_len: Optional[int] = None,
        mu: Optional[float] = None,
        sigmas: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Set the sigma/timestep grid; returns timesteps (T,) float32.

        When dynamic shifting is enabled and ``mu`` is not given, it is
        computed from ``seq_len`` (resolution-aware shift — reference
        ``set_scheduler_timesteps``, ``flow_match_euler_discrete.py:49-77``).
        """
        if self.use_dynamic_shifting and mu is None:
            if seq_len is None:
                raise ValueError("`seq_len` must be provided if `mu` is not given.")
            mu = calculate_shift(
                seq_len,
                self.base_image_seq_len,
                self.max_image_seq_len,
                self.base_shift,
                self.max_shift,
            )
        self.sigmas = build_flow_match_sigmas(
            num_inference_steps,
            shift=self.shift,
            use_dynamic_shifting=self.use_dynamic_shifting,
            mu=mu,
            sigmas=sigmas,
            shift_terminal=self.shift_terminal,
            num_train_timesteps=self.num_train_timesteps,
        )
        self.timesteps = (self.sigmas[:-1] * self.num_train_timesteps).astype(np.float32)
        return self.timesteps

    @property
    def num_inference_steps(self) -> int:
        return 0 if self.timesteps is None else len(self.timesteps)

    # -- SDE step subset ------------------------------------------------------
    @property
    def sde_steps(self) -> np.ndarray:
        if self._sde_steps is not None:
            return self._sde_steps
        return np.arange(0, max(self.num_inference_steps - 1, 0), dtype=np.int64)

    @property
    def num_sde_steps(self) -> int:
        if self._num_sde_steps is not None:
            return self._num_sde_steps
        return len(self.sde_steps)

    @property
    def current_sde_steps(self) -> np.ndarray:
        """SDE step indices under the current seed (redrawn each epoch)."""
        pool = self.sde_steps
        if self.num_sde_steps >= len(pool):
            return pool
        rng = np.random.default_rng(self.seed)
        return pool[rng.permutation(len(pool))[: self.num_sde_steps]]

    @property
    def train_timesteps(self) -> np.ndarray:
        """Timestep **indices** to train on this epoch."""
        return self.current_sde_steps

    def get_train_timesteps(self) -> np.ndarray:
        return self.timesteps[self.train_timesteps]

    def get_train_sigmas(self) -> np.ndarray:
        return self.sigmas[self.train_timesteps]

    def get_noise_levels(self) -> np.ndarray:
        """(T,) noise level per step — non-zero only inside the SDE window."""
        levels = np.zeros((self.num_inference_steps,), dtype=np.float32)
        if not self._is_eval and self.dynamics_type != "ODE":
            levels[self.current_sde_steps] = self.noise_level
        return levels

    def index_for_timestep(self, t: float) -> int:
        idx = np.nonzero(np.isclose(self.timesteps, t, atol=1e-3))[0]
        if len(idx) == 0:
            raise ValueError(f"Timestep {t} not in schedule")
        return int(idx[0])

    # -- step dispatch ---------------------------------------------------------
    def step(
        self,
        noise_pred: jax.Array,
        timestep_index: int,
        latents: jax.Array,
        *,
        key: Optional[jax.Array] = None,
        next_latents: Optional[jax.Array] = None,
        noise_level: Optional[Union[float, jax.Array]] = None,
        compute_log_prob: bool = True,
        storage_dtype: jnp.dtype = jnp.bfloat16,
        dynamics_type: Optional[DynamicsType] = None,
    ) -> SDEStepOutput:
        """Eager single-step convenience wrapper (tests / non-scan callers)."""
        dynamics_type = dynamics_type or self.dynamics_type
        if self._is_eval:
            dynamics_type = "ODE"
            noise_level = 0.0
        elif noise_level is None:
            noise_level = float(self.get_noise_levels()[timestep_index])
        sigma = float(self.sigmas[timestep_index])
        sigma_next = float(self.sigmas[timestep_index + 1])
        return sde_step(
            noise_pred,
            latents,
            sigma,
            sigma_next,
            dynamics_type=dynamics_type,
            noise_level=noise_level,
            key=key,
            next_latents=next_latents,
            compute_log_prob=compute_log_prob,
            storage_dtype=storage_dtype,
            sigma_max=float(self.sigmas[1]) if len(self.sigmas) > 1 else 0.999,
        )
