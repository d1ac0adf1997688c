"""UniPC multistep scheduler with SDE support (Wan family).

Re-design of the reference ``UniPCMultistepSDEScheduler``
(``src/flow_factory/scheduler/unipc_multistep.py``). Key observation carried
over from the reference: during RL ROLLOUT/TRAINING the SDE step math is
IDENTICAL to the FlowMatch-Euler SDE branches (``unipc_multistep.py:322-418``
mirrors ``flow_match_euler_discrete.py:329-420``) — the UniPC
predictor-corrector update is used only in EVAL mode
(``unipc_multistep.py:287-289`` → ``super().step()``). So:

* train/rollout: inherit every FlowMatch-Euler SDE path (log-prob replay
  exactness carries over verbatim);
* eval: a pure order-2 UniPC (bh2) predictor-corrector implemented as a
  scan-compatible function with EXPLICIT state (previous x0-prediction,
  previous lambda, previous sample) instead of mutable scheduler attributes
  — the reference's step_index/order buffers cannot live inside ``lax.scan``.

Flow-matching parameterization: x0 = x − σ·v, α_t = 1−σ_t,
λ_t = log(α_t/σ_t).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flow_match_euler import FlowMatchEulerSDE


class UniPCCarry(NamedTuple):
    """Explicit multistep state carried through the eval scan."""

    x: jax.Array  # current sample
    m_prev: jax.Array  # x0-prediction at the previous step
    lambda_prev: jax.Array  # λ at the previous step (scalar)
    x_prev: jax.Array  # previous (uncorrected) sample
    have_prev: jax.Array  # bool scalar: buffers valid


def _lam(sigma):
    sigma = jnp.clip(sigma, 1e-6, 1.0 - 1e-6)
    return jnp.log((1.0 - sigma) / sigma)


def unipc_eval_step(
    carry: UniPCCarry,
    v: jax.Array,  # velocity prediction at carry.x, time σ
    sigma: jax.Array,
    sigma_next: jax.Array,
) -> Tuple[UniPCCarry, jax.Array]:
    """One UniPC(bh2, order≤2) predictor-corrector step (deterministic).

    Returns (new carry, next sample). First step falls back to order-1
    (DPM-Solver / exact-Euler-in-λ), matching diffusers' lower-order warmup.
    """
    x = carry.x.astype(jnp.float32)
    v = v.astype(jnp.float32)
    m0 = x - sigma * v  # x0 prediction at current point

    lam_s0 = _lam(sigma)
    lam_t = _lam(sigma_next)
    alpha_t = 1.0 - sigma_next
    sigma_t = jnp.maximum(sigma_next, 1e-6)
    sigma_s0 = jnp.maximum(sigma, 1e-6)

    # ---- corrector (UniC) on the CURRENT sample using the fresh m0 ------
    def correct(x):
        h_c = lam_s0 - carry.lambda_prev
        hh = -h_c
        h_phi_1 = jnp.expm1(hh)
        B_h = h_phi_1  # bh2
        rk = jnp.float32(1.0)  # single-history corrector: r = 1
        D1 = m0 - carry.m_prev
        rhos_c = jnp.float32(0.5)
        alpha_s0 = 1.0 - sigma
        sig_prev = jnp.exp(-carry.lambda_prev) / (1.0 + jnp.exp(-carry.lambda_prev))
        x_corr = (sigma_s0 / jnp.maximum(sig_prev, 1e-6)) * carry.x_prev - alpha_s0 * h_phi_1 * carry.m_prev
        x_corr = x_corr - alpha_s0 * B_h * rhos_c * D1
        return x_corr

    x_used = jax.lax.cond(carry.have_prev, correct, lambda x_: x_, x)
    m0_used = x_used - sigma * v  # re-derive x0 pred from the corrected sample

    # ---- predictor (UniP) ------------------------------------------------
    h = lam_t - lam_s0
    hh = -h
    h_phi_1 = jnp.expm1(hh)
    B_h = h_phi_1  # bh2

    def order2(_):
        r0 = (carry.lambda_prev - lam_s0) / h
        r0 = jnp.where(jnp.abs(r0) < 1e-8, jnp.float32(1.0), r0)
        D1_0 = (carry.m_prev - m0_used) / r0
        h_phi_k = h_phi_1 / hh - 1.0
        rhos_p = h_phi_k / B_h  # order-2: R=[1], b=[h_phi_k]·1/B_h
        x_t = (sigma_t / sigma_s0) * x_used - alpha_t * h_phi_1 * m0_used
        return x_t - alpha_t * B_h * rhos_p * D1_0

    def order1(_):
        return (sigma_t / sigma_s0) * x_used - alpha_t * h_phi_1 * m0_used

    # lower_order_final: the σ→0 endpoint has λ→∞; the 1/r0 amplification of
    # the multistep difference diverges there (diffusers drops to order 1 on
    # the final steps for the same reason).
    use_order2 = jnp.logical_and(carry.have_prev, sigma_next > 1e-3)
    x_next = jax.lax.cond(use_order2, order2, order1, None)

    new_carry = UniPCCarry(
        x=x_next,
        m_prev=m0_used,
        lambda_prev=lam_s0,
        x_prev=x_used,
        have_prev=jnp.bool_(True),
    )
    return new_carry, x_next


def init_unipc_carry(x0: jax.Array) -> UniPCCarry:
    return UniPCCarry(
        x=x0.astype(jnp.float32),
        m_prev=jnp.zeros_like(x0, jnp.float32),
        lambda_prev=jnp.float32(0.0),
        x_prev=jnp.zeros_like(x0, jnp.float32),
        have_prev=jnp.bool_(False),
    )


class UniPCSDEScheduler(FlowMatchEulerSDE):
    """UniPC schedule + SDE rollout.

    Training/rollout steps (log-probs, the 4 dynamics) are inherited
    unchanged — they are mathematically identical in the reference. Eval
    rollouts use the order-2 predictor-corrector via
    :func:`unipc_eval_step` (adapters thread :class:`UniPCCarry` through
    their eval scan when ``scheduler.use_unipc_eval`` is set).
    """

    use_unipc_eval = True

    def set_timesteps(self, num_inference_steps, seq_len=None, mu=None, sigmas=None):
        # Wan uses the flow sigma schedule with a static shift (no dynamic mu)
        return super().set_timesteps(num_inference_steps, seq_len=seq_len, mu=mu, sigmas=sigmas)
