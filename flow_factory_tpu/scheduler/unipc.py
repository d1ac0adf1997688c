"""UniPC multistep scheduler with SDE support (Wan family).

Re-design of the reference ``UniPCMultistepSDEScheduler``
(``src/flow_factory/scheduler/unipc_multistep.py``). Key observation carried
over from the reference: during RL ROLLOUT/TRAINING the SDE step math is
IDENTICAL to the FlowMatch-Euler SDE branches (``unipc_multistep.py:322-418``
mirrors ``flow_match_euler_discrete.py:329-420``) — the UniPC
predictor-corrector update is used only in EVAL mode
(``unipc_multistep.py:287-289`` → diffusers ``UniPCMultistepScheduler.step``).
So:

* train/rollout: inherit every FlowMatch-Euler SDE path (log-prob replay
  exactness carries over verbatim);
* eval: UniPC(bh2) predictor-corrector with configurable ``solver_order``
  (1–3) and diffusers' ``lower_order_final`` order schedule, implemented as
  a scan-compatible function with EXPLICIT state (a 3-deep x0-prediction
  history + λ history) instead of mutable scheduler attributes — the
  reference's step_index/order buffers cannot live inside ``lax.scan``.
  The per-step predictor/corrector orders depend only on (step index,
  total steps, solver_order) and are precomputed host-side by
  :func:`compute_unipc_orders`; ``lax.switch`` selects the order branch.

Flow-matching parameterization (``predict_x0=True``): x0 = x − σ·v,
α_t = 1−σ_t, λ_t = log(α_t/σ_t); ``bh2`` ⇒ B_h = expm1(−h).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flow_match_euler import FlowMatchEulerSDE


class UniPCCarry(NamedTuple):
    """Explicit multistep state carried through the eval scan.

    History is most-recent-first: ``ms[0]``/``lams[0]`` belong to the step
    just taken. Validity is guaranteed by the host-computed order schedule
    (order k is only requested once k history entries exist).
    """

    x: jax.Array           # current sample
    last_sample: jax.Array  # corrected sample at the previous point (uni_c input)
    ms: jax.Array          # (3, *x.shape) x0-prediction history
    lams: jax.Array        # (3,) λ history


def _lam(sigma):
    sigma = jnp.clip(sigma, 1e-6, 1.0 - 1e-6)
    return jnp.log((1.0 - sigma) / sigma)


def compute_unipc_orders(
    num_steps: int, solver_order: int = 2, lower_order_final: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-step (predictor_orders, corrector_orders) — diffusers' schedule.

    ``this_order_i = min(solver_order, i+1[, N−i])`` (warm-up ramp; the
    ``lower_order_final`` taper keeps the σ→0 endpoint stable). The
    corrector at step i reuses the order the predictor used at step i−1
    (diffusers ``step()`` runs uni_c with ``self.this_order`` before
    recomputing it); 0 disables the corrector (step 0).
    """
    pred = []
    for i in range(num_steps):
        o = min(solver_order, i + 1)
        if lower_order_final:
            o = min(o, num_steps - i)
        pred.append(max(1, o))
    corr = [0] + pred[:-1]
    return np.asarray(pred, np.int32), np.asarray(corr, np.int32)


def _bh2_coeffs(h):
    """(h_phi_1, B_h, b1, b2, b3) for bh2 / predict_x0 (hh = −h)."""
    hh = -h
    h_phi_1 = jnp.expm1(hh)
    B_h = h_phi_1  # bh2
    # b_i = h_phi_k(i) · i! / B_h with the diffusers recurrence
    h_phi_k1 = h_phi_1 / hh - 1.0
    b1 = h_phi_k1 * 1.0 / B_h
    h_phi_k2 = h_phi_k1 / hh - 1.0 / 2.0
    b2 = h_phi_k2 * 2.0 / B_h
    h_phi_k3 = h_phi_k2 / hh - 1.0 / 6.0
    b3 = h_phi_k3 * 6.0 / B_h
    return h_phi_1, B_h, b1, b2, b3


def _solve2(a11, a12, a21, a22, y1, y2):
    det = a11 * a22 - a12 * a21
    det = jnp.where(jnp.abs(det) < 1e-12, jnp.float32(1e-12), det)
    return (y1 * a22 - y2 * a12) / det, (a11 * y2 - a21 * y1) / det


def unipc_eval_step(
    carry: UniPCCarry,
    v: jax.Array,       # velocity prediction at carry.x, time σ
    sigma: jax.Array,
    sigma_next: jax.Array,
    pred_order: Optional[jax.Array] = None,  # int32 ∈ {1,2,3}
    corr_order: Optional[jax.Array] = None,  # int32 ∈ {0,1,2,3}; 0 = skip
) -> Tuple[UniPCCarry, jax.Array]:
    """One UniPC(bh2) predictor-corrector step (deterministic, fp32).

    Mirrors diffusers ``UniPCMultistepScheduler.step`` for flow matching:
    the corrector (uni_c) first refines the CURRENT sample using the fresh
    x0 prediction, then the history is updated and the predictor (uni_p)
    produces the next sample at ``sigma_next``. Defaults (orders omitted)
    reproduce the order-2 warm-up/taper of a 2-step schedule.
    """
    if pred_order is None:
        pred_order = jnp.int32(1)
    if corr_order is None:
        corr_order = jnp.int32(0)
    x = carry.x.astype(jnp.float32)
    v = v.astype(jnp.float32)
    sigma = jnp.float32(sigma)
    sigma_next = jnp.float32(sigma_next)
    m_t = x - sigma * v  # x0 prediction at the current (uncorrected) point

    lam_cur = _lam(sigma)
    m1, m2, m3 = carry.ms[0], carry.ms[1], carry.ms[2]
    lam1, lam2, lam3 = carry.lams[0], carry.lams[1], carry.lams[2]

    # ---- corrector (uni_c): s0 = previous point, t = current point --------
    def uni_c(order_idx):
        """order_idx ∈ {0,1,2} → corrector order 1/2/3."""
        h = lam_cur - lam1
        h_phi_1, B_h, b1, b2, b3 = _bh2_coeffs(h)
        sig_prev = jnp.exp(-lam1) / (1.0 + jnp.exp(-lam1))  # σ from λ
        alpha_cur = 1.0 - sigma
        x_t_ = (sigma / jnp.maximum(sig_prev, 1e-6)) * carry.last_sample \
            - alpha_cur * h_phi_1 * m1
        D1_t = m_t - m1

        def c1(_):
            return x_t_ - alpha_cur * B_h * (0.5 * D1_t)

        def c2(_):
            r1 = (lam2 - lam1) / h
            r1 = jnp.where(jnp.abs(r1) < 1e-8, jnp.float32(1.0), r1)
            D1_1 = (m2 - m1) / r1
            # R = [[1, 1], [r1, 1]], b = [b1, b2]
            rho1, rho2 = _solve2(1.0, 1.0, r1, 1.0, b1, b2)
            return x_t_ - alpha_cur * B_h * (rho1 * D1_1 + rho2 * D1_t)

        def c3(_):
            r1 = (lam2 - lam1) / h
            r2 = (lam3 - lam1) / h
            r1 = jnp.where(jnp.abs(r1) < 1e-8, jnp.float32(1.0), r1)
            r2 = jnp.where(jnp.abs(r2) < 1e-8, jnp.float32(1.0), r2)
            D1_1 = (m2 - m1) / r1
            D1_2 = (m3 - m1) / r2
            R = jnp.stack([
                jnp.stack([jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0)]),
                jnp.stack([r1, r2, jnp.float32(1.0)]),
                jnp.stack([r1 * r1, r2 * r2, jnp.float32(1.0)]),
            ])
            rhos = jnp.linalg.solve(R, jnp.stack([b1, b2, b3]))
            return x_t_ - alpha_cur * B_h * (
                rhos[0] * D1_1 + rhos[1] * D1_2 + rhos[2] * D1_t
            )

        return jax.lax.switch(order_idx, [c1, c2, c3], None)

    x_used = jax.lax.cond(
        corr_order > 0,
        lambda _: uni_c(jnp.clip(corr_order - 1, 0, 2)),
        lambda _: x,
        None,
    )

    # ---- history update: append the (uncorrected-sample) x0 prediction ----
    ms = jnp.concatenate([m_t[None], carry.ms[:-1]], axis=0)
    lams = jnp.concatenate([lam_cur[None], carry.lams[:-1]], axis=0)

    # ---- predictor (uni_p): s0 = current point, t = next ------------------
    lam_t = _lam(sigma_next)
    h = lam_t - lam_cur
    h_phi_1, B_h, b1, b2, b3 = _bh2_coeffs(h)
    alpha_t = 1.0 - sigma_next
    sigma_t = jnp.maximum(sigma_next, 1e-6)
    sigma_s0 = jnp.maximum(sigma, 1e-6)
    x_t_ = (sigma_t / sigma_s0) * x_used - alpha_t * h_phi_1 * m_t

    def p1(_):
        return x_t_

    def p2(_):
        r1 = (lams[1] - lam_cur) / h
        r1 = jnp.where(jnp.abs(r1) < 1e-8, jnp.float32(1.0), r1)
        D1_1 = (ms[1] - m_t) / r1
        return x_t_ - alpha_t * B_h * (0.5 * D1_1)  # diffusers' simplified order-2

    def p3(_):
        r1 = (lams[1] - lam_cur) / h
        r2 = (lams[2] - lam_cur) / h
        r1 = jnp.where(jnp.abs(r1) < 1e-8, jnp.float32(1.0), r1)
        r2 = jnp.where(jnp.abs(r2) < 1e-8, jnp.float32(1.0), r2)
        D1_1 = (ms[1] - m_t) / r1
        D1_2 = (ms[2] - m_t) / r2
        # solve R[:-1,:-1] ρ = b[:-1] with R rows [rks^0; rks^1], rks=[r1,r2]
        rho1, rho2 = _solve2(1.0, 1.0, r1, r2, b1, b2)
        return x_t_ - alpha_t * B_h * (rho1 * D1_1 + rho2 * D1_2)

    x_next = jax.lax.switch(jnp.clip(pred_order - 1, 0, 2), [p1, p2, p3], None)

    new_carry = UniPCCarry(x=x_next, last_sample=x_used, ms=ms, lams=lams)
    return new_carry, x_next


def init_unipc_carry(x0: jax.Array) -> UniPCCarry:
    x0 = x0.astype(jnp.float32)
    return UniPCCarry(
        x=x0,
        last_sample=jnp.zeros_like(x0),
        ms=jnp.zeros((3, *x0.shape), jnp.float32),
        lams=jnp.zeros((3,), jnp.float32),
    )


class UniPCSDEScheduler(FlowMatchEulerSDE):
    """UniPC schedule + SDE rollout.

    Training/rollout steps (log-probs, the 4 dynamics) are inherited
    unchanged — they are mathematically identical in the reference. Eval
    rollouts use the order-``solver_order`` predictor-corrector via
    :func:`unipc_eval_step` (adapters thread :class:`UniPCCarry` through
    their eval scan when ``scheduler.use_unipc_eval`` is set).
    """

    use_unipc_eval = True
    solver_order: int = 2        # diffusers default; Wan pipelines use 2
    lower_order_final: bool = True

    def eval_orders(self, num_steps: int) -> Tuple[np.ndarray, np.ndarray]:
        return compute_unipc_orders(
            num_steps, int(self.solver_order), bool(self.lower_order_final)
        )

    def set_timesteps(self, num_inference_steps, seq_len=None, mu=None, sigmas=None):
        # Wan uses the flow sigma schedule with a static shift (no dynamic mu)
        return super().set_timesteps(num_inference_steps, seq_len=seq_len, mu=mu, sigmas=sigmas)
