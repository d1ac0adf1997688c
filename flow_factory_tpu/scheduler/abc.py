"""SDE scheduler interfaces.

The reference attaches SDE semantics to diffusers schedulers via a mixin with
mutable state (``src/flow_factory/scheduler/abc.py:24-154``). Here the step
math is a *pure function* (`sde_step` in ``flow_match_euler.py``) usable
inside ``lax.scan``; the class layer only holds host-side schedule state
(sigmas/timesteps, the per-epoch SDE-step subset, train/eval mode).
"""
from __future__ import annotations

from typing import Literal, NamedTuple, Optional

import jax

DynamicsType = Literal["Flow-SDE", "Dance-SDE", "CPS", "ODE"]


class SDEStepOutput(NamedTuple):
    """Output of a single SDE denoise step.

    Mirrors reference ``SDESchedulerOutput`` (``scheduler/abc.py:24-40``):
      next_latents:       x_{t+1}, in fp32 (already round-tripped through the
                          storage dtype when freshly sampled).
      next_latents_mean:  Gaussian mean of the transition kernel (fp32).
      std_dev_t:          per-step diffusion scale σ_t (fp32, broadcast shape).
      dt:                 signed step size σ_{t+1} − σ_t (negative; broadcast shape).
      log_prob:           (B,) per-sample log-probability, mean-reduced over
                          non-batch dims; zeros for ODE.
      noise_pred:         the velocity prediction that produced this step (fp32).
    """

    next_latents: jax.Array
    next_latents_mean: jax.Array
    std_dev_t: jax.Array
    dt: jax.Array
    log_prob: Optional[jax.Array]
    noise_pred: jax.Array
