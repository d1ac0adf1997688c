"""EMA of parameter pytrees + decay schedules.

Functional re-design of the reference EMA wrapper
(``src/flow_factory/ema/ema.py:32-207``) and its 6 decay schedules
(``ema/ema_utils.py:28-210``). In JAX an EMA is just another pytree and the
swap-restore context manager (``use_ema_parameters``) collapses to "pass
``ema.params`` instead of the live params" — the adapter exposes exactly
that. With ``decay=0, update_interval=0`` the holder doubles as a frozen
snapshot store, which is how ref-params and named parameter snapshots are
implemented (reference ``models/abc.py:547-552,649-657``).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

DecayFn = Callable[[int], float]


# ---------------------------------------------------------------------------
# Decay schedules (step → decay in [0, 1]); mirror reference ema_utils.py
# ---------------------------------------------------------------------------

def constant_decay(decay: float = 0.999) -> DecayFn:
    return lambda step: decay


def power_decay(gamma: float = 1.0, power: float = 2.0 / 3.0, max_decay: float = 0.9999) -> DecayFn:
    def fn(step: int) -> float:
        if step <= 0:
            return 0.0
        return min(max_decay, 1.0 - (1.0 + step / gamma) ** (-power))

    return fn


def linear_decay(start: float = 0.9, end: float = 0.9999, num_steps: int = 10000) -> DecayFn:
    def fn(step: int) -> float:
        if step >= num_steps:
            return end
        return start + (end - start) * (step / max(num_steps, 1))

    return fn


def piecewise_linear_decay(boundaries, values) -> DecayFn:
    """boundaries: [s1, s2, ...]; values: [v0, v1, ...] (len = len(boundaries)+1)."""

    def fn(step: int) -> float:
        for b, v in zip(boundaries, values):
            if step < b:
                return v
        return values[len(boundaries)]

    return fn


def cosine_decay(start: float = 0.9, end: float = 0.9999, num_steps: int = 10000) -> DecayFn:
    def fn(step: int) -> float:
        if step >= num_steps:
            return end
        cos = 0.5 * (1.0 + math.cos(math.pi * (1.0 - step / max(num_steps, 1))))
        return start + (end - start) * cos

    return fn


def warmup_cosine_decay(
    warmup_steps: int = 1000, start: float = 0.0, end: float = 0.9999, num_steps: int = 10000
) -> DecayFn:
    cos = cosine_decay(start, end, max(num_steps - warmup_steps, 1))

    def fn(step: int) -> float:
        if step < warmup_steps:
            return start
        return cos(step - warmup_steps)

    return fn


_SCHEDULES = {
    "constant": constant_decay,
    "power": power_decay,
    "linear": linear_decay,
    "piecewise_linear": piecewise_linear_decay,
    "cosine": cosine_decay,
    "warmup_cosine": warmup_cosine_decay,
}


def get_decay_schedule(name: str, **kwargs) -> DecayFn:
    if name not in _SCHEDULES:
        raise KeyError(f"Unknown EMA decay schedule {name!r}; have {sorted(_SCHEDULES)}")
    return _SCHEDULES[name](**kwargs)


# ---------------------------------------------------------------------------
# EMA holder
# ---------------------------------------------------------------------------

@jax.jit
def _ema_update(ema: Any, new: Any, decay: jax.Array) -> Any:
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, new)


class EMA:
    """EMA over a trainable pytree.

    ``update_interval=0`` never updates (frozen snapshot); ``offload=True``
    keeps the EMA tree in host memory (TPU HBM analog of the reference's
    cross-device CPU EMA, ``ema/ema.py:116-127``).
    """

    def __init__(
        self,
        params: Any,
        decay_fn: Optional[DecayFn] = None,
        update_interval: int = 1,
        offload: bool = False,
    ):
        self.decay_fn = decay_fn or constant_decay(0.999)
        self.update_interval = update_interval
        self.offload = offload
        self.step = 0
        self.params = self._place(jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params))

    def _place(self, tree: Any) -> Any:
        if self.offload:
            cpu = jax.local_devices(backend="cpu")[0]
            return jax.device_put(tree, cpu)
        return tree

    def update(self, params: Any, step: Optional[int] = None) -> None:
        self.step = self.step + 1 if step is None else step
        if self.update_interval <= 0 or (self.step % self.update_interval) != 0:
            return
        decay = jnp.asarray(self.decay_fn(self.step), jnp.float32)
        if self.offload:
            params = jax.device_put(params, jax.local_devices(backend="cpu")[0])
        self.params = _ema_update(self.params, params, decay)

    def copy_from(self, params: Any) -> None:
        """Hard reset (snapshot semantics)."""
        self.params = self._place(jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params))

    def state_dict(self) -> dict:
        return {"step": self.step, "params": self.params}

    def load_state_dict(self, state: dict) -> None:
        self.step = int(state["step"])
        self.params = self._place(state["params"])
