"""Golden-value tests for the FlowMatch-Euler SDE scheduler.

Strategy (reference test methodology, SURVEY.md §4): fp32 golden values are
recomputed independently with numpy from the published formulas; the replay
(ratio == 1) invariant is checked through the same `sde_step` function used
by both rollout and training.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_factory_tpu.scheduler import FlowMatchEulerSDE, build_flow_match_sigmas, sde_step
from flow_factory_tpu.scheduler.flow_match_euler import calculate_shift


class TestSigmaSchedule:
    def test_linear_no_shift(self):
        sig = build_flow_match_sigmas(10, shift=1.0)
        assert sig.shape == (11,)
        np.testing.assert_allclose(sig[:-1], np.linspace(1.0, 0.1, 10), rtol=1e-6)
        assert sig[-1] == 0.0

    def test_static_shift(self):
        base = np.linspace(1.0, 1.0 / 8, 8)
        expected = 3.0 * base / (1 + 2.0 * base)
        sig = build_flow_match_sigmas(8, shift=3.0)
        np.testing.assert_allclose(sig[:-1], expected, rtol=1e-6)

    def test_dynamic_shift(self):
        mu = calculate_shift(1024)
        base = np.linspace(1.0, 1.0 / 8, 8)
        expected = math.exp(mu) / (math.exp(mu) + (1.0 / base - 1.0))
        sig = build_flow_match_sigmas(8, use_dynamic_shifting=True, mu=mu)
        np.testing.assert_allclose(sig[:-1], expected, rtol=1e-6)

    def test_shift_terminal(self):
        sig = build_flow_match_sigmas(8, shift=1.0, shift_terminal=0.1)
        assert abs(sig[-2] - 0.1) < 1e-6


class TestSDEStepGolden:
    """Each dynamics type vs an independent numpy recomputation, fp32."""

    def setup_method(self):
        rng = np.random.default_rng(0)
        self.B, self.C, self.H, self.W = 2, 4, 8, 8
        self.x = rng.standard_normal((self.B, self.C, self.H, self.W)).astype(np.float32)
        self.v = rng.standard_normal((self.B, self.C, self.H, self.W)).astype(np.float32)
        self.sigma, self.sigma_next = 0.8, 0.6
        self.eta = 0.7

    def test_ode(self):
        out = sde_step(
            jnp.asarray(self.v), jnp.asarray(self.x), self.sigma, self.sigma_next,
            dynamics_type="ODE", compute_log_prob=True, storage_dtype=jnp.float32,
        )
        expected = self.x + self.v * (self.sigma_next - self.sigma)
        np.testing.assert_allclose(np.asarray(out.next_latents), expected, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.log_prob), np.zeros(self.B))

    def test_flow_sde_mean_and_logprob(self):
        dt = self.sigma_next - self.sigma
        std = math.sqrt(self.sigma / (1 - self.sigma)) * self.eta
        mean = self.x * (1 + std**2 / (2 * self.sigma) * dt) + self.v * (
            1 + std**2 * (1 - self.sigma) / (2 * self.sigma)
        ) * dt
        # replay mode: fixed stored next_latents
        stored = mean + 0.1
        out = sde_step(
            jnp.asarray(self.v), jnp.asarray(self.x), self.sigma, self.sigma_next,
            dynamics_type="Flow-SDE", noise_level=self.eta,
            next_latents=jnp.asarray(stored.astype(np.float32)),
            compute_log_prob=True, storage_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(out.next_latents_mean), mean, rtol=1e-4, atol=1e-6)
        scale = std * math.sqrt(-dt)
        lp = (-((stored - mean) ** 2) / (2 * scale**2) - math.log(scale) - 0.5 * math.log(2 * math.pi))
        lp = lp.reshape(self.B, -1).mean(axis=1)
        np.testing.assert_allclose(np.asarray(out.log_prob), lp, rtol=1e-4)

    def test_dance_sde_mean(self):
        dt = self.sigma_next - self.sigma
        x0 = self.x - self.sigma * self.v
        log_term = 0.5 * self.eta**2 * (self.x - x0 * (1 - self.sigma)) / self.sigma**2
        mean = self.x + (self.v + log_term) * dt
        out = sde_step(
            jnp.asarray(self.v), jnp.asarray(self.x), self.sigma, self.sigma_next,
            dynamics_type="Dance-SDE", noise_level=self.eta,
            next_latents=jnp.asarray(mean.astype(np.float32)), compute_log_prob=True,
            storage_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(out.next_latents_mean), mean, rtol=1e-4, atol=1e-6)

    def test_cps_mean(self):
        std = self.sigma_next * math.sin(self.eta * math.pi / 2)
        x0 = self.x - self.sigma * self.v
        x1 = self.x + self.v * (1 - self.sigma)
        mean = x0 * (1 - self.sigma_next) + x1 * math.sqrt(self.sigma_next**2 - std**2)
        out = sde_step(
            jnp.asarray(self.v), jnp.asarray(self.x), self.sigma, self.sigma_next,
            dynamics_type="CPS", noise_level=self.eta,
            next_latents=jnp.asarray(mean.astype(np.float32)), compute_log_prob=True,
            storage_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(out.next_latents_mean), mean, rtol=1e-4, atol=1e-6)
        # log prob of the mean itself is 0 (negative MSE surrogate)
        np.testing.assert_allclose(np.asarray(out.log_prob), np.zeros(self.B), atol=1e-9)


class TestReplayConsistency:
    """Train-inference consistency: replaying a sampled transition with the
    same velocity prediction must give an identical log-prob (ratio == 1).
    This is the core runtime self-check of the reference
    (.agents/knowledge/topics/train_inference_consistency.md)."""

    @pytest.mark.parametrize("dynamics", ["Flow-SDE", "Dance-SDE", "CPS"])
    @pytest.mark.parametrize("storage_dtype", [jnp.float32, jnp.bfloat16])
    def test_ratio_is_one(self, dynamics, storage_dtype):
        key = jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (2, 4, 8, 8), dtype=jnp.float32)
        v = jax.random.normal(k2, (2, 4, 8, 8), dtype=jnp.float32)

        sampled = sde_step(
            v, x, 0.8, 0.6, dynamics_type=dynamics, noise_level=0.7, key=k3,
            compute_log_prob=True, storage_dtype=storage_dtype,
        )
        replayed = sde_step(
            v, x, 0.8, 0.6, dynamics_type=dynamics, noise_level=0.7,
            next_latents=sampled.next_latents, compute_log_prob=True,
            storage_dtype=storage_dtype,
        )
        ratio = jnp.exp(replayed.log_prob - sampled.log_prob)
        np.testing.assert_allclose(np.asarray(ratio), np.ones(2), rtol=1e-6)

    def test_storage_roundtrip_changes_value(self):
        """bf16 round-trip must be applied before the log-prob (guard against
        silently computing log-prob on un-quantized latents)."""
        key = jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (2, 4, 8, 8), dtype=jnp.float32)
        v = jax.random.normal(k2, (2, 4, 8, 8), dtype=jnp.float32)
        out = sde_step(
            v, x, 0.8, 0.6, dynamics_type="Flow-SDE", noise_level=0.7, key=k3,
            compute_log_prob=True, storage_dtype=jnp.bfloat16,
        )
        f32 = np.asarray(out.next_latents, dtype=np.float32)
        np.testing.assert_array_equal(f32, f32.astype(np.float32).astype(jnp.bfloat16).astype(np.float32))


class TestSchedulerState:
    def test_sde_step_subset_deterministic(self):
        s = FlowMatchEulerSDE(noise_level=0.8, sde_steps=[1, 2, 3, 4, 5], num_sde_steps=2, seed=7)
        s.set_timesteps(10)
        a = s.current_sde_steps
        b = s.current_sde_steps
        np.testing.assert_array_equal(a, b)
        assert set(a.tolist()) <= {1, 2, 3, 4, 5}
        assert len(a) == 2
        s.set_seed(8)
        # redraw with a different seed eventually differs
        draws = {tuple(sorted(FlowMatchEulerSDE(0.8, [1, 2, 3, 4, 5], 2, seed=i).current_sde_steps.tolist())) for i in range(20)}
        assert len(draws) > 1

    def test_noise_levels_gating(self):
        s = FlowMatchEulerSDE(noise_level=0.8, sde_steps=[1, 2], num_sde_steps=2, seed=0)
        s.set_timesteps(6)
        levels = s.get_noise_levels()
        assert levels[1] == pytest.approx(0.8) and levels[2] == pytest.approx(0.8)
        assert levels[0] == 0 and levels[3:].sum() == 0
        s.eval()
        assert s.get_noise_levels().sum() == 0

    def test_default_sde_steps_all_but_last(self):
        s = FlowMatchEulerSDE(noise_level=0.5)
        s.set_timesteps(8)
        np.testing.assert_array_equal(s.sde_steps, np.arange(7))

    def test_eval_step_is_ode(self):
        s = FlowMatchEulerSDE(noise_level=0.8, dynamics_type="Flow-SDE")
        s.set_timesteps(8)
        s.eval()
        x = jnp.ones((1, 4, 4, 4))
        v = jnp.ones((1, 4, 4, 4)) * 0.5
        out = s.step(v, 0, x, compute_log_prob=False, storage_dtype=jnp.float32)
        dt = float(s.sigmas[1] - s.sigmas[0])
        np.testing.assert_allclose(np.asarray(out.next_latents), np.asarray(x + v * dt), rtol=1e-6)
