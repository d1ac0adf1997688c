import numpy as np
import pytest

from flow_factory_tpu.utils import (
    TimeSampler,
    build_store_maps,
    compute_trajectory_indices,
    derive_seed,
    filter_kwargs,
    flow_match_sigma,
)


class TestFilterKwargs:
    def test_filters_unknown(self):
        def f(a, b=1):
            return a + b

        assert filter_kwargs(f, a=1, b=2, c=3) == {"a": 1, "b": 2}

    def test_var_keyword_passthrough(self):
        def f(a, **kw):
            return a

        assert filter_kwargs(f, a=1, z=9) == {"a": 1, "z": 9}


class TestDeriveSeed:
    def test_stable(self):
        assert derive_seed("prompt", 42) == derive_seed("prompt", 42)
        assert derive_seed("prompt", 42) != derive_seed("prompt", 43)
        assert derive_seed("a", 1) != derive_seed("b", 1)


class TestTrajectoryIndices:
    def test_minimal_union(self):
        assert compute_trajectory_indices([2, 5, 8], 20) == [2, 3, 5, 6, 8, 9]

    def test_consecutive_share_boundaries(self):
        assert compute_trajectory_indices([0, 1, 2], 20) == [0, 1, 2, 3]

    def test_clamps_out_of_range(self):
        assert compute_trajectory_indices([19], 20) == [19, 20]

    def test_include_initial(self):
        assert compute_trajectory_indices([5], 20, include_initial=True) == [0, 5, 6]


class TestStoreMaps:
    def test_all(self):
        m = build_store_maps("all", 4)
        assert m.num_latent_slots == 5
        np.testing.assert_array_equal(m.latent_store_slot, np.arange(5))
        np.testing.assert_array_equal(m.latent_index_map, np.arange(5))
        assert m.num_logprob_slots == 4

    def test_selective(self):
        m = build_store_maps([2, 3], 4)
        assert m.num_latent_slots == 2
        assert m.latent_store_slot[2] == 0 and m.latent_store_slot[3] == 1
        # non-stored positions map to the garbage slot
        assert m.latent_store_slot[0] == 2 and m.latent_store_slot[4] == 2
        assert m.latent_index_map[0] == -1
        # log probs only for positions < T
        assert m.num_logprob_slots == 2
        assert m.logprob_store_slot[2] == 0 and m.logprob_store_slot[3] == 1

    def test_none(self):
        m = build_store_maps(None, 4)
        assert m.num_latent_slots == 0
        assert (m.latent_index_map == -1).all()

    def test_negative_indices(self):
        m = build_store_maps([0, -1], 10)
        assert m.latent_store_slot[0] == 0 and m.latent_store_slot[10] == 1


class TestTimeSampler:
    def test_logit_normal_range_and_shape(self):
        t = TimeSampler.logit_normal_shifted(4, 8, (0.0, 0.99), seed=0)
        assert t.shape == (8, 4)
        assert (t >= 1000 * 0.01 - 1e-3).all() and (t <= 1000).all()
        # deterministic
        t2 = TimeSampler.logit_normal_shifted(4, 8, (0.0, 0.99), seed=0)
        np.testing.assert_array_equal(t, t2)

    def test_uniform_stratified_coverage(self):
        t = TimeSampler.uniform(1, 100, (0.0, 1.0), seed=1)[:, 0]
        # stratified: sorted values roughly linear
        s = np.sort(t)[::-1]
        assert abs(s[0] - 1000) < 15 and abs(s[-1]) < 15

    def test_discrete_force_init(self):
        ts = np.linspace(1000, 100, 10).astype(np.float32)
        t = TimeSampler.discrete(2, 3, ts, timestep_range=(0.0, 1.0), force_init=True, seed=3)
        assert t.shape == (3, 2)
        assert t[0, 0] == ts[0]

    def test_discrete_window(self):
        ts = np.linspace(1000, 100, 10).astype(np.float32)
        t = TimeSampler.discrete(1, 4, ts, timestep_range=(0.0, 0.5), seed=3)[:, 0]
        assert (t >= 500 - 1e-3).all()

    def test_sigma_map(self):
        np.testing.assert_allclose(flow_match_sigma(np.array([0.0, 500.0, 1000.0])), [0, 0.5, 1.0])


def test_unique_id_incorporates_preprocessed_conditions():
    """Trainer rollouts carry condition identity only as preprocessed
    latents (cond_latents et al.) — same-prompt records with different
    conditions must not share an advantage group."""
    from flow_factory_tpu.samples import BaseSample

    a = BaseSample(prompt="edit the cat")
    b = BaseSample(prompt="edit the cat")
    a.extra_kwargs["cond_latents"] = np.ones((4, 8), np.float32)
    b.extra_kwargs["cond_latents"] = np.zeros((4, 8), np.float32)
    assert a.unique_id != b.unique_id
    c = BaseSample(prompt="edit the cat")
    c.extra_kwargs["cond_latents"] = np.ones((4, 8), np.float32)
    assert a.unique_id == c.unique_id
