"""Fused LayerNorm/RMSNorm+modulate kernel (ops/norms.py).

The CPU native path must be BIT-identical to the flax compositions it
replaced (recorded goldens depend on it); the Pallas kernel (interpret mode
here) must agree to fp32-reduction-order tolerance; gradients must be exact
(the VJP recomputes through the native composition).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from flow_factory_tpu.ops.norms import (
    _bcast,
    _ln_mul_add_pallas,
    _native_ln_mul_add,
    adaln_modulate,
    fused_layernorm,
    rms_modulate,
)

B, S, D = 2, 37, 256


@pytest.fixture(scope="module")
def rngs():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, S, D), jnp.bfloat16) * 3
    sh = jax.random.normal(jax.random.fold_in(k, 1), (B, D), jnp.float32)
    sc = jax.random.normal(jax.random.fold_in(k, 2), (B, D), jnp.float32)
    return x, sh, sc


def test_adaln_bit_exact_vs_flax(rngs):
    x, sh, sc = rngs

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32)(
                x.astype(jnp.float32)
            )
            return (n * (1.0 + scale[:, None, :]) + shift[:, None, :]).astype(x.dtype)

    ref = Ref().apply({}, x, sh, sc)
    assert bool(jnp.all(ref == adaln_modulate(x, sh, sc)))


def test_adaln_per_token_bit_exact(rngs):
    x, _, _ = rngs
    k = jax.random.PRNGKey(7)
    sh3 = jax.random.normal(k, (B, S, D), jnp.float32)
    sc3 = jax.random.normal(jax.random.fold_in(k, 1), (B, S, D), jnp.float32)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x, shift, scale):
            n = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32)(
                x.astype(jnp.float32)
            )
            return (n * (1.0 + scale) + shift).astype(x.dtype)

    assert bool(jnp.all(Ref().apply({}, x, sh3, sc3) == adaln_modulate(x, sh3, sc3)))


def test_affine_layernorm_bit_exact_vs_flax(rngs):
    x, _, _ = rngs
    k = jax.random.PRNGKey(3)
    w = jax.random.normal(k, (D,), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(k, 1), (D,), jnp.float32)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32)).astype(x.dtype)

    ref = Ref().apply({"params": {"LayerNorm_0": {"scale": w, "bias": b}}}, x)
    assert bool(jnp.all(ref == fused_layernorm(x, w, b)))


def test_rms_modulate_bit_exact_vs_flax(rngs):
    x, sh, sc = rngs

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x, shift, scale):
            n = nn.RMSNorm(epsilon=1e-6, use_scale=False, dtype=jnp.float32)(
                x.astype(jnp.float32)
            )
            return (n * (1.0 + scale[:, None, :]) + shift[:, None, :]).astype(x.dtype)

    assert bool(jnp.all(Ref().apply({}, x, sh, sc) == rms_modulate(x, sh, sc)))


@pytest.mark.parametrize("fold,rms", [(False, False), (True, False), (False, True)])
@pytest.mark.parametrize("per_token", [False, True])
def test_pallas_kernel_matches_native(rngs, fold, rms, per_token):
    """Interpret-mode Pallas kernel ≈ native, incl. the padded tail (S=37
    with block 32 exercises both pad rows and a partial final block)."""
    x, sh, sc = rngs
    if per_token:
        k = jax.random.PRNGKey(11)
        sh = jax.random.normal(k, (B, S, D), jnp.float32)
        sc = jax.random.normal(jax.random.fold_in(k, 1), (B, S, D), jnp.float32)
    mul = 1.0 + _bcast(sc, B)
    add = _bcast(sh, B)
    p = _ln_mul_add_pallas(x, mul, add, 1e-6, jnp.bfloat16, 32, fold, rms)
    n = _native_ln_mul_add(x, mul, add, 1e-6, jnp.bfloat16, fold, rms)
    diff = jnp.max(jnp.abs(p.astype(jnp.float32) - n.astype(jnp.float32)))
    # bf16 output: one ulp of disagreement from fp32 reduction order
    assert float(diff) <= 2e-4, float(diff)


def test_gradients_exact(rngs):
    """custom_vjp recomputes through the native composition — grads must be
    bit-identical to differentiating the unfused graph."""
    x, sh, sc = rngs
    x32 = x.astype(jnp.float32)

    def loss_fused(x, sh, sc):
        return jnp.sum(adaln_modulate(x, sh, sc) ** 2)

    def loss_native(x, sh, sc):
        mul = 1.0 + _bcast(sc, B)
        add = _bcast(sh, B)
        return jnp.sum(_native_ln_mul_add(x, mul, add, 1e-6, x.dtype, False) ** 2)

    g1 = jax.grad(loss_fused, (0, 1, 2))(x32, sh, sc)
    g2 = jax.grad(loss_native, (0, 1, 2))(x32, sh, sc)
    for a, b in zip(g1, g2):
        assert a.shape == b.shape
        assert bool(jnp.all(a == b))


def test_out_dtype_override(rngs):
    x, sh, sc = rngs
    out = adaln_modulate(x, sh, sc, out_dtype=jnp.float32)
    assert out.dtype == jnp.float32


def test_broadcast_shapes(rngs):
    """(D,), (B,D) and (B,1,D) modulation operands agree."""
    x, sh, sc = rngs
    a = adaln_modulate(x, sh, sc)
    b = adaln_modulate(x, sh[:, None, :], sc[:, None, :])
    assert bool(jnp.all(a == b))
    shd, scd = sh[0], sc[0]
    c = adaln_modulate(x[:1], shd, scd)
    d = adaln_modulate(x[:1], shd[None], scd[None])
    assert bool(jnp.all(c == d))


# ---------------------------------------------------------------------------
# Fused residual + gate + modulate (round 4)
# ---------------------------------------------------------------------------

def test_residual_gate_modulate_matches_composition():
    """Fused op (interpret mode) == open-coded residual + adaln_modulate —
    both outputs, odd sequence length (pad path)."""
    import numpy as np

    from flow_factory_tpu.ops.norms import (
        _bcast,
        _native_ln_mul_add,
        _rgm_fused,
        residual_gate_modulate,
    )

    key = jax.random.PRNGKey(5)
    B, S, D = 2, 200, 256
    x = jax.random.normal(key, (B, S, D), jnp.bfloat16)
    br = jax.random.normal(jax.random.fold_in(key, 1), (B, S, D), jnp.bfloat16)
    gate = jax.random.normal(jax.random.fold_in(key, 2), (B, D), jnp.float32)
    sh = jax.random.normal(jax.random.fold_in(key, 3), (B, D), jnp.float32)
    sc = jax.random.normal(jax.random.fold_in(key, 4), (B, D), jnp.float32)

    # reference: the exact block composition this op replaced
    x_ref = x + gate[:, None, :].astype(x.dtype) * br
    mul, add = 1.0 + _bcast(sc, B), _bcast(sh, B)
    xm_ref = _native_ln_mul_add(x_ref, mul, add, 1e-6, x.dtype, fold=False)

    # native dispatch path (CPU) must be BIT-identical
    xn, xm = residual_gate_modulate(x, br, gate, sh, sc)
    assert np.array_equal(np.asarray(xn), np.asarray(x_ref))
    assert np.array_equal(np.asarray(xm), np.asarray(xm_ref))

    # Pallas kernel (interpret mode) must match to bf16 tolerance
    xn2, xm2 = _rgm_fused(x, br, gate, mul, add, 1e-6, jnp.bfloat16, 128)
    # bf16 output + fp32 reduction-tree differences: ~1 ulp relative
    np.testing.assert_allclose(np.asarray(xn2, np.float32), np.asarray(x_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(xm2, np.float32), np.asarray(xm_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_residual_gate_modulate_grads_match():
    """custom_vjp grads (through the native recompute) == autodiff of the
    open-coded composition, for every input."""
    import numpy as np

    from flow_factory_tpu.ops.norms import _bcast, _native_ln_mul_add, _rgm_fused

    key = jax.random.PRNGKey(9)
    B, S, D = 1, 130, 128
    x = jax.random.normal(key, (B, S, D), jnp.float32)
    br = jax.random.normal(jax.random.fold_in(key, 1), (B, S, D), jnp.float32)
    gate = jax.random.normal(jax.random.fold_in(key, 2), (B, D), jnp.float32)
    mul = 1.0 + _bcast(jax.random.normal(jax.random.fold_in(key, 3), (B, D)), B)
    add = _bcast(jax.random.normal(jax.random.fold_in(key, 4), (B, D)), B)

    def loss_fused(x, br, gate, mul, add):
        xn, xm = _rgm_fused(x, br, gate, mul, add, 1e-6, jnp.float32, 128)
        return jnp.sum(xn ** 2) + jnp.sum(xm ** 2)

    def loss_ref(x, br, gate, mul, add):
        xn = x + gate[:, None, :] * br
        xm = _native_ln_mul_add(xn, mul, add, 1e-6, jnp.float32, fold=False)
        return jnp.sum(xn ** 2) + jnp.sum(xm ** 2)

    g1 = jax.grad(loss_fused, (0, 1, 2, 3, 4))(x, br, gate, mul, add)
    g2 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(x, br, gate, mul, add)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
