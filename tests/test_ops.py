"""Pallas flash attention vs native reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_factory_tpu.ops import dot_product_attention, flash_attention, native_attention


@pytest.mark.parametrize("sq,sk", [(128, 128), (200, 200), (64, 300)])
def test_flash_matches_native(sq, sk):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, 4, sq, 32), jnp.float32)
    k = jax.random.normal(k2, (2, 4, sk, 32), jnp.float32)
    v = jax.random.normal(k3, (2, 4, sk, 32), jnp.float32)
    ref = native_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_backward_matches_native():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 130, 16), jnp.float32)

    f_flash = lambda x: flash_attention(x, x, x, block_q=128, block_k=128).sum()
    f_native = lambda x: native_attention(x, x, x).sum()
    g1, g2 = jax.grad(f_flash)(q), jax.grad(f_native)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_dispatch_native_with_mask():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 16))
    mask = jnp.tril(jnp.ones((8, 8), bool))[None, None]
    out = dot_product_attention(q, q, q, mask=mask, backend="native")
    assert out.shape == q.shape
    with pytest.raises(NotImplementedError):
        dot_product_attention(q, q, q, mask=mask, backend="flash")


def test_flash_backward_dq_dk_dv_separately():
    """Per-input cotangents of the Pallas backward vs einsum reference."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(k1, (2, 3, 200, 32), jnp.float32)
    k = jax.random.normal(k2, (2, 3, 136, 32), jnp.float32)  # ragged kv
    v = jax.random.normal(k3, (2, 3, 136, 32), jnp.float32)
    g = jax.random.normal(k4, (2, 3, 200, 32), jnp.float32)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, block_q=128, block_k=128) * g).sum()

    def f_native(q, k, v):
        return (native_attention(q, k, v) * g).sum()

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(f_native, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gn, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name)
