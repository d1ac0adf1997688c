"""Ring flash attention == full attention (8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flow_factory_tpu.ops import native_attention
from flow_factory_tpu.ops.ring_attention import make_ring_attention


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_ring_matches_full():
    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("seq",))
    B, H, S, D = 2, 4, 512, 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, S, D), jnp.float32)
    k = jax.random.normal(k2, (B, H, S, D), jnp.float32)
    v = jax.random.normal(k3, (B, H, S, D), jnp.float32)

    ring = make_ring_attention(mesh, axis_name="seq")
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(ring)(qs, ks, vs)
    ref = native_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_ring_gradients_match_full():
    """Ring VJP (rotating dK/dV accumulators) == dense-attention gradients."""
    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("seq",))
    B, H, S, D = 1, 2, 256, 16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(k1, (B, H, S, D), jnp.float32)
    k = jax.random.normal(k2, (B, H, S, D), jnp.float32)
    v = jax.random.normal(k3, (B, H, S, D), jnp.float32)
    cot = jax.random.normal(k4, (B, H, S, D), jnp.float32)  # nontrivial cotangent

    ring = make_ring_attention(mesh, axis_name="seq")
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs, cs = (jax.device_put(x, spec) for x in (q, k, v, cot))

    loss_ring = lambda q, k, v: jnp.sum(ring(q, k, v) * cs)
    loss_ref = lambda q, k, v: jnp.sum(native_attention(q, k, v) * cot)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, err_msg=f"d{name}"
        )
