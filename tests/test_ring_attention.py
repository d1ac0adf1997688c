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
