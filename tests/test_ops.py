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


def test_flash_backward_extreme_logits_padded_tail():
    """The backward kernels run UNMASKED over the zero-padded key tail
    (padded k rows are zero / padded dk,dv rows are sliced): with every real
    score very negative, the pad columns' p=exp2(0-lse) would overflow to
    inf (→ inf·0 = NaN) without the exponent clamp. Odd S forces padding."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(k1, (1, 2, 200, 32), jnp.float32) * 30.0
    k = jax.random.normal(k2, (1, 2, 200, 32), jnp.float32)
    v = jax.random.normal(k3, (1, 2, 200, 32), jnp.float32)
    grads = jax.grad(lambda q, k, v: flash_attention(q, k, v).sum(), argnums=(0, 1, 2))(q, k, v)
    for name, g_ in zip(("dq", "dk", "dv"), grads):
        assert bool(jnp.all(jnp.isfinite(g_))), name
    ref = jax.grad(lambda q, k, v: native_attention(q, k, v).sum(), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), grads, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)


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


def test_hybrid_backend_matches_native_and_flash_grads():
    """hybrid = XLA forward + Pallas-flash backward: forward matches native,
    gradients match the pure-flash custom VJP."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flow_factory_tpu.ops.attention import (
        dot_product_attention,
        flash_attention,
        hybrid_attention,
        native_attention,
    )

    B, H, S, D = 1, 2, 300, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q, k, v, cot = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks)

    out = hybrid_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(native_attention(q, k, v)),
                               atol=2e-5)
    out2 = dot_product_attention(q, k, v, backend="hybrid")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)

    loss_h = lambda q, k, v: jnp.sum(hybrid_attention(q, k, v) * cot)
    loss_f = lambda q, k, v: jnp.sum(flash_attention(q, k, v) * cot)
    gh = jax.grad(loss_h, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gh, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=f"d{name}")


def test_flash_adaptive_blocks_odd_sizes():
    """Default caps engage the sequence-fitted block pick (e.g. S=333 →
    a single 384-wide block): forward and backward must still match the
    native reference bit-for-tolerance across block-boundary tails."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(k1, (1, 2, 333, 32), jnp.float32)
    k = jax.random.normal(k2, (1, 2, 339, 32), jnp.float32)
    v = jax.random.normal(k3, (1, 2, 339, 32), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v)),
        np.asarray(native_attention(q, k, v)), atol=2e-5)

    f_flash = lambda a: flash_attention(a, a, a).sum()
    f_native = lambda a: native_attention(a, a, a).sum()
    qq = jax.random.normal(k1, (1, 2, 333, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_flash)(qq)),
        np.asarray(jax.grad(f_native)(qq)), atol=1e-4)


# ---------------------------------------------------------------------------
# Fused qk-norm flash attention (round 4)
# ---------------------------------------------------------------------------

def test_qknorm_module_matches_flax_rmsnorm_bitwise():
    """QKNorm's hand-rolled native path must be BIT-identical to the previous
    nn.RMSNorm formulation (CPU goldens depend on it)."""
    import flax.linen as nn

    from flow_factory_tpu.models.layers import QKNorm

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 3, 17, 24), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 17, 24), jnp.bfloat16)
    gq = jax.random.normal(jax.random.fold_in(key, 2), (24,), jnp.float32) * 0.1 + 1.0
    gk = jax.random.normal(jax.random.fold_in(key, 3), (24,), jnp.float32) * 0.1 + 1.0

    mod = QKNorm(24)
    qn, kn = mod.apply(
        {"params": {"q_norm": {"scale": gq}, "k_norm": {"scale": gk}}}, q, k
    )
    ref_q = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32).apply(
        {"params": {"scale": gq}}, q.astype(jnp.float32)).astype(q.dtype)
    ref_k = nn.RMSNorm(epsilon=1e-6, dtype=jnp.float32).apply(
        {"params": {"scale": gk}}, k.astype(jnp.float32)).astype(k.dtype)
    assert np.array_equal(np.asarray(qn), np.asarray(ref_q))
    assert np.array_equal(np.asarray(kn), np.asarray(ref_k))
    # init builds the same tree
    tree = mod.init(key, q, k)["params"]
    assert set(tree) == {"q_norm", "k_norm"} and tuple(tree["q_norm"]["scale"].shape) == (24,)


@pytest.mark.parametrize("sq,sk,block_k", [(200, 200, 1024), (300, 300, 128)])
def test_qknorm_flash_matches_composition(sq, sk, block_k):
    """Fused kernel (interpret mode; exercises BOTH the single-k fast path
    and the multi-k online-softmax) vs RMS-norm + native attention, with a
    per-position two-stream scale map."""
    from flow_factory_tpu.ops.attention import _qknorm_flash, _rms_scale

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(7), 5)
    D = 32
    q = jax.random.normal(k1, (2, 3, sq, D), jnp.float32)
    k = jax.random.normal(k2, (2, 3, sk, D), jnp.float32)
    v = jax.random.normal(k3, (2, 3, sk, D), jnp.float32)
    # two-stream map: first 64 rows one set of scales, rest another
    gq = jnp.concatenate([
        jnp.broadcast_to(1.0 + 0.1 * jax.random.normal(k4, (D,)), (64, D)),
        jnp.broadcast_to(1.0 + 0.1 * jax.random.normal(k5, (D,)), (sq - 64, D)),
    ])
    gk = gq[:sk]
    scale = D ** -0.5

    out = _qknorm_flash(q, k, v, gq, gk, scale, 1e-6, 128, block_k)
    qn = _rms_scale(q, gq, 1e-6).astype(q.dtype)
    kn = _rms_scale(k, gk, 1e-6).astype(k.dtype)
    ref = native_attention(qn, kn, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_qknorm_flash_grads_match_composition():
    """Fused custom_vjp grads (incl. dγ) vs autodiff through the unfused
    composition."""
    from flow_factory_tpu.ops.attention import _qknorm_flash, _rms_scale

    key = jax.random.PRNGKey(11)
    D = 16
    q = jax.random.normal(key, (1, 2, 130, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 130, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 130, D), jnp.float32)
    gq = jnp.broadcast_to(1.0 + 0.05 * jax.random.normal(jax.random.fold_in(key, 3), (D,)), (130, D))
    gk = jnp.broadcast_to(1.0 - 0.05 * jax.random.normal(jax.random.fold_in(key, 4), (D,)), (130, D))
    scale = D ** -0.5

    def fused(q, k, v, gq, gk):
        return (_qknorm_flash(q, k, v, gq, gk, scale, 1e-6, 128, 128) ** 2).sum()

    def composed(q, k, v, gq, gk):
        qn = _rms_scale(q, gq, 1e-6).astype(q.dtype)
        kn = _rms_scale(k, gk, 1e-6).astype(k.dtype)
        return (native_attention(qn, kn, v, scale=scale) ** 2).sum()

    g1 = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(q, k, v, gq, gk)
    g2 = jax.grad(composed, argnums=(0, 1, 2, 3, 4))(q, k, v, gq, gk)
    for a, b, name in zip(g1, g2, ("dq", "dk", "dv", "dgq", "dgk")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name)


def test_qknorm_dispatch_native_path_matches_module():
    """qknorm_dot_product_attention off-TPU == QKNorm + dot_product_attention
    (the replay-consistency seam for non-fused platforms)."""
    from flow_factory_tpu.models.layers import QKNorm
    from flow_factory_tpu.ops.attention import qknorm_dot_product_attention

    key = jax.random.PRNGKey(3)
    D = 24
    q = jax.random.normal(key, (2, 2, 50, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 50, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 2, 50, D), jnp.bfloat16)
    gq = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (D,), jnp.float32)
    gk = 1.0 - 0.1 * jax.random.normal(jax.random.fold_in(key, 4), (D,), jnp.float32)

    out = qknorm_dot_product_attention(q, k, v, gq, gk, backend="native")
    qn, kn = QKNorm(D).apply(
        {"params": {"q_norm": {"scale": gq}, "k_norm": {"scale": gk}}}, q, k)
    ref = dot_product_attention(qn, kn, v, backend="native")
    assert np.array_equal(np.asarray(out), np.asarray(ref))
