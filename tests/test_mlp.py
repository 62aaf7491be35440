"""Fused GEGLU MLP kernel (ops/mlp.py) vs the unfused two-GEMM lowering.

The kernel replaces the FF blocks' HBM-materialized (B, S, 8C) intermediate
(reference FF: ``src/models/base/attention.py`` GEGLU) — numerics must match
the unfused path and gradients must flow (custom_vjp twin).
"""
import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models import attention_blocks as AB
from actalker_tpu.ops import mlp as M

KEY = jax.random.PRNGKey(0)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def test_kernel_matches_xla_twin_interpret():
    c, inner, cout, m = 128, 512, 128, 512
    ks = jax.random.split(KEY, 5)
    x = _rand(ks[0], (m, c), jnp.bfloat16)
    w1 = _rand(ks[1], (c, 2 * inner), jnp.bfloat16) * 0.05
    b1 = _rand(ks[2], (2 * inner,)) * 0.1
    w2 = _rand(ks[3], (inner, cout), jnp.bfloat16) * 0.05
    b2 = _rand(ks[4], (cout,)) * 0.1
    got = M._mlp_pallas(x, w1, b1, w2, b2, interpret=True)
    want = M._mlp_xla(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=0.05)


def test_feedforward_fused_equals_unfused_params_and_values():
    """Same param tree, same output (f32: the xla twin is exact)."""
    x = _rand(KEY, (2, 256, 64))
    ff = AB.FeedForward(dtype=jnp.float32)
    AB.set_mlp_impl("xla")
    try:
        p_ref = ff.init(KEY, x)
        y_ref = ff.apply(p_ref, x)
        AB.set_mlp_impl("fused")
        p_fused = ff.init(KEY, x)
        assert jax.tree.structure(p_ref) == jax.tree.structure(p_fused)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
            assert a.shape == b.shape
        y_fused = ff.apply(p_ref, x)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
    finally:
        AB.set_mlp_impl("fused")


def test_geglu_grads_flow():
    c, inner = 64, 256
    ks = jax.random.split(KEY, 5)
    x = _rand(ks[0], (128, c))
    w1 = _rand(ks[1], (c, 2 * inner)) * 0.05
    b1 = _rand(ks[2], (2 * inner,)) * 0.1
    w2 = _rand(ks[3], (inner, c)) * 0.05
    b2 = _rand(ks[4], (c,)) * 0.1

    def loss(*p):
        return jnp.sum(M.geglu_mlp(*p) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    ref = jax.grad(lambda *p: jnp.sum(M._mlp_xla(*p) ** 2),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for g, r in zip(grads, ref):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
