"""Fused GN+SiLU+3x3-conv kernel (ops/resconv.py): interpret-mode kernel vs
the XLA twin, the twin vs the stock module lowering, gradients, and
param-tree interchangeability of the two ResnetBlock2D paths."""
import numpy as np
import jax
import jax.numpy as jnp

from actalker_tpu.ops.resconv import (
    _gn_affine,
    _gnconv_pallas,
    _gnconv_xla,
    gn_silu_conv3x3,
)


def _args(key, n=2, h=8, w=8, c=32, co=32):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    wk = jax.random.normal(ks[3], (3, 3, c, co), jnp.float32) * 0.05
    cb = 0.1 * jax.random.normal(ks[4], (co,), jnp.float32)
    return x, gamma, beta, wk, cb


def test_kernel_interpret_matches_twin():
    x, gamma, beta, wk, cb = _args(jax.random.PRNGKey(0))
    groups, eps = 8, 1e-5
    a, b = _gn_affine(x, gamma, beta, groups, eps)
    out = _gnconv_pallas(x, a, b, wk, cb, interpret=True)
    ref = _gnconv_xla(x, gamma, beta, groups, eps, wk, cb, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_twin_matches_module_lowering():
    """The XLA twin must equal the stock GroupNorm32+SiLU+nn.Conv chain the
    fused path replaces (fp32; the production bf16 delta is rounding)."""
    import flax.linen as nn

    from actalker_tpu.models.common import GroupNorm32, conv2d

    x, gamma, beta, wk, cb = _args(jax.random.PRNGKey(1))
    groups, eps = 32, 1e-5

    class Stock(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = GroupNorm32(epsilon=eps, name="norm1")(x)
            h = nn.silu(h)
            return conv2d(32, name="conv1")(h)

    params = {"params": {"norm1": {"scale": gamma, "bias": beta},
                         "conv1": {"kernel": wk, "bias": cb}}}
    want = Stock().apply(params, x)
    got = _gnconv_xla(x, gamma, beta, groups, eps, wk, cb, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradients_flow():
    x, gamma, beta, wk, cb = _args(jax.random.PRNGKey(2), n=1)

    def loss(x, gamma, beta, wk, cb):
        return jnp.sum(jnp.square(
            gn_silu_conv3x3(x, gamma, beta, 8, 1e-5, wk, cb)))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, wk, cb)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0


def test_resnet_block_paths_share_param_tree():
    """Both ResnetBlock2D lowerings must create the identical param pytree
    (converted checkpoints and the exporters see one contract)."""
    from actalker_tpu.models import resnet as R

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 32), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(4), (2, 16), jnp.float32)

    def tree_of(impl):
        R.set_resconv_impl(impl)
        try:
            blk = R.ResnetBlock2D(out_channels=32)
            v = blk.init(jax.random.PRNGKey(0), x, temb)
            return jax.tree.map(lambda t: (t.shape, str(t.dtype)), v)
        finally:
            R.set_resconv_impl("xla")

    a = tree_of("xla")
    b = tree_of("pallas")
    assert a == b

    # and the two paths agree numerically in fp32 on shared params
    R.set_resconv_impl("xla")
    blk = R.ResnetBlock2D(out_channels=32)
    params = blk.init(jax.random.PRNGKey(0), x, temb)
    want = blk.apply(params, x, temb)
    R.set_resconv_impl("pallas")
    try:
        got = R.ResnetBlock2D(out_channels=32).apply(params, x, temb)
    finally:
        R.set_resconv_impl("xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
