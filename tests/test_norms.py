"""Fused normalization kernels (ops/norms.py).

Interpret-mode Pallas vs the XLA reference, tail-row masking in the
GroupNorm two-pass accumulator, gradients through the custom_vjp, and
agreement of the module-level fused/xla switch (checkpoint compatibility —
both read the same flat scale/bias params).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actalker_tpu.ops.norms import (
    _gn_pallas,
    _gn_xla,
    _ln_pallas,
    _ln_xla,
    group_norm,
    layer_norm,
)


def _rand(key, shape, scale=1.0, shift=0.0):
    return jax.random.normal(key, shape, jnp.float32) * scale + shift


def test_layer_norm_interpret_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = _rand(ks[0], (512, 320), scale=3.0, shift=1.5)
    g, b = _rand(ks[1], (320,)), _rand(ks[2], (320,))
    out = _ln_pallas(x, g, b, 1e-5, interpret=True)
    ref = _ln_xla(x, g, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = _rand(ks[0], (64, 128), scale=2.0, shift=-0.7)
    g, b = _rand(ks[1], (128,)), _rand(ks[2], (128,))
    out = layer_norm(x, g, b, 1e-5)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(np.asarray(x)), (128,),
        torch.from_numpy(np.asarray(g)), torch.from_numpy(np.asarray(b)),
        eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("m", [96, 100])  # divisible and tail-masked
def test_group_norm_interpret_matches_xla(m):
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _rand(ks[0], (3, m, 320), scale=2.0, shift=-0.5)
    g, b = _rand(ks[1], (320,)), _rand(ks[2], (320,))
    out = _gn_pallas(x, g, b, 32, 1e-5, interpret=True)
    ref = _gn_xla(x, g, b, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)


def test_group_norm_matches_torch():
    torch = pytest.importorskip("torch")
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    n, h, w, c, groups = 2, 6, 5, 64, 8
    x = _rand(ks[0], (n, h, w, c), scale=1.5, shift=0.3)
    g, b = _rand(ks[1], (c,)), _rand(ks[2], (c,))
    out = group_norm(x, g, b, groups, 1e-5)
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    ref = torch.nn.functional.group_norm(
        xt, groups, torch.from_numpy(np.asarray(g)),
        torch.from_numpy(np.asarray(b)), eps=1e-5
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)


def test_layer_norm_gradients_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x = _rand(ks[0], (32, 64))
    g, b = _rand(ks[1], (64,)), _rand(ks[2], (64,))
    g1 = jax.grad(lambda x, g, b: jnp.sum(jnp.tanh(layer_norm(x, g, b))),
                  argnums=(0, 1, 2))(x, g, b)
    g2 = jax.grad(
        lambda x, g, b: jnp.sum(jnp.tanh(_ln_xla(x, g, b, 1e-5))),
        argnums=(0, 1, 2))(x, g, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


def test_group_norm_gradients_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = _rand(ks[0], (2, 12, 64))
    g, b = _rand(ks[1], (64,)), _rand(ks[2], (64,))
    g1 = jax.grad(lambda x, g, b: jnp.sum(jnp.tanh(group_norm(x, g, b, 8))),
                  argnums=(0, 1, 2))(x, g, b)
    g2 = jax.grad(
        lambda x, g, b: jnp.sum(jnp.tanh(_gn_xla(x, g, b, 8, 1e-5))),
        argnums=(0, 1, 2))(x, g, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("norm", ["layer", "group"])
def test_module_norm_impls_agree(norm):
    # fused and xla module paths read the same params and agree in f32
    from actalker_tpu.models import common

    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    if norm == "layer":
        model = common.LayerNormF32()
        x = _rand(ks[0], (4, 24, 64), scale=2.0)
    else:
        model = common.GroupNorm32(num_groups=8)
        x = _rand(ks[0], (2, 6, 6, 64), scale=2.0)
    params = model.init(ks[1], x)
    prev = common._NORM_IMPL
    try:
        common.set_norm_impl("fused")
        y1 = model.apply(params, x)
        common.set_norm_impl("xla")
        y2 = model.apply(params, x)
    finally:
        common.set_norm_impl(prev)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=5e-3, rtol=1e-3)
