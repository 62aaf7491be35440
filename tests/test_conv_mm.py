"""ConvMM (shift-matmul conv fast path) equivalence vs nn.Conv."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actalker_tpu.ops.conv_mm import ConvMM, conv2d_mm


@pytest.mark.parametrize("kernel,stride,pad,shape", [
    ((3, 3), (1, 1), 1, (2, 8, 8, 16)),
    ((3, 3), (2, 2), 1, (2, 9, 9, 8)),
    ((1, 1), (1, 1), 0, (2, 8, 8, 16)),
    ((5, 5), (1, 1), 2, (1, 12, 10, 4)),
    ((3, 3), (2, 2), ((1, 1), (1, 1)), (2, 8, 8, 8)),
])
def test_conv_mm_matches_nn_conv(kernel, stride, pad, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref_mod = nn.Conv(12, kernel_size=kernel, strides=stride,
                      padding=(((pad, pad), (pad, pad))
                               if isinstance(pad, int) else pad))
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(params, x)
    got = ConvMM(12, kernel_size=kernel, strides=stride,
                 padding=pad).apply(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_mm_bf16_close_to_f32():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 32, 16)) * 0.1).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    f32 = conv2d_mm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    bf = conv2d_mm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
                   jnp.asarray(b))
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf, np.float32), np.asarray(f32),
                               rtol=0.1, atol=0.1)
