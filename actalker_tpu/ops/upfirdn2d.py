"""StyleGAN2 resampling ops as XLA-native convolutions.

TPU-native replacement for the reference's JIT-compiled CUDA extensions
(``src/utils/enhance/op/upfirdn2d.cpp/.cu`` and ``fused_bias_act.cpp/.cu``,
loaded at ``upfirdn2d.py:10-17`` / ``fused_act.py:11-17``): upsample-FIR-
downsample is one ``lax.conv_general_dilated`` with lhs dilation (upsample),
kernel = the FIR filter, and window strides (downsample); fused
bias + LeakyReLU + scale is a single jitted elementwise expression XLA fuses
into neighbors.

Layout NHWC; filters are (kh, kw) applied depthwise.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k: Sequence[float]) -> np.ndarray:
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def upfirdn2d(
    x: jax.Array,               # (N, H, W, C)
    kernel: np.ndarray,         # (kh, kw) FIR filter
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jax.Array:
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    k = jnp.asarray(kernel, x.dtype)
    # depthwise filter: (kh, kw, 1, C) with feature_group_count = C
    filt = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    pad0, pad1 = pad
    # torch's upfirdn2d dilates to in*up (keeps up-1 trailing zeros); XLA's
    # lhs_dilation yields in*up - (up-1), so fold the difference into pad1.
    pad1 = pad1 + (up - 1)
    y = lax.conv_general_dilated(
        x,
        filt,
        window_strides=(down, down),
        padding=((pad0, pad1), (pad0, pad1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return y


def upsample2x(x: jax.Array, kernel=(1, 3, 3, 1)) -> jax.Array:
    k = make_kernel(kernel) * 4.0
    p = k.shape[0] - 2
    return upfirdn2d(x, k, up=2, pad=((p + 1) // 2 + 1, p // 2))


def downsample2x(x: jax.Array, kernel=(1, 3, 3, 1)) -> jax.Array:
    k = make_kernel(kernel)
    p = k.shape[0] - 2
    return upfirdn2d(x, k, down=2, pad=((p + 1) // 2, p // 2))


def blur(x: jax.Array, kernel=(1, 3, 3, 1), pad=(2, 1), upsample_factor=1
         ) -> jax.Array:
    k = make_kernel(kernel)
    if upsample_factor > 1:
        k = k * (upsample_factor**2)
    return upfirdn2d(x, k, pad=pad)


def fused_leaky_relu(x: jax.Array, bias: jax.Array, negative_slope=0.2,
                     scale=2**0.5) -> jax.Array:
    """bias + LeakyReLU + sqrt(2) gain in one fused expression (XLA fuses
    this into the surrounding convs; parity with fused_bias_act)."""
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(y >= 0, y, negative_slope * y) * scale
