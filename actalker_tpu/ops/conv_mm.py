"""Spatial convolution as shifted matmuls (opt-in MXU path).

Measured on this TPU platform: XLA's native convolution lowering is
pathologically slow for a channel-heavy 3x3 conv *benchmarked in
isolation* (~0.6 TFLOP/s for 3x3 2560->1280 @32x32), while the same
contraction expressed as k*k statically-shifted matmuls with a shared
fp32 accumulator reaches >90 TFLOP/s.  However, inside the full UNet the
native convs land in XLA's conv+add fusions and the full-model bench is
FASTER with ``nn.Conv`` (1.16 s/window-step) than with every conv routed
through this op (1.42 s/window-step) — the per-tap formulation defeats
those fusions and re-reads the activation k*k times from HBM.  So this op
is NOT the default (``models/common.py::conv2d`` uses ``nn.Conv``); it is
kept for shape-targeted use where a profile shows an isolated slow conv.

``conv2d_mm`` implements exactly ``lax.conv_general_dilated(NHWC, HWIO,
'SAME'-style int padding)`` for unit dilation: zero-pad, then for each
kernel tap (ky, kx) take the strided window and matmul against
``w[ky, kx]``; taps accumulate in fp32 and the result casts back once.
``ConvMM`` is a drop-in flax module with ``nn.Conv``'s parameter layout
(kernel (kh, kw, in, out), bias (out,)) so every existing weight converter
keeps working.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def conv2d_mm(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
              stride: Tuple[int, int] = (1, 1),
              padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1)),
              accum_dtype=jnp.float32) -> jax.Array:
    """NHWC x HWIO conv via per-tap matmuls. Returns x.dtype."""
    kh, kw, cin, cout = w.shape
    sh, sw = stride
    n, h, ww_, c = x.shape
    assert c == cin, (x.shape, w.shape)
    (pt, pb), (pl, pr) = padding
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    ho = (hp - kh) // sh + 1
    wo = (wp - kw) // sw + 1
    acc = None
    for ky in range(kh):
        for kx in range(kw):
            win = jax.lax.slice(
                x, (0, ky, kx, 0),
                (n, ky + (ho - 1) * sh + 1, kx + (wo - 1) * sw + 1, c),
                (1, sh, sw, 1))
            t = jax.lax.dot_general(
                win.reshape(n * ho * wo, c), w[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=accum_dtype)
            acc = t if acc is None else acc + t
    y = acc
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.reshape(n, ho, wo, cout).astype(x.dtype)


class ConvMM(nn.Module):
    """Drop-in for ``nn.Conv`` (2D, unit dilation) on the matmul fast path.

    Parameter names/shapes match ``nn.Conv`` (kernel (kh, kw, in, out),
    bias (out,)) so torch->flax converters are unaffected."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, str):
            if pad.upper() == "SAME":
                # unit-dilation SAME for odd kernels
                pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
            else:
                pad = ((0, 0), (0, 0))
        else:
            pad = tuple((p, p) if isinstance(p, int) else tuple(p)
                        for p in pad)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        return conv2d_mm(x, kernel.astype(dtype),
                         None if bias is None else bias,
                         tuple(self.strides), pad)
