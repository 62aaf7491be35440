"""Shared building blocks for the model layer.

Conventions (TPU-native):
  * images/features are NHWC: (batch, height, width, channels);
  * video features are (batch, frames, H, W, C) — flattened to (B*F, H, W, C)
    for spatial ops and (B*HW, F, C) for temporal ops;
  * ``dtype`` is the computation dtype (bf16 on TPU), ``param_dtype`` the
    storage dtype; normalization statistics are always computed in fp32.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GroupNorm32(nn.Module):
    """GroupNorm over the channel-last axis with fp32 statistics regardless of
    compute dtype. Params are flat ('scale'/'bias') for converter simplicity."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        groups = self.num_groups if c >= self.num_groups else c
        assert c % groups == 0, (c, groups)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        shape = xf.shape
        import numpy as _np

        spatial = int(_np.prod(shape[1:-1])) if len(shape) > 2 else 1
        xg = xf.reshape(-1, spatial, groups, c // groups)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = xg.reshape(shape) * scale + bias
        return y.astype(orig_dtype)


class LayerNormF32(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(orig_dtype)


def dense(features: int, use_bias: bool = True, dtype=None, name: Optional[str] = None):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def conv2d(features: int, kernel=(3, 3), stride=(1, 1), padding=1, use_bias=True,
           dtype=None, name: Optional[str] = None):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, kernel_size=kernel, strides=stride, padding=padding,
                   use_bias=use_bias, dtype=dtype, name=name)
