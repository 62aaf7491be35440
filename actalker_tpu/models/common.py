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
    """GroupNorm with fp32 statistics regardless of compute dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        groups = self.num_groups if x.shape[-1] >= self.num_groups else x.shape[-1]
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class LayerNormF32(nn.Module):
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def dense(features: int, use_bias: bool = True, dtype=None, name: Optional[str] = None):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def conv2d(features: int, kernel=(3, 3), stride=(1, 1), padding=1, use_bias=True,
           dtype=None, name: Optional[str] = None):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, kernel_size=kernel, strides=stride, padding=padding,
                   use_bias=use_bias, dtype=dtype, name=name)
