"""VASA facial expression / head-pose encoders.

Parity targets (``src/dataset/vasa_feature_v2.py``):
  * ``HeadExpression`` (107-121): ResNet-50 with GroupNorm(groups=1) ->
    512-d expression code (fc head with ``num_classes=512``).
  * ``HeadPose_train`` (9-22): ResNet-18 with GroupNorm(32) -> 6 outputs;
    rotation = sigmoid*360-180, translation = sigmoid*4-2.

Both consume 256x256 RGB crops; layout NHWC.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import conv2d, dense


def _gn(groups, name):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _maxpool_3x3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1  # GroupNorm groups (reference uses 1 for ResNet50-GN)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        residual = x
        h = conv2d(self.planes, kernel=(1, 1), padding=0, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_gn(self.groups, "gn1")(h))
        h = conv2d(self.planes, stride=(self.stride, self.stride), use_bias=False,
                   dtype=self.dtype, name="conv2")(h)
        h = nn.relu(_gn(self.groups, "gn2")(h))
        h = conv2d(out_ch, kernel=(1, 1), padding=0, use_bias=False,
                   dtype=self.dtype, name="conv3")(h)
        h = _gn(self.groups, "gn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = conv2d(out_ch, kernel=(1, 1), padding=0,
                              stride=(self.stride, self.stride), use_bias=False,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = _gn(self.groups, "downsample_gn")(residual)
        return nn.relu(h + residual)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = conv2d(self.planes, stride=(self.stride, self.stride), use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_gn(32, "bn1")(h))
        h = conv2d(self.planes, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = _gn(32, "bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = conv2d(self.planes, kernel=(1, 1), padding=0,
                              stride=(self.stride, self.stride), use_bias=False,
                              dtype=self.dtype, name="shortcut_conv")(x)
            residual = _gn(32, "shortcut_gn")(residual)
        return nn.relu(h + residual)


class HeadExpression(nn.Module):
    """ResNet-50-GN(groups=1) -> out_feat_dim expression code."""

    out_dim: int = 512
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, 256, 256, 3) in [0, 1]
        h = conv2d(64, kernel=(7, 7), stride=(2, 2), padding=3, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_gn(1, "gn1")(h))
        h = _maxpool_3x3s2(h)
        planes = 64
        for i, blocks in enumerate(self.layers):
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = Bottleneck(planes, stride=stride, groups=1,
                               dtype=self.dtype, name=f"layer{i + 1}_{j}")(h)
            planes *= 2
        h = jnp.mean(h, axis=(1, 2))
        return dense(self.out_dim, dtype=self.dtype, name="fc")(h)


class HeadPose(nn.Module):
    """ResNet-18-GN(32) -> rotation (deg, +-180) and translation (+-2)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, 256, 256, 3) in [-1, 1]
        h = conv2d(64, kernel=(7, 7), stride=(2, 2), padding=3, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_gn(32, "bn1")(h))
        h = _maxpool_3x3s2(h)
        planes = 64
        for i, blocks in enumerate(self.layers):
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = BasicBlock(planes, stride=stride, dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(h)
            planes *= 2
        h = jnp.mean(h, axis=(1, 2))
        out = dense(6, dtype=self.dtype, name="fc")(h)
        rotation = nn.sigmoid(out[:, :3]) * 360.0 - 180.0
        translation = nn.sigmoid(out[:, 3:]) * 4.0 - 2.0
        return {"rotation": rotation, "translation": translation}
