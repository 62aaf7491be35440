"""ArcFace identity encoder (iResNet-50) in Flax.

Parity target: ``src/utils/arcface.py`` (``get_model('r50')``, used at
``src/dataset/test_preprocess.py:437-453``): 112x112 aligned head crop in
[-1, 1] -> 512-d identity embedding. iResNet block: BN -> 3x3 conv -> BN ->
PReLU -> 3x3 stride conv -> BN, with a 1x1-conv+BN downsample shortcut;
stem is 3x3 stride-1 conv + BN + PReLU; head is BN -> flatten -> Dense(512)
-> BN1d. r50 layout: layers (3, 4, 14, 3), channels (64, 128, 256, 512).

BatchNorms run in inference mode as affine transforms over stored running
stats (params mean/var/scale/bias, filled by the weight converter).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import conv2d, dense


class FrozenBatchNorm(nn.Module):
    """Inference-only BatchNorm: y = scale * (x - mean)/sqrt(var+eps) + bias."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (f,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (f,), jnp.float32)
        inv = scale / jnp.sqrt(var + self.epsilon)
        return x * inv + (bias - mean * inv)


class PReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = FrozenBatchNorm(x.shape[-1], name="bn1")(x)
        out = conv2d(self.planes, use_bias=False, name="conv1")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = PReLU(self.planes, name="prelu")(out)
        out = conv2d(self.planes, stride=(self.stride, self.stride),
                     use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = conv2d(self.planes, kernel=(1, 1), padding=0,
                              stride=(self.stride, self.stride),
                              use_bias=False, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes, name="downsample_bn")(identity)
        return out + identity


class IResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 14, 3)
    embed_dim: int = 512

    @nn.compact
    def __call__(self, x):  # (N, 112, 112, 3) in [-1, 1]
        h = conv2d(64, use_bias=False, name="conv1")(x)
        h = FrozenBatchNorm(64, name="bn1")(h)
        h = PReLU(64, name="prelu")(h)
        planes = 64
        for i, blocks in enumerate(self.layers):
            for j in range(blocks):
                stride = 2 if j == 0 else 1
                h = IBasicBlock(planes, stride=stride,
                                name=f"layer{i + 1}_{j}")(h)
            planes *= 2
        h = FrozenBatchNorm(h.shape[-1], name="bn2")(h)
        h = h.reshape(h.shape[0], -1)
        h = dense(self.embed_dim, name="fc")(h)
        h = FrozenBatchNorm(self.embed_dim, epsilon=1e-5, name="features")(h)
        return h


def iresnet50() -> IResNet:
    return IResNet(layers=(3, 4, 14, 3))


def iresnet100() -> IResNet:
    return IResNet(layers=(3, 13, 30, 3))
