"""SENet-50 face embedder (VGGFace2) for identity evaluation.

Parity target: the reference's face-ID evaluation embeds face crops with a
VGGFace2-pretrained SENet-50 (``eval/evaluation_faceid.py:18`` imports
``modules.model.senet`` — a package absent from the reference repo — and
``:33-55`` loads the Caffe-converted VGGFace2 pickle into it; cosine
similarity over its 2048-d pool5 features is the reported face-ID score).

This is the standard SE-ResNet-50 graph (Hu et al., arXiv:1709.01507) in the
layout used by the released VGGFace2 weights: conv7x7/2 + BN + relu +
maxpool3/2, stages [3, 4, 6, 3] of SEBottleneck (1x1 -> 3x3 -> 1x1 with a
squeeze-excite gate, reduction 16), global average pool -> 2048-d embedding
(the 8631-way classifier head is kept for converter completeness but the
embedding is the evaluation feature). Inference preprocessing matches the
VGGFace2 recipe: 224x224 BGR-mean-subtracted crops.

NHWC, fp32 (offline evaluation path; not in the generation hot loop).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models.arcface import FrozenBatchNorm
from actalker_tpu.models.common import conv2d, dense

# RGB means of the VGGFace2 training recipe (the Caffe models subtract these
# per channel on 224x224 crops).
VGGFACE2_MEAN_RGB = (131.0912, 103.8827, 91.4953)


class SEBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = conv2d(self.planes, kernel=(1, 1), padding=0, use_bias=False,
                   name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(h))
        h = conv2d(self.planes, stride=(self.stride, self.stride),
                   use_bias=False, name="conv2")(h)
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(h))
        h = conv2d(out_ch, kernel=(1, 1), padding=0, use_bias=False,
                   name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        # squeeze-excite: global pool -> fc1 -> relu -> fc2 -> sigmoid gate.
        # The released weights keep fc1/fc2 as 1x1 convs with bias.
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.relu(conv2d(out_ch // self.reduction, kernel=(1, 1), padding=0,
                           name="se_fc1")(s))
        s = nn.sigmoid(conv2d(out_ch, kernel=(1, 1), padding=0,
                              name="se_fc2")(s))
        h = h * s
        residual = x
        if self.downsample:
            residual = conv2d(out_ch, kernel=(1, 1), padding=0,
                              stride=(self.stride, self.stride),
                              use_bias=False, name="downsample_conv")(x)
            residual = FrozenBatchNorm(out_ch, name="downsample_bn")(residual)
        return nn.relu(h + residual)


class SENet50(nn.Module):
    """224x224 RGB [0, 255] mean-subtracted input -> 2048-d embedding
    (``include_top=True`` additionally returns the 8631-way logits)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 8631
    include_top: bool = False

    @nn.compact
    def __call__(self, x):
        h = conv2d(64, kernel=(7, 7), stride=(2, 2), padding=3,
                   use_bias=False, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(64, name="bn1")(h))
        h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)),
                    constant_values=-np.inf)  # caffe-style ceil_mode pool
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        planes = 64
        for i, blocks in enumerate(self.layers):
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                h = SEBottleneck(planes, stride=stride, downsample=(j == 0),
                                 name=f"layer{i + 1}_{j}")(h)
            planes *= 2
        feat = jnp.mean(h, axis=(1, 2))                       # (N, 2048)
        if self.include_top:
            return feat, dense(self.num_classes, name="fc")(feat)
        return feat


def preprocess_vggface2(images: np.ndarray) -> np.ndarray:
    """(N, 224, 224, 3) uint8/float RGB -> mean-subtracted fp32."""
    x = np.asarray(images, np.float32)
    return x - np.asarray(VGGFACE2_MEAN_RGB, np.float32)
