"""Teeth-region enhancement network.

Parity target: ``src/utils/enhance_teeth/enhance_teeth_pnnx.py`` — a
PNNX-exported (machine-flattened) UNet encoder/decoder with qkv attention
mid-blocks, applied to the mouth crop as a post-process. The reference file
is a generated flat conv graph; this is the same architecture written as a
normal model: conv stem, strided encoder stages with GroupNorm/SiLU resblocks,
a single-head qkv attention bottleneck, and a skip-connected decoder with
nearest-upsample + conv, ending in a residual RGB delta.

Weights for the reference's ``yt_teeth`` checkpoint can be mapped onto this
module once available; without them the module runs (identity-ish at init:
the final conv is zero-initialized so the enhancement starts as a no-op).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.common import GroupNorm32, conv2d
from actalker_tpu.ops.attention import dot_product_attention


class _ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(name="norm1")(x)
        h = nn.silu(h)
        h = conv2d(self.features, name="conv1")(h)
        h = GroupNorm32(name="norm2")(h)
        h = nn.silu(h)
        h = conv2d(self.features, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = conv2d(self.features, kernel=(1, 1), padding=0,
                       name="skip")(x)
        return x + h


class _AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = GroupNorm32(name="norm")(x).reshape(n, h * w, c)
        q = conv2d(c, kernel=(1, 1), padding=0, name="q")(
            y.reshape(n, h, w, c)).reshape(n, h * w, 1, c)
        k = conv2d(c, kernel=(1, 1), padding=0, name="k")(
            y.reshape(n, h, w, c)).reshape(n, h * w, 1, c)
        v = conv2d(c, kernel=(1, 1), padding=0, name="v")(
            y.reshape(n, h, w, c)).reshape(n, h * w, 1, c)
        o = dot_product_attention(q, k, v).reshape(n, h, w, c)
        o = conv2d(c, kernel=(1, 1), padding=0, name="proj_out")(o)
        return x + o


class TeethEnhancer(nn.Module):
    """Mouth-crop enhancer: (N, H, W, 3) in [-1, 1] -> enhanced same-shape."""

    base: int = 64
    channel_mults: Sequence[int] = (1, 2, 4)

    @nn.compact
    def __call__(self, x):
        skips = []
        h = conv2d(self.base, name="conv_in")(x)
        for i, m in enumerate(self.channel_mults):
            h = _ResBlock(self.base * m, name=f"down_{i}_res")(h)
            skips.append(h)
            if i < len(self.channel_mults) - 1:
                h = conv2d(self.base * self.channel_mults[i + 1],
                           stride=(2, 2), name=f"down_{i}_conv")(h)
        h = _ResBlock(h.shape[-1], name="mid_res1")(h)
        h = _AttnBlock(name="mid_attn")(h)
        h = _ResBlock(h.shape[-1], name="mid_res2")(h)
        for i, m in reversed(list(enumerate(self.channel_mults))):
            if i < len(self.channel_mults) - 1:
                n, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = conv2d(self.base * m, name=f"up_{i}_conv")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = _ResBlock(self.base * m, name=f"up_{i}_res")(h)
        h = GroupNorm32(name="norm_out")(h)
        h = nn.silu(h)
        delta = nn.Conv(3, kernel_size=(3, 3), padding=1,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="conv_out")(h)
        return jnp.clip(x + delta, -1.0, 1.0)
