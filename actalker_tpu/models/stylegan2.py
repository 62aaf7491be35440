"""StyleGAN2/GPEN generator for blind face restoration (BFR).

Parity target: ``src/utils/enhance/model_enhance.py`` — the reference's
"YT-enhance-512" is a GPEN-style FullGenerator: a conv encoder pyramid whose
per-scale features become the noise inputs of a StyleGAN2 synthesis network
(EqualConv/EqualLinear with lr-mul weight scaling, ModulatedConv2d with
demodulation, FIR blur resampling, NoiseInjection, skip ToRGB). Applied by
``bfr_enhance.test_pipeline`` on a 512x512 aligned face crop and composited
back with a feathered rectangle mask (``test_preprocess.py:286-304``).

TPU notes: the CUDA upfirdn2d / fused_bias_act kernels become the XLA ops in
``ops/upfirdn2d.py``; modulated conv is implemented in grouped form (one conv
per batch via feature groups) which XLA maps onto the MXU.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.ops.upfirdn2d import (
    blur,
    downsample2x,
    fused_leaky_relu,
    upfirdn2d,
    make_kernel,
)


class EqualLinear(nn.Module):
    features: int
    lr_mul: float = 1.0
    use_bias: bool = True
    activation: bool = False
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (in_dim, self.features))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = x @ (w * scale)
        if self.use_bias:
            b = self.param("bias",
                           nn.initializers.constant(self.bias_init),
                           (self.features,))
            if self.activation:
                return fused_leaky_relu(y, b * self.lr_mul)
            y = y + b * self.lr_mul
        return y


class EqualConv2d(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, in_ch, self.features))
        scale = 1.0 / math.sqrt(in_ch * self.kernel**2)
        y = jax.lax.conv_general_dilated(
            x, w * scale, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class ModulatedConv2d(nn.Module):
    features: int
    kernel: int = 3
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        n, h, w_, in_ch = x.shape
        k = self.kernel
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, in_ch, self.features))
        scale = 1.0 / math.sqrt(in_ch * k**2)
        # bias_init=1 lives in the stored parameter (torch bias_init=1),
        # so converted checkpoints carry it — no external +1
        s = EqualLinear(in_ch, bias_init=1.0, name="modulation")(style)
        wmod = weight[None] * scale * s[:, None, None, :, None]  # (N,k,k,in,out)
        if self.demodulate:
            d = jax.lax.rsqrt(jnp.sum(wmod**2, axis=(1, 2, 3)) + 1e-8)
            wmod = wmod * d[:, None, None, None, :]

        if self.upsample:
            # StyleGAN2 padding math for factor-2 transposed conv + blur
            p = (len(self.blur_kernel) - 2) - (k - 1)
            pad0 = (p + 1) // 2 + 1
            pad1 = p // 2 + 1
            # grouped transposed conv: batch -> feature groups. Group g's
            # input channels are [g*in, (g+1)*in) and its output channels
            # [g*out, (g+1)*out) — rhs laid out (k, k, in, N*out).
            xg = x.transpose(1, 2, 0, 3).reshape(1, h, w_, n * in_ch)
            wg = wmod.transpose(1, 2, 3, 0, 4)  # (k,k,in,N,out)
            wg = wg.reshape(k, k, in_ch, n * self.features)
            y = jax.lax.conv_general_dilated(
                xg, jnp.flip(wg, (0, 1)), (1, 1),
                ((k - 1, k - 1), (k - 1, k - 1)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n,
            )
            y = y.reshape(y.shape[1], y.shape[2], n, self.features
                          ).transpose(2, 0, 1, 3)
            y = blur(y, self.blur_kernel, pad=(pad0, pad1),
                     upsample_factor=2)
            return y
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            x = blur(x, self.blur_kernel, pad=((p + 1) // 2, p // 2))
            stride, padding = 2, 0
        else:
            stride, padding = 1, k // 2
        # Exact reformulation: style scales the inputs, demodulation scales
        # the outputs, so one shared-weight conv suffices (no per-sample
        # grouped weights; maps cleanly onto the MXU).
        xs = x * s[:, None, None, :]
        y = jax.lax.conv_general_dilated(
            xs, weight * scale, (stride, stride),
            ((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.demodulate:
            d = jax.lax.rsqrt(
                jnp.sum(
                    (weight[None] * scale * s[:, None, None, :, None]) ** 2,
                    axis=(1, 2, 3),
                ) + 1e-8
            )
            y = y * d[:, None, None, :]
        return y


class NoiseInjection(nn.Module):
    """GPEN noise: the encoder feature map is CONCATENATED onto the channels
    (``isconcat=True``, reference ``model_enhance.py:11-12,289``) — each
    StyledConv output doubles in width (the ``sss=2`` factor)."""

    concat: bool = True

    @nn.compact
    def __call__(self, x, noise=None):
        w = self.param("weight", nn.initializers.zeros, ())
        if noise is None:
            noise = jnp.zeros_like(x)
        if self.concat:
            return jnp.concatenate([x, w * noise], axis=-1)
        return x + w * noise


class StyledConv(nn.Module):
    features: int
    kernel: int = 3
    upsample: bool = False
    concat_noise: bool = True

    @nn.compact
    def __call__(self, x, style, noise=None):
        y = ModulatedConv2d(self.features, self.kernel,
                            upsample=self.upsample, name="conv")(x, style)
        y = NoiseInjection(concat=self.concat_noise, name="noise")(y, noise)
        b = self.param("bias", nn.initializers.zeros, (y.shape[-1],))
        return fused_leaky_relu(y, b)


class ToRGB(nn.Module):
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = ModulatedConv2d(3, kernel=1, demodulate=False, name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros, (3,))
        y = y + b
        if skip is not None:
            from actalker_tpu.ops.upfirdn2d import upsample2x

            skip = upsample2x(skip)
            y = y + skip
        return y


def _channels(size: int, channel_multiplier: int = 2) -> dict:
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
        256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class GPENGenerator(nn.Module):
    """FullGenerator_paper: encoder pyramid -> style vector + per-scale
    features fed as concat-noise -> StyleGAN2 synthesis with skip ToRGB
    (``model_enhance.py``: FullGenerator_paper 778-872, Generator 372-556,
    isconcat/sss 11-12). 512px, loaded from ``enhance-512.pth`` via
    ``io/weights.py::convert_bfr``."""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, x):  # (N, size, size, 3) in [-1, 1]
        ch = _channels(self.size, self.channel_multiplier)
        log_size = int(math.log2(self.size))

        # ----- encoder (ecd0..ecdK): 1x1 stem then blur + stride-2 convs,
        # biases live in the fused leaky-relus; every stage output is kept
        # as the synthesis noise at that scale (forward 860-865)
        feats = []
        h = EqualConv2d(ch[self.size], 1, padding=0, use_bias=False,
                        name="ecd0")(x)
        b0 = self.param("ecd0_bias", nn.initializers.zeros, (ch[self.size],))
        h = fused_leaky_relu(h, b0)
        feats.append(h)
        for i in range(log_size, 2, -1):
            res = 2 ** (i - 1)
            idx = log_size - i + 1
            p = 2 + 2  # (len(blur_kernel) - 2) + (kernel - 1) for k=3
            h = blur(h, pad=((p + 1) // 2, p // 2))
            h = EqualConv2d(ch[res], 3, stride=2, padding=0, use_bias=False,
                            name=f"ecd{idx}")(h)
            b = self.param(f"ecd{idx}_bias", nn.initializers.zeros,
                           (ch[res],))
            h = fused_leaky_relu(h, b)
            feats.append(h)

        # final 4x4 -> z (flatten channel-major like torch .view) -> w
        z = h.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        z = EqualLinear(self.style_dim, activation=True,
                        name="final_linear")(z)
        style = z * jax.lax.rsqrt(jnp.mean(z * z, -1, keepdims=True) + 1e-8)
        for i in range(self.n_mlp):
            style = EqualLinear(self.style_dim, lr_mul=0.01, activation=True,
                                name=f"mlp_{i}")(style)

        # ----- synthesis: 4 -> size; both convs of a block share the
        # encoder feature at that scale (Generator.forward 556-566)
        feats = feats[::-1]
        const = self.param("input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        y = jnp.tile(const, (x.shape[0], 1, 1, 1))
        y = StyledConv(ch[4], name="conv1")(y, style, feats[0])
        rgb = ToRGB(upsample=False, name="to_rgb1")(y, style)
        for i in range(3, log_size + 1):
            res = 2**i
            noise = feats[i - 2]
            y = StyledConv(ch[res], upsample=True,
                           name=f"conv_{i}_up")(y, style, noise)
            y = StyledConv(ch[res], name=f"conv_{i}")(y, style, noise)
            rgb = ToRGB(name=f"to_rgb_{i}")(y, style, rgb)
        return rgb


def feathered_box_mask(size: int = 512, margin: int = 26,
                       sigma: float = 24.0) -> np.ndarray:
    """Feathered compositing mask (the reference builds it with two gaussian
    blurs of a rectangle, ``bfr_enhance.py:18-21``)."""
    m = np.zeros((size, size), np.float32)
    m[margin:size - margin, margin:size - margin] = 1.0
    # separable gaussian blur
    r = int(3 * sigma)
    xs = np.arange(-r, r + 1)
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g /= g.sum()
    m = np.apply_along_axis(lambda v: np.convolve(v, g, mode="same"), 0, m)
    m = np.apply_along_axis(lambda v: np.convolve(v, g, mode="same"), 1, m)
    return m
