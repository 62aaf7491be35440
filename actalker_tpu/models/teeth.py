"""Teeth-region enhancement network (exact parity with the reference graph).

Parity target: ``src/utils/enhance_teeth/enhance_teeth_pnnx.py`` — a
PNNX-exported (machine-flattened) BatchNorm/ReLU autoencoder applied to a
512x512 mouth crop: conv stem; 6 encoder stages (asymmetric-pad stride-2
downsample + resblock, channels 32-32-64-128-256-512-512, attention at the
bottom stage); res-attn-res mid stacks on both sides of a conv latent;
6 decoder stages (nearest 2x upsample + conv + resblock, attention at the
top); a BN-conv-tanh head emitting RGB + an alpha matte mapped to [0, 1]
(graph: ctor 15-140, forward 384-599). PNNX folded every BatchNorm that
follows a conv into the conv (the ``convbn2d_K`` modules); standalone BNs
remain as eval-mode running-stat normalizations.

This file is the same computation written as a structured NHWC flax model;
``io/weights.py::convert_teeth`` maps the reference TorchScript state dict
onto it (verified against a torch oracle in tests).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.common import conv2d

# encoder stage output channels (reference ctor lines 15-51); stage 0 has no
# downsample; stages 1-5 downsample then widen in the resblock
ENC_CH = (32, 64, 128, 256, 512, 512)
# decoder stage output channels (ctor 83-137); stages 1-5 upsample first
DEC_CH = (512, 512, 256, 128, 64, 32)


class _BNEval(nn.Module):
    """Inference-mode BatchNorm2d: running-stat normalize + affine
    (the exported graph is eval-only; eps 1e-5 per the pnnx export)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class _ResBlock(nn.Module):
    """norm1 -> relu -> conv1(BN-folded) -> relu -> conv2, plus a 1x1
    residual projection when channels change (reference stage pattern,
    e.g. forward v_11..v_17)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = _BNEval(x.shape[-1], name="norm1")(x)
        h = nn.relu(h)
        h = conv2d(self.out_ch, name="conv1")(h)
        h = nn.relu(h)
        h = conv2d(self.out_ch, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = conv2d(self.out_ch, kernel=(1, 1), padding=0,
                       name="residual_func")(x)
        return x + h


class _AttnBlock(nn.Module):
    """Single-head spatial attention with 1x1 projections and a BN norm
    (reference forward v_53..v_70; softmax scale 1/sqrt(C))."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = _BNEval(c, name="norm")(x)
        q = conv2d(c, kernel=(1, 1), padding=0, name="q")(y).reshape(n, h * w, c)
        k = conv2d(c, kernel=(1, 1), padding=0, name="k")(y).reshape(n, h * w, c)
        v = conv2d(c, kernel=(1, 1), padding=0, name="v")(y).reshape(n, h * w, c)
        wts = jax.nn.softmax(
            jnp.einsum("nic,njc->nij", q, k) / jnp.sqrt(jnp.float32(c)), -1)
        o = jnp.einsum("nij,njc->nic", wts, v).reshape(n, h, w, c)
        o = conv2d(c, kernel=(1, 1), padding=0, name="proj_out")(o)
        return x + o


def _bicubic_512(x: jax.Array) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], 512, 512, x.shape[-1]),
                            method="cubic")


class TeethEnhancer(nn.Module):
    """(N, H, W, 3) in [-1, 1] -> (rgb (N, 512, 512, 3) in [-1, 1],
    alpha (N, 512, 512, 1) in [0, 1]) — the reference's output pair
    (forward v_205-v_209). ``resize_input=False`` skips the bicubic 512
    resize (for tests on small inputs)."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        if self.resize_input:
            x = _bicubic_512(x)
        h = conv2d(ENC_CH[0], name="encoder_conv_in")(x)
        for i, ch in enumerate(ENC_CH):
            if i > 0:
                # asymmetric (0,1,0,1) pad + stride-2 VALID conv, channels
                # preserved (forward v_9/v_10 pattern)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = conv2d(h.shape[-1], stride=(2, 2), padding=0,
                           name=f"encoder_down_{i}")(h)
            h = _ResBlock(ch, name=f"encoder_res_{i}")(h)
            if i == len(ENC_CH) - 1:
                h = _AttnBlock(name="encoder_attn")(h)
        h = _ResBlock(512, name="encoder_mid_res1")(h)
        h = _AttnBlock(name="encoder_mid_attn")(h)
        h = _ResBlock(512, name="encoder_mid_res2")(h)
        h = _BNEval(512, name="encoder_out_norm")(h)
        h = nn.relu(h)
        h = conv2d(512, name="encoder_conv_out")(h)

        h = conv2d(512, name="decoder_conv_in")(h)
        h = _ResBlock(512, name="decoder_mid_res1")(h)
        h = _AttnBlock(name="decoder_mid_attn")(h)
        h = _ResBlock(512, name="decoder_mid_res2")(h)
        for i, ch in enumerate(DEC_CH):
            if i > 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = conv2d(h.shape[-1], name=f"decoder_up_{i}")(h)
            h = _ResBlock(ch, name=f"decoder_res_{i}")(h)
            if i == 0:
                h = _AttnBlock(name="decoder_attn")(h)
        h = _BNEval(DEC_CH[-1], name="decoder_out_norm")(h)
        h = jnp.tanh(conv2d(4, name="decoder_conv_out")(h))
        return h[..., :3], (h[..., 3:4] + 1.0) / 2.0
