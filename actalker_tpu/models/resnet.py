"""Resnet blocks for the spatio-temporal UNet and VAE (NHWC, frame-major).

Architecture parity targets (reference vendors these from diffusers):
  * ``ResnetBlock2D`` — GN32/SiLU/conv + time-embedding add + GN/SiLU/conv +
    1x1 shortcut (used per-frame).
  * ``TemporalResnetBlock`` — same shape with (3,1,1) convs over the frame
    axis (``unet_3d_blocks.py`` imports, reference lines 24-31).
  * ``SpatioTemporalResBlock`` — spatial block, then temporal block, blended
    by AlphaBlender (``learned_with_images``).
  * ``Downsample2D`` / ``Upsample2D`` — stride-2 conv and nearest-2x + conv.

Video tensors are (B, F, H, W, C); time embeddings are (B*F, Ct).
"""
from __future__ import annotations

import os as _os
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import GroupNorm32, conv2d, dense
from actalker_tpu.models.embeddings import AlphaBlender

# Spatial resnet GN+SiLU+3x3-conv lowering: "pallas" routes through the
# fused 9-tap GEMM kernel (ops/resconv.py) — XLA's emitter for the C=320
# family runs these convs at ~24-60% MFU (r5 attribution,
# outputs/perf_r05.log); "xla" keeps the stock module lowering.
_RESCONV = _os.environ.get("ACTALKER_RESCONV", "xla")

# Conv emitter isolation: "1" fences every resnet conv with
# optimization_barriers so neither the GN/SiLU prologue (input fusion) nor
# the next norm's statistics (output fusion) fuse into the convolution.
# Motivation (outputs/perf_r05.log A3e): a conv with a fused elementwise
# prologue gets a "batch in sublanes" emitter at 15x the roofline; the
# IDENTICAL conv behind a no-op pad/slice runs at the clean ~99%-MFU
# emitter. Barriers cost one extra HBM pass for the prologue output.
_CONV_ISOLATE = _os.environ.get("ACTALKER_CONV_ISOLATE", "0") == "1"

# Channel padding to 128-lane multiples for the resnet 3x3 convs: the
# C=320-family convs (2.5 lane tiles) draw a ~3x-off-roofline emitter;
# padding cin/cout to 384 in the HLO (weights re-padded per call, output
# sliced) selects the clean emitter in micro A/Bs (outputs/perf_r05.log
# A3e: 6.4 ms vs 101 ms micro, vs ~8.9 ms in-situ fusion).
_CONV_PAD = _os.environ.get("ACTALKER_CONV_PAD", "0") == "1"


def set_resconv_impl(impl: str) -> None:
    global _RESCONV
    assert impl in ("pallas", "xla"), impl
    _RESCONV = impl


def _fence(x):
    if _CONV_ISOLATE:
        import jax

        return jax.lax.optimization_barrier(x)
    return x


def _rup128(c: int) -> int:
    return (c + 127) // 128 * 128


def _conv3x3_padded(h, kernel, bias, dtype):
    """3x3 SAME conv with cin/cout padded to 128-multiples in the HLO."""
    import jax

    c, co = kernel.shape[2], kernel.shape[3]
    cp, cop = _rup128(c), _rup128(co)
    hp = jnp.pad(h, ((0, 0),) * (h.ndim - 1) + ((0, cp - c),))
    wp = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp - c), (0, cop - co)))
    y = jax.lax.conv_general_dilated(
        hp.astype(dtype), wp.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[..., :co] + bias.astype(dtype)


class _NormParams(nn.Module):
    """GroupNorm32's parameters without its lowering (fused-conv path);
    param names/shapes/dtypes identical so checkpoints are interchangeable."""

    channels: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.channels,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.channels,),
                           jnp.float32))


class _ConvParams(nn.Module):
    """nn.Conv's 3x3 parameters without its lowering (fused-conv path)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, self.cin, self.cout), jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.cout,),
                           jnp.float32))


class ResnetBlock2D(nn.Module):
    out_channels: int
    eps: float = 1e-5
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        # x: (N, H, W, C)
        residual = x
        c = x.shape[-1]
        fused = _RESCONV == "pallas"
        if fused:
            from actalker_tpu.ops.resconv import gn_silu_conv3x3

            g1, b1 = _NormParams(c, name="norm1")()
            k1, cb1 = _ConvParams(c, self.out_channels, name="conv1")()
            h = gn_silu_conv3x3(x.astype(self.dtype), g1, b1,
                                min(32, c), self.eps, k1, cb1)
        elif _CONV_PAD and (c % 128 or self.out_channels % 128):
            h = GroupNorm32(epsilon=self.eps, name="norm1")(x)
            k1, cb1 = _ConvParams(c, self.out_channels, name="conv1")()
            h = _conv3x3_padded(nn.silu(h), k1, cb1, self.dtype)
        else:
            h = GroupNorm32(epsilon=self.eps, name="norm1")(x)
            h = _fence(nn.silu(h))
            h = _fence(
                conv2d(self.out_channels, dtype=self.dtype, name="conv1")(h))
        if self.use_temb and temb is not None:
            t = dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        if fused:
            from actalker_tpu.ops.resconv import gn_silu_conv3x3

            g2, b2 = _NormParams(self.out_channels, name="norm2")()
            k2, cb2 = _ConvParams(self.out_channels, self.out_channels,
                                  name="conv2")()
            h = gn_silu_conv3x3(h.astype(self.dtype), g2, b2,
                                min(32, self.out_channels), self.eps, k2, cb2)
        elif _CONV_PAD and self.out_channels % 128:
            h = GroupNorm32(epsilon=self.eps, name="norm2")(h)
            k2, cb2 = _ConvParams(self.out_channels, self.out_channels,
                                  name="conv2")()
            h = _conv3x3_padded(nn.silu(h), k2, cb2, self.dtype)
        else:
            h = GroupNorm32(epsilon=self.eps, name="norm2")(h)
            h = _fence(nn.silu(h))
            h = _fence(
                conv2d(self.out_channels, dtype=self.dtype, name="conv2")(h))
        if residual.shape[-1] != self.out_channels:
            residual = conv2d(
                self.out_channels, kernel=(1, 1), padding=0, dtype=self.dtype,
                name="conv_shortcut",
            )(residual)
        return h + residual


class TemporalResnetBlock(nn.Module):
    out_channels: int
    eps: float = 1e-6
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        # x: (B, F, H, W, C); conv over frames with kernel (3,1,1)
        residual = x
        h = GroupNorm32(epsilon=self.eps, name="norm1")(x)
        h = _fence(nn.silu(h))
        h = _fence(nn.Conv(
            self.out_channels, kernel_size=(3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)), dtype=self.dtype, name="conv1",
        )(h))
        if self.use_temb and temb is not None:
            # temb: (B, F, Ct)
            t = dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, :, None, None, :]
        h = GroupNorm32(epsilon=self.eps, name="norm2")(h)
        h = _fence(nn.silu(h))
        h = _fence(nn.Conv(
            self.out_channels, kernel_size=(3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)), dtype=self.dtype, name="conv2",
        )(h))
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, kernel_size=(1, 1, 1), dtype=self.dtype,
                name="conv_shortcut",
            )(residual)
        return h + residual


class SpatioTemporalResBlock(nn.Module):
    out_channels: int
    eps: float = 1e-5
    temporal_eps: Optional[float] = None
    merge_factor: float = 0.5
    switch_spatial_to_temporal_mix: bool = False  # True only in the VAE decoder
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, image_only_indicator):
        # x: (B, F, H, W, C); temb: (B*F, Ct) or None
        b, f, hh, ww, c = x.shape
        xs = x.reshape(b * f, hh, ww, c)
        xs = ResnetBlock2D(
            self.out_channels, eps=self.eps, dtype=self.dtype,
            name="spatial_res_block",
        )(xs, temb)
        x_spatial = xs.reshape(b, f, hh, ww, self.out_channels)
        temb_t = temb.reshape(b, f, -1) if temb is not None else None
        x_temporal = TemporalResnetBlock(
            self.out_channels,
            eps=self.temporal_eps if self.temporal_eps is not None else self.eps,
            dtype=self.dtype, name="temporal_res_block",
        )(x_spatial, temb_t)
        mixed = AlphaBlender(
            alpha_init=self.merge_factor,
            switch_spatial_to_temporal_mix=self.switch_spatial_to_temporal_mix,
            name="time_mixer",
        )(x_spatial, x_temporal, image_only_indicator)
        return mixed


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv2d(self.out_channels, stride=(2, 2), dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv2d(self.out_channels, dtype=self.dtype, name="conv")(x)
