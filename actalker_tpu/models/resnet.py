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

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import GroupNorm32, conv2d, dense
from actalker_tpu.models.embeddings import AlphaBlender


class ResnetBlock2D(nn.Module):
    out_channels: int
    eps: float = 1e-5
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        # x: (N, H, W, C)
        residual = x
        h = GroupNorm32(epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = conv2d(self.out_channels, dtype=self.dtype, name="conv1")(h)
        if self.use_temb and temb is not None:
            t = dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm32(epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = conv2d(self.out_channels, dtype=self.dtype, name="conv2")(h)
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
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, kernel_size=(3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)), dtype=self.dtype, name="conv1",
        )(h)
        if self.use_temb and temb is not None:
            # temb: (B, F, Ct)
            t = dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, :, None, None, :]
        h = GroupNorm32(epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, kernel_size=(3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)), dtype=self.dtype, name="conv2",
        )(h)
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
