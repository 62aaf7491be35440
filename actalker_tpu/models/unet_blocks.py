"""UNet down/mid/up blocks (spatio-temporal SVD layout).

Parity targets (reference ``src/models/base/unet_3d_blocks.py``):
  * ``DownBlockSpatioTemporal`` (2159-2246): resnets (eps 1e-5) + downsample.
  * ``CrossAttnDownBlockSpatioTemporal`` (2249-2376): [resnet (eps 1e-6) +
    transformer] * 2 + downsample, res samples collected after each pair.
  * ``UNetMidBlockSpatioTemporal`` (2047-2156): resnet + [vanilla transformer
    + resnet] (eps 1e-5) — the mid block never uses the mamba variant.
  * ``UpBlockSpatioTemporal`` / ``CrossAttnUpBlockSpatioTemporal``
    (2379-2592): skip-concat on channels + resnet (+ transformer) + upsample.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.resnet import (
    Downsample2D,
    SpatioTemporalResBlock,
    Upsample2D,
)
from actalker_tpu.models.transformer_st import TransformerSpatioTemporal


def _spatial(x, fn):
    b, f, h, w, c = x.shape
    y = fn(x.reshape(b * f, h, w, c))
    return y.reshape(b, f, *y.shape[1:])


class DownBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, image_only_indicator):
        states = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype, name=f"resnet_{i}"
            )(x, temb, image_only_indicator)
            states.append(x)
        if self.add_downsample:
            x = _spatial(x, Downsample2D(self.out_channels, dtype=self.dtype,
                                         name="downsampler"))
            states.append(x)
        return x, states


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    context_dim: int = 1024
    add_downsample: bool = True
    use_mamba: bool = True
    scan_impl: str = "pallas"
    ablate: tuple = ()
    mask_capacity: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, cond: Conditioning, image_only_indicator):
        states = []
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-6, dtype=self.dtype, name=f"resnet_{i}"
            )(x, temb, image_only_indicator)
            x = TransformerSpatioTemporal(
                self.heads, self.out_channels // self.heads,
                context_dim=self.context_dim, num_layers=self.transformer_layers,
                use_mamba=self.use_mamba, scan_impl=self.scan_impl,
                ablate=self.ablate, mask_capacity=self.mask_capacity,
                dtype=self.dtype, name=f"attention_{i}",
            )(x, cond, image_only_indicator)
            states.append(x)
        if self.add_downsample:
            x = _spatial(x, Downsample2D(self.out_channels, dtype=self.dtype,
                                         name="downsampler"))
            states.append(x)
        return x, states


class UNetMidBlockSpatioTemporal(nn.Module):
    channels: int
    heads: int
    transformer_layers: int = 1
    context_dim: int = 1024
    ablate: tuple = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, cond: Conditioning, image_only_indicator):
        x = SpatioTemporalResBlock(
            self.channels, eps=1e-5, dtype=self.dtype, name="resnet_0"
        )(x, temb, image_only_indicator)
        x = TransformerSpatioTemporal(
            self.heads, self.channels // self.heads, context_dim=self.context_dim,
            num_layers=self.transformer_layers, use_mamba=False,
            ablate=self.ablate, dtype=self.dtype, name="attention_0",
        )(x, cond, image_only_indicator)
        x = SpatioTemporalResBlock(
            self.channels, eps=1e-5, dtype=self.dtype, name="resnet_1"
        )(x, temb, image_only_indicator)
        return x


class UpBlockSpatioTemporal(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states, temb, image_only_indicator):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_states.pop()], axis=-1)
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype, name=f"resnet_{i}"
            )(x, temb, image_only_indicator)
        if self.add_upsample:
            x = _spatial(x, Upsample2D(self.out_channels, dtype=self.dtype,
                                       name="upsampler"))
        return x


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    out_channels: int
    heads: int
    num_layers: int = 3
    transformer_layers: int = 1
    context_dim: int = 1024
    add_upsample: bool = True
    use_mamba: bool = True
    scan_impl: str = "pallas"
    ablate: tuple = ()
    mask_capacity: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_states, temb, cond: Conditioning,
                 image_only_indicator):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, res_states.pop()], axis=-1)
            x = SpatioTemporalResBlock(
                self.out_channels, eps=1e-5, dtype=self.dtype, name=f"resnet_{i}"
            )(x, temb, image_only_indicator)
            x = TransformerSpatioTemporal(
                self.heads, self.out_channels // self.heads,
                context_dim=self.context_dim, num_layers=self.transformer_layers,
                use_mamba=self.use_mamba, scan_impl=self.scan_impl,
                ablate=self.ablate, mask_capacity=self.mask_capacity,
                dtype=self.dtype, name=f"attention_{i}",
            )(x, cond, image_only_indicator)
        if self.add_upsample:
            x = _spatial(x, Upsample2D(self.out_channels, dtype=self.dtype,
                                       name="upsampler"))
        return x
