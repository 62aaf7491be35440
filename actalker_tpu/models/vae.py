"""AutoencoderKL with temporal decoder (SVD VAE), TPU-native.

Parity target: diffusers ``AutoencoderKLTemporalDecoder`` as used by the
reference (``Inference.py:41-44``, fp16 variant, ``force_upcast`` honored by
running the VAE in fp32 — pipeline reference 512-515):

  * Encoder: per-frame 2D KL encoder — conv_in(3->128), 4 DownEncoderBlocks
    (128/256/512/512, 2 resnets each, eps 1e-6, asymmetric stride-2 downsample
    pad), single-head-attention mid block, GN/SiLU/conv_out -> 2*4ch moments,
    then quant_conv (1x1, 8->8).
  * TemporalDecoder: conv_in(4->512), MidBlockTemporalDecoder (2 spatio-
    temporal resnets [temporal_eps 1e-5, merge_factor 0, 'learned',
    switch mix] + one single-head spatial attention), 4 UpBlockTemporalDecoder
    (3 resnets + upsample), GN/SiLU/conv_out(->3), then a (3,1,1) conv over
    frames (``time_conv_out``).

Latent scaling factor 0.18215. Layout: (B, F, H, W, C); the encoder flattens
frames; the decoder consumes frame-major video.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.common import GroupNorm32, conv2d, dense
from actalker_tpu.models.resnet import ResnetBlock2D, SpatioTemporalResBlock, Upsample2D
from actalker_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215

    def tiny(self) -> "VAEConfig":
        return dataclasses.replace(self, block_out_channels=(16, 16, 32, 32),
                                   layers_per_block=1)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention with GroupNorm and residual (the SD
    VAE mid-block attention; q/k/v have biases)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        n, h, w, c = x.shape
        residual = x
        y = GroupNorm32(epsilon=1e-6, name="group_norm")(x).reshape(n, h * w, c)
        q = dense(c, dtype=self.dtype, name="to_q")(y)
        k = dense(c, dtype=self.dtype, name="to_k")(y)
        v = dense(c, dtype=self.dtype, name="to_v")(y)
        o = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = dense(c, dtype=self.dtype, name="to_out")(o)
        return o.reshape(n, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, H, W, 3) -> (N, h, w, 2*latent)
        cfg = self.config
        h = conv2d(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=self.dtype,
                                  name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # asymmetric pad (0,1,0,1) then stride-2 valid conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, kernel_size=(3, 3), strides=(2, 2),
                            padding="VALID", dtype=self.dtype,
                            name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=self.dtype,
                          name="mid_resnet_0")(h)
        h = VAEAttention(ch, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=self.dtype,
                          name="mid_resnet_1")(h)
        h = GroupNorm32(epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return conv2d(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(h)


class TemporalDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, image_only_indicator):
        # z: (B, F, h, w, latent) -> (B, F, H, W, 3)
        cfg = self.config
        b, f = z.shape[:2]
        top = cfg.block_out_channels[-1]

        def st_res(ch, name):
            return SpatioTemporalResBlock(
                ch, eps=1e-6, temporal_eps=1e-5, merge_factor=0.0,
                switch_spatial_to_temporal_mix=True, dtype=self.dtype, name=name,
            )

        h = conv2d(top, dtype=self.dtype, name="conv_in")(
            z.reshape(b * f, *z.shape[2:])
        ).reshape(b, f, z.shape[2], z.shape[3], top)

        # mid: resnet, attention, resnet (layers_per_block resnets after attn)
        h = st_res(top, "mid_resnet_0")(h, None, image_only_indicator)
        hs = h.reshape(b * f, *h.shape[2:])
        hs = VAEAttention(top, dtype=self.dtype, name="mid_attn")(hs)
        h = hs.reshape(b, f, *hs.shape[1:])
        for j in range(1, cfg.layers_per_block):
            h = st_res(top, f"mid_resnet_{j}")(h, None, image_only_indicator)

        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = st_res(ch, f"up_{i}_resnet_{j}")(h, None, image_only_indicator)
            if i < len(cfg.block_out_channels) - 1:
                hs = h.reshape(b * f, *h.shape[2:])
                hs = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(hs)
                h = hs.reshape(b, f, *hs.shape[1:])

        # Per-frame statistics (diffusers TemporalDecoder normalizes the
        # (B*F, C, H, W) sample).
        hs = h.reshape(b * f, *h.shape[2:])
        hs = GroupNorm32(epsilon=1e-6, name="conv_norm_out")(hs)
        hs = nn.silu(hs)
        hs = conv2d(3, dtype=self.dtype, name="conv_out")(hs)
        h = hs.reshape(b, f, *hs.shape[1:])
        # temporal smoothing conv over frames
        h = nn.Conv(3, kernel_size=(3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="time_conv_out")(h)
        return h


class AutoencoderKLTemporalDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels,
                                  kernel_size=(1, 1), dtype=self.dtype)

    def encode(self, x):
        """(N, H, W, 3) -> latent mean (N, h, w, latent) (posterior mode)."""
        moments = self.quant_conv(self.encoder(x))
        mean, _ = jnp.split(moments, 2, axis=-1)
        return mean

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z, image_only_indicator=None):
        if image_only_indicator is None:
            image_only_indicator = jnp.zeros(z.shape[:2], self.dtype)
        return self.decoder(z, image_only_indicator)

    def __call__(self, x_frames):
        """Round trip for init/testing: (B, F, H, W, 3) -> same."""
        b, f = x_frames.shape[:2]
        z = self.encode(x_frames.reshape(b * f, *x_frames.shape[2:]))
        z = z.reshape(b, f, *z.shape[1:])
        return self.decode(z)
