"""Torch oracle for diffusers ``AutoencoderKLTemporalDecoder``.

The reference loads this VAE from diffusers (``Inference.py:41-44``) — the
class is not on the reference disk — so the oracle is an independent torch
implementation of the documented diffusers graph, written NCHW with torch
modules while the flax model (``actalker_tpu/models/vae.py``) is NHWC. The
state-dict key names match diffusers exactly, which is what
``convert_vae`` (``io/weights.py:323``) consumes.

Structure:
  encoder: conv_in -> 4x DownEncoderBlock2D (2 resnets + asym-pad stride-2
  downsample) -> mid (resnet, single-head attention, resnet) -> GN/SiLU/
  conv_out(8) ; quant_conv 1x1(8->8)
  decoder (TemporalDecoder): conv_in -> MidBlockTemporalDecoder (spatio-
  temporal resnets ['learned' merge, switch mix, temporal_eps 1e-5] +
  attention) -> 4x UpBlockTemporalDecoder (3 resnets + upsample) -> GN/SiLU/
  conv_out(3) -> time_conv_out Conv3d (3,1,1) over frames.
"""
from __future__ import annotations

import torch
import torch.nn as nn

from tests.torch_shim.shim import (
    Attention,
    Downsample2D,
    ResnetBlock2D,
    SpatioTemporalResBlock,
    Upsample2D,
)


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers=2,
                 add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels,
                          out_channels=out_channels, temb_channels=None,
                          eps=1e-6)
            for i in range(num_layers)])
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_channels, use_conv=True,
                                        out_channels=out_channels,
                                        padding=0, name="op")])
            if add_downsample else None)

    def forward(self, h):
        for resnet in self.resnets:
            h = resnet(h, temb=None)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                h = d(h)
        return h


class UNetMidBlock2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=channels, out_channels=channels,
                          temb_channels=None, eps=1e-6)
            for _ in range(2)])
        self.attentions = nn.ModuleList([
            Attention(channels, heads=1, dim_head=channels,
                      rescale_output_factor=1.0, eps=1e-6,
                      norm_num_groups=32, residual_connection=True,
                      bias=True, upcast_softmax=True)])

    def forward(self, h):
        h = self.resnets[0](h, temb=None)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            h = attn(h)
            h = resnet(h, temb=None)
        return h


class Encoder(nn.Module):
    def __init__(self, in_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 padding=1)
        self.down_blocks = nn.ModuleList()
        ch = block_out_channels[0]
        for i, out_ch in enumerate(block_out_channels):
            self.down_blocks.append(DownEncoderBlock2D(
                ch, out_ch, layers_per_block,
                add_downsample=i < len(block_out_channels) - 1))
            ch = out_ch
        self.mid_block = UNetMidBlock2D(ch)
        self.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(ch, 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for block in self.down_blocks:
            h = block(h)
        h = self.mid_block(h)
        h = self.conv_norm_out(h)
        h = self.conv_act(h)
        return self.conv_out(h)


class MidBlockTemporalDecoder(nn.Module):
    def __init__(self, channels, num_layers=2):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(
                in_channels=channels, out_channels=channels,
                temb_channels=None, eps=1e-6, temporal_eps=1e-5,
                merge_factor=0.0, merge_strategy="learned",
                switch_spatial_to_temporal_mix=True)
            for _ in range(num_layers)])
        self.attentions = nn.ModuleList([
            Attention(channels, heads=1, dim_head=channels, eps=1e-6,
                      norm_num_groups=32, bias=True,
                      residual_connection=True, upcast_softmax=True)])

    def forward(self, h, image_only_indicator):
        h = self.resnets[0](h, temb=None,
                            image_only_indicator=image_only_indicator)
        for resnet, attn in zip(self.resnets[1:], self.attentions):
            h = attn(h)
            h = resnet(h, temb=None,
                       image_only_indicator=image_only_indicator)
        return h


class UpBlockTemporalDecoder(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers=3,
                 add_upsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(
                in_channels=in_channels if i == 0 else out_channels,
                out_channels=out_channels, temb_channels=None, eps=1e-6,
                temporal_eps=1e-5, merge_factor=0.0, merge_strategy="learned",
                switch_spatial_to_temporal_mix=True)
            for i in range(num_layers)])
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_channels, use_conv=True,
                                      out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, h, image_only_indicator):
        for resnet in self.resnets:
            h = resnet(h, temb=None,
                       image_only_indicator=image_only_indicator)
        if self.upsamplers is not None:
            for up in self.upsamplers:
                h = up(h)
        return h


class TemporalDecoder(nn.Module):
    def __init__(self, latent_channels=4, out_channels=3,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2):
        super().__init__()
        self.conv_in = nn.Conv2d(latent_channels, block_out_channels[-1], 3,
                                 padding=1)
        self.mid_block = MidBlockTemporalDecoder(block_out_channels[-1],
                                                 num_layers=layers_per_block)
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(block_out_channels))
        ch = rev[0]
        for i, out_ch in enumerate(rev):
            self.up_blocks.append(UpBlockTemporalDecoder(
                ch, out_ch, layers_per_block + 1,
                add_upsample=i < len(rev) - 1))
            ch = out_ch
        self.conv_norm_out = nn.GroupNorm(32, block_out_channels[0], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                  padding=1)
        self.time_conv_out = nn.Conv3d(out_channels, out_channels,
                                       kernel_size=(3, 1, 1),
                                       padding=(1, 0, 0))

    def forward(self, sample, image_only_indicator):
        num_frames = image_only_indicator.shape[-1]
        h = self.conv_in(sample)
        h = self.mid_block(h, image_only_indicator)
        for block in self.up_blocks:
            h = block(h, image_only_indicator)
        h = self.conv_norm_out(h)
        h = self.conv_act(h)
        h = self.conv_out(h)
        batch_frames, channels, height, width = h.shape
        batch_size = batch_frames // num_frames
        h = h[None, :].reshape(batch_size, num_frames, channels, height,
                               width).permute(0, 2, 1, 3, 4)
        h = self.time_conv_out(h)
        return h.permute(0, 2, 1, 3, 4).reshape(batch_frames, channels,
                                                height, width)


class AutoencoderKLTemporalDecoder(nn.Module):
    def __init__(self, in_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2):
        super().__init__()
        self.encoder = Encoder(in_channels, latent_channels,
                               block_out_channels, layers_per_block)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)
        self.decoder = TemporalDecoder(latent_channels, in_channels,
                                       block_out_channels, layers_per_block)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z, num_frames):
        batch_size = z.shape[0] // num_frames
        image_only_indicator = torch.zeros(batch_size, num_frames,
                                           device=z.device, dtype=z.dtype)
        return self.decoder(z, image_only_indicator)
