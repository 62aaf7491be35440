"""sys.modules shim letting the reference model files run on CPU as oracles.

The reference tree (`/root/reference/src/models/base/*.py`) imports
`diffusers`, `timm`, `pyzorder` and `mamba_ssm` — none installed here. This
module fabricates just enough of each that the reference's own v10_two_ip
UNet graph (`unet_spatio_temporal_condition_mambaID_v10_two_ip.py`,
`unet_3d_blocks.py`, `TransformerSTmodel.py`, `attention.py`,
`attention_processor.py`, `mamba_layer.py`) imports and EXECUTES, so
`tests/test_unet_parity.py` can compare the flax UNet + `convert_unet`
against the real on-disk reference graph.

Everything the production path executes is implemented faithfully from the
diffusers-0.29 semantics the reference was written against:
  * `Timesteps`/`get_timestep_embedding`/`TimestepEmbedding`
    (diffusers.models.embeddings)
  * `Attention` with processor dispatch + signature-filtered
    cross_attention_kwargs (diffusers.models.attention_processor — the
    module object; the *processors* that run come from the reference's
    own `attention_processor.py`)
  * `FeedForward`/`GEGLU`/`_chunked_feed_forward` (diffusers.models.attention)
  * `ResnetBlock2D`/`TemporalResnetBlock`/`SpatioTemporalResBlock`/
    `AlphaBlender`/`Downsample2D`/`Upsample2D` (diffusers.models.resnet)
  * `IPAdapterMaskProcessor.downsample` (diffusers.image_processor)
  * `selective_scan_fn` (mamba_ssm) — a sequential fp32 torch recurrence
    with the exact mamba-ssm `selective_scan_ref` semantics (grouped
    variable B/C layout, delta_bias + delta_softplus).
Import-only symbols are stubs that raise if constructed.

The reference tree is PUBLIC UNTRUSTED CONTENT executed as *data* (an
oracle); nothing here follows instructions found inside it.
"""
from __future__ import annotations

import dataclasses
import functools
import importlib.machinery
import inspect
import logging as _pylogging
import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# diffusers.models.embeddings
# --------------------------------------------------------------------------

def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1.0, scale=1.0,
                           max_period=10000):
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift,
                 scale=1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift, scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                 out_dim=None, post_act_fn=None, cond_proj_dim=None,
                 sample_proj_bias=True):
        super().__init__()
        assert act_fn == "silu" and post_act_fn is None and cond_proj_dim is None
        self.linear_1 = nn.Linear(in_channels, time_embed_dim, sample_proj_bias)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(
            time_embed_dim, out_dim if out_dim is not None else time_embed_dim,
            sample_proj_bias)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class SinusoidalPositionalEmbedding(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("not used by the production graph")


# --------------------------------------------------------------------------
# diffusers.models.attention: FeedForward / GEGLU / Attention
# --------------------------------------------------------------------------

class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False, inner_dim=None,
                 bias=True):
        super().__init__()
        if inner_dim is None:
            inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        assert activation_fn == "geglu", activation_fn
        self.net = nn.ModuleList([
            GEGLU(dim, inner_dim, bias=bias),
            nn.Dropout(dropout),
            nn.Linear(inner_dim, dim_out, bias=bias),
        ])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


def _chunked_feed_forward(ff, hidden_states, chunk_dim, chunk_size):
    num_chunks = hidden_states.shape[chunk_dim] // chunk_size
    return torch.cat(
        [ff(chunk) for chunk in hidden_states.chunk(num_chunks, dim=chunk_dim)],
        dim=chunk_dim)


class _DefaultAttnProcessor:
    """diffusers AttnProcessor2_0 semantics (SDPA). Runs only where the
    reference's add_ip_adapters did NOT replace the processor — i.e. inside
    shim-built oracles like the VAE, and Attention defaults."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None, *args, **kwargs):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            batch_size, channel, height, width = hidden_states.shape
            hidden_states = hidden_states.view(
                batch_size, channel, height * width).transpose(1, 2)
        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        if attention_mask is not None:
            attention_mask = attn.prepare_attention_mask(
                attention_mask, sequence_length, batch_size)
            attention_mask = attention_mask.view(
                batch_size, attn.heads, -1, attention_mask.shape[-1])
        if attn.group_norm is not None:
            hidden_states = attn.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False)
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim).to(query.dtype)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(
                batch_size, channel, height, width)
        if attn.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / attn.rescale_output_factor


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention — the attribute surface
    the reference's AttnProcessor2_0 / IPAdapterAttnProcessor2_0 touch, plus
    forward() processor dispatch with signature-filtered kwargs."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, upcast_attention=False,
                 upcast_softmax=False, cross_attention_norm=None,
                 cross_attention_norm_num_groups=32, qk_norm=None,
                 added_kv_proj_dim=None, norm_num_groups=None,
                 spatial_norm_dim=None, out_bias=True, scale_qk=True,
                 only_cross_attention=False, eps=1e-5,
                 rescale_output_factor=1.0, residual_connection=False,
                 _from_deprecated_attn_block=False, processor=None,
                 out_dim=None):
        super().__init__()
        assert cross_attention_norm is None and added_kv_proj_dim is None
        assert spatial_norm_dim is None and qk_norm is None
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = (
            cross_attention_dim if cross_attention_dim is not None else query_dim)
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.dropout = dropout
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.scale_qk = scale_qk
        self.scale = dim_head ** -0.5 if scale_qk else 1.0
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.only_cross_attention = only_cross_attention
        self.group_norm = (
            nn.GroupNorm(num_channels=query_dim, num_groups=norm_num_groups,
                         eps=eps, affine=True)
            if norm_num_groups is not None else None)
        self.spatial_norm = None
        self.norm_cross = None
        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList([
            nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
            nn.Dropout(dropout),
        ])
        self.set_processor(processor if processor is not None
                           else _DefaultAttnProcessor())

    def set_processor(self, processor):
        if (hasattr(self, "processor")
                and isinstance(self.processor, nn.Module)
                and not isinstance(processor, nn.Module)):
            self._modules.pop("processor")
        self.processor = processor

    def get_processor(self, *a, **k):
        return self.processor

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim=3):
        head_size = self.heads
        if attention_mask is None:
            return attention_mask
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(
                attention_mask, (0, target_length - current_length), value=0.0)
        if out_dim == 3:
            if attention_mask.shape[0] < batch_size * head_size:
                attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        elif out_dim == 4:
            attention_mask = attention_mask.unsqueeze(1)
            attention_mask = attention_mask.repeat_interleave(head_size, dim=1)
        return attention_mask

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        attn_parameters = set(
            inspect.signature(self.processor.__call__).parameters.keys())
        cross_attention_kwargs = {
            k: w for k, w in cross_attention_kwargs.items()
            if k in attn_parameters}
        return self.processor(
            self, hidden_states,
            encoder_hidden_states=encoder_hidden_states,
            attention_mask=attention_mask, **cross_attention_kwargs)


# --------------------------------------------------------------------------
# diffusers.models.resnet
# --------------------------------------------------------------------------

class ResnetBlock2D(nn.Module):
    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="swish",
                 skip_time_act=False, time_embedding_norm="default",
                 output_scale_factor=1.0, use_in_shortcut=None, up=False,
                 down=False, conv_shortcut_bias=True, conv_2d_out_channels=None):
        super().__init__()
        assert time_embedding_norm == "default" and not up and not down
        out_channels = in_channels if out_channels is None else out_channels
        self.norm1 = nn.GroupNorm(num_groups=groups, num_channels=in_channels,
                                  eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, stride=1, padding=1)
        self.time_emb_proj = (nn.Linear(temb_channels, out_channels)
                              if temb_channels is not None else None)
        self.norm2 = nn.GroupNorm(num_groups=groups_out or groups,
                                  num_channels=out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        conv_2d_out_channels = conv_2d_out_channels or out_channels
        self.conv2 = nn.Conv2d(out_channels, conv_2d_out_channels, 3,
                               stride=1, padding=1)
        self.nonlinearity = nn.SiLU()
        self.output_scale_factor = output_scale_factor
        self.use_in_shortcut = (in_channels != conv_2d_out_channels
                                if use_in_shortcut is None else use_in_shortcut)
        self.conv_shortcut = (
            nn.Conv2d(in_channels, conv_2d_out_channels, 1, stride=1,
                      padding=0, bias=conv_shortcut_bias)
            if self.use_in_shortcut else None)

    def forward(self, input_tensor, temb, *args, **kwargs):
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None and temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + hidden_states) / self.output_scale_factor


class TemporalResnetBlock(nn.Module):
    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        kernel_size = (3, 1, 1)
        padding = [k // 2 for k in kernel_size]
        self.norm1 = nn.GroupNorm(num_groups=32, num_channels=in_channels,
                                  eps=eps, affine=True)
        self.conv1 = nn.Conv3d(in_channels, out_channels, kernel_size,
                               stride=1, padding=padding)
        self.time_emb_proj = (nn.Linear(temb_channels, out_channels)
                              if temb_channels is not None else None)
        self.norm2 = nn.GroupNorm(num_groups=32, num_channels=out_channels,
                                  eps=eps, affine=True)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv3d(out_channels, out_channels, kernel_size,
                               stride=1, padding=padding)
        self.nonlinearity = nn.SiLU()
        self.use_in_shortcut = in_channels != out_channels
        self.conv_shortcut = (
            nn.Conv3d(in_channels, out_channels, 1, stride=1, padding=0)
            if self.use_in_shortcut else None)

    def forward(self, input_tensor, temb):
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None and temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))
            temb = temb[:, :, :, None, None].permute(0, 2, 1, 3, 4)
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return input_tensor + hidden_states


class AlphaBlender(nn.Module):
    def __init__(self, alpha, merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        self.merge_strategy = merge_strategy
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix
        if merge_strategy == "fixed":
            self.register_buffer("mix_factor", torch.Tensor([alpha]))
        elif merge_strategy in ("learned", "learned_with_images"):
            self.register_parameter("mix_factor",
                                    nn.Parameter(torch.Tensor([alpha])))
        else:
            raise ValueError(merge_strategy)

    def get_alpha(self, image_only_indicator, ndims):
        if self.merge_strategy == "fixed":
            return self.mix_factor
        if self.merge_strategy == "learned":
            return torch.sigmoid(self.mix_factor)
        alpha = torch.where(
            image_only_indicator.bool(),
            torch.ones(1, 1, device=image_only_indicator.device),
            torch.sigmoid(self.mix_factor)[..., None])
        if ndims == 5:
            alpha = alpha[:, None, :, None, None]
        elif ndims == 3:
            alpha = alpha.reshape(-1)[:, None, None]
        else:
            raise ValueError(ndims)
        return alpha

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        alpha = alpha.to(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, temporal_eps=None, merge_factor=0.5,
                 merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.spatial_res_block = ResnetBlock2D(
            in_channels=in_channels, out_channels=out_channels,
            temb_channels=temb_channels, eps=eps)
        self.temporal_res_block = TemporalResnetBlock(
            out_channels, out_channels, temb_channels=temb_channels,
            eps=temporal_eps if temporal_eps is not None else eps)
        self.time_mixer = AlphaBlender(
            alpha=merge_factor, merge_strategy=merge_strategy,
            switch_spatial_to_temporal_mix=switch_spatial_to_temporal_mix)

    def forward(self, hidden_states, temb=None, image_only_indicator=None):
        num_frames = image_only_indicator.shape[-1]
        hidden_states = self.spatial_res_block(hidden_states, temb)
        batch_frames, channels, height, width = hidden_states.shape
        batch_size = batch_frames // num_frames
        hidden_states_mix = hidden_states[None, :].reshape(
            batch_size, num_frames, channels, height, width
        ).permute(0, 2, 1, 3, 4)
        hidden_states = hidden_states[None, :].reshape(
            batch_size, num_frames, channels, height, width
        ).permute(0, 2, 1, 3, 4)
        if temb is not None:
            temb = temb.reshape(batch_size, num_frames, -1)
        hidden_states = self.temporal_res_block(hidden_states, temb)
        hidden_states = self.time_mixer(
            x_spatial=hidden_states_mix, x_temporal=hidden_states,
            image_only_indicator=image_only_indicator)
        return hidden_states.permute(0, 2, 1, 3, 4).reshape(
            batch_frames, channels, height, width)


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None, padding=1,
                 name="conv", kernel_size=3, bias=True, **kwargs):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        self.padding = padding
        if use_conv:
            self.conv = nn.Conv2d(self.channels, self.out_channels,
                                  kernel_size=kernel_size, stride=2,
                                  padding=padding, bias=bias)
        else:
            self.conv = nn.AvgPool2d(kernel_size=2, stride=2)

    def forward(self, hidden_states, *args, **kwargs):
        if self.use_conv and self.padding == 0:
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1),
                                  mode="constant", value=0)
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv", kernel_size=None, padding=1,
                 bias=True, interpolate=True, **kwargs):
        super().__init__()
        assert not use_conv_transpose and interpolate
        self.channels = channels
        self.out_channels = out_channels or channels
        self.conv = nn.Conv2d(self.channels, self.out_channels,
                              kernel_size=kernel_size or 3, padding=padding,
                              bias=bias)

    def forward(self, hidden_states, output_size=None, *args, **kwargs):
        hidden_states = F.interpolate(hidden_states, scale_factor=2.0,
                                      mode="nearest")
        return self.conv(hidden_states)


class TemporalConvLayer(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("not used by the production graph")


# --------------------------------------------------------------------------
# diffusers.image_processor.IPAdapterMaskProcessor
# --------------------------------------------------------------------------

class IPAdapterMaskProcessor:
    @staticmethod
    def downsample(mask, batch_size, num_queries, value_embed_dim):
        o_h, o_w = mask.shape[1], mask.shape[2]
        ratio = o_w / o_h
        mask_h = int(math.sqrt(num_queries / ratio))
        mask_h = int(mask_h) + int((num_queries % int(mask_h)) != 0)
        mask_w = num_queries // mask_h
        mask_downsample = F.interpolate(
            mask.unsqueeze(0), size=(mask_h, mask_w), mode="bicubic"
        ).squeeze(0)
        if mask_downsample.shape[0] < batch_size:
            mask_downsample = mask_downsample.repeat(batch_size, 1, 1)
        mask_downsample = mask_downsample.view(mask_downsample.shape[0], -1)
        downsampled_area = mask_h * mask_w
        if downsampled_area < num_queries:
            mask_downsample = F.pad(
                mask_downsample, (0, num_queries - mask_downsample.shape[1]),
                value=0.0)
        if downsampled_area > num_queries:
            mask_downsample = mask_downsample[:, :num_queries]
        return mask_downsample.view(
            mask_downsample.shape[0], mask_downsample.shape[1], 1
        ).repeat(1, 1, value_embed_dim)


# --------------------------------------------------------------------------
# diffusers config / model mixins and utils
# --------------------------------------------------------------------------

class _FrozenConfig(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


class ConfigMixin:
    @property
    def config(self):
        return _FrozenConfig(getattr(self, "_shim_config", {}))


def register_to_config(init):
    @functools.wraps(init)
    def inner(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        init(self, *args, **kwargs)
        self._shim_config = cfg
    return inner


class ModelMixin(nn.Module):
    @property
    def device(self):
        return next(self.parameters()).device

    @property
    def dtype(self):
        return next(self.parameters()).dtype


class BaseOutput:
    pass


class _Logging:
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers_shim")


def deprecate(*args, **kwargs):
    return None


def is_torch_version(operation, version):
    return operation in (">=", ">")


def apply_freeu(*a, **k):
    raise NotImplementedError("freeu is not used by the production graph")


def maybe_allow_in_graph(cls):
    return cls


def is_torch_npu_available():
    return False


def is_xformers_available():
    return False


class _RaisingStub:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            f"{type(self).__name__} is an import-only shim stub")


class AdaLayerNorm(_RaisingStub):
    pass


class AdaLayerNormZero(_RaisingStub):
    pass


class AdaLayerNormContinuous(_RaisingStub):
    pass


class GatedSelfAttentionDense(_RaisingStub):
    pass


class LoRALinearLayer(_RaisingStub):
    pass


class DualTransformer2DModel(_RaisingStub):
    pass


class Transformer2DModel(_RaisingStub):
    pass


class TransformerTemporalModel(_RaisingStub):
    pass


@dataclasses.dataclass
class TransformerTemporalModelOutput:
    sample: torch.Tensor = None


class UNet2DConditionLoadersMixin:
    pass


# --------------------------------------------------------------------------
# timm / pyzorder stubs
# --------------------------------------------------------------------------

class Bottleneck(_RaisingStub):
    pass


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x  # eval-mode identity


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


class ZOrderIndexer:
    """pyzorder stand-in; only the 'zorder' scan path (unused in the
    production 'sweep' config) would call its methods."""

    def __init__(self, rng_i, rng_j):
        self._rng_i, self._rng_j = rng_i, rng_j

    def __getattr__(self, name):
        raise NotImplementedError("zorder scan is not exercised by tests")


# --------------------------------------------------------------------------
# mamba_ssm.ops.selective_scan_interface — faithful sequential reference
# --------------------------------------------------------------------------

def selective_scan_fn(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                      delta_softplus=False, return_last_state=False):
    """Exact `selective_scan_ref` semantics of mamba-ssm 1.2 (the kernel the
    reference calls at `mamba_layer.py:1532-1538`): fp32 state recurrence
    h_t = exp(dt*A) h_{t-1} + dt*B_t*u_t, y_t = C_t·h_t + D*u_t, with the
    grouped variable-B/C layout (B, G, N, L)."""
    dtype_in = u.dtype
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias[..., None].float()
    if delta_softplus:
        delta = F.softplus(delta)
    batch, dim, L = u.shape
    A = A.float()
    B = B.float()
    C = C.float()
    if B.dim() == 4:
        B = B.repeat_interleave(dim // B.shape[1], dim=1)  # (B, D, N, L)
    if C.dim() == 4:
        C = C.repeat_interleave(dim // C.shape[1], dim=1)
    deltaA = torch.exp(torch.einsum("bdl,dn->bdln", delta, A))
    deltaB_u = torch.einsum("bdl,bdnl,bdl->bdln", delta, B, u)
    x = u.new_zeros((batch, dim, A.shape[1]))
    ys = []
    for i in range(L):
        x = deltaA[:, :, i] * x + deltaB_u[:, :, i]
        ys.append(torch.einsum("bdn,bdn->bd", x, C[:, :, :, i]))
    y = torch.stack(ys, dim=2)  # (B, D, L)
    out = y if D is None else y + u * D.float()[None, :, None]
    if z is not None:
        out = out * F.silu(z.float())
    out = out.to(dtype=dtype_in)
    return (out, x) if return_last_state else out


# --------------------------------------------------------------------------
# installer
# --------------------------------------------------------------------------

def _module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec so later importlib.util.find_spec(name) calls
        # (e.g. transformers' is_timm_available probe) don't blow up on
        # __spec__ is None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install():
    """Register the fake diffusers/timm/pyzorder/mamba_ssm modules. Idempotent.
    Must run BEFORE importing anything from /root/reference/src."""
    if "diffusers" in sys.modules and getattr(
            sys.modules["diffusers"], "_actalker_shim", False):
        return

    d = _module("diffusers", _actalker_shim=True, __version__="0.29.0")
    _module("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
            register_to_config=register_to_config)
    _module("diffusers.loaders",
            UNet2DConditionLoadersMixin=UNet2DConditionLoadersMixin)
    utils = _module("diffusers.utils", BaseOutput=BaseOutput,
                    logging=_Logging(), deprecate=deprecate,
                    is_torch_version=is_torch_version)
    _module("diffusers.utils.torch_utils", apply_freeu=apply_freeu,
            maybe_allow_in_graph=maybe_allow_in_graph)
    _module("diffusers.utils.import_utils",
            is_torch_npu_available=is_torch_npu_available,
            is_xformers_available=is_xformers_available)
    utils.torch_utils = sys.modules["diffusers.utils.torch_utils"]
    utils.import_utils = sys.modules["diffusers.utils.import_utils"]
    models = _module("diffusers.models")
    _module("diffusers.models.embeddings", TimestepEmbedding=TimestepEmbedding,
            Timesteps=Timesteps, get_timestep_embedding=get_timestep_embedding,
            SinusoidalPositionalEmbedding=SinusoidalPositionalEmbedding)
    _module("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    _module("diffusers.models.attention", Attention=Attention,
            FeedForward=FeedForward, GEGLU=GEGLU,
            BasicTransformerBlock=_RaisingStub,
            TemporalBasicTransformerBlock=_RaisingStub,
            AdaLayerNorm=AdaLayerNorm, AdaLayerNormZero=AdaLayerNormZero,
            AdaLayerNormContinuous=AdaLayerNormContinuous,
            GatedSelfAttentionDense=GatedSelfAttentionDense,
            _chunked_feed_forward=_chunked_feed_forward)
    _module("diffusers.models.resnet", Downsample2D=Downsample2D,
            ResnetBlock2D=ResnetBlock2D,
            SpatioTemporalResBlock=SpatioTemporalResBlock,
            TemporalResnetBlock=TemporalResnetBlock,
            TemporalConvLayer=TemporalConvLayer, Upsample2D=Upsample2D,
            AlphaBlender=AlphaBlender)
    _module("diffusers.models.lora", LoRALinearLayer=LoRALinearLayer)
    _module("diffusers.models.transformers")
    _module("diffusers.models.transformers.dual_transformer_2d",
            DualTransformer2DModel=DualTransformer2DModel)
    _module("diffusers.models.transformers.transformer_2d",
            Transformer2DModel=Transformer2DModel)
    _module("diffusers.models.transformers.transformer_temporal",
            TransformerTemporalModel=TransformerTemporalModel,
            TransformerTemporalModelOutput=TransformerTemporalModelOutput)
    _module("diffusers.image_processor",
            IPAdapterMaskProcessor=IPAdapterMaskProcessor)
    d.models = models
    d.utils = utils

    _module("timm")
    _module("timm.models")
    _module("timm.models.resnet", Bottleneck=Bottleneck)
    _module("timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple,
            trunc_normal_=torch.nn.init.trunc_normal_)
    _module("pyzorder", ZOrderIndexer=ZOrderIndexer)

    _module("mamba_ssm")
    _module("mamba_ssm.ops")
    _module("mamba_ssm.ops.selective_scan_interface",
            selective_scan_fn=selective_scan_fn,
            selective_scan_ref=selective_scan_fn)


def load_reference_module(dotted):
    """Import e.g. 'src.models.base.unet_spatio_temporal_condition_mambaID_v10_two_ip'
    from /root/reference with the shim installed."""
    install()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib
    return importlib.import_module(dotted)
