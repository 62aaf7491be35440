"""The flagship model: spatio-temporal conditional UNet (SVD-XT + parallel
mamba control), TPU-native.

Parity target: ``UNetSpatioTemporalConditionModel``
(``src/models/base/unet_spatio_temporal_condition_mambaID_v10_two_ip.py:34-517``):
conv_in (8->320), sinusoidal time + added-time embeddings (fps /
motion_bucket_id / motion_bucket_id_exp — the reference feeds the expression
bucket where SVD had noise_aug, pipeline call 567-575), PoseGuider spatial
condition added after conv_in (reference 450-452), 3 cross-attn down blocks +
1 plain (320/640/1280/1280, heads 5/10/20/20), vanilla-attention mid block,
mirrored up path, GroupNorm/SiLU/conv_out (->4).

Layout: video tensors (B, F, H, W, C); conditioning via the typed
``Conditioning`` bundle (id/audio/vasa tokens + region masks + IP scales).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.common import GroupNorm32, conv2d
from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.embeddings import TimestepEmbedding, sinusoidal_embedding
from actalker_tpu.models.unet_blocks import (
    CrossAttnDownBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    transformer_layers_per_block: int = 1
    use_mamba: bool = True
    scan_impl: str = "pallas"
    # rematerialize each down/mid/up block in the backward pass (the
    # reference trains with activation checkpointing,
    # config/train.yaml gradient_checkpointing)
    gradient_checkpointing: bool = False
    # Reference ablation lineage (_wo_audio/_wo_id/_wo_ssd/_wo_cross_attn
    # UNet file copies, SURVEY.md section 2) as config: any subset of
    # {"audio", "vasa", "id", "ssd", "cross_attn"}.
    ablate: Tuple[str, ...] = ()
    # Static masked-token capacity fractions (audio, exp) for the SSM gather
    # path (SS2DCondV10.capacity_frac): computed host-side by the pipeline
    # from the clip's region masks; None => masked-dense full scan.
    mask_capacity: Optional[Tuple[float, float]] = None

    def tiny(self) -> "UNetConfig":
        """A scaled-down config for tests/smoke runs."""
        return dataclasses.replace(
            self,
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(2, 4, 4, 4),
            layers_per_block=1,
        )

    def micro(self) -> "UNetConfig":
        """A 2-level config for compile-heavy multi-device tests."""
        return dataclasses.replace(
            self,
            block_out_channels=(32, 64),
            num_attention_heads=(2, 4),
            down_block_types=(
                "CrossAttnDownBlockSpatioTemporal",
                "DownBlockSpatioTemporal",
            ),
            up_block_types=(
                "UpBlockSpatioTemporal",
                "CrossAttnUpBlockSpatioTemporal",
            ),
            layers_per_block=1,
        )


class UNetSpatioTemporalCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,          # (B, F, H, W, Cin=8): noisy latents ++ ref latents
        timestep: jax.Array,        # scalar or (B,)
        cond: Conditioning,
        added_time_ids: jax.Array,  # (B, 3): fps, motion_bucket, motion_bucket_exp
        spatial_condition: Optional[jax.Array] = None,  # (B, F, H, W, 320)
    ) -> jax.Array:
        cfg = self.config
        b, f, hh, ww, _ = sample.shape
        ch0 = cfg.block_out_channels[0]

        timesteps = jnp.broadcast_to(jnp.asarray(timestep), (b,))
        t_emb = sinusoidal_embedding(timesteps, ch0)
        emb = TimestepEmbedding(ch0 * 4, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )
        add_embeds = sinusoidal_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(b, -1)
        emb = emb + TimestepEmbedding(
            ch0 * 4, dtype=self.dtype, name="add_embedding"
        )(add_embeds.astype(self.dtype))
        emb = jnp.repeat(emb, f, axis=0)  # (B*F, C)

        image_only_indicator = jnp.zeros((b, f), self.dtype)

        x = sample
        bf = b * f
        h = conv2d(ch0, dtype=self.dtype, name="conv_in")(
            x.reshape(bf, hh, ww, x.shape[-1])
        ).reshape(b, f, hh, ww, ch0)
        if spatial_condition is not None:
            h = h + spatial_condition

        if cfg.gradient_checkpointing:
            # one remat scope per UNet block: activations inside each block
            # are recomputed during backward (reference parity:
            # gradient_checkpointing in config/train.yaml's solver)
            _CrossDown = nn.remat(CrossAttnDownBlockSpatioTemporal)
            _Down = nn.remat(DownBlockSpatioTemporal)
            _Mid = nn.remat(UNetMidBlockSpatioTemporal)
            _CrossUp = nn.remat(CrossAttnUpBlockSpatioTemporal)
            _Up = nn.remat(UpBlockSpatioTemporal)
        else:
            _CrossDown = CrossAttnDownBlockSpatioTemporal
            _Down = DownBlockSpatioTemporal
            _Mid = UNetMidBlockSpatioTemporal
            _CrossUp = CrossAttnUpBlockSpatioTemporal
            _Up = UpBlockSpatioTemporal

        res_states = [h]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                h, states = _CrossDown(
                    out_ch, cfg.num_attention_heads[i],
                    num_layers=cfg.layers_per_block,
                    transformer_layers=cfg.transformer_layers_per_block,
                    context_dim=cfg.cross_attention_dim,
                    add_downsample=not is_final, use_mamba=cfg.use_mamba,
                    scan_impl=cfg.scan_impl, ablate=cfg.ablate,
                    mask_capacity=cfg.mask_capacity,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(h, emb, cond, image_only_indicator)
            else:
                h, states = _Down(
                    out_ch, num_layers=cfg.layers_per_block,
                    add_downsample=not is_final, dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(h, emb, image_only_indicator)
            res_states.extend(states)

        h = _Mid(
            cfg.block_out_channels[-1], cfg.num_attention_heads[-1],
            transformer_layers=cfg.transformer_layers_per_block,
            context_dim=cfg.cross_attention_dim, ablate=cfg.ablate,
            dtype=self.dtype, name="mid_block",
        )(h, emb, cond, image_only_indicator)

        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_attention_heads))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            n_layers = cfg.layers_per_block + 1
            # hand each block ONLY its own skip states: the blocks pop from
            # the list they receive, and under nn.remat that list is a
            # pytree copy whose mutation would not reach the next block
            states_i = res_states[-n_layers:]
            del res_states[-n_layers:]
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                h = _CrossUp(
                    out_ch, rev_heads[i], num_layers=n_layers,
                    transformer_layers=cfg.transformer_layers_per_block,
                    context_dim=cfg.cross_attention_dim,
                    add_upsample=not is_final, use_mamba=cfg.use_mamba,
                    scan_impl=cfg.scan_impl, ablate=cfg.ablate,
                    mask_capacity=cfg.mask_capacity,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(h, list(states_i), emb, cond, image_only_indicator)
            else:
                h = _Up(
                    out_ch, num_layers=n_layers, add_upsample=not is_final,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(h, list(states_i), emb, image_only_indicator)

        # Per-frame statistics (reference conv_norm_out sees (B*F, C, H, W)).
        h = h.reshape(bf, *h.shape[2:])
        h = GroupNorm32(name="conv_norm_out")(h)
        h = nn.silu(h)
        h = conv2d(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)
        return h.reshape(b, f, hh, ww, cfg.out_channels)
