"""Conditioning projection heads.

Parity targets (``src/models/audio_adapter/audio_proj.py``):
  * ``AudioProjModel`` (40-124): flattened (10 x 5 x 384) Whisper window ->
    ReLU MLP(1024) -> 32 context tokens x 1024 -> LayerNorm.
  * ``VasaProjModel`` (126-147): 512-d VASA expression -> Linear + LayerNorm.
  * ``IDProjModel`` (150-169): 512-d ArcFace -> 3-layer ReLU MLP -> 1024.
  * ``ExpProjModel`` / ``MotionControlProjModel`` (171-216): alternates kept
    for checkpoint compatibility.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import LayerNormF32, dense


class AudioProjModel(nn.Module):
    seq_len: int = 10
    blocks: int = 5
    channels: int = 384
    intermediate_dim: int = 1024
    output_dim: int = 1024
    context_tokens: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio_embeds):
        """(B, F, window, blocks, channels) -> (B, F, context_tokens, out)."""
        b, f = audio_embeds.shape[:2]
        x = audio_embeds.reshape(b * f, -1)
        x = nn.relu(dense(self.intermediate_dim, dtype=self.dtype, name="proj1")(x))
        x = nn.relu(dense(self.intermediate_dim, dtype=self.dtype, name="proj2")(x))
        x = dense(self.context_tokens * self.output_dim, dtype=self.dtype,
                  name="proj3")(x)
        x = x.reshape(b * f, self.context_tokens, self.output_dim)
        x = LayerNormF32(name="norm")(x)
        return x.reshape(b, f, self.context_tokens, self.output_dim)


class VasaProjModel(nn.Module):
    output_dim: int = 1018
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = dense(self.output_dim, dtype=self.dtype, name="proj1")(x)
        return LayerNormF32(name="norm")(x)


class IDProjModel(nn.Module):
    intermediate_dim: int = 1024
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(dense(self.intermediate_dim, dtype=self.dtype, name="proj1")(x))
        x = nn.relu(dense(self.intermediate_dim, dtype=self.dtype, name="proj2")(x))
        return dense(self.output_dim, dtype=self.dtype, name="proj3")(x)


class ExpProjModel(nn.Module):
    intermediate_dim: int = 768
    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(dense(self.intermediate_dim, dtype=self.dtype, name="proj1")(x))
        x = nn.relu(dense(self.intermediate_dim, dtype=self.dtype, name="proj2")(x))
        return dense(self.output_dim, dtype=self.dtype, name="proj3")(x)
