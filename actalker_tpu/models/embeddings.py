"""Timestep / positional embeddings and the spatial-temporal AlphaBlender.

Semantics match the reference's vendored diffusers pieces
(``src/models/base/TransformerSTmodel.py:43-197``): sinusoidal embedding with
``flip_sin_to_cos=True, downscale_freq_shift=0`` for the UNet time and
added-time conditioning, a two-layer SiLU MLP, and a learned sigmoid blend
between spatial and temporal branches (``learned_with_images`` strategy).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import dense


def sinusoidal_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """(N,) -> (N, dim) float32 sinusoidal features."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear MLP over sinusoidal features."""

    embed_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = dense(self.embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = dense(self.out_dim or self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class AlphaBlender(nn.Module):
    """x = a * spatial + (1 - a) * temporal with a = sigmoid(mix_factor).

    ``image_only_indicator`` forces a = 1 (spatial only) per (batch, frame);
    video inference passes zeros. Supports (B*F, S, C) rank-3 inputs.
    """

    alpha_init: float = 0.5
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False  # True in the VAE decoder

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only_indicator):
        mix = self.param(
            "mix_factor", lambda k: jnp.full((1,), self.alpha_init, jnp.float32)
        )
        if self.merge_strategy == "fixed":
            alpha = mix
        elif self.merge_strategy in ("learned", "learned_with_images"):
            alpha = nn.sigmoid(mix)
        else:
            raise ValueError(self.merge_strategy)
        if self.merge_strategy == "learned_with_images":
            alpha = jnp.where(
                image_only_indicator.astype(bool), 1.0, alpha[..., None]
            )  # (B, F)
            if x_spatial.ndim == 3:  # (B*F, S, C)
                alpha = alpha.reshape(-1)[:, None, None]
            elif x_spatial.ndim == 5:  # (B, F, H, W, C)
                alpha = alpha[:, :, None, None, None]
            else:
                raise ValueError(f"unexpected ndim {x_spatial.ndim}")
        alpha = alpha.astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal
