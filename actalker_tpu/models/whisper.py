"""Whisper audio encoder (tiny) in Flax.

Parity target: HF ``WhisperModel.encoder`` as used by the reference
(``Inference.py:179, 450-461``): log-mel (80, 3000) windows -> conv1 (k3) +
GELU -> conv2 (k3, stride 2) + GELU -> +sinusoidal positions -> 4 pre-LN
transformer layers (6 heads, d=384, GELU MLP 1536) -> final LN. The talking-
head pipeline stacks *all five* hidden states (embedding output + each layer)
as per-frame audio features, so ``__call__`` returns the stacked states
(B, T', 5, 384).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.common import LayerNormF32, dense
from actalker_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    d_model: int = 384
    layers: int = 4
    heads: int = 6
    ffn_dim: int = 1536
    num_mel_bins: int = 80
    max_positions: int = 1500


class WhisperEncoderLayer(nn.Module):
    cfg: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg.d_model
        hd = c // self.cfg.heads
        residual = x
        h = LayerNormF32(name="self_attn_layer_norm")(x)
        q = dense(c, dtype=self.dtype, name="q_proj")(h) * (hd**-0.5)
        k = dense(c, use_bias=False, dtype=self.dtype, name="k_proj")(h)
        v = dense(c, dtype=self.dtype, name="v_proj")(h)
        b, s, _ = h.shape
        o = dot_product_attention(
            q.reshape(b, s, self.cfg.heads, hd),
            k.reshape(b, s, self.cfg.heads, hd),
            v.reshape(b, s, self.cfg.heads, hd),
            scale=1.0,
        ).reshape(b, s, c)
        x = residual + dense(c, dtype=self.dtype, name="out_proj")(o)
        residual = x
        h = LayerNormF32(name="final_layer_norm")(x)
        h = nn.gelu(dense(self.cfg.ffn_dim, dtype=self.dtype, name="fc1")(h),
                    approximate=False)
        return residual + dense(c, dtype=self.dtype, name="fc2")(h)


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig = WhisperConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: (B, num_mel_bins, T<=3000) -> stacked hidden states
        (B, T//2, 1 + layers, d_model)."""
        c = self.cfg.d_model
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, mel) — feature-last for Conv
        x = nn.gelu(nn.Conv(c, kernel_size=(3,), padding=1, dtype=self.dtype,
                            name="conv1")(x), approximate=False)
        x = nn.gelu(nn.Conv(c, kernel_size=(3,), strides=(2,), padding=1,
                            dtype=self.dtype, name="conv2")(x), approximate=False)
        pos = self.param(
            "embed_positions",
            lambda key: _sinusoid_positions(self.cfg.max_positions, c),
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        states = [x]
        for i in range(self.cfg.layers):
            x = WhisperEncoderLayer(self.cfg, dtype=self.dtype,
                                    name=f"layers_{i}")(x)
            states.append(x)
        # HF's .hidden_states: raw outputs per layer EXCEPT the final entry,
        # which is post-final-LayerNorm (WhisperEncoder.forward appends after
        # the loop's layer_norm).
        states[-1] = LayerNormF32(name="layer_norm")(x)
        return jnp.stack(states, axis=2)


def _sinusoid_positions(length: int, channels: int) -> jnp.ndarray:
    """Whisper's fixed sinusoidal position table (also stored as a weight in
    the HF checkpoint, so the converter can overwrite it)."""
    log_timescale = jnp.log(10000.0) / (channels // 2 - 1)
    inv = jnp.exp(-log_timescale * jnp.arange(channels // 2, dtype=jnp.float32))
    t = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(t), jnp.cos(t)], axis=1)
