"""PoseGuider: ControlNet-lite spatial conditioning encoder.

Parity target: ``src/models/audio_adapter/pose_guider.py:28-73`` — a stack of
frame-wise ("inflated") 3x3 convs (16/32/96/256) with stride-2 downsampling
between scales and a zero-initialized final conv producing the 320-channel
condition added after the UNet's conv_in. Layout here is (B, F, H, W, C);
"inflated" 2D conv == plain 2D conv over the flattened frame axis.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from actalker_tpu.models.common import conv2d


class PoseGuider(nn.Module):
    embedding_channels: int = 320
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, F, H, W, 3) in [0, 1]
        b, f = x.shape[:2]
        h = x.reshape(b * f, *x.shape[2:])
        h = conv2d(self.block_out_channels[0], dtype=self.dtype, name="conv_in")(h)
        h = nn.silu(h)
        for i in range(len(self.block_out_channels) - 1):
            cin = self.block_out_channels[i]
            cout = self.block_out_channels[i + 1]
            h = conv2d(cin, dtype=self.dtype, name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
            h = conv2d(cout, stride=(2, 2), dtype=self.dtype,
                       name=f"blocks_{2 * i + 1}")(h)
            h = nn.silu(h)
        h = nn.Conv(
            self.embedding_channels, kernel_size=(3, 3), padding=1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_out",
        )(h)
        return h.reshape(b, f, *h.shape[1:])
