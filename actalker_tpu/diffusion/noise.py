"""Noise utilities (explicit-key JAX port of the reference semantics).

``video_fusion_noise`` mixes a per-clip common noise with per-frame
independent noise: ``sqrt(1-s) * common + sqrt(s) * ind`` (reference
``src/utils/noise_util.py:31-83``). ``random_noise`` supports the
noise-offset trick used in training (``noise_util.py:8-28``).

Frame-axis convention here is (B, T, C, H, W) to match the rest of the
framework (the reference uses (B, C, T, H, W)).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def random_noise(
    key: jax.Array,
    shape: Sequence[int],
    dtype=jnp.float32,
    noise_offset: Optional[float] = None,
) -> jax.Array:
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, shape, dtype)
    if noise_offset is not None:
        # arxiv "offset noise": a per-(batch, channel) constant shift.
        b, t, c = shape[0], shape[1], shape[2]
        noise = noise + noise_offset * jax.random.normal(k2, (b, 1, c, 1, 1), dtype)
    return noise


def video_fusion_noise(
    key: jax.Array,
    shape: Sequence[int],
    w_ind_noise: float = 0.5,
    dtype=jnp.float32,
    initial_common_noise: Optional[jax.Array] = None,
    initial_ind_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Correlated video noise over (B, T, C, H, W).

    ``initial_common_noise`` mirrors the reference's injection hook
    (``noise_util.py:38``); ``initial_ind_noise`` is the same idea for the
    per-frame draw — parity tests feed both sides identical tensors so the
    mixing formula is compared against the reference's own function.
    """
    b, t, c, h, w = shape
    k1, k2 = jax.random.split(key)
    if initial_common_noise is not None:
        common = initial_common_noise.astype(dtype)
    else:
        common = jax.random.normal(k1, (b, 1, c, h, w), dtype)
    if initial_ind_noise is not None:
        ind = initial_ind_noise.astype(dtype)
    else:
        ind = jax.random.normal(k2, shape, dtype)
    s = jnp.asarray(w_ind_noise, dtype)
    return jnp.sqrt(1.0 - s) * common + jnp.sqrt(s) * ind
