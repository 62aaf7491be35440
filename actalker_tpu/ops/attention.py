"""Attention primitive wrapper.

Single entry point for scaled-dot-product attention so the implementation can
be swapped per backend (XLA fused attention on TPU — which XLA pattern-matches
into a flash-attention kernel — vs a manual einsum fallback with fp32
softmax). Replaces the reference's ``F.scaled_dot_product_attention`` /
xformers usage (``src/models/base/attention_processor.py:2817``).

Shapes: q (B, Sq, H, Dh), k/v (B, Sk, H, Dh) -> (B, Sq, H, Dh).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl in ("auto", "xla"):
        try:
            return jax.nn.dot_product_attention(q, k, v, scale=scale)
        except Exception:
            if impl == "xla":
                raise
    # manual fallback: fp32 logits + softmax
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
