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


def _flash_block_sizes(sq: int, sk: int):
    from jax.experimental.pallas.ops.tpu import flash_attention as FA

    # 1024/1024 blocks: at 2048 the kernel's fwd-inside-vjp (residual-saving
    # variant, the TRAINING path via mha_tokens' custom bwd) exceeds the
    # 17 MB scoped-vmem limit by 0.9 MB and the whole train step fails to
    # compile (outputs/profile_r04.log train_mem_probe). Inference no longer
    # rides this kernel (ops/mha.py token-layout kernels are the default),
    # so the ~7% 2048-vs-1024 fwd win measured in r2 is moot here.
    # CONSTRAINT: the flash BACKWARD requires block_q to divide the sequence
    # length, so blocks must be exact divisors — e.g. s=1536/2560/3584 (all
    # pass the s % 512 == 0 gate) need 512-blocks, not 1024.
    def _divisor(s):
        b = min(1024, s)
        while s % b:
            b //= 2
        return b

    bq = _divisor(sq)
    bk = _divisor(sk)
    return FA.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def self_attention_bhsd(q: jax.Array, k: jax.Array, v: jax.Array,
                        scale: Optional[float] = None) -> jax.Array:
    """Self-attention in (B, H, S, D) layout.

    Uses the Pallas TPU flash-attention kernel for long sequences (the
    reference's 72x72-token spatial self-attention materializes multi-GB
    logits if done naively; flash keeps them in VMEM). Falls back to a fused
    einsum+softmax for short sequences or non-TPU backends.
    """
    b, h, s, d = q.shape
    if scale is None:
        scale = d**-0.5
    if (jax.default_backend() == "tpu" and s >= 1024 and s % 512 == 0
            and d in (64, 128, 256)):
        from jax.experimental.pallas.ops.tpu import flash_attention as FA

        return FA.flash_attention(
            q, k, v, sm_scale=scale, block_sizes=_flash_block_sizes(s, s)
        )
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
