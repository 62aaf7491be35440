"""Transformer blocks: self/cross attention with IP-adapter branches, GEGLU
feed-forward, and the spatial/temporal basic blocks.

Parity targets in the reference:
  * ``Attention`` + ``AttnProcessor2_0`` / ``IPAdapterAttnProcessor2_0``
    (``src/models/base/attention_processor.py:2704-2934``): base SDPA over the
    id-embedding context plus one SDPA branch per adapter (audio tokens, VASA
    token) through per-adapter k/v projections, each scaled and optionally
    region-masked via a bicubic mask downsample.
  * ``BasicTransformerBlock`` (``src/models/base/attention.py:29-343``):
    LN -> self-attn -> LN -> cross-attn(+IP) -> LN -> GEGLU FF.
  * ``TemporalBasicTransformerBlock`` (``attention.py:347-473``): reshapes
    (B*F, S, C) -> (B*S, F, C), with an input FF and residual.

Design notes (TPU): heads stay in the (B, S, H, Dh) layout consumed by
``ops.attention.dot_product_attention`` (XLA fuses into a flash kernel); the
IP branches share the query projection with the base attention so the three
SDPAs batch cleanly; masks are downsampled host-shape-statically and applied
as (B, S, 1) multipliers.
"""
from __future__ import annotations

import math
import os as _os
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.common import LayerNormF32, dense
from actalker_tpu.ops.attention import dot_product_attention, self_attention_bhsd
from actalker_tpu.ops.mha import frame_attention_tokens, mha_tokens
from actalker_tpu.ops.resize import torch_bicubic_resize

# Attention layout: "tokens" (default) keeps q/k/v in (B, S, C=H*Dh) token
# layout end to end (ops.mha kernels; projections stay 2-D GEMMs, no
# (B,S,H,D)<->(B,H,S,D) relayouts), "bhsd" projects to per-head layout for
# the stock flash kernel. "frame_tokens"/"spatial_tokens" apply the token
# kernels to only the frame / only the spatial attention (A/B granularity).
# All values share the same parameter tree (kernel (C, inner)/(inner, C) +
# bias). Measured on the v5e bench step (2026-08-18): tokens 1.0461 s vs
# bhsd 1.0694 s (both with XLA norms).
_ATTN_CHOICES = ("tokens", "bhsd", "frame_tokens", "spatial_tokens")
_ATTN_IMPL = _os.environ.get("ACTALKER_ATTN", "tokens")
assert _ATTN_IMPL in _ATTN_CHOICES, _ATTN_IMPL


def set_attn_impl(impl: str) -> None:
    global _ATTN_IMPL
    assert impl in _ATTN_CHOICES, impl
    _ATTN_IMPL = impl


class _Proj(nn.Module):
    """Linear with Dense-compatible params but a custom application fn, so
    head splitting/merging fuses into the projection einsum (no (B,S,H,D) <->
    (B,H,S,D) relayouts around the attention kernel)."""

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str, heads: int = 1):
        c = x.shape[-1] if mode != "out_bhsd" else x.shape[1] * x.shape[-1]
        if mode == "out_bhsd":
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (c, self.features))
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (c, self.features))
        k = kernel.astype(self.dtype)
        if mode == "bhsd":          # (B, S, C) -> (B, H, S, D)
            k3 = k.reshape(c, heads, self.features // heads)
            y = jnp.einsum("bsc,chd->bhsd", x, k3)
        elif mode == "out_bhsd":    # (B, H, S, D) -> (B, S, C)
            h, d = x.shape[1], x.shape[-1]
            k3 = k.reshape(h, d, self.features)
            y = jnp.einsum("bhsd,hdc->bsc", x, k3)
        else:                       # plain linear
            y = x @ k
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


def downsample_ip_mask(mask: jax.Array, num_queries: int) -> jax.Array:
    """(B, 1, H, W) -> (B, num_queries, 1) multiplier.

    Matches diffusers' ``IPAdapterMaskProcessor.downsample``: bicubic resize
    to a (mask_h, mask_w) grid chosen from the query count and the mask aspect
    ratio, flatten, then zero-pad / truncate to ``num_queries``. Uses the
    torch-exact a=-0.75 cubic kernel (``ops/resize.py``) — ``jax.image``'s
    a=-0.5 cubic shifts mask values by up to ~0.3 and flips the v10 mamba
    token selection at region boundaries.
    """
    b, _, o_h, o_w = mask.shape
    ratio = o_w / o_h
    mask_h = int(math.sqrt(num_queries / ratio))
    mask_h = mask_h + int((num_queries % mask_h) != 0)
    mask_w = num_queries // mask_h
    m = torch_bicubic_resize(mask[:, 0], mask_h, mask_w)
    m = m.reshape(b, mask_h * mask_w)
    if mask_h * mask_w < num_queries:
        m = jnp.pad(m, ((0, 0), (0, num_queries - mask_h * mask_w)))
    elif mask_h * mask_w > num_queries:
        m = m[:, :num_queries]
    return m[:, :, None]


def expand_mask_rows(m: jax.Array, batch: jax.Array) -> jax.Array:
    """Expand a per-sample mask tensor (leading axis Bm) to the token batch.

    Token batches are sample-major flattenings (B, F) -> B*F (UNet forward)
    or CFG stacks of one clip, so Bm == 1 broadcasts and Bm > 1 repeats each
    sample row ``batch // Bm`` times consecutively — per-sample region masks
    (reference dataset emits one mouth/exp mask per sample,
    ``portrait_audio_dataset_arcface_vasa.py:725-735``).
    """
    bm = m.shape[0]
    if bm == batch:
        return m
    if bm == 1:
        return jnp.broadcast_to(m, (batch,) + m.shape[1:])
    assert batch % bm == 0, (batch, bm)
    return jnp.repeat(m, batch // bm, axis=0)


class Attention(nn.Module):
    """Multi-head attention with optional IP-adapter branches.

    ``num_adapters > 0`` adds per-adapter ``to_k_ip``/``to_v_ip`` projections;
    call with ``ip_contexts`` (list of (B, Si, Cc)), per-adapter ``ip_scales``
    and optional ``ip_masks`` ((B, 1, H, W) region masks or None).
    """

    heads: int
    head_dim: int
    context_dim: Optional[int] = None  # None => self-attention dims
    out_dim: Optional[int] = None
    num_adapters: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                     # (B, S, C)
        context: Optional[jax.Array] = None,
        ip_contexts: Optional[List[jax.Array]] = None,
        ip_scales: Optional[Sequence[float]] = None,
        ip_masks: Optional[List[Optional[jax.Array]]] = None,
    ) -> jax.Array:
        b, s, c = x.shape
        inner = self.heads * self.head_dim
        if context is None and self.num_adapters == 0:
            if _ATTN_IMPL in ("tokens", "spatial_tokens"):
                # token layout end to end: plain 2-D GEMM projections, the
                # multi-head flash kernel splits heads inside VMEM. Keeps the
                # whole block in the canonical C-minor layout (see ops/mha.py).
                q = dense(inner, use_bias=False, dtype=self.dtype,
                          name="to_q")(x)
                k = dense(inner, use_bias=False, dtype=self.dtype,
                          name="to_k")(x)
                v = dense(inner, use_bias=False, dtype=self.dtype,
                          name="to_v")(x)
                o = mha_tokens(q, k, v, self.heads)
                return dense(self.out_dim or c, use_bias=True,
                             dtype=self.dtype, name="to_out")(o)
            # per-head layout: project straight to (B, H, S, D), run the
            # flash kernel, fold the head-merge into the output projection.
            q = _Proj(inner, dtype=self.dtype, name="to_q")(x, "bhsd", self.heads)
            k = _Proj(inner, dtype=self.dtype, name="to_k")(x, "bhsd", self.heads)
            v = _Proj(inner, dtype=self.dtype, name="to_v")(x, "bhsd", self.heads)
            o = self_attention_bhsd(q, k, v)
            return _Proj(self.out_dim or c, use_bias=True, dtype=self.dtype,
                         name="to_out")(o, "out_bhsd")
        ctx = x if context is None else context
        # Shared-context folding: if the context batch divides the query batch
        # (e.g. one frame-pooled context per clip, queries per spatial
        # position), fold the group into the query length instead of
        # materializing a repeated context — attention does not mix queries,
        # so this is exact, and it avoids the reference's giant
        # ``repeat(1, h*w, 1, 1)`` broadcast (TransformerSTmodel.py:4049).
        bc = ctx.shape[0]

        def attend(q, k, v):
            bk = k.shape[0]
            if bk == b:
                return dot_product_attention(q, k, v)
            assert b % bk == 0, (b, bk)
            qf = q.reshape(bk, (b // bk) * s, self.heads, self.head_dim)
            out = dot_product_attention(qf, k, v)
            return out.reshape(b, s, self.heads, self.head_dim)

        def broadcast_v(v):
            # Singleton-key shortcut: softmax over one key is identically 1,
            # so attention over a length-1 context IS its value row — no
            # q/k projections, no einsum, no relayout copies. Exact.
            bv = v.shape[0]
            v = v.reshape(bv, 1, inner)
            return jnp.broadcast_to(v, (bv, (b // bv) * s, inner)
                                    ).reshape(b, s, inner)

        # q is needed only where some context has more than one token
        ip_lens = [ipc.shape[1] for ipc in (ip_contexts or [])]
        q = None
        if ctx.shape[1] > 1 or any(ln > 1 for ln in ip_lens):
            q = dense(inner, use_bias=False, dtype=self.dtype,
                      name="to_q")(x).reshape(b, s, self.heads, self.head_dim)

        v = dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        if ctx.shape[1] == 1:
            out = broadcast_v(v)
        else:
            k = dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            k = k.reshape(bc, -1, self.heads, self.head_dim)
            v = v.reshape(bc, -1, self.heads, self.head_dim)
            out = attend(q, k, v).reshape(b, s, inner)

        if self.num_adapters:
            assert ip_contexts is not None and len(ip_contexts) == self.num_adapters
            if ip_scales is None:
                ip_scales = [1.0] * self.num_adapters
            for i in range(self.num_adapters):
                ip_ctx = ip_contexts[i]
                bi = ip_ctx.shape[0]
                v_ip = dense(inner, use_bias=False, dtype=self.dtype,
                             name=f"to_v_ip_{i}")(ip_ctx)
                if ip_ctx.shape[1] == 1:
                    ip_out = broadcast_v(v_ip)
                else:
                    k_ip = dense(inner, use_bias=False, dtype=self.dtype,
                                 name=f"to_k_ip_{i}")(ip_ctx)
                    k_ip = k_ip.reshape(bi, -1, self.heads, self.head_dim)
                    v_ip = v_ip.reshape(bi, -1, self.heads, self.head_dim)
                    ip_out = attend(q, k_ip, v_ip).reshape(b, s, inner)
                if ip_masks is not None and ip_masks[i] is not None:
                    m = downsample_ip_mask(ip_masks[i], s).astype(ip_out.dtype)
                    ip_out = ip_out * expand_mask_rows(m, b)
                out = out + jnp.asarray(ip_scales[i], out.dtype) * ip_out

        return dense(self.out_dim or c, dtype=self.dtype, name="to_out")(out)


class _DenseParams(nn.Module):
    """nn.Dense-compatible parameter holder (kernel/bias, same inits and
    fp32 storage) that returns the raw tensors, so sibling GEMMs can fuse
    into one Pallas kernel without changing the checkpoint tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


# FF lowering: "fused" (default) runs the whole GEGLU MLP as one Pallas
# kernel (ops/mlp.py) — the unfused path materializes a (B, S, 8C)
# intermediate in HBM (1.17 GB at the res-64 flagship shape) and measured
# 39% MFU (outputs/attr_r4). "xla" keeps the two-GEMM lowering (A/B).
_MLP_IMPL = _os.environ.get("ACTALKER_MLP", "fused")
assert _MLP_IMPL in ("fused", "xla"), _MLP_IMPL


def set_mlp_impl(impl: str) -> None:
    global _MLP_IMPL
    assert impl in ("fused", "xla"), impl
    _MLP_IMPL = impl


class FeedForward(nn.Module):
    """GEGLU feed-forward: proj to 2*inner, gate with GELU, project out."""

    dim_out: Optional[int] = None
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        if _MLP_IMPL == "fused":
            from actalker_tpu.ops.mlp import geglu_mlp

            w1, b1 = _DenseParams(inner * 2, name="proj_in")(dim)
            w2, b2 = _DenseParams(self.dim_out or dim, name="proj_out")(inner)
            return geglu_mlp(x, w1.astype(self.dtype), b1,
                             w2.astype(self.dtype), b2)
        h = dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return dense(self.dim_out or dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    num_adapters: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, ip_contexts=None, ip_scales=None,
                 ip_masks=None):
        h = LayerNormF32(name="norm1")(x)
        x = x + Attention(
            self.heads, self.head_dim, dtype=self.dtype, name="attn1"
        )(h)
        if self.context_dim is not None:
            h = LayerNormF32(name="norm2")(x)
            x = x + Attention(
                self.heads, self.head_dim, context_dim=self.context_dim,
                num_adapters=self.num_adapters, dtype=self.dtype, name="attn2",
            )(h, context=context, ip_contexts=ip_contexts, ip_scales=ip_scales,
              ip_masks=ip_masks)
        h = LayerNormF32(name="norm3")(x)
        return x + FeedForward(dtype=self.dtype, name="ff")(h)


class _FrameSelfAttention(nn.Module):
    """Self-attention over the frame axis computed in the native
    (B*F, S, C) layout — no (B*F, S, C) <-> (B*S, F, C) relayouts.

    Parameter tree matches ``Attention``'s self-attention path (to_q/to_k/
    to_v kernels (C, inner), to_out kernel+bias), so checkpoints are
    unchanged. The frame contraction happens inside the einsums; measured on
    v5e this removes the two 150 MB transposes and XLA's per-projection
    layout copies (35 -> ~25 ms per temporal block at 4096 tokens)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        bf, s, c = x.shape
        b = bf // num_frames
        inner = self.heads * self.head_dim
        q = dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        if _ATTN_IMPL in ("tokens", "frame_tokens"):
            o = frame_attention_tokens(q, k, v, num_frames, self.heads)
        else:
            q5 = q.reshape(b, num_frames, s, self.heads, self.head_dim)
            k5 = k.reshape(b, num_frames, s, self.heads, self.head_dim)
            v5 = v.reshape(b, num_frames, s, self.heads, self.head_dim)
            scores = jnp.einsum(
                "bfshd,bgshd->bshfg", q5, k5).astype(jnp.float32)
            probs = jax.nn.softmax(
                scores * (self.head_dim ** -0.5), axis=-1).astype(q.dtype)
            o = jnp.einsum(
                "bshfg,bgshd->bfshd", probs, v5).reshape(bf, s, inner)
        return dense(c, use_bias=True, dtype=self.dtype, name="to_out")(o)


class TemporalBasicTransformerBlock(nn.Module):
    """Attention over the frame axis (reference: ``attention.py:347-473``,
    which reshapes (B*F, S, C) -> (B*S, F, C)).

    TPU redesign: everything runs in the (B*F, S, C) layout. LayerNorm/FF
    are per-token (commute with the frame/space permutation), frame
    self-attention contracts the frame axis in-einsum, and cross-attention
    folds frames into the query length (attention does not mix queries, so
    this is exact). The cross-attention context is the frame-pooled
    conditioning (``spatial2time``); its IP branches run unmasked (the
    reference's temporal blocks don't receive ip_adapter_masks).
    """

    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    num_adapters: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames, context=None, ip_contexts=None,
                 ip_scales=None):
        bf, s, c = x.shape
        b = bf // num_frames
        h = x
        residual = h
        h = LayerNormF32(name="norm_in")(h)
        h = FeedForward(dtype=self.dtype, name="ff_in")(h)
        h = h + residual

        n = LayerNormF32(name="norm1")(h)
        h = h + _FrameSelfAttention(self.heads, self.head_dim,
                                    dtype=self.dtype, name="attn1")(
            n, num_frames)

        if self.context_dim is not None:
            n = LayerNormF32(name="norm2")(h)
            h = h + Attention(
                self.heads, self.head_dim, context_dim=self.context_dim,
                num_adapters=self.num_adapters, dtype=self.dtype, name="attn2",
            )(
                n.reshape(b, num_frames * s, c), context=context,
                ip_contexts=ip_contexts, ip_scales=ip_scales,
            ).reshape(bf, s, c)

        n = LayerNormF32(name="norm3")(h)
        h = h + FeedForward(dtype=self.dtype, name="ff")(n)
        return h
