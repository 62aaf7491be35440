"""Spatio-temporal transformer: spatial attention + optional SSM control
block + temporal attention, blended per layer.

Parity targets:
  * vanilla ``TransformerSpatioTemporalModel``
    (``src/models/base/TransformerSTmodel.py:200-421``) — used by the UNet
    mid-block;
  * ``TransformerSpatioTemporalModel_new_mambaID_v10_two_ip``
    (``TransformerSTmodel.py:3908-4155``) — the production variant: after the
    spatial BasicTransformerBlock, hidden states pass through the
    ``SS2D_cond_v10`` mamba block (replacing, not residual — reference line
    4121), then the temporal block with frame-position embeddings and the
    AlphaBlender mix. The SSM block is constructed with
    ``d_cond=cross_attention_dim, d_state=16, scan 'sweep', 2 directions``
    (reference ctor 3960-3974).

Temporal cross-attention context is the frame-pooled conditioning
(``spatial2time``); our attention layer folds the shared context instead of
repeating it per spatial position.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from actalker_tpu.models.attention_blocks import (
    BasicTransformerBlock,
    TemporalBasicTransformerBlock,
)
from actalker_tpu.models.common import GroupNorm32, dense
from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.embeddings import (
    AlphaBlender,
    TimestepEmbedding,
    sinusoidal_embedding,
)
from actalker_tpu.models.ssm import SS2DCondV10


class TransformerSpatioTemporal(nn.Module):
    """``ablate`` reproduces the reference's ``_wo_*`` variant lineage
    (17 UNet / 12 transformer file copies, SURVEY.md section 2) as config:
    any subset of {"audio", "vasa", "id", "ssd", "cross_attn"}."""

    heads: int
    head_dim: int
    context_dim: int = 1024
    num_layers: int = 1
    use_mamba: bool = False
    scan_impl: str = "pallas"
    ablate: Tuple[str, ...] = ()
    # static masked-token capacity fractions (audio, exp) for the SSM gather
    # path — see SS2DCondV10.capacity_frac
    mask_capacity: Optional[Tuple[float, float]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                  # (B, F, H, W, C)
        cond: Conditioning,
        image_only_indicator: jax.Array,   # (B, F)
    ) -> jax.Array:
        b, f, hh, ww, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        # Per-frame statistics: the reference norm runs on (B*F, C, H, W)
        # (TransformerSTmodel.py:4073-4076); a 5-D call would pool stats
        # across frames.
        h = GroupNorm32(epsilon=1e-6, name="norm")(
            x.reshape(b * f, hh * ww, c))
        h = dense(inner, dtype=self.dtype, name="proj_in")(h)

        # frame-position embedding, shared across spatial positions
        t_emb = sinusoidal_embedding(jnp.arange(f), c)
        t_emb = jnp.tile(t_emb, (b, 1)).astype(h.dtype)
        emb = TimestepEmbedding(c * 4, out_dim=c, dtype=self.dtype,
                                name="time_pos_embed")(t_emb)
        emb = emb[:, None, :]

        pooled = cond.pooled_over_frames(f)
        use_audio = "audio" not in self.ablate
        use_vasa = "vasa" not in self.ablate
        use_ca = "cross_attn" not in self.ablate
        ctx_dim = self.context_dim if use_ca else None

        def adapters(c):
            toks, scales, msks = [], [], []
            if use_audio:
                toks.append(c.audio_tokens)
                scales.append(cond.ip_scales[0])
                msks.append(cond.audio_mask)
            if use_vasa:
                toks.append(c.vasa_tokens)
                scales.append(cond.ip_scales[1])
                msks.append(cond.exp_mask)
            return toks, tuple(scales), msks

        ip_toks, ip_scales, ip_masks = adapters(cond)
        pool_toks, _, _ = adapters(pooled)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.heads, self.head_dim, context_dim=ctx_dim,
                num_adapters=len(ip_toks), dtype=self.dtype, name=f"block_{i}",
            )(
                h, context=cond.id_tokens, ip_contexts=ip_toks,
                ip_scales=ip_scales, ip_masks=ip_masks,
            )
            if self.use_mamba:
                h = SS2DCondV10(
                    d_model=inner, d_cond=self.context_dim,
                    scan_impl=self.scan_impl,
                    use_id="id" not in self.ablate,
                    use_audio=use_audio, use_exp=use_vasa,
                    no_scan="ssd" in self.ablate,
                    capacity_frac=self.mask_capacity,
                    dtype=self.dtype, name=f"mamba_{i}",
                )(
                    h, cond.id_tokens, cond.audio_tokens, cond.vasa_tokens,
                    cond.audio_mask, cond.exp_mask,
                )
            mix = h + emb
            mix = TemporalBasicTransformerBlock(
                self.heads, self.head_dim, context_dim=ctx_dim,
                num_adapters=len(ip_toks), dtype=self.dtype,
                name=f"temporal_block_{i}",
            )(
                mix, f, context=pooled.id_tokens, ip_contexts=pool_toks,
                ip_scales=ip_scales,
            )
            h = AlphaBlender(name=f"time_mixer_{i}")(
                h, mix, image_only_indicator
            )

        h = dense(c, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(b, f, hh, ww, c)
        return h + residual
