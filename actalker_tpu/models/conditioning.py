"""Conditioning bundle threaded through the UNet.

Replaces the reference's ad-hoc ``(id_embed, [audio_tokens, vasa_tokens])``
tuple + ``cross_attention_kwargs['ip_adapter_masks']`` plumbing
(``Inference.py:724``, ``unet_...v10:436-444``) with one typed pytree.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax


@flax.struct.dataclass
class Conditioning:
    """All cross-attention / SSM conditioning for one UNet call.

    Shapes (BF = batch * frames):
      id_tokens:    (BF, 1, d_cond)   ArcFace identity embedding tokens
      audio_tokens: (BF, 32, d_cond)  Whisper-window context tokens
      vasa_tokens:  (BF, 1, d_cond)   VASA expression+pose token
      audio_mask:   (Bm, 1, H, W) region mask for the audio branch (or None);
                    Bm == 1 broadcasts over the token batch, Bm == B carries
                    one mask per sample (training batches; frame-repeated at
                    the use sites, see ``expand_mask_rows``)
      exp_mask:     (Bm, 1, H, W) region mask for the expression branch
      ip_scales:    static per-adapter attention scales (audio, vasa)
    """

    id_tokens: jax.Array
    audio_tokens: jax.Array
    vasa_tokens: jax.Array
    audio_mask: Optional[jax.Array] = None
    exp_mask: Optional[jax.Array] = None
    ip_scales: Tuple[float, float] = flax.struct.field(
        pytree_node=False, default=(1.25, 1.25)
    )

    def pooled_over_frames(self, num_frames: int) -> "Conditioning":
        """Frame-mean conditioning for temporal attention (the reference's
        ``spatial2time`` pooling, ``TransformerSTmodel.py:4037-4052``) —
        without the spatial repeat: the temporal blocks broadcast instead."""
        def pool(t):
            bf, s, c = t.shape
            b = bf // num_frames
            return t.reshape(b, num_frames, s, c).mean(axis=1)

        return self.replace(
            id_tokens=pool(self.id_tokens),
            audio_tokens=pool(self.audio_tokens),
            vasa_tokens=pool(self.vasa_tokens),
        )
