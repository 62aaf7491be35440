"""Build TrainBatch tensors from raw dataset samples.

Connects the host data pipeline (``training/data.py`` — frames, ref frame,
masks, motion buckets) to the device-side ``TrainBatch``: VAE-encodes the
clip and reference frame, runs Whisper + the audio projection over per-frame
feature windows, the ArcFace identity embedding, the VASA towers (when
driving supervision is used), and the PoseGuider features — i.e. the
encode-side of the reference's reconstructed training step
(SURVEY.md section 3.4).

Raw-sample contract (what ``PortraitAudioDataset`` emits): pixel ``frames``/
``ref_frame``, a 112x112 ``head_crop`` in [-1, 1] (ArcFace input), 256x256
``vasa_face``/``vasa_pose`` crops in [0, 1] (VASA tower inputs), the
``audio_features`` log-mel (80, <=3000) of the clip's 30-second
get_audio_file window plus the window-local ``audio_offset`` and the clip
``audio_step``, and
the mask/bucket scalars. Samples may instead carry pre-encoded ``id_embed``
(512), ``audio_tokens`` (F, 32, 1024) or ``vasa_tokens`` (F, 1, 1024), which
take precedence (tests and pre-encoded corpora use this).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models.vae import AutoencoderKLTemporalDecoder
from actalker_tpu.training.trainer import TrainBatch
from actalker_tpu.utils.observability import get_logger

log = get_logger("batch_builder")


class BatchBuilder:
    def __init__(self, pipe, fps: float = 12.5,
                 arcface: Optional[Tuple[Any, Any]] = None,
                 raw_heads: bool = False, encode_chunk: int = 16):
        """``pipe``: an ACTalkerPipeline (modules + params).

        ``arcface``: optional (module, params) mapping (B, 112, 112, 3)
        in [-1, 1] -> (B, 512) identity embeddings. Without it (and without
        precomputed ``id_embed`` in the samples) identity conditioning is a
        zero embedding — mirrors the CLI's loud degrade when ArcFace weights
        are absent.

        ``raw_heads``: emit the trainable heads' *inputs* (whisper feature
        windows / ArcFace embedding / VASA expression+rotation / pose
        pixels) instead of projected tokens, so the train step runs
        AudioProj/IDProj/VasaProj/PoseGuider inside the differentiable graph
        and fine-tunes all six reference artifacts. Frozen encoders (VAE,
        whisper, VASA towers, ArcFace) still run here on the loader side.
        """
        self.pipe = pipe
        self.fps = fps
        self.raw_heads = raw_heads
        # VAE-encode at most this many frames per device call: a global
        # batch (8 samples x 8 frames at 512 px) in ONE encode allocates
        # multi-GiB activation tensors (64 x 512^2 x 128ch) and OOMs a
        # 16 GiB v5e next to the model state (outputs/perf_r05.log C8).
        self.encode_chunk = encode_chunk
        m = pipe.m
        # params bound via functools.partial as jit ARGUMENTS: a closure
        # capture bakes them into the jaxpr as constants (host round-trip
        # at lowering + a duplicate device copy — the 576px-clip OOM bug,
        # pipeline.py decode_latents).
        import functools as _ft

        self._encode = _ft.partial(jax.jit(lambda p, x: m.vae.apply(
            p, x, method=AutoencoderKLTemporalDecoder.encode)),
            pipe.params["vae"])
        self._pose = _ft.partial(
            jax.jit(lambda p, x: m.pose_guider.apply(p, x)),
            pipe.params["pose_guider"])
        self._idp = _ft.partial(jax.jit(lambda p, e: m.id_proj.apply(p, e)),
                                pipe.params["id_proj"])
        self._aproj = _ft.partial(
            jax.jit(lambda p, w: m.audio_proj.apply(p, w)),
            pipe.params["audio_proj"])
        self._arc = (_ft.partial(jax.jit(
            lambda p, x: arcface[0].apply(p, x)), arcface[1])
            if arcface is not None else None)
        self._warned: set = set()

    def _warn_once(self, key: str, msg: str) -> None:
        if key not in self._warned:
            self._warned.add(key)
            log.warning(msg)

    def _id_embeds(self, samples) -> np.ndarray:
        if all("id_embed" in s for s in samples):
            return np.stack([s["id_embed"] for s in samples])
        if self._arc is not None and all("head_crop" in s for s in samples):
            crops = jnp.asarray(np.stack([s["head_crop"] for s in samples]))
            return np.asarray(self._arc(crops))
        self._warn_once(
            "id", "no ArcFace module / precomputed id_embed: identity "
            "conditioning is a zero embedding")
        return np.zeros((len(samples), 512), np.float32)

    def _audio_windows(self, s: Dict[str, Any], f: int) -> Optional[np.ndarray]:
        """Per-frame (f, 10, 5, 384) whisper-state windows, or None."""
        mel = s.get("audio_features")
        if mel is None:
            return None
        # mel -> whisper states, zero padding 4 front / 6 back, then
        # per-frame 10x5x384 windows starting at the sampled clip offset
        # (2 feature frames per video frame at the RAW 25 fps; the clip's
        # stride is audio_step) — the same assembly as the CLI (reference
        # ``Inference.py:450-461``). The dataset emits the mel of ONE
        # 30-second get_audio_file window with a window-local offset; a
        # wider (whole-clip) mel from a pre-computed corpus is encoded in
        # 3000-frame chunks instead.
        mel = np.asarray(mel, np.float32)
        offset = int(s.get("audio_offset", 0))
        step = int(s.get("audio_step", 1))
        raw_fps = float(s.get("fps", 25.0)) * step
        if abs(raw_fps - 25.0) > 0.5:
            self._warn_once(
                "fps", f"clip raw fps {raw_fps:.4g} != 25 but whisper "
                "states run at 2 per 25fps video frame — audio "
                "conditioning will drift (resample the corpus to 25 fps)")
        if mel.shape[-1] <= 3000:
            if mel.shape[-1] < 3000:
                # test fakes / trimmed windows; production windows arrive
                # silence-padded in the sample domain at exactly 3000
                mel = np.pad(mel, ((0, 0), (0, 3000 - mel.shape[-1])))
            feats = np.asarray(self.pipe.encode_audio_windows(
                jnp.asarray(mel[None])))[0]
        else:
            feats = np.concatenate(
                [np.asarray(self.pipe.encode_audio_windows(
                    jnp.asarray(mel[None, :, i:i + 3000])))[0]
                 for i in range(0, mel.shape[-1], 3000)], axis=0)
        feats = np.concatenate(
            [np.zeros_like(feats[:4]), feats, np.zeros_like(feats[:6])],
            axis=0)
        feats = feats[2 * offset:]
        need = 2 * step * (f - 1) + 10
        if len(feats) < need:  # never a ragged per-frame window stack
            feats = np.concatenate(
                [feats, np.zeros((need - len(feats),) + feats.shape[1:],
                                 feats.dtype)], axis=0)
        return np.stack(
            [feats[i * 2 * step: i * 2 * step + 10] for i in range(f)])

    def _audio_tokens(self, s: Dict[str, Any], f: int) -> np.ndarray:
        if "audio_tokens" in s:
            return np.asarray(s["audio_tokens"], np.float32)
        windows = self._audio_windows(s, f)
        if windows is None:
            self._warn_once(
                "audio", "samples carry no audio_features mel / "
                "audio_tokens: audio conditioning is zero")
            return np.zeros((f, 32, 1024), np.float32)
        return np.asarray(self._aproj(jnp.asarray(windows)[None])[0])

    def _vasa_tokens(self, s: Dict[str, Any], f: int) -> np.ndarray:
        if "vasa_tokens" in s:
            return np.asarray(s["vasa_tokens"], np.float32)
        if ("vasa_face" in s and "vasa_pose" in s
                and "vasa_expression" in self.pipe.params):
            expr, rot = self.pipe.encode_vasa_video(
                np.asarray(s["vasa_face"], np.float32),
                np.asarray(s["vasa_pose"], np.float32))
            cond, _ = self.pipe.vasa_tokens(expr, rot, f)
            return np.asarray(cond)
        self._warn_once(
            "vasa", "no VASA tower params / precomputed vasa_tokens: "
            "expression conditioning is zero")
        return np.zeros((f, 1, 1024), np.float32)

    def _vasa_raw(self, s: Dict[str, Any], f: int):
        """Raw (expr (f, 512), rot (f, 3)) from the frozen VASA towers; zeros
        when the sample carries no driving crops (projection of zeros ==
        the pipeline's uncond branch)."""
        if ("vasa_face" in s and "vasa_pose" in s
                and "vasa_expression" in self.pipe.params):
            expr, rot = self.pipe.encode_vasa_video(
                np.asarray(s["vasa_face"], np.float32),
                np.asarray(s["vasa_pose"], np.float32))
            return np.asarray(expr, np.float32), np.asarray(rot, np.float32)
        self._warn_once(
            "vasa", "no VASA tower params / driving crops: expression "
            "conditioning is zero")
        return np.zeros((f, 512), np.float32), np.zeros((f, 3), np.float32)

    def _encode_chunked(self, x: jax.Array) -> jax.Array:
        """(N, H, W, 3) -> latents, at most ``encode_chunk`` frames per
        device call; the tail is padded so every call shares one compiled
        shape."""
        n, ck = x.shape[0], self.encode_chunk
        if n <= ck:
            return self._encode(x)
        outs = []
        for i in range(0, n, ck):
            c = x[i:i + ck]
            pad = ck - c.shape[0]
            if pad:
                c = jnp.concatenate(
                    [c, jnp.broadcast_to(c[-1:], (pad,) + c.shape[1:])])
            outs.append(self._encode(c)[: ck - pad if pad else None])
        return jnp.concatenate(outs, axis=0)

    def __call__(self, samples: list[Dict[str, Any]]) -> TrainBatch:
        scale = self.pipe.m.vae.config.scaling_factor
        frames = jnp.asarray(np.stack([s["frames"] for s in samples]))
        b, f, hh, ww, _ = frames.shape
        latents = self._encode_chunked(frames.reshape(b * f, hh, ww, 3))
        latents = latents.reshape(b, f, *latents.shape[1:]) * scale
        refs = jnp.asarray(np.stack([s["ref_frame"] for s in samples]))
        ref_latents = self._encode_chunked(refs)  # unscaled (concat cond)

        pose_imgs = jnp.asarray(np.stack([
            np.repeat(s["pose_mask"][..., None], 3, axis=-1) for s in samples
        ]))  # (B, H, W, 3)

        fields: Dict[str, Any] = {}
        if self.raw_heads:
            # trainable-head inputs; the train step projects them in-graph
            raw_ok = all("audio_tokens" not in s and "vasa_tokens" not in s
                         for s in samples)
            if not raw_ok:
                self._warn_once(
                    "raw", "raw_heads=True but samples carry pre-encoded "
                    "tokens; falling back to UNet-only conditioning fields")
            else:
                zeros_w = np.zeros((f, 10, 5, 384), np.float32)
                fields["audio_feats"] = jnp.asarray(np.stack([
                    (lambda w: zeros_w if w is None else w)(
                        self._audio_windows(s, f)) for s in samples]))
                fields["id_embed"] = jnp.asarray(self._id_embeds(samples))
                vr = [self._vasa_raw(s, f) for s in samples]
                fields["vasa_expr"] = jnp.asarray(np.stack([e for e, _ in vr]))
                fields["vasa_rot"] = jnp.asarray(np.stack([r for _, r in vr]))
                fields["pose_pixels"] = pose_imgs
        if not fields:
            fields["id_tokens"] = self._idp(
                jnp.asarray(self._id_embeds(samples)))[:, None, :]
            fields["audio_tokens"] = jnp.asarray(
                np.stack([self._audio_tokens(s, f) for s in samples]))
            fields["vasa_tokens"] = jnp.asarray(
                np.stack([self._vasa_tokens(s, f) for s in samples]))
            fields["pose_fea"] = self._pose(jnp.broadcast_to(
                pose_imgs[:, None], (b, f) + pose_imgs.shape[1:]))

        # per-sample region masks (B, 1, H, W) — the reference dataset emits
        # one mouth/exp mask per sample (portrait_audio_dataset_arcface_vasa
        # .py:725-735); at batch > 1 every sample keeps its own mask
        am = jnp.asarray(np.stack([s["mouth_mask"] for s in samples]))[:, None]
        em = jnp.asarray(np.stack([s["exp_mask"] for s in samples]))[:, None]
        mb = jnp.asarray(np.stack([
            [s["motion_bucket"], s["motion_bucket_exp"]] for s in samples
        ], dtype=np.float32))
        return TrainBatch(
            latents=latents, ref_latents=ref_latents,
            audio_mask=am, exp_mask=em,
            motion_buckets=mb, fps=jnp.asarray(
                [float(s.get("fps", self.fps)) for s in samples], jnp.float32),
            **fields,
        )
