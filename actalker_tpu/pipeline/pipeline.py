"""End-to-end talking-head generation pipeline (host orchestration).

The TPU-native counterpart of the reference's ``Pose2VideoLongSVDPipeline`` +
``Inference.py:test()`` glue: owns the model modules and parameters, encodes
conditioning (Whisper windows -> audio tokens, ArcFace -> id token, VASA ->
expression token, PoseGuider -> spatial features, VAE -> ref latents), builds
the per-frame ring buffers, invokes the jitted sliding-window sampler, and
decodes latents chunk-wise.

Conditioning buffer semantics follow the reference exactly
(``pipeline_svd_...two_ip.py:494-575`` and ``Inference.py:403-594``):
  * audio buffer = per-frame 32 tokens; positions past ``num_frames`` hold
    the unconditional tokens (reference pads with ``uncond[:1]``);
  * vasa token = [vasa_linear(expr), rot, 0*trans] -> 1024-d; uncond =
    vasa_linear(zeros) padded with zero pose dims;
  * masks: all-ones in mode 2 (the reference overrides mouth/exp masks,
    ``Inference.py:545-546``); modes 0/1 gate the single active branch by
    the face box mask (pipeline ``:702-711``). The gate table zeroes the
    inactive branch, and ``_capacity_fracs`` turns the box fraction into a
    static SSM scan budget (gather path).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.pose_guider import PoseGuider
from actalker_tpu.models.projections import AudioProjModel, IDProjModel, VasaProjModel
from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition
from actalker_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig
from actalker_tpu.models.vasa import HeadExpression, HeadPose
from actalker_tpu.models.whisper import WhisperEncoder
from actalker_tpu.pipeline.sampler import (
    CondBuffers,
    SamplerConfig,
    make_plan,
    sample_video,
)


@dataclasses.dataclass
class PipelineModules:
    unet: UNetSpatioTemporalCondition
    vae: AutoencoderKLTemporalDecoder
    audio_proj: AudioProjModel
    id_proj: IDProjModel
    vasa_proj: VasaProjModel
    pose_guider: PoseGuider
    whisper: WhisperEncoder
    vasa_expression: HeadExpression = dataclasses.field(
        default_factory=HeadExpression)
    vasa_pose: HeadPose = dataclasses.field(default_factory=HeadPose)

    @classmethod
    def create(cls, unet_config: Optional[UNetConfig] = None,
               vae_config: Optional[VAEConfig] = None,
               dtype=jnp.bfloat16, vasa_expression_dim: int = 1018,
               vae_dtype=jnp.float32):
        """``vae_dtype``: fp32 by default (the reference upcasts its VAE,
        pipeline 512-515). bf16 halves VAE decode time/HBM on TPU at >40 dB
        PSNR vs fp32 (tests/test_vae_parity.py PSNR gate) — the CLI exposes
        it as ``vae_dtype: bf16``."""
        return cls(
            unet=UNetSpatioTemporalCondition(unet_config or UNetConfig(), dtype=dtype),
            vae=AutoencoderKLTemporalDecoder(vae_config or VAEConfig(),
                                             dtype=vae_dtype),
            audio_proj=AudioProjModel(dtype=jnp.float32),
            id_proj=IDProjModel(dtype=jnp.float32),
            vasa_proj=VasaProjModel(output_dim=vasa_expression_dim,
                                    dtype=jnp.float32),
            pose_guider=PoseGuider(
                embedding_channels=(unet_config or UNetConfig()).block_out_channels[0],
                dtype=jnp.float32,
            ),
            whisper=WhisperEncoder(dtype=jnp.float32),
        )


class ACTalkerPipeline:
    """params: dict with keys unet/vae/audio_proj/id_proj/vasa_proj/
    pose_guider/whisper, each a flax variables dict."""

    def __init__(self, modules: PipelineModules, params: Dict[str, Any],
                 dtype=jnp.bfloat16):
        self.m = modules
        self.params = params
        self.dtype = dtype
        self._jit_cache: Dict[Any, Any] = {}

    def _jit(self, name, key, builder):
        """Per-pipeline cache of jitted callables.

        ``jax.jit`` caches traces by FUNCTION IDENTITY — a lambda built
        inside a method is a fresh function every call, so each call paid a
        full re-trace (plus compile-cache lookup) and the encoders ran
        eagerly op-by-op, which dominates wall-clock over the TPU tunnel
        (~100 s of the first measured 151 s clip)."""
        k = (name, key)
        fn = self._jit_cache.get(k)
        if fn is None:
            fn = self._jit_cache[k] = builder()
        return fn

    # ---------- conditioning encoders (host-called, jitted) ----------

    def encode_audio_windows(self, mel: jax.Array) -> jax.Array:
        """mel (B, 80, T) -> stacked whisper states (B, T//2, 5, 384)."""
        fn = self._jit("whisper", jnp.shape(mel), lambda: jax.jit(
            lambda p, m: self.m.whisper.apply(p, m)))
        return fn(self.params["whisper"], mel)

    def audio_tokens_per_frame(self, audio_feats: np.ndarray, num_frames: int,
                               step: int = 2) -> tuple[jax.Array, jax.Array]:
        """Slice per-frame 10x5x384 windows and project to 32 tokens each.

        ``audio_feats``: (T2, 5, 384) whisper states at 2 frames/video-frame,
        already zero-padded 4 front / 6 back (reference ``Inference.py:461``).
        Returns (cond, uncond) of shape (num_frames, 32, 1024).
        """
        windows = np.stack(
            [audio_feats[i * 2 * step: i * 2 * step + 10] for i in range(num_frames)]
        )  # (F, 10, 5, 384)
        aproj = self._jit("audio_proj", (), lambda: jax.jit(
            lambda p, w: self.m.audio_proj.apply(p, w)))
        ap = aproj(self.params["audio_proj"], jnp.asarray(windows)[None])[0]
        # (F, 32, 1024)
        uncond = aproj(
            self.params["audio_proj"], jnp.zeros((1, 1, 10, 5, 384))
        )[0, 0]  # (32, 1024)
        uncond = jnp.broadcast_to(uncond[None], ap.shape)
        return ap, uncond

    def encode_vasa_video(self, face_crops: np.ndarray, pose_crops: np.ndarray,
                          chunk: int = 16):
        """Run the VASA towers over driving-video crops.

        face_crops: (F, 256, 256, 3) in [0, 1] (expression tower input);
        pose_crops: (F, 256, 256, 3) in [0, 1] (pose tower gets *2-1, the
        reference's ``Inference.py:494``). Returns (expr (F, 512), rot (F, 3)).
        Requires 'vasa_expression' / 'vasa_pose' params (converted from the
        reference's MX31c checkpoint)."""
        expr_fn = self._jit("vasa_expression", chunk, lambda: jax.jit(
            lambda p, x: self.m.vasa_expression.apply(p, x)))
        pose_fn = self._jit("vasa_pose", chunk, lambda: jax.jit(
            lambda p, x: self.m.vasa_pose.apply(p, x * 2.0 - 1.0)))
        exprs, rots = [], []
        n = face_crops.shape[0]
        for i in range(0, n, chunk):
            fc = jnp.asarray(face_crops[i:i + chunk], jnp.float32)
            pc = jnp.asarray(pose_crops[i:i + chunk], jnp.float32)
            pad = chunk - fc.shape[0]
            if pad:
                fc = jnp.concatenate([fc, jnp.broadcast_to(fc[-1:], (pad,) + fc.shape[1:])])
                pc = jnp.concatenate([pc, jnp.broadcast_to(pc[-1:], (pad,) + pc.shape[1:])])
            exprs.append(np.asarray(expr_fn(
                self.params["vasa_expression"], fc))[:chunk - pad if pad else None])
            rots.append(np.asarray(pose_fn(
                self.params["vasa_pose"], pc)["rotation"])[:chunk - pad if pad else None])
        return np.concatenate(exprs)[:n], np.concatenate(rots)[:n]

    def vasa_tokens(self, expr: Optional[np.ndarray], rot: Optional[np.ndarray],
                    num_frames: int, vasa_dim: int = 1018):
        """(F, 512) expression + (F, 3) rotation -> (F, 1, 1024) tokens.

        Mode 0 (no driving video): zero tokens (reference dummy placeholders,
        ``Inference.py:478-483``)."""
        if expr is None:
            tok = jnp.zeros((num_frames, 1, vasa_dim + 6), jnp.float32)
            return tok, jnp.zeros_like(tok)
        vproj = self._jit("vasa_proj", (), lambda: jax.jit(
            lambda p, e: self.m.vasa_proj.apply(p, e)))
        proj = vproj(self.params["vasa_proj"], jnp.asarray(expr))
        pose = jnp.concatenate(
            [jnp.asarray(rot), jnp.zeros_like(jnp.asarray(rot))], axis=-1
        )  # rot, trans*0
        cond = jnp.concatenate([proj, pose], axis=-1)[:, None, :]
        unc = vproj(
            self.params["vasa_proj"], jnp.zeros_like(jnp.asarray(expr))
        )
        uncond = jnp.concatenate([unc, jnp.zeros_like(pose)], axis=-1)[:, None, :]
        return cond, uncond

    # ---------- main generation ----------

    def _capacity_fracs(self, config, audio_mask, exp_mask, latent_hw):
        """Host-side static SSM token budgets (SS2DCondV10.capacity_frac).

        Mirrors the sampler's gate table (mode 0/1 zero one branch,
        ``Inference.py:469-476`` / pipeline ``:702-711``) and measures the
        exact active-token fraction of each region mask at every mamba
        resolution with the same ``downsample_ip_mask`` the block uses, so
        the static capacity is a true upper bound. Fractions are bucketed up
        to 1/16 to bound the number of jit traces; returns None (masked-dense
        full scan) when the shared scan buffer would not actually shrink —
        the grouped kernel walks max-over-branches rows, so gather only pays
        when BOTH branch budgets are small (mode 2's all-ones masks stay
        dense, matching the reference's cost there).
        """
        from actalker_tpu.models.attention_blocks import downsample_ip_mask

        ga, gv = config.gate
        h8, w8 = latent_hw

        # the spatial scales at which mamba blocks run, derived from the
        # UNet block layout (cross-attn transformers carry the SSM): down
        # level i sits at stride 2^i, up level i at 2^(n-1-i)
        ucfg = self.m.unet.config
        n_levels = len(ucfg.down_block_types)
        scales = sorted(
            {2 ** i for i, bt in enumerate(ucfg.down_block_types)
             if bt.startswith("CrossAttn")}
            | {2 ** (n_levels - 1 - i)
               for i, bt in enumerate(ucfg.up_block_types)
               if bt.startswith("CrossAttn")}
        ) or [1]

        def frac_of(mask_np, gate_on):
            if not gate_on:
                return 0.0
            if mask_np is None:
                return 1.0
            m = np.asarray(mask_np, np.float32)
            if m.min() >= 1.0 - 1e-6:
                return 1.0
            worst = 0.0
            for s in scales:
                l = (h8 // s) * (w8 // s)
                sel = np.asarray(
                    downsample_ip_mask(jnp.asarray(m), l)[..., 0]
                ) >= 1.0 - 1e-6
                worst = max(worst, float(sel.sum(axis=-1).max()) / l)
            return worst

        import math as _math
        fa = min(1.0, _math.ceil(frac_of(audio_mask, ga) * 16) / 16)
        fe = min(1.0, _math.ceil(frac_of(exp_mask, gv) * 16) / 16)
        if max(fa, fe) > 0.75:
            return None
        return (fa, fe)

    def generate_latents(
        self,
        ref_image: np.ndarray,            # (H, W, 3) in [-1, 1]
        id_embed: np.ndarray,             # (512,) ArcFace
        audio_tokens: jax.Array,          # (F, 32, 1024)
        uncond_audio_tokens: jax.Array,
        vasa_tokens: jax.Array,           # (F, 1, 1024)
        uncond_vasa_tokens: jax.Array,
        pose_images: np.ndarray,          # (F, H, W, 3) in [0, 1]
        config: SamplerConfig,
        seed: int = 0,
        audio_mask: Optional[np.ndarray] = None,   # (1, 1, H, W)
        exp_mask: Optional[np.ndarray] = None,
        init_noise: Optional[np.ndarray] = None,   # (buf, h, w, 4) parity hook
    ) -> jax.Array:
        num_frames = audio_tokens.shape[0]
        plan = make_plan(config, num_frames)
        buf = plan.buffer_len
        fpb = config.frames_per_batch
        key = jax.random.PRNGKey(seed)

        # VAE encodings (fp32, reference upcasts the VAE)
        ref = jnp.asarray(ref_image, jnp.float32)[None]
        vae_encode = self._jit("vae_encode", ref.shape, lambda: jax.jit(
            lambda p, x: self.m.vae.apply(
                p, x, method=AutoencoderKLTemporalDecoder.encode)))
        ref_latent = vae_encode(self.params["vae"], ref)[0] \
            * self.m.vae.config.scaling_factor
        key, k_aug = jax.random.split(key)
        ref_aug = ref + config.noise_aug_strength * jax.random.normal(
            k_aug, ref.shape
        )
        image_latent = vae_encode(self.params["vae"], ref_aug)[0]
        # unscaled (reference _encode_vae_image)

        # identity tokens
        id_tok = self._jit("id_proj", (), lambda: jax.jit(
            lambda p, e: self.m.id_proj.apply(p, e)))(
            self.params["id_proj"], jnp.asarray(id_embed, jnp.float32)[None]
        )[None]  # (1, 1, 1024)

        # pose guider features over the buffer (pose images tiled mod F)
        pose_idx = np.arange(buf) % num_frames
        pose = jnp.asarray(pose_images, jnp.float32)[pose_idx][None]
        pose_fea = self._jit("pose_guider", pose.shape, lambda: jax.jit(
            lambda p, x: self.m.pose_guider.apply(p, x)))(
            self.params["pose_guider"], pose)[0]

        def pad_to_buf(cond, uncond):
            pad = jnp.broadcast_to(uncond[:1], (buf - cond.shape[0],) + cond.shape[1:])
            return (jnp.concatenate([cond, pad], axis=0),
                    jnp.concatenate([uncond, pad], axis=0))

        audio_b, audio_u = pad_to_buf(audio_tokens, uncond_audio_tokens)
        vasa_b, vasa_u = pad_to_buf(vasa_tokens, uncond_vasa_tokens)

        hm, wm = ref_image.shape[:2]
        ones = np.ones((1, 1, hm, wm), np.float32)
        buffers = CondBuffers(
            id_tokens=jnp.broadcast_to(id_tok[0], (buf, 1, id_tok.shape[-1])),
            audio_tokens=audio_b,
            audio_tokens_u=audio_u,
            vasa_tokens=vasa_b,
            vasa_tokens_u=vasa_u,
            image_latents=jnp.broadcast_to(
                image_latent, (buf,) + image_latent.shape
            ),
            pose_fea=pose_fea,
            audio_mask=jnp.asarray(audio_mask if audio_mask is not None else ones),
            exp_mask=jnp.asarray(exp_mask if exp_mask is not None else ones),
        )

        caps = self._capacity_fracs(
            config, audio_mask, exp_mask, (hm // 8, wm // 8))
        unet = self.m.unet
        if caps is not None:
            unet = dataclasses.replace(
                unet, config=dataclasses.replace(
                    unet.config, mask_capacity=caps))

        # Fence the conditioning encoders before launching the sampler: TPU
        # program workspaces are reserved at ENQUEUE, so the still-queued
        # VAE-encode/PoseGuider scratch would stack under the sampler's
        # (RESOURCE_EXHAUSTED at 576px, outputs/perf_r05.log E0). pose_fea
        # is the last-enqueued encoder output, so its readback implies all
        # earlier programs have retired (in-order execution).
        np.asarray(jax.device_get(pose_fea[:1, :1, :1, :1]))
        del pose        # free the pixel-space pose stack (~200 MB at 576px)
        key, k_noise = jax.random.split(key)
        inj = init_noise is not None
        run = self._jit("sample", (config, num_frames, caps, inj),
                        lambda: jax.jit(
            lambda p, bufs, ref, k, noise: sample_video(
                unet.apply, p, config, plan, bufs, ref, k,
                dtype=self.dtype, init_noise=noise,
            )
        ) if inj else jax.jit(
            lambda p, bufs, ref, k: sample_video(
                unet.apply, p, config, plan, bufs, ref, k,
                dtype=self.dtype,
            )
        ))
        if inj:
            latents = run(self.params["unet"], buffers, ref_latent, k_noise,
                          jnp.asarray(init_noise, jnp.float32))
        else:
            latents = run(self.params["unet"], buffers, ref_latent, k_noise)
        return latents[:num_frames]

    def decode_latents(self, latents: jax.Array, decode_chunk_size: int = 10
                       ) -> np.ndarray:
        """(F, h, w, 4) -> (F, H, W, 3) float32 in [-1, 1], chunked.

        All chunk decodes are DISPATCHED before any host transfer (jax
        dispatch is async), so chunk k+1 computes while chunk k copies out —
        the per-chunk ``np.asarray`` in the r2 version serialized decode
        against D2H and cost ~1.5 s/clip at the bench shape."""
        scale = 1.0 / self.m.vae.config.scaling_factor
        # Fence the sampler before dispatching decode: the TPU runtime
        # allocates a program's temp workspace at ENQUEUE, so async decode
        # chunks stack their scratch on top of the still-running sampler's
        # — measured RESOURCE_EXHAUSTED at the 576px clip even after the
        # constant-capture fix (outputs/perf_r05.log D1). One host readback
        # (~30 ms; block_until_ready does not reliably block through the
        # tunnel) bounds the peak; chunks still overlap each other.
        np.asarray(jax.device_get(latents[:1, :1, :1, :1]))
        frames = []
        # params are an ARGUMENT, not a closure capture: a captured jax
        # Array is baked into the jaxpr as a constant, which round-trips
        # the whole VAE through the host at compile and keeps a second
        # on-device copy alive — measured RESOURCE_EXHAUSTED at the 576px
        # clip (outputs/perf_r05.log C3).
        decode = self._jit("vae_decode", decode_chunk_size, lambda: jax.jit(
            lambda p, z: self.m.vae.apply(
                p, z, method=AutoencoderKLTemporalDecoder.decode
            )
        ))
        n = latents.shape[0]
        for i in range(0, n, decode_chunk_size):
            chunk = latents[i: i + decode_chunk_size] * scale
            pad = decode_chunk_size - chunk.shape[0]
            if pad:  # keep a single compiled shape
                chunk = jnp.concatenate(
                    [chunk, jnp.broadcast_to(chunk[-1:], (pad,) + chunk.shape[1:])]
                )
            out = decode(self.params["vae"], chunk[None])[0]
            frames.append(out[: decode_chunk_size - pad if pad else None])
        return np.concatenate(
            [np.asarray(f, np.float32) for f in frames], axis=0)[:n]
