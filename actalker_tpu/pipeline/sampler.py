"""Long-video sliding-window diffusion sampler — the whole denoise loop is ONE
jitted ``lax.scan``.

Reference semantics being reproduced (``src/pipelines/pipeline_svd_audio_adapter
_motionexp_idembed_vasa_two_ip.py``):
  * 4-way CFG batch ``[uncond, drop_audio+vasa, drop_vasa, full]`` with three
    guidance scales combined as ``u + g1(a-u) + g2(b-a) + g3(c-b)``
    (``_clip_encode_image`` 168/182-183, combine 731-733);
  * latent ring buffer of ``num_frames + frames_per_batch`` frames; per
    denoise step, windows start at ``range(0, N, fpb - overlap) - shift`` with
    ``shift`` advancing by ``shift_offset`` (mod fpb) each step, indices wrap
    mod the buffer (684-693, 752-753); per-window Euler steps share the step's
    sigma (the reference resets ``_step_index`` per window, 685); window
    outputs are averaged into the buffer (748-756);
  * ``add_time_ids = [fps, motion_bucket_id, motion_bucket_id_exp]`` (567-575);
  * i2i start: buffer = ref-latent + sigma_0 * noise (prepare_latents 312-316);
  * mode gating: audio/vasa token zeroing + region-mask selection (702-711,
    ``Inference.py:469-546``).

TPU-first design: the reference's Python window loop is replaced by a static
per-step window index table (steps x windows x fpb, precomputed host-side);
windows and the 4 CFG branches fold into the UNet batch axis (vmapped, or
chunked with ``lax.map`` when activation memory demands), so one program
covers the whole generation. The scatter-average uses a one-hot matmul
(MXU-friendly segment sum).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.diffusion import scheduler as sch
from actalker_tpu.models.conditioning import Conditioning


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_inference_steps: int = 25
    frames_per_batch: int = 25       # window length (data.n_sample_frames)
    overlap: int = 0
    shift_offset: int = 7
    fps: float = 12.5
    motion_bucket_id: float = 12.0
    motion_bucket_id_exp: float = 20.0
    noise_aug_strength: float = 0.0
    min_guidance1: float = 2.0       # appearance
    max_guidance1: float = 2.0
    guidance2: float = 7.5           # audio
    guidance3: float = 3.0           # vasa
    i2i_noise_strength: float = 1.0
    gate: Tuple[int, int] = (1, 1)   # (audio, vasa) — mode 0:[1,0] 1:[0,1] 2:[1,1]
    windows_per_call: int = 0        # 0 = all windows in one UNet batch
    # ancestral churn (reference scheduler step args, scheduling_euler_
    # discrete.py:85-92; production keeps s_churn = 0 = deterministic)
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0
    noise_type: str = "random"       # "random" | "video_fusion"
    w_ind_noise: float = 0.5
    scheduler: sch.EulerDiscreteConfig = sch.EulerDiscreteConfig()


@dataclasses.dataclass(frozen=True)
class SamplerPlan:
    """Host-precomputed static tables for the jitted loop."""

    sigmas: np.ndarray          # (steps + 1,)
    timesteps: np.ndarray       # (steps,) — continuous EDM timesteps
    guidance1: np.ndarray       # (steps,)
    guidance2: np.ndarray
    guidance3: np.ndarray
    gammas: np.ndarray          # (steps,) per-step churn gamma (0 = no churn)
    window_idx: np.ndarray      # (steps, n_windows, fpb) buffer indices
    buffer_len: int
    num_frames: int


@flax.struct.dataclass
class CondBuffers:
    """Per-frame conditioning ring buffers (length = buffer_len).

    ``*_u`` are the unconditional variants. Masks follow the reference's
    gating table. ``image_latents``: per-frame ref latents for channel concat
    (unscaled VAE mode); ``pose_fea``: PoseGuider output per frame.
    """

    id_tokens: jax.Array        # (buf, 1, d)
    audio_tokens: jax.Array     # (buf, 32, d)
    audio_tokens_u: jax.Array
    vasa_tokens: jax.Array      # (buf, 1, d)
    vasa_tokens_u: jax.Array
    image_latents: jax.Array    # (buf, h, w, 4)
    pose_fea: jax.Array         # (buf, h, w, 320)
    audio_mask: Optional[jax.Array]   # (1, 1, H, W)
    exp_mask: Optional[jax.Array]
    ip_scales: Tuple[float, float] = flax.struct.field(
        pytree_node=False, default=(1.25, 1.25)
    )


def make_plan(cfg: SamplerConfig, num_frames: int) -> SamplerPlan:
    sigmas, timesteps = sch.set_timesteps(cfg.scheduler, cfg.num_inference_steps)
    sigmas, timesteps, n = sch.i2i_truncate(
        sigmas, timesteps, cfg.num_inference_steps, cfg.i2i_noise_strength
    )
    fpb = cfg.frames_per_batch
    buf = num_frames + fpb
    stride = fpb - cfg.overlap
    starts0 = np.arange(0, buf, stride)
    window_idx = np.zeros((n, len(starts0), fpb), np.int32)
    shift = 0
    for i in range(n):
        starts = starts0 - shift
        idx = starts[:, None] + np.arange(fpb)[None, :]
        window_idx[i] = np.mod(idx, buf)
        shift = (shift + cfg.shift_offset) % fpb
    g1 = np.linspace(cfg.min_guidance1, cfg.max_guidance1, n).astype(np.float32)
    g2 = np.full((n,), cfg.guidance2, np.float32)
    g3 = np.full((n,), cfg.guidance3, np.float32)
    # per-step churn gamma (reference scheduler step, scheduling_euler_
    # discrete.py:147-151): min(s_churn / (len(sigmas)-1), sqrt(2)-1) when
    # s_tmin <= sigma <= s_tmax else 0. Host-precomputed: sigmas are static.
    gam = min(cfg.s_churn / max(len(sigmas) - 1, 1), 2**0.5 - 1)
    gammas = np.where(
        (sigmas[:-1] >= cfg.s_tmin) & (sigmas[:-1] <= cfg.s_tmax), gam, 0.0
    ).astype(np.float32)
    return SamplerPlan(
        sigmas=sigmas, timesteps=timesteps, guidance1=g1, guidance2=g2,
        guidance3=g3, gammas=gammas, window_idx=window_idx, buffer_len=buf,
        num_frames=num_frames,
    )


def _cfg_conditioning(buffers: CondBuffers, idx: jax.Array, cfg: SamplerConfig,
                      dtype) -> Conditioning:
    """Build the 4-way-CFG Conditioning for one window (frame indices idx)."""
    ga, gv = cfg.gate
    id_c = buffers.id_tokens[idx].astype(dtype)                 # (fpb, 1, d)
    zeros_id = jnp.zeros_like(id_c)
    au_c = buffers.audio_tokens[idx].astype(dtype) * ga
    au_u = buffers.audio_tokens_u[idx].astype(dtype) * ga
    va_c = buffers.vasa_tokens[idx].astype(dtype) * gv
    va_u = buffers.vasa_tokens_u[idx].astype(dtype) * gv
    # batches stacked [uncond, drop_audio+vasa, drop_vasa, full]
    id_tokens = jnp.concatenate([zeros_id, id_c, id_c, id_c], axis=0)
    audio = jnp.concatenate([au_u, au_u, au_c, au_c], axis=0)
    vasa = jnp.concatenate([va_u, va_u, va_u, va_c], axis=0)
    if ga == 1 and gv == 1:
        am, em = buffers.audio_mask, buffers.exp_mask
    elif ga == 1:
        am = buffers.audio_mask
        em = jnp.zeros_like(buffers.audio_mask) if buffers.audio_mask is not None else None
    else:
        am = jnp.zeros_like(buffers.exp_mask) if buffers.exp_mask is not None else None
        em = buffers.exp_mask
    return Conditioning(
        id_tokens=id_tokens, audio_tokens=audio, vasa_tokens=vasa,
        audio_mask=am, exp_mask=em, ip_scales=buffers.ip_scales,
    )


def sample_video(
    unet_apply: Callable[..., jax.Array],
    unet_params: Any,
    cfg: SamplerConfig,
    plan: SamplerPlan,
    buffers: CondBuffers,
    ref_latent: jax.Array,          # (h, w, 4) — scaled (x0.18215) VAE mean
    noise_key: jax.Array,
    dtype=jnp.bfloat16,
    window_sharding=None,
    init_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Runs the full denoise loop; returns latents (buffer_len, h, w, 4) fp32.

    ``unet_apply(params, sample, t, cond, added_time_ids, spatial_condition)``
    must be the flagship UNet's apply function.

    ``window_sharding``: optional ``NamedSharding`` over the window axis
    (e.g. ``NamedSharding(mesh, P("dp"))``). Within one denoise step the
    sliding windows are embarrassingly parallel (each reads only the
    previous step's buffer — SURVEY §5), so constraining the window batch
    partitions the UNet across chips; the only cross-chip exchange is the
    all-reduce behind the overlap-average scatter.

    ``init_noise``: optional (buffer_len, h, w, 4) initial noise, replacing
    the PRNG draw — used by parity tests to feed the reference pipeline's
    exact noise tensor (``prepare_latents``'s ``latents=`` argument).
    """
    fpb = cfg.frames_per_batch
    buf = plan.buffer_len
    h, w, _ = ref_latent.shape
    sigmas = jnp.asarray(plan.sigmas)
    n_steps = len(plan.timesteps)
    nw = plan.window_idx.shape[1]

    if init_noise is None:
        noise = jax.random.normal(noise_key, (buf, h, w, 4), jnp.float32)
    else:
        noise = init_noise.astype(jnp.float32)
    latents0 = sch.add_noise(
        jnp.broadcast_to(ref_latent.astype(jnp.float32), (buf, h, w, 4)),
        noise, plan.sigmas[0],
    )

    added_time_ids = jnp.asarray(
        [[cfg.fps, cfg.motion_bucket_id, cfg.motion_bucket_id_exp]], dtype
    )
    added_time_ids4 = jnp.tile(added_time_ids, (4, 1))

    churn = cfg.s_churn > 0
    churn_key = jax.random.fold_in(noise_key, 0x5345)

    def churn_noise(step_i, w_ord):
        """Per-(step, window) churn noise, (fpb, h, w, 4)."""
        from actalker_tpu.diffusion.noise import video_fusion_noise

        k = jax.random.fold_in(jax.random.fold_in(churn_key, step_i), w_ord)
        if cfg.noise_type == "video_fusion":
            n5 = video_fusion_noise(k, (1, fpb, 4, h, w), cfg.w_ind_noise)
            return jnp.moveaxis(n5[0], 0, -1)                    # (fpb, h, w, 4)
        return jax.random.normal(k, (fpb, h, w, 4), jnp.float32)

    def denoise_window(latents_all, idx, sigma, sigma_next, t_cont, g1, g2, g3,
                       gamma=0.0, noise=None):
        """One window: gather -> 4-way CFG UNet -> combine -> Euler step."""
        lat = latents_all[idx]                                   # (fpb, h, w, 4)
        cond = _cfg_conditioning(buffers, idx, cfg, dtype)
        lat4 = jnp.broadcast_to(lat[None], (4, fpb, h, w, 4))
        scaled = sch.scale_model_input(lat4, sigma).astype(dtype)
        img_lat = buffers.image_latents[idx].astype(dtype)       # (fpb, h, w, 4)
        img_lat4 = jnp.stack([
            jnp.zeros_like(img_lat), img_lat, img_lat, img_lat
        ])
        inp = jnp.concatenate([scaled, img_lat4], axis=-1)       # (4, fpb, h, w, 8)
        pose = jnp.broadcast_to(
            buffers.pose_fea[idx][None].astype(dtype),
            (4,) + buffers.pose_fea[idx].shape,
        )
        pred = unet_apply(
            unet_params, inp, t_cont.astype(dtype), cond, added_time_ids4, pose
        ).astype(jnp.float32)                                    # (4, fpb, h, w, 4)
        u, a, b, c = pred[0], pred[1], pred[2], pred[3]
        noise_pred = u + g1 * (a - u) + g2 * (b - a) + g3 * (c - b)
        return sch.step(
            lat, noise_pred, sigma, sigma_next,
            cfg.scheduler.prediction_type,
            gamma=gamma, noise=noise, s_noise=cfg.s_noise,
        )

    def step_fn(latents_all, xs):
        sigma, sigma_next, t_cont, g1, g2, g3, gamma, step_i, w_idx = xs

        def one(idx, w_ord):
            noise = churn_noise(step_i, w_ord) if churn else None
            return denoise_window(
                latents_all, idx, sigma, sigma_next, t_cont, g1, g2, g3,
                gamma=gamma, noise=noise,
            )

        w_ords = jnp.arange(nw, dtype=jnp.int32)
        # window_sharding overrides windows_per_call: the lax.map chunking
        # bounds memory on ONE chip, whereas sharding spreads the full
        # window batch across chips (which is the memory bound already).
        if (window_sharding is None and cfg.windows_per_call
                and cfg.windows_per_call < nw):
            outs = jax.lax.map(
                lambda iw: one(*iw), (w_idx, w_ords),
                batch_size=cfg.windows_per_call,
            )
        else:
            if window_sharding is not None:
                w_idx = jax.lax.with_sharding_constraint(
                    w_idx, window_sharding)
            outs = jax.vmap(one)(w_idx, w_ords)                  # (nw, fpb, h, w, 4)
            if window_sharding is not None:
                outs = jax.lax.with_sharding_constraint(
                    outs, window_sharding)

        # scatter-average via one-hot segment sum (MXU-friendly)
        flat_idx = w_idx.reshape(-1)
        onehot = jax.nn.one_hot(flat_idx, buf, dtype=jnp.float32)  # (nw*fpb, buf)
        flat = outs.reshape(nw * fpb, -1)
        summed = onehot.T @ flat                                  # (buf, h*w*4)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_latents = (summed / counts).reshape(buf, h, w, 4)
        return new_latents, None

    xs = (
        sigmas[:-1], sigmas[1:],
        jnp.asarray(plan.timesteps), jnp.asarray(plan.guidance1),
        jnp.asarray(plan.guidance2), jnp.asarray(plan.guidance3),
        jnp.asarray(plan.gammas), jnp.arange(n_steps, dtype=jnp.int32),
        jnp.asarray(plan.window_idx),
    )
    latents, _ = jax.lax.scan(step_fn, latents0, xs, length=n_steps)
    return latents
