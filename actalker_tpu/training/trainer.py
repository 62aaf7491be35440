"""Training step: EDM/v-prediction diffusion fine-tuning of the flagship UNet.

The reference repo ships no train.py; behavior is reconstructed from its
configs (``config/train.yaml``: fp16 mixed precision, grad-accum 4, cond
dropout 0.10, noise_offset 0.05, AdamW lr 1e-5 wd 1e-2, max_grad_norm 1.0,
ZeRO-2 over 8 GPUs) and the SVD training formulation implied by the
v-prediction EulerDiscrete scheduler:

    sigma ~ exp(N(P_mean, P_std))            (log-normal EDM sampling)
    x_sigma = x0 + sigma * n                  (+ offset noise)
    D(x) = c_skip x_sigma + c_out F(c_in x_sigma; 0.25 ln sigma)
    loss = lambda(sigma) * ||D(x) - x0||^2,  lambda = (1 + sigma^2) / sigma^2

with c_skip = 1/(1+sigma^2), c_out = -sigma/sqrt(1+sigma^2), c_in =
1/sqrt(1+sigma^2) — exactly the preconditioning the inference scheduler
inverts, so a model trained here samples correctly with
``diffusion/scheduler.py``.

TPU story: bf16 compute / fp32 master params and optimizer state; grad
accumulation via ``optax.MultiSteps``; dp gradient psum + tp sharding come
from GSPMD given the shardings installed by ``parallel/mesh.py`` (ZeRO-like
optimizer-state sharding falls out of sharding the Adam moments the same way
as the params).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from actalker_tpu.models.conditioning import Conditioning


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    grad_accum_steps: int = 4
    cond_dropout_prob: float = 0.10
    noise_offset: float = 0.05
    sigma_p_mean: float = 0.7
    sigma_p_std: float = 1.6


class TrainBatch(NamedTuple):
    """One training example batch (latents precomputed by the data pipeline).

    Two conditioning contracts:
      * **raw** (fine-tuning the full artifact set): ``audio_feats`` /
        ``id_embed`` / ``vasa_expr`` + ``vasa_rot`` / ``pose_pixels`` carry
        the *inputs* of the trainable heads (AudioProj / IDProj / VasaProj /
        PoseGuider), which then run inside the differentiable train step so
        their gradients flow — the reference fine-tunes all six artifacts
        (``full_ft``, checkpoint contract ``Inference.py:80-142``).
      * **pre-encoded** (legacy / UNet-only): ``*_tokens`` / ``pose_fea``
        carry already-projected conditioning; only the UNet gets gradients.
    A raw field set to an array takes precedence over its pre-encoded twin.
    """

    latents: jax.Array        # (B, F, h, w, 4) clean video latents (scaled)
    ref_latents: jax.Array    # (B, h, w, 4) unscaled ref latent (concat cond)
    id_tokens: Optional[jax.Array] = None    # (B, 1, d)
    audio_tokens: Optional[jax.Array] = None  # (B, F, 32, d)
    vasa_tokens: Optional[jax.Array] = None   # (B, F, 1, d)
    pose_fea: Optional[jax.Array] = None      # (B, F, h, w, c0)
    audio_mask: Optional[jax.Array] = None    # (B, 1, H, W) region masks
    exp_mask: Optional[jax.Array] = None      # (B, 1, H, W)
    motion_buckets: Optional[jax.Array] = None  # (B, 2)
    fps: Optional[jax.Array] = None           # (B,)
    # raw conditioning (trainable-head inputs)
    audio_feats: Optional[jax.Array] = None   # (B, F, 10, 5, 384) whisper win
    id_embed: Optional[jax.Array] = None      # (B, 512) ArcFace embedding
    vasa_expr: Optional[jax.Array] = None     # (B, F, 512) expression code
    vasa_rot: Optional[jax.Array] = None      # (B, F, 3) head rotation
    pose_pixels: Optional[jax.Array] = None   # (B[, F], H, W, 3) pose images


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
            eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx


def _as_applies(applies) -> Dict[str, Any]:
    """Normalize ``make_train_step``'s first argument: a bare callable is the
    legacy UNet-only mode; a dict maps artifact name -> module ``.apply``."""
    return {"unet": applies} if callable(applies) else dict(applies)


def head_tokens(applies, params, batch: TrainBatch, keep: jax.Array,
                dtype=jnp.bfloat16):
    """Run the trainable conditioning heads inside the differentiable graph.

    ``keep``: (B,) 1.0/0.0 conditioning-dropout mask. In the raw path the
    *inputs* are zeroed before projection, so the dropped branch equals the
    inference pipeline's uncond branch (projection of zeros — the CLI's
    ``audio_tokens_per_frame``/``vasa_tokens`` uncond semantics) and head
    gradients flow through both branches. Pre-encoded fields fall back to
    token zeroing (UNet-only training).

    Returns (id_tokens (B,1,d), audio (B,F,32,d), vasa (B,F,1,d),
    pose_fea (B,F,h,w,c0)).
    """
    b, f = batch.latents.shape[:2]
    if batch.audio_feats is not None:
        feats = batch.audio_feats * keep[:, None, None, None, None]
        audio = applies["audio_proj"](params["audio_proj"],
                                      feats.astype(jnp.float32))
    else:
        audio = batch.audio_tokens * keep[:, None, None, None]
    if batch.id_embed is not None:
        idt = applies["id_proj"](params["id_proj"],
                                 batch.id_embed * keep[:, None])[:, None, :]
    else:
        idt = batch.id_tokens * keep[:, None, None]
    if batch.vasa_expr is not None:
        proj = applies["vasa_proj"](params["vasa_proj"],
                                    batch.vasa_expr * keep[:, None, None])
        rot = batch.vasa_rot * keep[:, None, None]
        # rotation + translation*0 (reference Inference.py:498-505)
        pose6 = jnp.concatenate([rot, jnp.zeros_like(rot)], axis=-1)
        vasa = jnp.concatenate([proj, pose6], axis=-1)[:, :, None, :]
    else:
        vasa = batch.vasa_tokens * keep[:, None, None, None]
    if batch.pose_pixels is not None:
        px = batch.pose_pixels
        if px.ndim == 4:  # (B, H, W, 3) static pose image -> every frame
            px = jnp.broadcast_to(px[:, None], (b, f) + px.shape[1:])
        pose_fea = applies["pose_guider"](params["pose_guider"],
                                          px.astype(dtype))
    else:
        pose_fea = batch.pose_fea
    return idt, audio, vasa, pose_fea


def diffusion_loss(
    applies,
    params,
    batch: TrainBatch,
    key: jax.Array,
    cfg: TrainConfig,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    applies = _as_applies(applies)
    legacy = set(applies) == {"unet"}
    if legacy:
        params = {"unet": params}
    b, f, h, w, _ = batch.latents.shape
    k_sig, k_noise, k_off, k_drop = jax.random.split(key, 4)

    sigma = jnp.exp(
        cfg.sigma_p_mean + cfg.sigma_p_std * jax.random.normal(k_sig, (b,))
    )
    sig = sigma[:, None, None, None, None]
    noise = jax.random.normal(k_noise, batch.latents.shape)
    if cfg.noise_offset:
        noise = noise + cfg.noise_offset * jax.random.normal(
            k_off, (b, 1, 1, 1, 1)
        )
    x0 = batch.latents.astype(jnp.float32)
    x_sigma = x0 + sig * noise

    # conditioning dropout (reference conditioning_dropout_prob 0.10):
    # per-sample, drop audio+vasa+id simultaneously to the uncond branch.
    drop = jax.random.bernoulli(k_drop, cfg.cond_dropout_prob, (b,))
    keep = jnp.where(drop, 0.0, 1.0)
    id_tok, audio, vasa, pose_fea = head_tokens(applies, params, batch, keep,
                                                dtype)
    id_tok = jnp.repeat(id_tok, f, axis=0)
    cond = Conditioning(
        id_tokens=id_tok.astype(dtype),
        audio_tokens=audio.reshape(b * f, *audio.shape[2:]).astype(dtype),
        vasa_tokens=vasa.reshape(b * f, *vasa.shape[2:]).astype(dtype),
        audio_mask=batch.audio_mask,
        exp_mask=batch.exp_mask,
    )

    c_in = 1.0 / jnp.sqrt(sig**2 + 1.0)
    c_skip = 1.0 / (sig**2 + 1.0)
    c_out = -sig / jnp.sqrt(sig**2 + 1.0)
    t_cont = 0.25 * jnp.log(sigma)

    ref = jnp.broadcast_to(
        batch.ref_latents[:, None].astype(jnp.float32), x0.shape
    )
    inp = jnp.concatenate([(c_in * x_sigma), ref], axis=-1).astype(dtype)
    added = jnp.stack(
        [batch.fps, batch.motion_buckets[:, 0], batch.motion_buckets[:, 1]],
        axis=-1,
    ).astype(dtype)

    model_out = applies["unet"](
        params["unet"], inp, t_cont.astype(dtype), cond, added,
        pose_fea.astype(dtype),
    ).astype(jnp.float32)

    denoised = c_skip * x_sigma + c_out * model_out
    weight = (sig**2 + 1.0) / sig**2
    loss = jnp.mean(weight * jnp.square(denoised - x0))
    return loss, {"loss": loss, "sigma_mean": jnp.mean(sigma)}


def make_train_step(applies, tx: optax.GradientTransformation,
                    cfg: TrainConfig, dtype=jnp.bfloat16):
    """Returns a pure (params, opt_state, batch, key) -> (params, opt_state,
    metrics) step; wrap in jit with your mesh shardings.

    ``applies``: a dict mapping trainable-artifact name -> module ``.apply``
    ({"unet", "pose_guider", "audio_proj", "id_proj", "vasa_proj"}; the
    adapter to_k_ip/to_v_ip live inside the UNet tree) with ``params`` the
    matching dict of param trees — the reference's six-artifact ``full_ft``
    contract. A bare callable keeps the legacy UNet-only mode where
    ``params`` is the UNet tree itself.
    """
    legacy = callable(applies)

    def step(params, opt_state, batch: TrainBatch, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: diffusion_loss(applies, p, batch, key, cfg, dtype),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        if not legacy:
            for name, g in grads.items():
                metrics[f"grad_norm/{name}"] = optax.global_norm(g)
        return params, opt_state, metrics

    return step
