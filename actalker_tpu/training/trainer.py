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
    """One training example batch (latents precomputed by the data pipeline)."""

    latents: jax.Array        # (B, F, h, w, 4) clean video latents (scaled)
    ref_latents: jax.Array    # (B, h, w, 4) unscaled ref latent (concat cond)
    id_tokens: jax.Array      # (B, 1, d)
    audio_tokens: jax.Array   # (B, F, 32, d)
    vasa_tokens: jax.Array    # (B, F, 1, d)
    pose_fea: jax.Array       # (B, F, h, w, c0)
    audio_mask: jax.Array     # (B, 1, H, W) per-sample region masks
    exp_mask: jax.Array       # (B, 1, H, W)
    motion_buckets: jax.Array  # (B, 2) [motion_bucket_id, motion_bucket_id_exp]
    fps: jax.Array            # (B,)


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


def diffusion_loss(
    unet_apply,
    params,
    batch: TrainBatch,
    key: jax.Array,
    cfg: TrainConfig,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
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
    dmask_tok = jnp.where(drop[:, None, None], 0.0, 1.0)
    id_tok = jnp.repeat(batch.id_tokens * dmask_tok, f, axis=0)
    audio = batch.audio_tokens * dmask_tok[:, None]
    vasa = batch.vasa_tokens * dmask_tok[:, None]
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

    model_out = unet_apply(
        params, inp, t_cont.astype(dtype), cond, added,
        batch.pose_fea.astype(dtype),
    ).astype(jnp.float32)

    denoised = c_skip * x_sigma + c_out * model_out
    weight = (sig**2 + 1.0) / sig**2
    loss = jnp.mean(weight * jnp.square(denoised - x0))
    return loss, {"loss": loss, "sigma_mean": jnp.mean(sigma)}


def make_train_step(unet_apply, tx: optax.GradientTransformation,
                    cfg: TrainConfig, dtype=jnp.bfloat16):
    """Returns a pure (params, opt_state, batch, key) -> (params, opt_state,
    metrics) step; wrap in jit with your mesh shardings."""

    def step(params, opt_state, batch: TrainBatch, key):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: diffusion_loss(unet_apply, p, batch, key, cfg, dtype),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return step
