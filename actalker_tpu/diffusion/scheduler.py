"""Euler-discrete (EDM-style) scheduler as pure functions.

TPU-native re-design of the reference's scheduler stack
(``src/schedulers/scheduling_euler_discrete.py``, a subclass of diffusers'
EulerDiscreteScheduler with a sigma-indexed ``add_noise`` for i2i strength and
an optional correlated ``video_fusion`` churn noise): here the sigma/timestep
tables are precomputed host-side with numpy (float64), and the per-step update
is a pure jittable function taking explicit ``sigma`` / ``sigma_next`` scalars
— no mutable ``_step_index`` state, which is what lets the whole denoise loop
(windows included) live inside one ``lax.scan``.

Defaults match SVD-XT 1.1's shipped scheduler config: scaled-linear betas,
Karras sigma schedule in [0.002, 700], "leading" timestep spacing,
continuous (EDM) timesteps ``t = 0.25 * ln(sigma)``, v-prediction.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerDiscreteConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear"
    prediction_type: str = "v_prediction"  # "epsilon" | "v_prediction" | "sample"
    interpolation_type: str = "linear"
    use_karras_sigmas: bool = True
    sigma_min: Optional[float] = 0.002
    sigma_max: Optional[float] = 700.0
    timestep_spacing: str = "leading"  # "linspace" | "leading" | "trailing"
    timestep_type: str = "continuous"  # "discrete" | "continuous"
    steps_offset: int = 1
    rho: float = 7.0


def training_sigmas(cfg: EulerDiscreteConfig) -> np.ndarray:
    """Per-train-timestep sigmas from the beta schedule (ascending index)."""
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64)
            ** 2
        )
    else:
        raise ValueError(f"unknown beta_schedule {cfg.beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return np.sqrt((1 - alphas_cumprod) / alphas_cumprod)


def _karras_ramp(cfg: EulerDiscreteConfig, n: int, smin: float, smax: float) -> np.ndarray:
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    inv_rho = 1.0 / cfg.rho
    return (smax**inv_rho + ramp * (smin**inv_rho - smax**inv_rho)) ** cfg.rho


def set_timesteps(
    cfg: EulerDiscreteConfig, num_inference_steps: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sigmas, timesteps): sigmas has ``num_inference_steps + 1``
    entries (terminal 0 appended), timesteps has ``num_inference_steps``.

    Timesteps are the values fed to the UNet: discrete indices for
    ``timestep_type='discrete'``; ``0.25 * ln(sigma)`` for 'continuous' (EDM).
    """
    sig_train = training_sigmas(cfg)
    nt = cfg.num_train_timesteps
    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, nt - 1, num_inference_steps, dtype=np.float64)[::-1]
    elif cfg.timestep_spacing == "leading":
        ratio = nt // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.float64)
        ts += cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        ratio = nt / num_inference_steps
        ts = (np.arange(nt, 0, -ratio)).round().astype(np.float64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing {cfg.timestep_spacing!r}")

    if cfg.interpolation_type == "linear":
        sigmas = np.interp(ts, np.arange(nt), sig_train)
    elif cfg.interpolation_type == "log_linear":
        sigmas = np.exp(
            np.linspace(np.log(sig_train[-1]), np.log(sig_train[0]), num_inference_steps + 1)
        )[:-1][::-1]
    else:
        raise ValueError(f"unknown interpolation_type {cfg.interpolation_type!r}")

    if cfg.use_karras_sigmas:
        smin = cfg.sigma_min if cfg.sigma_min is not None else float(sigmas[-1])
        smax = cfg.sigma_max if cfg.sigma_max is not None else float(sigmas[0])
        sigmas = _karras_ramp(cfg, num_inference_steps, smin, smax)

    if cfg.timestep_type == "continuous":
        timesteps = 0.25 * np.log(sigmas)
    else:
        if cfg.use_karras_sigmas:
            # invert sigma -> t by interpolation on the log-sigma table
            log_t = np.log(sig_train)
            timesteps = np.interp(np.log(sigmas), log_t, np.arange(nt))
        else:
            timesteps = ts
    sigmas = np.concatenate([sigmas, [0.0]])
    return sigmas.astype(np.float32), timesteps.astype(np.float32)


def init_noise_sigma(cfg: EulerDiscreteConfig, sigmas: np.ndarray) -> float:
    smax = float(np.max(sigmas))
    if cfg.timestep_spacing in ("linspace", "trailing"):
        return smax
    return float((smax**2 + 1) ** 0.5)


def scale_model_input(sample: jax.Array, sigma) -> jax.Array:
    """Input preconditioning c_in = 1 / sqrt(sigma^2 + 1)."""
    return sample / jnp.sqrt(jnp.square(sigma) + 1.0)


def step(
    sample: jax.Array,
    model_output: jax.Array,
    sigma,
    sigma_next,
    prediction_type: str = "v_prediction",
    gamma=0.0,
    noise: Optional[jax.Array] = None,
    s_noise: float = 1.0,
) -> jax.Array:
    """One Euler step x_{t} -> x_{t-1}; pure function of explicit sigmas.

    ``gamma`` enables ancestral churn (requires ``noise``); the production
    sampler uses gamma == 0, making the step deterministic. ``gamma`` may be
    a traced scalar (the sampler feeds a host-precomputed per-step gamma
    table) as long as ``noise`` is provided — with gamma == 0 the churn term
    is exactly zero, matching the reference's ``if gamma > 0`` guard
    (``src/schedulers/scheduling_euler_discrete.py:147-170``).
    """
    sigma = jnp.asarray(sigma, sample.dtype)
    gamma = jnp.asarray(gamma, sample.dtype)
    sigma_hat = sigma * (gamma + 1.0)
    if noise is None:
        if (isinstance(gamma, (int, float)) or gamma.ndim == 0) and \
                not isinstance(gamma, jax.core.Tracer) and float(gamma) > 0:
            raise ValueError("gamma > 0 requires noise")
    else:
        sample = sample + noise * s_noise * jnp.sqrt(
            jnp.maximum(sigma_hat**2 - sigma**2, 0.0))

    if prediction_type == "epsilon":
        pred_x0 = sample - sigma_hat * model_output
    elif prediction_type == "v_prediction":
        pred_x0 = model_output * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + sample / (
            sigma**2 + 1.0
        )
    elif prediction_type in ("sample", "original_sample"):
        pred_x0 = model_output
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")

    derivative = (sample - pred_x0) / sigma_hat
    return sample + derivative * (jnp.asarray(sigma_next, sample.dtype) - sigma_hat)


def add_noise(original: jax.Array, noise: jax.Array, sigma) -> jax.Array:
    """i2i-style noising at a given sigma: x = x0 + sigma * n (Euler/EDM
    convention; matches the reference's sigma-indexed add_noise)."""
    return original + noise * jnp.asarray(sigma, original.dtype)


def i2i_truncate(
    sigmas: np.ndarray, timesteps: np.ndarray, num_inference_steps: int, strength: float
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Drop the first steps for image-to-image strength < 1 (reference
    ``get_timesteps``): keeps the last ``round(n * strength)`` steps."""
    init_t = min(int(num_inference_steps * strength), num_inference_steps)
    t_start = max(num_inference_steps - init_t, 0)
    return sigmas[t_start:], timesteps[t_start:], num_inference_steps - t_start
