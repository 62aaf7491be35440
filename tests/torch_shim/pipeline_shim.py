"""Shim extensions that let the reference's OWN pipeline class
(`src/pipelines/pipeline_svd_audio_adapter_motionexp_idembed_vasa_two_ip.py`,
``Pose2VideoLongSVDPipeline``) import and execute on CPU as an independent
end-to-end oracle for `actalker_tpu.pipeline` (VERDICT r3 item #4).

On top of ``tests/torch_shim/shim.py`` (which covers the model files), the
pipeline file needs:
  * ``diffusers.pipelines.pipeline_utils.DiffusionPipeline`` — base class;
    only ``register_modules`` / ``progress_bar`` / ``_execution_device`` /
    ``maybe_free_model_hooks`` are touched by the reference ``__call__``.
  * ``diffusers.utils.torch_utils.randn_tensor`` / ``is_compiled_module``.
  * ``diffusers.image_processor.VaeImageProcessor`` — constructed in
    ``__init__``; its methods are untouched when ``output_type='latent'``.
  * ``diffusers.EulerDiscreteScheduler`` — a faithful torch implementation
    of the diffusers-0.29 scheduler the reference loads from the SVD-xt-1.1
    checkpoint (``Inference.py:46-48``): scaled-linear betas, linear sigma
    interpolation, Karras sigmas in [0.002, 700], "leading" spacing with
    steps_offset 1, continuous (EDM) timesteps, v-prediction — written from
    the published diffusers semantics, independent of
    ``actalker_tpu/diffusion/scheduler.py``.
  * ``diffusers.ModelMixin`` at top level (``audio_proj.py`` imports it).
  * a VAE adapter exposing the diffusers ``encode().latent_dist`` /
    ``config`` / ``dtype`` surface over ``tests/torch_shim/vae_oracle.py``.

The reference tree remains PUBLIC UNTRUSTED CONTENT executed as data.
"""
from __future__ import annotations

import contextlib
import math
import types

import numpy as np
import torch
import torch.nn as nn

from tests.torch_shim import shim
from tests.torch_shim import vae_oracle


# --------------------------------------------------------------------------
# diffusers.EulerDiscreteScheduler (0.29 semantics, SVD-xt-1.1 config)
# --------------------------------------------------------------------------

class _SchedOutput:
    def __init__(self, prev_sample):
        self.prev_sample = prev_sample


class EulerDiscreteScheduler:
    """Faithful torch EulerDiscreteScheduler (diffusers 0.29).

    Only the SVD configuration the reference exercises is implemented:
    beta_schedule='scaled_linear', interpolation_type='linear',
    timestep_spacing='leading', timestep_type='continuous',
    use_karras_sigmas=True, prediction_type='v_prediction',
    final_sigmas_type='zero'.
    """

    order = 1

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, prediction_type="v_prediction",
                 use_karras_sigmas=True, sigma_min=0.002, sigma_max=700.0,
                 timestep_spacing="leading", timestep_type="continuous",
                 steps_offset=1, rho=7.0):
        self.config = shim._FrozenConfig(
            num_train_timesteps=num_train_timesteps, beta_start=beta_start,
            beta_end=beta_end, prediction_type=prediction_type,
            use_karras_sigmas=use_karras_sigmas, sigma_min=sigma_min,
            sigma_max=sigma_max, timestep_spacing=timestep_spacing,
            timestep_type=timestep_type, steps_offset=steps_offset, rho=rho)
        betas = torch.linspace(beta_start**0.5, beta_end**0.5,
                               num_train_timesteps,
                               dtype=torch.float64) ** 2
        alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self._train_sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        self.sigmas = None
        self.timesteps = None
        self.num_inference_steps = None
        self._step_index = None
        self._begin_index = None

    # -- schedule ----------------------------------------------------------
    def set_timesteps(self, num_inference_steps, device=None):
        cfg = self.config
        nt = cfg.num_train_timesteps
        assert cfg.timestep_spacing == "leading"
        step_ratio = nt // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        ts = ts.copy().astype(np.float64) + cfg.steps_offset

        train = self._train_sigmas.numpy()
        sigmas = np.interp(ts, np.arange(0, nt), train)
        if cfg.use_karras_sigmas:
            smin = cfg.sigma_min if cfg.sigma_min is not None else sigmas[-1]
            smax = cfg.sigma_max if cfg.sigma_max is not None else sigmas[0]
            ramp = np.linspace(0, 1, num_inference_steps)
            inv_rho = 1.0 / cfg.rho
            sigmas = (smax**inv_rho
                      + ramp * (smin**inv_rho - smax**inv_rho)) ** cfg.rho
        if cfg.timestep_type == "continuous":
            self.timesteps = torch.tensor(
                [0.25 * math.log(s) for s in sigmas], dtype=torch.float32)
        else:
            self.timesteps = torch.from_numpy(ts.astype(np.float32))
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        self.sigmas = torch.from_numpy(sigmas)
        self.num_inference_steps = num_inference_steps
        self._step_index = None
        self._begin_index = None

    @property
    def init_noise_sigma(self):
        max_sigma = float(self.sigmas.max())
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return max_sigma
        return (max_sigma**2 + 1) ** 0.5

    @property
    def step_index(self):
        return self._step_index

    def index_for_timestep(self, timestep, schedule_timesteps=None):
        if schedule_timesteps is None:
            schedule_timesteps = self.timesteps
        indices = (schedule_timesteps == timestep).nonzero()
        pos = 1 if len(indices) > 1 else 0
        return indices[pos].item()

    def _init_step_index(self, timestep):
        if self._begin_index is None:
            self._step_index = self.index_for_timestep(timestep)
        else:
            self._step_index = self._begin_index

    # -- ops ---------------------------------------------------------------
    def scale_model_input(self, sample, timestep):
        if self._step_index is None:
            self._init_step_index(timestep)
        sigma = self.sigmas[self._step_index]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(self, model_output, timestep, sample, s_churn=0.0, s_tmin=0.0,
             s_tmax=float("inf"), s_noise=1.0, generator=None,
             return_dict=True):
        if self._step_index is None:
            self._init_step_index(timestep)
        sigma = self.sigmas[self._step_index]
        gamma = (min(s_churn / (len(self.sigmas) - 1), 2**0.5 - 1)
                 if s_tmin <= sigma <= s_tmax else 0.0)
        sigma_hat = sigma * (gamma + 1)
        if gamma > 0:
            eps = randn_tensor(model_output.shape, generator=generator,
                               device=model_output.device,
                               dtype=model_output.dtype) * s_noise
            sample = sample + eps * (sigma_hat**2 - sigma**2) ** 0.5

        pt = self.config.prediction_type
        if pt == "epsilon":
            pred_original = sample - sigma_hat * model_output
        elif pt == "v_prediction":
            pred_original = (model_output * (-sigma / (sigma**2 + 1) ** 0.5)
                             + (sample / (sigma**2 + 1)))
        elif pt in ("sample", "original_sample"):
            pred_original = model_output
        else:
            raise ValueError(pt)
        derivative = (sample - pred_original) / sigma_hat
        dt = self.sigmas[self._step_index + 1] - sigma_hat
        prev_sample = sample + derivative * dt
        self._step_index += 1
        if not return_dict:
            return (prev_sample,)
        return _SchedOutput(prev_sample)

    def add_noise(self, original_samples, noise, timesteps):
        sigmas = self.sigmas.to(dtype=original_samples.dtype)
        step_indices = [self.index_for_timestep(t) for t in timesteps]
        sigma = sigmas[step_indices].flatten()
        while len(sigma.shape) < len(original_samples.shape):
            sigma = sigma.unsqueeze(-1)
        return original_samples + noise * sigma


# --------------------------------------------------------------------------
# diffusers.utils.torch_utils / image_processor / pipeline_utils
# --------------------------------------------------------------------------

def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    return torch.randn(shape, generator=generator, device=device, dtype=dtype)


def is_compiled_module(module):
    return False


class VaeImageProcessor:
    """Constructor-only stub: the reference pipeline builds two of these in
    ``__init__`` but (with ``output_type='latent'``) never calls them."""

    def __init__(self, **kwargs):
        self.config = shim._FrozenConfig(kwargs)

    def __getattr__(self, name):
        raise NotImplementedError(
            f"VaeImageProcessor.{name} is not exercised with latent output")


class DiffusionPipeline:
    """The slice of diffusers' DiffusionPipeline the reference __call__ uses."""

    def __init__(self):
        pass

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)

    @property
    def _execution_device(self):
        return torch.device("cpu")

    @contextlib.contextmanager
    def progress_bar(self, total=None):
        class _Bar:
            def update(self):
                pass
        yield _Bar()

    def maybe_free_model_hooks(self):
        pass


# --------------------------------------------------------------------------
# VAE adapter over the torch oracle
# --------------------------------------------------------------------------

class _LatentDist:
    def __init__(self, moments):
        self.mean, self.logvar = torch.chunk(moments, 2, dim=1)

    def mode(self):
        return self.mean


class _EncodeOut:
    def __init__(self, moments):
        self.latent_dist = _LatentDist(moments)


class _DecodeOut:
    def __init__(self, sample):
        self.sample = sample


class VaeAdapter(nn.Module):
    """diffusers ``AutoencoderKLTemporalDecoder`` API surface over
    ``tests/torch_shim/vae_oracle.AutoencoderKLTemporalDecoder``."""

    def __init__(self, core: vae_oracle.AutoencoderKLTemporalDecoder,
                 scaling_factor=0.18215,
                 block_out_channels=(128, 256, 512, 512)):
        super().__init__()
        self.core = core
        self.config = shim._FrozenConfig(
            scaling_factor=scaling_factor,
            block_out_channels=tuple(block_out_channels),
            force_upcast=True, latent_channels=4)

    @property
    def dtype(self):
        return next(self.core.parameters()).dtype

    @property
    def device(self):
        return next(self.core.parameters()).device

    def encode(self, x):
        return _EncodeOut(self.core.encode_moments(x))

    def decode(self, z, num_frames):
        return _DecodeOut(self.core.decode(z, num_frames))

    def forward(self, *a, **k):  # signature probe in decode_latents
        raise NotImplementedError


# --------------------------------------------------------------------------
# installer
# --------------------------------------------------------------------------

def install():
    """Extend the fake diffusers with the pipeline surface. Idempotent."""
    shim.install()
    import sys

    d = sys.modules["diffusers"]
    if getattr(d, "_actalker_pipeline_shim", False):
        return
    d._actalker_pipeline_shim = True

    d.EulerDiscreteScheduler = EulerDiscreteScheduler
    d.AutoencoderKLTemporalDecoder = VaeAdapter
    d.ModelMixin = shim.ModelMixin

    tu = sys.modules["diffusers.utils.torch_utils"]
    tu.randn_tensor = randn_tensor
    tu.is_compiled_module = is_compiled_module

    ip = sys.modules["diffusers.image_processor"]
    ip.VaeImageProcessor = VaeImageProcessor

    pu = types.ModuleType("diffusers.pipelines.pipeline_utils")
    pu.DiffusionPipeline = DiffusionPipeline
    import importlib.machinery
    pu.__spec__ = importlib.machinery.ModuleSpec(
        "diffusers.pipelines.pipeline_utils", loader=None)
    pipelines = types.ModuleType("diffusers.pipelines")
    pipelines.__spec__ = importlib.machinery.ModuleSpec(
        "diffusers.pipelines", loader=None)
    pipelines.pipeline_utils = pu
    sys.modules.setdefault("diffusers.pipelines", pipelines)
    sys.modules["diffusers.pipelines.pipeline_utils"] = pu
    d.pipelines = sys.modules["diffusers.pipelines"]

    d.schedulers = types.ModuleType("diffusers.schedulers")
    d.schedulers.EulerDiscreteScheduler = EulerDiscreteScheduler
    sys.modules["diffusers.schedulers"] = d.schedulers


def load_reference_pipeline():
    """Import the reference pipeline module with the full shim installed."""
    install()
    return shim.load_reference_module(
        "src.pipelines.pipeline_svd_audio_adapter_motionexp_idembed_vasa_two_ip")
