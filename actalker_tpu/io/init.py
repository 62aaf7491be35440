"""Parameter initialization helpers.

Two modes:
  * ``flax_init`` — real flax initializers (CPU; used by tests/training);
  * ``random_like`` — shapes via ``jax.eval_shape`` materialized host-side
    with numpy (fast on the TPU tunnel, where eager per-op init is slow).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def random_like(shapes, scale: float = 0.02, seed: int = 0):
    """Materialize a params pytree of small random values host-side."""
    rng = np.random.default_rng(seed)

    def make(s):
        return jnp.asarray((rng.standard_normal(s.shape) * scale).astype(s.dtype))

    return jax.tree.map(make, shapes)


def cast_params_bf16(tree: Any) -> Any:
    """Inference-precision cast mirroring the reference (fp16 weights with
    the mamba state params forced fp32, ``Inference.py:430-433``): kernels
    (>=2-D leaves) go to bf16; 1-D leaves — biases, norm affines, and the
    scan's ``A_logs``/``Ds``/``dt_projs_bias`` rows — stay fp32 (tiny, and
    the scan kernel contract requires fp32 state params).

    Keeping fp32 master params and letting the module's ``dtype=bf16``
    convert on the fly doubles HBM (fp32 copy + bf16 temps inside the
    sampler's while-loop) — enough to OOM a 16 GB chip on the full clip
    pipeline."""

    def cast(path, x):
        name = str(path[-1].key) if path else ""
        if (getattr(x, "ndim", 0) >= 2 and x.dtype == jnp.float32
                and name not in ("A_logs", "dt_projs_weight",
                                 "dt_projs_bias")):
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree_util.tree_map_with_path(cast, tree)


def convert_checkpoint_params(cfg, unet_kwargs=None) -> "Dict[str, Any] | None":
    """Build the pipeline params dict from the reference's on-disk artifacts
    (the six ``.pth`` checkpoint contract ``Inference.py:80-142`` plus the
    SVD-XT VAE and whisper-tiny). Returns None when the UNet checkpoint is
    absent (this environment ships no weights); optional frozen encoders
    (VAE / whisper / VASA towers) are included only when their files exist
    — callers merge over a random-init base. Shared by the inference CLI
    and the trainer, so training fine-tunes the *actual* converted model
    when weights exist."""
    import os

    from actalker_tpu.io import weights as W

    def have(p):
        return p and os.path.exists(p)

    if not have(getattr(cfg, "unet_checkpoint_path", None)):
        return None
    params = {}
    params["unet"] = W.convert_unet(
        W.load_torch_state_dict(cfg.unet_checkpoint_path),
        **(unet_kwargs or {}))
    if have(cfg.adapter_module_checkpoint_path):
        W.load_adapter_modules(
            params["unet"],
            W.load_torch_state_dict(cfg.adapter_module_checkpoint_path),
            **(unet_kwargs or {}))
    params["pose_guider"] = W.convert_pose_guider(
        W.load_torch_state_dict(cfg.pose_guider_checkpoint_path))
    params["audio_proj"] = W.convert_audio_proj(
        W.load_torch_state_dict(cfg.audio_linear_checkpoint_path))
    params["id_proj"] = W.convert_id_proj(
        W.load_torch_state_dict(cfg.id_proj_checkpoint_path))
    params["vasa_proj"] = W.convert_vasa_proj(
        W.load_torch_state_dict(cfg.vasa_linear_checkpoint_path))
    vae_path = os.path.join(cfg.pretrained_model_name_or_path or "", "vae",
                            "diffusion_pytorch_model.fp16.safetensors")
    if os.path.exists(vae_path):
        params["vae"] = W.convert_vae(W.load_torch_state_dict(vae_path))
    wsp = os.path.join(cfg.whisper_model or "", "pytorch_model.bin")
    if os.path.exists(wsp):
        params["whisper"] = W.convert_whisper_encoder(
            W.load_torch_state_dict(wsp))
    if have(cfg.vasa_checkpoint_path):
        import torch

        ck = torch.load(cfg.vasa_checkpoint_path, map_location="cpu",
                        weights_only=True)
        gen = {k: v.float().numpy() for k, v in ck["generator"].items()}
        params["vasa_expression"] = W.convert_vasa_expression(gen)
        params["vasa_pose"] = W.convert_vasa_pose(
            {k: v.float().numpy() for k, v in ck["pose_model"].items()})
    return params


def init_pipeline_params(
    modules,
    key: jax.Array,
    image_size: Tuple[int, int] = (64, 64),
    latent_size: Tuple[int, int] = (8, 8),
    frames: int = 2,
    use_eval_shape: bool = False,
    seed: int = 0,
) -> Dict[str, Any]:
    """Init every module in a PipelineModules bundle with dummy inputs."""
    h, w = image_size
    lh, lw = latent_size
    ks = jax.random.split(key, 7)
    from actalker_tpu.models.conditioning import Conditioning

    cond = Conditioning(
        id_tokens=jnp.zeros((frames, 1, 1024)),
        audio_tokens=jnp.zeros((frames, 32, 1024)),
        vasa_tokens=jnp.zeros((frames, 1, 1024)),
        audio_mask=jnp.ones((1, 1, lh, lw)),
        exp_mask=jnp.ones((1, 1, lh, lw)),
    )
    inits = {
        "unet": lambda k: modules.unet.init(
            k, jnp.zeros((1, frames, lh, lw, 8)), 0.5, cond,
            jnp.zeros((1, 3)),
        ),
        "vae": lambda k: modules.vae.init(k, jnp.zeros((1, frames, h, w, 3))),
        "audio_proj": lambda k: modules.audio_proj.init(
            k, jnp.zeros((1, 1, 10, 5, 384))
        ),
        "id_proj": lambda k: modules.id_proj.init(k, jnp.zeros((1, 512))),
        "vasa_proj": lambda k: modules.vasa_proj.init(k, jnp.zeros((1, 512))),
        "pose_guider": lambda k: modules.pose_guider.init(
            k, jnp.zeros((1, frames, h, w, 3))
        ),
        "whisper": lambda k: modules.whisper.init(k, jnp.zeros((1, 80, 100))),
        "vasa_expression": lambda k: modules.vasa_expression.init(
            k, jnp.zeros((1, 64, 64, 3))
        ),
        "vasa_pose": lambda k: modules.vasa_pose.init(
            k, jnp.zeros((1, 64, 64, 3))
        ),
    }
    params = {}
    for i, (name, fn) in enumerate(inits.items()):
        if use_eval_shape:
            shapes = jax.eval_shape(fn, ks[i])
            params[name] = random_like(shapes, seed=seed + i)
        else:
            params[name] = fn(ks[i])
    return params
