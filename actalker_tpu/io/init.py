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
