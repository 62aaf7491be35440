"""Capture an xprof trace of the bench denoise step and print the top ops.

Runs the exact bench.py workload (512px / 14 frames / 4-way CFG UNet forward,
bf16) once under ``jax.profiler.trace``, then summarizes the device plane via
tools/xprof_top.py. Norm-stats lowering follows ACTALKER_NORM_STATS (default
matmul, see models/common.py).

Usage: timeout 1800 python -u tools/step_profile.py [ntop]
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from actalker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from actalker_tpu.models.conditioning import Conditioning
    from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition

    cfg = UNetConfig()
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
    # --prod: the reference's default operating point (576px -> 72x72
    # latents, 25-frame windows) instead of the 512px/14f bench shape
    prod = "--prod" in sys.argv
    b, f, hw = (4, 25, 72) if prod else (4, 14, 64)
    cond = Conditioning(
        id_tokens=jnp.zeros((b * f, 1, 1024), jnp.bfloat16),
        audio_tokens=jnp.zeros((b * f, 32, 1024), jnp.bfloat16),
        vasa_tokens=jnp.zeros((b * f, 1, 1024), jnp.bfloat16),
        audio_mask=jnp.ones((1, 1, hw * 8, hw * 8), jnp.float32),
        exp_mask=jnp.ones((1, 1, hw * 8, hw * 8), jnp.float32),
    )
    sample0 = jnp.zeros((b, f, hw, hw, 8), jnp.bfloat16)
    tids = jnp.zeros((b, 3), jnp.bfloat16)
    pose = jnp.zeros((b, f, hw, hw, cfg.block_out_channels[0]), jnp.bfloat16)

    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), sample0, 0.5, cond, tids, pose
    )
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: (rng.standard_normal(s.shape, dtype=np.float32) * 0.02)
        .astype(ml_dtypes.bfloat16),
        shapes,
    )
    params = jax.device_put(params)

    @jax.jit
    def denoise_step(params, sample, pose):
        out = unet.apply(params, sample, 0.5, cond, tids, pose)
        nxt = jnp.concatenate([sample[..., :4] - 0.1 * out, sample[..., 4:]],
                              axis=-1)
        return nxt

    sample = denoise_step(params, sample0, pose)
    float(jnp.sum(sample.astype(jnp.float32)))  # warm + drain

    logdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "outputs",
        "xprof_step_576" if prod else "xprof_step")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        for _ in range(3):
            sample = denoise_step(params, sample, pose)
        float(jnp.sum(sample.astype(jnp.float32)))

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    ntop = pos[0] if pos else "40"
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "xprof_top.py"),
                    logdir, ntop])


if __name__ == "__main__":
    main()
