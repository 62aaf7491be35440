"""Dump the optimized (post-layout) HLO of the bench denoise step.

Writes outputs/step_hlo.txt — the compiled executable text with layouts,
fusion bodies, and memory annotations, for diagnosing layout-entangled
fusions seen in the xprof step trace.

Usage: timeout 1800 python -u tools/dump_step_hlo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from actalker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import ml_dtypes

from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition


def main():
    cfg = UNetConfig()
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
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

    @jax.jit
    def denoise_step(params, sample, pose):
        out = unet.apply(params, sample, 0.5, cond, tids, pose)
        nxt = jnp.concatenate([sample[..., :4] - 0.1 * out, sample[..., 4:]],
                              axis=-1)
        return nxt

    lowered = denoise_step.lower(params, sample0, pose)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "outputs",
        "step_hlo_576.txt" if prod else "step_hlo.txt")
    with open(out_path, "w") as fh:
        fh.write(txt)
    print(f"wrote {out_path} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
