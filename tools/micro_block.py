"""Standalone benchmark of one TransformerSpatioTemporal block at the bench
shape (4x14 frames, 64x64 tokens, C=320, heads=5, mamba on) — the unit the
step trace says costs ~92 ms each (x5 at this resolution; ~850 ms of the
1063 ms step lives in these blocks across resolutions).

Used for fast A/B iteration on layout restructurings: full-step bench A/Bs
cost ~4 min each, this compiles in ~30 s and isolates the block.

Usage: timeout 1800 python -u tools/micro_block.py [res=64] [ch=320]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from actalker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import ml_dtypes

from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.transformer_st import TransformerSpatioTemporal


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    b, f = 4, 14
    heads, hd = ch // 64, 64
    model = TransformerSpatioTemporal(
        heads=heads, head_dim=hd, context_dim=1024, use_mamba=True,
        dtype=jnp.bfloat16)
    x = jnp.zeros((b, f, res, res, ch), jnp.bfloat16)
    cond = Conditioning(
        id_tokens=jnp.zeros((b * f, 1, 1024), jnp.bfloat16),
        audio_tokens=jnp.zeros((b * f, 32, 1024), jnp.bfloat16),
        vasa_tokens=jnp.zeros((b * f, 1, 1024), jnp.bfloat16),
        audio_mask=jnp.ones((1, 1, 512, 512), jnp.float32),
        exp_mask=jnp.ones((1, 1, 512, 512), jnp.float32),
    )
    ioi = jnp.zeros((b, f), jnp.bfloat16)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, cond, ioi)
    rng = np.random.default_rng(0)
    params = jax.device_put(jax.tree.map(
        lambda s: (rng.standard_normal(s.shape, dtype=np.float32) * 0.02)
        .astype(ml_dtypes.bfloat16), shapes))

    @jax.jit
    def fwd(params, x):
        return model.apply(params, x, cond, ioi)

    hlo_out = os.environ.get("ACTALKER_BLOCK_HLO")
    if hlo_out:
        txt = fwd.lower(params, x).compile().as_text()
        with open(hlo_out, "w") as fh:
            fh.write(txt)
        print(f"hlo -> {hlo_out} ({len(txt)} bytes)")

    x = jax.device_put(np.asarray(
        rng.standard_normal((b, f, res, res, ch), dtype=np.float32) * 0.1,
        dtype=ml_dtypes.bfloat16))
    y = fwd(params, x)
    float(jnp.sum(y.astype(jnp.float32)))          # compile+warm, drain

    n = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = x
        for _ in range(n):
            out = fwd(params, out)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"block res={res} ch={ch}: {best*1e3:8.3f} ms")

    prof_dir = os.environ.get("ACTALKER_BLOCK_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            out = x
            for _ in range(3):
                out = fwd(params, out)
            float(jnp.sum(out.astype(jnp.float32)))
        print(f"trace -> {prof_dir}")


if __name__ == "__main__":
    main()
