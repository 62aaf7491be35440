"""Micro-bench the grouped selective-scan kernel v1 vs v2 on the real TPU.

Shapes = the three flagship SSM launches seen in the step trace
(outputs/profile_r04.log): res-64 (Lp 4160, dp 640), res-32 (1088, 1280),
res-16 (320, 2560), all at Bp 56, G 4, N 16.

Usage: timeout 2400 python -u tools/micro_scan.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

G, N, RANK = 4, 16, 20


def build(rng, lp, bp, dp):
    import jax
    import ml_dtypes

    from actalker_tpu.ops import selective_scan_pallas as SP

    u = (rng.standard_normal((lp, bp, 2 * dp)) * 0.3).astype(
        ml_dtypes.bfloat16)
    slab = np.zeros((lp, bp, G * 128), np.float32)
    for gi in range(G):
        slab[:, :, gi * 128:gi * 128 + RANK + 2 * N] = \
            rng.standard_normal((lp, bp, RANK + 2 * N)) * 0.3
    dtw = np.zeros((G, 128, dp), np.float32)
    dtw[:, :RANK] = rng.standard_normal((G, RANK, dp)) * 0.3
    dtw[:, SP.MASK_LANE] = -1e9
    A = (-np.exp(rng.standard_normal((G, dp, N)) * 0.3)).astype(np.float32)
    D = rng.standard_normal((G, dp)).astype(np.float32)
    bias = (rng.standard_normal((G, dp)) * 0.2).astype(np.float32)
    return (jax.device_put(u),
            jax.device_put(slab.astype(ml_dtypes.bfloat16)),
            jax.device_put(dtw), jax.device_put(A), jax.device_put(D),
            jax.device_put(bias))


def one(rng, impl, lp, bp, dp):
    import jax
    import jax.numpy as jnp

    from actalker_tpu.ops import selective_scan_pallas as SP

    SP.set_scan_impl(impl)
    u, slab, dtw, A, D, bias = build(rng, lp, bp, dp)

    @jax.jit
    def f(u, slab):
        y = SP.ssm_scan_grouped(u, slab, dtw, A, D, bias, rank=RANK)
        mix = jnp.concatenate(
            [y[:, :, :dp] + y[:, :, dp:2 * dp],
             y[:, :, 2 * dp:3 * dp] + y[:, :, 3 * dp:]], axis=-1)
        return (u + 0.001 * mix, slab)

    u2, s2 = f(u, slab)
    float(jnp.sum(u2[:1].astype(jnp.float32)))
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        u2, s2 = f(u2, s2)
    float(jnp.sum(u2[:1].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{impl} Lp={lp:5d} dp={dp:5d}: {dt*1e3:8.3f} ms")


def main():
    rng = np.random.default_rng(0)
    for impl in ("v1", "v2"):
        for lp, bp, dp in [(4160, 56, 640), (1088, 56, 1280),
                           (320, 56, 2560)]:
            try:
                one(rng, impl, lp, bp, dp)
            except Exception as e:
                print(f"{impl} Lp={lp} dp={dp}: {type(e).__name__} "
                      f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
