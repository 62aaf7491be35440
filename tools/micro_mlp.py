"""Micro-bench the fused GEGLU kernel's M-tile (bm) on the real TPU.

The step trace shows ff/ff_in custom-calls at ~30-35% MFU (113+57 ms/step,
outputs/profile_r04.log). The f32 (bm, 2*inner) intermediate budget decides
bm; this sweeps it at the three flagship widths.

Usage: timeout 1800 python -u tools/micro_mlp.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from actalker_tpu.ops import mlp as M

    rng = np.random.default_rng(0)

    def bench(m, c, mult=4, budget_mb=8):
        inner = c * mult
        x = jax.device_put(rng.standard_normal((m, c), np.float32)
                           .astype(ml_dtypes.bfloat16))
        w1 = jax.device_put((rng.standard_normal((c, 2 * inner), np.float32)
                             * 0.02).astype(ml_dtypes.bfloat16))
        b1 = jax.device_put(np.zeros(2 * inner, np.float32))
        w2 = jax.device_put((rng.standard_normal((inner, c), np.float32)
                             * 0.02).astype(ml_dtypes.bfloat16))
        b2 = jax.device_put(np.zeros(c, np.float32))

        bm = M._pick_bm(m, inner)

        @jax.jit
        def f(x):
            y = M._mlp_pallas(x, w1, b1, w2, b2, interpret=False)
            return x + 0.001 * y          # dependency chain

        x = f(x)
        float(jnp.sum(x.astype(jnp.float32)))
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            x = f(x)
        float(jnp.sum(x.astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        fl = m * (c * 2 * inner + inner * c) * 2
        print(f"m={m:7d} c={c:5d} bm={bm:5d} budget={budget_mb:3d}MB "
              f"{dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s")
        return dt

    shapes = [(229376, 320), (57344, 640), (14336, 1280)]
    for budget in (8, 16, 32, 64):
        os.environ["ACTALKER_MLP_BUDGET_MB"] = str(budget)
        for m, c in shapes:
            try:
                bench(m, c, budget_mb=budget)
            except Exception as e:
                print(f"m={m} c={c} budget={budget}: {type(e).__name__} {e}")


if __name__ == "__main__":
    main()
