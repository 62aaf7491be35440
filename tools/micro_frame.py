"""Micro-bench frame-attention lowerings on the real TPU.

Shapes: the res-64 and res-32 temporal blocks of the bench step
(B=4, F=14, S=4096/1024, C=320/640). Compares the XLA einsum (current
default, ~11 ms in-situ at res-64 incl. layout copies), the v1 Pallas
kernel (d-on-lanes, known slow), and the v2 kernel (d-on-sublanes).

Usage: timeout 2400 python -u tools/micro_frame.py
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

    from actalker_tpu.ops import mha as M

    rng = np.random.default_rng(0)

    def bench(name, fn, b, f, s, c, h):
        sc = (c // h) ** -0.5
        mk = lambda: jax.device_put(  # noqa: E731
            (rng.standard_normal((b, f, s, c)) * 0.3).astype(
                ml_dtypes.bfloat16))
        q, k, v = mk(), mk(), mk()

        @jax.jit
        def step(q, k, v):
            o = fn(q, k, v, h, sc)
            return q + 0.001 * o, k, v

        q, k, v = step(q, k, v)
        float(jnp.sum(q[:1].astype(jnp.float32)))
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            q, k, v = step(q, k, v)
        float(jnp.sum(q[:1].astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"{name:10s} b={b} f={f} s={s:5d} c={c:4d} h={h:2d}: "
              f"{dt*1e3:8.3f} ms")

    for b, f, s, c, h in [(4, 14, 4096, 320, 5), (4, 14, 1024, 640, 10)]:
        bench("xla", lambda *a: M._frame_xla(*a), b, f, s, c, h)
        try:
            bench("pallas_v2",
                  lambda *a: M._frame_pallas_v2(*a, interpret=False),
                  b, f, s, c, h)
        except Exception as e:
            print(f"pallas_v2 s={s}: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:110]}")


if __name__ == "__main__":
    main()
