"""Micro: token-space GEMM lowering at the bench shapes.

The step trace shows proj_out (56,4096,320)@(320,320) emitted as a
convolution with EmitInputBatchInLanes at ~4% MFU (5.5 ms vs 0.24 ms ideal).
This sweeps equivalent formulations to find one XLA lowers well:
2-D reshape, einsum 3-D, fp32 accum dot_general, and the conv-free
preferred-layout variants.

Usage: timeout 1800 python -u tools/micro_gemm.py
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


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, args, n=30):
    out = fn(*args)
    drain(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    b, s = 56, 4096
    for (cin, cout) in [(320, 320), (320, 2560), (1280, 320)]:
        x3 = jnp.asarray(rng.standard_normal((b, s, cin)), jnp.bfloat16)
        x2 = jnp.asarray(rng.standard_normal((b * s, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.02, jnp.bfloat16)
        flops = 2 * b * s * cin * cout
        ideal = flops / 197e12 * 1e3

        t2d = timeit(jax.jit(lambda x, w: x @ w), (x2, w))
        t3d = timeit(jax.jit(lambda x, w: jnp.einsum("bsc,cd->bsd", x, w)),
                     (x3, w))
        t3r = timeit(jax.jit(
            lambda x, w: (x.reshape(-1, x.shape[-1]) @ w
                          ).reshape(x.shape[0], x.shape[1], -1)), (x3, w))
        print(f"({cin:4d}->{cout:4d}) ideal {ideal:6.3f} | 2d {t2d:6.3f} | "
              f"einsum3d {t3d:6.3f} | reshape2d {t3r:6.3f} ms")

    # GN + GEMM + residual chain (what a block actually does)
    cin = 320
    x3 = jnp.asarray(rng.standard_normal((b, s, cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((cin, cin)) * 0.02, jnp.bfloat16)
    g = jnp.ones((cin,), jnp.float32)
    bta = jnp.zeros((cin,), jnp.float32)

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + bta).astype(x.dtype)

    t_chain = timeit(jax.jit(
        lambda x, w: x + ln(x) @ w), (x3, w1))
    t_chain2 = timeit(jax.jit(
        lambda x, w: x + (ln(x).reshape(-1, cin) @ w).reshape(x.shape)),
        (x3, w1))
    print(f"LN+gemm+res 3d {t_chain:6.3f} | reshape2d {t_chain2:6.3f} ms "
          f"(ideal gemm {2*b*s*cin*cin/197e12*1e3:.3f})")


if __name__ == "__main__":
    main()
