"""TPU micro-benchmark: fused GN+SiLU+3x3conv kernel vs the XLA lowering at
the flagship resnet shapes (r5 conv+stats pool attack).

Usage: timeout 2400 python -u tools/micro_resconv.py
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

from actalker_tpu.ops.resconv import _gn_affine, _gnconv_pallas, _gnconv_xla


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, x, n=20):
    out = fn(x)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        # dependency chain regardless of cout (tunnel-safe timing)
        out = fn(x + 0.0 * out[..., :1].astype(x.dtype))
    drain(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    # (n, h, w, cin, cout): flagship spatial resnet convs (56 = 4 CFG x 14f)
    shapes = [
        (56, 64, 64, 320, 320),
        (56, 64, 64, 640, 320),     # up3 concat-skip conv1
        (56, 32, 32, 640, 640),
        (56, 16, 16, 1280, 1280),
    ]
    for (n, h, w, c, co) in shapes:
        ks = jax.random.split(rng, 5)
        x = jax.random.normal(ks[0], (n, h, w, c), jnp.bfloat16)
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
        beta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
        wk = (jax.random.normal(ks[3], (3, 3, c, co), jnp.float32) * 0.05
              ).astype(jnp.bfloat16)
        cb = 0.1 * jax.random.normal(ks[4], (co,), jnp.float32)

        @jax.jit
        def f_pallas(x):
            a, b = _gn_affine(x, gamma, beta, 32, 1e-5)
            return _gnconv_pallas(x, a, b, wk, cb, interpret=False)

        @jax.jit
        def f_xla(x):
            return _gnconv_xla(x, gamma, beta, 32, 1e-5, wk, cb, jnp.bfloat16)

        yk = np.asarray(f_pallas(x), np.float32)
        yx = np.asarray(f_xla(x), np.float32)
        err = np.abs(yk - yx).max() / (np.abs(yx).max() + 1e-9)
        tk = timeit(f_pallas, x)
        tx = timeit(f_xla, x)
        ideal = n * h * w * c * co * 9 * 2 / 197e12 * 1e3
        print(f"resconv ({n},{h},{w},{c}->{co}): pallas {tk:7.3f} ms  "
              f"xla {tx:7.3f} ms  ideal {ideal:5.2f} ms  relerr={err:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
