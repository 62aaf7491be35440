"""Does padding conv channels to 128-multiples buy back the MXU?

r5 finding: XLA's (56,64,64,320)->320 3x3 conv runs ~6.5 ms vs a 2.15 ms
roofline (~33% MFU, "batch in sublanes" emitter) while the same geometry at
C=640 runs ~99%. 320 is 2.5 lane tiles; this times jnp.pad-to-384/1024
variants (plus GN-affine+SiLU prologue, as in the resnet blocks).

Usage: timeout 2400 python -u tools/micro_convpad.py
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


def conv(y, w):
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timeit(fn, x, n=20):
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(x + 0.0 * out[..., :1].astype(x.dtype))
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def rup(c, m=128):
    return (c + m - 1) // m * m


def main():
    rng = jax.random.PRNGKey(0)
    shapes = [
        (56, 64, 64, 320, 320),
        (56, 64, 64, 960, 320),
        (56, 32, 32, 640, 640),
        (56, 16, 16, 1280, 1280),
        (56, 64, 64, 320, 640),    # downsample-ish
    ]
    for (n, h, wd, c, co) in shapes:
        ks = jax.random.split(rng, 4)
        x = jax.random.normal(ks[0], (n, h, wd, c), jnp.bfloat16)
        w = (jax.random.normal(ks[1], (3, 3, c, co), jnp.float32) * 0.05
             ).astype(jnp.bfloat16)
        a = 1.0 + 0.1 * jax.random.normal(ks[2], (n, c), jnp.float32)
        b = 0.1 * jax.random.normal(ks[3], (n, c), jnp.float32)

        def pro(x):
            y = (x.astype(jnp.float32) * a[:, None, None, :]
                 + b[:, None, None, :])
            return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

        f_plain = jax.jit(lambda x: conv(pro(x), w))

        cp, cop = rup(c), rup(co)
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, cop - co)))

        def f_padded(x):
            y = jnp.pad(pro(x), ((0, 0), (0, 0), (0, 0), (0, cp - c)))
            return conv(y, wp)[..., :co]

        f_padded = jax.jit(f_padded)

        # pad input channels only (K dim), keep output width
        wpi = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, 0)))

        def f_padin(x):
            y = jnp.pad(pro(x), ((0, 0), (0, 0), (0, 0), (0, cp - c)))
            return conv(y, wpi)

        f_padin = jax.jit(f_padin)

        ideal = n * h * wd * c * co * 9 * 2 / 197e12 * 1e3
        tp = timeit(f_plain, x)
        tpad = timeit(f_padded, x)
        tpin = timeit(f_padin, x)
        print(f"conv ({n},{h},{wd},{c}->{co}): plain {tp:7.3f}  "
              f"pad{cp}->{cop} {tpad:7.3f}  padin{cp} {tpin:7.3f}  "
              f"ideal {ideal:5.2f} ms", flush=True)


if __name__ == "__main__":
    main()
