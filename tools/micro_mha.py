"""Correctness + timing of the token-layout attention kernels on the TPU.

Compares ops.mha kernels against their XLA fallbacks at the bench shapes and
times them (chained-iteration + single host-drain, see bench.py).

Usage: timeout 1800 python -u tools/micro_mha.py
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

from actalker_tpu.ops.mha import (
    _frame_xla,
    _mha_xla,
    frame_attention_tokens,
    mha_tokens,
)


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, q, k, v, n=30):
    out = fn(q, k, v)
    drain(out)
    t0 = time.perf_counter()
    out = q
    for _ in range(n):
        out = fn(out, k, v)
    drain(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    for (b, s, c, h) in [(56, 4096, 320, 5), (56, 1024, 640, 10),
                         (56, 256, 1280, 20)]:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, c), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, c), jnp.bfloat16)
        f_kern = jax.jit(lambda q, k, v, h=h: mha_tokens(q, k, v, h))
        f_xla = jax.jit(lambda q, k, v, h=h: _mha_xla(q, k, v, h, (c//h)**-0.5))
        yk = np.asarray(f_kern(q, k, v), np.float32)
        yx = np.asarray(f_xla(q, k, v), np.float32)
        err = np.abs(yk - yx).max()
        t = timeit(f_kern, q, k, v)
        print(f"mha ({b},{s},{c},h{h}): {t:8.3f} ms  maxerr={err:.4f}")

    for (b, f, s, c, h) in [(4, 14, 4096, 320, 5), (4, 14, 1024, 640, 10)]:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b * f, s, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b * f, s, c), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b * f, s, c), jnp.bfloat16)
        fk = jax.jit(lambda q, k, v: frame_attention_tokens(q, k, v, f, h))
        fx = jax.jit(lambda q, k, v: _frame_xla(
            q.reshape(b, f, s, c), k.reshape(b, f, s, c),
            v.reshape(b, f, s, c), h, (c//h)**-0.5).reshape(b*f, s, c))
        yk = np.asarray(fk(q, k, v), np.float32)
        yx = np.asarray(fx(q, k, v), np.float32)
        err = np.abs(yk - yx).max()
        t = timeit(fk, q, k, v)
        tx = timeit(fx, q, k, v)
        print(f"frame ({b}x{f},{s},{c},h{h}): kernel {t:8.3f} ms  "
              f"xla {tx:8.3f} ms  maxerr={err:.4f}")


if __name__ == "__main__":
    main()
