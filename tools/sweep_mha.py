"""Sweep token-layout flash-attention block sizes on the real TPU.

The r4 profile puts the spatial flash pool at ~118 ms/step (~40% MFU at
D=64) with blocks picked by ops/mha._pick_blocks (2048/1024 at S=4096).
This sweeps ACTALKER_MHA_BLOCKS over the divisor grid at the three bench
shapes and prints ms per call, so the default can be set from data.

Also compile-checks the NEW padded flash backward (r4 advisor finding) at
the 576-px S=5184 shape — without the segment-id padding the bwd would try
to materialize a ~54 GB f32 score tensor and fail to compile.

Usage: timeout 3600 python -u tools/sweep_mha.py [--bwd-only]
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

from actalker_tpu.ops import mha as M


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


def sweep():
    rng = jax.random.PRNGKey(0)
    shapes = [(56, 4096, 320, 5), (56, 1024, 640, 10), (56, 256, 1280, 20)]
    for (b, s, c, h) in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, c), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, c), jnp.bfloat16)
        cands = []
        for bq in (256, 512, 1024):
            for bk in (1024, 2048, 4096):
                if s % bq or s % bk or bq > s or bk > s:
                    continue
                # scores bq*bk f32 + acc bq*c f32 + 3 blocks; keep < 48 MB
                # (bq=4096 spilled 105 MB of register-allocator slots and
                # killed the whole sweep on the first run)
                if bq * bk * 4 + bq * c * 4 + (bq + 2 * bk) * c * 2 > 48 * 2**20:
                    continue
                cands.append((bq, bk))
        for bq, bk in cands:
            os.environ["ACTALKER_MHA_BLOCKS"] = f"{bq},{bk}"
            try:
                f = jax.jit(lambda q, k, v, h=h: M.mha_tokens(q, k, v, h))
                t = timeit(f, q, k, v)
                print(f"mha ({b},{s},{c},h{h}) bq={bq:4d} bk={bk:4d}: "
                      f"{t:8.3f} ms", flush=True)
            except Exception as e:
                print(f"mha ({b},{s},{c},h{h}) bq={bq:4d} bk={bk:4d}: "
                      f"FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
        # default picker (1-pass kernel when it chooses bk=s)
        os.environ.pop("ACTALKER_MHA_BLOCKS", None)
        try:
            f = jax.jit(lambda q, k, v, h=h: M.mha_tokens(q, k, v, h))
            t = timeit(f, q, k, v)
            dbq, dbk = M._pick_blocks(s, c)
            print(f"mha ({b},{s},{c},h{h}) DEFAULT bq={dbq} bk={dbk}: "
                  f"{t:8.3f} ms", flush=True)
        except Exception as e:
            print(f"mha ({b},{s},{c},h{h}) DEFAULT: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def bwd_5184():
    # 576-px spatial shape, small batch: does the padded-segment flash bwd
    # compile + run, and does it agree with the einsum vjp at a small shape?
    b, s, c, h = 8, 5184, 320, 5
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, c), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, c), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(jnp.square(M.mha_tokens(q, k, v, h).astype(jnp.float32)))

    t0 = time.perf_counter()
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    dq, dk, dv = g(q, k, v)
    drain(dq)
    print(f"bwd S=5184 padded flash: compiled+ran in "
          f"{time.perf_counter() - t0:.1f}s, |dq|={drain(jnp.abs(dq)):.1f}",
          flush=True)

    # numeric check at a small non-256-multiple shape vs einsum vjp
    b2, s2 = 2, 1408            # 1408 = 11*128, not a 512-multiple
    q2 = jax.random.normal(ks[0], (b2, s2, c), jnp.float32) * 0.1
    k2 = jax.random.normal(ks[1], (b2, s2, c), jnp.float32) * 0.1
    v2 = jax.random.normal(ks[2], (b2, s2, c), jnp.float32) * 0.1

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(M._mha_xla(q, k, v, h, (c // h) ** -0.5)))

    ga = jax.jit(jax.grad(lambda *a: loss(*a), argnums=(0, 1, 2)))(q2, k2, v2)
    gb = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q2, k2, v2)
    for name, a, bb in zip("qkv", ga, gb):
        err = float(jnp.max(jnp.abs(a - bb)))
        rel = err / (float(jnp.max(jnp.abs(bb))) + 1e-9)
        print(f"bwd grad d{name} maxerr={err:.5f} rel={rel:.5f}", flush=True)


def sweep_576():
    """Block sweep at the 576-px production spatial shape (VERDICT r4 weak
    #3: the 5376→1792/768 block choice was untuned there). S=5184 pads to
    5376 = 21*256 inside the kernel; candidate bq are 5376's 256-multiple
    divisors, bk=5376 routes to the 1-pass kernel."""
    b, s, c, h = 100, 5184, 320, 5          # 4-CFG x 25 frames
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, c), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, c), jnp.bfloat16)
    for bq, bk in ((256, 5376), (768, 5376), (1344, 5376),
                   (768, 1344), (1344, 1344), (256, 2688), (768, 2688)):
        os.environ["ACTALKER_MHA_BLOCKS"] = f"{bq},{bk}"
        try:
            f = jax.jit(lambda q, k, v: M.mha_tokens(q, k, v, h))
            t = timeit(f, q, k, v, n=10)
            print(f"mha576 ({b},{s}->5376,{c},h{h}) bq={bq:4d} bk={bk:4d}: "
                  f"{t:8.3f} ms", flush=True)
        except Exception as e:
            print(f"mha576 bq={bq:4d} bk={bk:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    os.environ.pop("ACTALKER_MHA_BLOCKS", None)
    f = jax.jit(lambda q, k, v: M.mha_tokens(q, k, v, h))
    t = timeit(f, q, k, v, n=10)
    dbq, dbk = M._pick_blocks(5376, c)
    print(f"mha576 DEFAULT bq={dbq} bk={dbk}: {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    if "--s576" in sys.argv[1:]:
        sweep_576()
    else:
        if "--bwd-only" not in sys.argv[1:]:
            sweep()
        bwd_5184()
