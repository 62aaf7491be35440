"""Microbenchmarks for the norm + attention hot spots found in the step trace.

Step trace (outputs/xprof_step, 2026-08-18) puts ~200 ms/step into norm-stat
fusions and ~100 ms into flash attention at 35% MFU. This times isolated
candidates on the real chip:
  * GroupNorm32 at (56,64,64,320) bf16 — trace shows ~3.3-8.9 ms/fusion vs a
    ~0.4 ms HBM floor;
  * LayerNormF32 at (56,4096,320);
  * legacy pallas flash_attention vs splash_attention at (56,5,4096,64).

Usage: timeout 1800 python -u tools/micro_norm.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _drain(out):
    # axon (tunneled TPU) does not honor block_until_ready; a host transfer
    # is the only reliable drain (same pattern as bench.py).
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, x, *args, n=50, warm=3):
    """Times fn by CHAINING iterations (out feeds the next call's first arg,
    shape permitting) and draining once via host transfer."""
    out = x
    for _ in range(warm):
        out = fn(out, *args)
        out = out if (hasattr(out, "shape") and out.shape == x.shape
                      and out.dtype == x.dtype) else x
    _drain(out)
    t0 = time.perf_counter()
    out = x
    for _ in range(n):
        out = fn(out, *args)
        out = out if (hasattr(out, "shape") and out.shape == x.shape
                      and out.dtype == x.dtype) else x
    _drain(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from actalker_tpu.models.common import GroupNorm32, LayerNormF32

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (56, 64, 64, 320), jnp.bfloat16)

    gn = GroupNorm32(dtype=jnp.bfloat16)
    gp = gn.init(rng, x)

    @jax.jit
    def gn_apply(p, x):
        return gn.apply(p, x)

    print(f"GN32 (56,64,64,320) bf16:        {timeit(lambda y: gn_apply(gp, y), x):8.3f} ms")

    # variant: stats over a (N, HW, C) reshape
    @jax.jit
    def gn_reshaped(p, x):
        n, h, w, c = x.shape
        return gn.apply(p, x.reshape(n, h * w, c)).reshape(x.shape)

    print(f"GN32 reshaped (56,4096,320):     {timeit(lambda y: gn_reshaped(gp, y), x):8.3f} ms")

    # floor probe: plain elementwise copy-scale (pure HBM r/w)
    @jax.jit
    def scale_only(x):
        return x * jnp.bfloat16(1.0001) + jnp.bfloat16(0.5)

    print(f"elementwise affine (floor):      {timeit(scale_only, x):8.3f} ms")

    # floor probe: stats only
    @jax.jit
    def stats_only(x):
        s1 = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
        s2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
        return s1, s2

    print(f"GN stats only (reduce):          {timeit(stats_only, x):8.3f} ms")

    @jax.jit
    def stats_matmul(x):
        n, h, w, c = x.shape
        xf = x.reshape(n, h * w, c)
        ones = jnp.ones((h * w,), x.dtype)
        s1 = jnp.einsum("nsc,s->nc", xf, ones,
                        preferred_element_type=jnp.float32)
        s2 = jnp.einsum("nsc,nsc,s->nc", xf, xf, ones,
                        preferred_element_type=jnp.float32)
        return s1, s2

    print(f"GN stats only (matmul):          {timeit(stats_matmul, x):8.3f} ms")

    ln = LayerNormF32()
    xt = jax.random.normal(rng, (56, 4096, 320), jnp.bfloat16)
    lp = ln.init(rng, xt)

    @jax.jit
    def ln_apply(p, x):
        return ln.apply(p, x)

    print(f"LN (56,4096,320) bf16:           {timeit(lambda y: ln_apply(lp, y), xt):8.3f} ms")

    # attention A/B
    q = jax.random.normal(rng, (56, 5, 4096, 64), jnp.bfloat16)
    k = jax.random.normal(rng, (56, 5, 4096, 64), jnp.bfloat16)
    v = jax.random.normal(rng, (56, 5, 4096, 64), jnp.bfloat16)

    from actalker_tpu.ops.attention import self_attention_bhsd

    att = jax.jit(self_attention_bhsd)
    print(f"flash attn (56,5,4096,64):       {timeit(lambda y: att(y, k, v), q):8.3f} ms")

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        def make_splash():
            mask = sm.FullMask((4096, 4096))
            mmask = sm.MultiHeadMask([mask] * 5)
            kernel = sk.make_splash_mha(
                mask=mmask, head_shards=1, q_seq_shards=1)
            return kernel

        kernel = make_splash()

        @jax.jit
        def splash(q, k, v):
            scale = 64 ** -0.5
            return jax.vmap(kernel)(q * scale, k, v)

        print(f"splash attn (56,5,4096,64):      {timeit(lambda y: splash(y, k, v), q):8.3f} ms")
    except Exception as e:  # pragma: no cover
        print(f"splash attn: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
