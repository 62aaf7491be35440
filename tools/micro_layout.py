"""Microbenchmarks for the (B,L,C) <-> (L,B,C) seam around the SSM blocks.

The step trace shows ~100 ms/step of relayout fusions feeding/draining the
grouped scan custom call (plus norm-stat fusions that slow down 2-6x vs
standalone when entangled with these layouts). This isolates the candidates:

  * materialized moveaxis (56,4096,320) -> (4096,56,320) and back
  * in_proj fused with the transpose: einsum("blc,cd->lbd") vs
    moveaxis + einsum("lbc,cd->lbd")
  * the full scan seam: transpose + in_proj + slab-proj + out-combine

Usage: timeout 1800 python -u tools/micro_layout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from actalker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def drain(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, n=30, warm=2):
    for _ in range(warm):
        out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    b, l, c, dI = 56, 4096, 320, 640
    nb = 2
    x = jax.random.normal(rng, (b, l, c), jnp.bfloat16)
    xa = jax.random.normal(rng, (l, b, c), jnp.bfloat16)
    w_in = jax.random.normal(rng, (c, nb * dI), jnp.bfloat16)
    w_slab = jax.random.normal(rng, (nb * dI, 4 * 128), jnp.bfloat16)
    yg = jax.random.normal(rng, (l + 64, b, 4 * dI), jnp.bfloat16)

    f_t = jax.jit(lambda x: jnp.moveaxis(x, 0, 1) + jnp.bfloat16(0))
    print(f"moveaxis (56,4096,320)->LBC:          {timeit(f_t, x):8.3f} ms")

    f_t2 = jax.jit(lambda y: jnp.moveaxis(y, 0, 1) + jnp.bfloat16(0))
    print(f"moveaxis (4096,56,320)->BLC:          {timeit(f_t2, xa):8.3f} ms")

    f_a = jax.jit(lambda x: jnp.einsum(
        "lbc,cd->lbd", jnp.moveaxis(x, 0, 1), w_in))
    print(f"moveaxis + einsum lbc,cd->lbd:        {timeit(f_a, x):8.3f} ms")

    f_b = jax.jit(lambda x: jnp.einsum("blc,cd->lbd", x, w_in))
    print(f"einsum blc,cd->lbd (fused transp):    {timeit(f_b, x):8.3f} ms")

    f_c = jax.jit(lambda x: jnp.einsum("blc,cd->bld", x, w_in))
    print(f"einsum blc,cd->bld (no transp):       {timeit(f_c, x):8.3f} ms")

    # out-side: slice two direction slabs, add, where, moveaxis back
    tm = jnp.ones((l + 64, b), bool)

    @jax.jit
    def out_combine(yg, xz):
        outs = []
        for bi in range(nb):
            y_b = (yg[:l, :, 2 * bi * dI:(2 * bi + 1) * dI]
                   + yg[:l, :, (2 * bi + 1) * dI:(2 * bi + 2) * dI])
            xz_b = xz[:l, :, bi * dI:(bi + 1) * dI]
            outs.append(jnp.where(tm[:l, :, None], y_b, xz_b))
        return jnp.moveaxis(sum(outs), 0, 1)

    xz = jax.random.normal(rng, (l + 64, b, nb * dI), jnp.bfloat16)
    print(f"out combine (+moveaxis back):         {timeit(out_combine, yg, xz):8.3f} ms")

    # GN in context: matmul -> GN -> matmul (layout-entangled like the UNet)
    from actalker_tpu.models.common import GroupNorm32
    gn = GroupNorm32(dtype=jnp.bfloat16)
    xi = jax.random.normal(rng, (b, 64, 64, c), jnp.bfloat16)
    gp = gn.init(rng, xi)
    wq = jax.random.normal(rng, (c, c), jnp.bfloat16)

    @jax.jit
    def gn_ctx(xi):
        h = gn.apply(gp, xi)
        return jnp.einsum("bhwc,cd->bhwd", h, wq)

    print(f"GN(56,64,64,320) + matmul:            {timeit(gn_ctx, xi):8.3f} ms")

    @jax.jit
    def mm_only(xi):
        return jnp.einsum("bhwc,cd->bhwd", xi, wq)

    print(f"matmul only:                          {timeit(mm_only, xi):8.3f} ms")


if __name__ == "__main__":
    main()
