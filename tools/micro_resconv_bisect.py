"""Bisect the resconv kernel cost on the TPU: which piece costs ~1.8 ms/im?

Variants at (56, 64, 64, 320->320):
  full     — the production kernel
  noshift  — dx=0 group only (no sublane-shifted copies, no masks)
  noaffine — skip the dynamic a_ref[i]/b_ref[i] affine (static 1/0)
  mmonly   — matmuls over a zeroed cat (no input read into cat at all)
  nosilu   — affine but no silu
Usage: timeout 2400 python -u tools/micro_resconv_bisect.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from actalker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, a_ref, b_ref, w2_ref, cb_ref, o_ref, cat_ref,
           *, H, W, variant):
    c = x_ref.shape[-1]
    hw = H * W
    i = pl.program_id(0)
    xf = x_ref[0].astype(jnp.float32)
    if variant in ("full", "noshift", "nosilu"):
        y = xf * a_ref[i][None, :] + b_ref[i][None, :]
    else:
        y = xf
    if variant != "nosilu":
        y = y / (1.0 + jnp.exp(-y))
    yb = y.astype(cat_ref.dtype)

    cat_ref[...] = jnp.zeros_like(cat_ref)
    if variant != "mmonly":
        cat_ref[W:W + hw, c:2 * c] = yb
    if variant in ("full", "noaffine", "nosilu"):
        xpos = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % W
        cat_ref[W:W + hw - 1, 2 * c:3 * c] = jnp.where(
            xpos[:hw - 1] == W - 1, 0.0, yb[1:].astype(jnp.float32)
        ).astype(cat_ref.dtype)
        cat_ref[W + 1:W + hw, 0:c] = jnp.where(
            xpos[1:] == 0, 0.0, yb[:hw - 1].astype(jnp.float32)
        ).astype(cat_ref.dtype)

    acc = jax.lax.dot_general(
        cat_ref[0:hw, :], w2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        cat_ref[W:W + hw, :], w2_ref[1], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        cat_ref[2 * W:2 * W + hw, :], w2_ref[2], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (acc + cb_ref[...][None, :]).astype(o_ref.dtype)


def main():
    n, h, w, c, co = 56, 64, 64, 320, 320
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (n, h * w, c), jnp.bfloat16)
    a = 1.0 + 0.1 * jax.random.normal(ks[1], (n, c), jnp.float32)
    b = 0.1 * jax.random.normal(ks[2], (n, c), jnp.float32)
    w2 = (jax.random.normal(ks[3], (3, 3 * c, co), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)
    cb = 0.1 * jax.random.normal(ks[4], (co,), jnp.float32)

    for variant in ("mmonly", "noshift", "noaffine", "nosilu", "full"):
        f = pl.pallas_call(
            functools.partial(kernel, H=h, W=w, variant=variant),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((n, c), lambda i: (0, 0)),
                pl.BlockSpec((n, c), lambda i: (0, 0)),
                pl.BlockSpec((3, 3 * c, co), lambda i: (0, 0, 0)),
                pl.BlockSpec((co,), lambda i: (0,)),
            ],
            out_specs=pl.BlockSpec((1, h * w, co), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, h * w, co), x.dtype),
            scratch_shapes=[pltpu.VMEM(((h + 2) * w, 3 * c), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 2**20,
            ),
        )
        g = jax.jit(lambda x: f(x, a, b, w2, cb))
        try:
            out = g(x)
            float(jnp.sum(out.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(10):
                out = g(x + 0.0 * out[:, :, :1].astype(x.dtype))
            float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / 10 * 1e3
            print(f"{variant:9s}: {dt:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{variant:9s}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
