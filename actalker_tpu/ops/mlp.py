"""Fused GEGLU feed-forward (Pallas TPU): y = (h * gelu(g)) @ W2 + b2 with
[h | g] = x @ W1 + b1 — computed tile-by-tile so the (M, 2*inner)
intermediate never exists in HBM.

Why: the transformer FF materializes a (B, S, 8*C) activation between its
two GEMMs — 1.17 GB bf16 at the flagship res-64 shape (56, 4096, 2560) —
so XLA's lowering is HBM-bandwidth-bound: 7.4 ms measured vs 2.9 ms of pure
MXU work (39% MFU, outputs/attr_r4 `block_0/ff`). Both weight matrices fit
VMEM at every flagship width (<= 52 MB at C=1280), so one kernel pass
reads x once, runs GEMM -> gate -> GEMM in VMEM, and writes y once.

Numerics: accumulation and the GEGLU gate run in f32 (the unfused path
gates in bf16 — this is strictly tighter); output cast to x.dtype. Exact
(erf) GELU, matching ``nn.gelu(approximate=False)`` /
``diffusers GEGLU`` (reference ``src/models/base/attention.py`` FF blocks).

Backward: custom_vjp recomputes through a pure-XLA twin (repo convention —
the kernels carry no autodiff; training tolerates the materialization).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf for the Pallas path (Mosaic has no erf primitive): Abramowitz &
    Stegun 7.1.26 rational approximation, max abs error 1.5e-7 — far below
    bf16 resolution (2^-8) and the f32 noise of the surrounding GEMMs."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x, erf=jax.lax.erf):
    return 0.5 * x * (1.0 + erf(x * (2.0 ** -0.5)))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, inner: int):
    x = x_ref[...]
    h2 = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...][None, :]                       # (bm, 2*inner) f32
    h = h2[:, :inner] * _gelu_exact(h2[:, inner:], erf=_erf)
    y = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...][None, :]
    o_ref[...] = y.astype(o_ref.dtype)


def _pick_bm(m: int, inner: int) -> int:
    # f32 intermediate (bm, 2*inner) is the VMEM-heavy temporary; the budget
    # bounds it next to the weights + double-buffered x/y tiles.
    # Swept on v5e (tools/micro_mlp.py): ACTALKER_MLP_BUDGET_MB env for A/B.
    import os

    budget = int(os.environ.get("ACTALKER_MLP_BUDGET_MB", "8")) * 2**20
    bm = 2048
    while bm > 128 and bm * 2 * inner * 4 > budget:
        bm //= 2
    while m % bm:
        bm //= 2
    return bm


def _mlp_pallas(x2, w1, b1, w2, b2, *, interpret: bool):
    m, c = x2.shape
    inner = w2.shape[0]
    cout = w2.shape[1]
    bm = _pick_bm(m, inner)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, inner=inner),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((2 * inner,), lambda i: (0,)),
            pl.BlockSpec((inner, cout), lambda i: (0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, cout), x2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2**20,
        ),
    )(x2, w1, b1, w2, b2)


def _mlp_xla(x, w1, b1, w2, b2):
    inner = w2.shape[0]
    h2 = (x @ w1 + b1).astype(jnp.float32)
    h = h2[..., :inner] * _gelu_exact(h2[..., inner:])
    return (h.astype(w2.dtype) @ w2 + b2).astype(x.dtype)


def _use_kernel(m: int, c: int, inner: int, cout: int) -> bool:
    # weights must fit VMEM next to the f32 intermediate; all flagship
    # widths (C=320/640/1280 => inner 1280/2560/5120) qualify. c/cout only
    # need lane-tile alignment (Mosaic pads the K dim internally; C=320 is
    # the flagship down0/up3 width).
    wbytes = (c * 2 * inner + inner * cout) * 2
    return (jax.default_backend() == "tpu" and m >= 512 and m % 256 == 0
            and c % 64 == 0 and inner % 128 == 0 and cout % 64 == 0
            and wbytes <= 80 * 2**20)


@jax.custom_vjp
def geglu_mlp(x, w1, b1, w2, b2):
    """x (..., C); w1 (C, 2*inner) [h|gate]; w2 (inner, Cout). -> (..., Cout)

    Weights/biases in the computation dtype (cast by the caller, like
    ``nn.Dense(dtype=...)``); accumulation f32 inside."""
    return _mlp_fwd(x, w1, b1, w2, b2)[0]


def _mlp_fwd(x, w1, b1, w2, b2):
    c = x.shape[-1]
    cout = w2.shape[1]
    inner = w2.shape[0]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if _use_kernel(m, c, inner, cout):
        out = _mlp_pallas(x.reshape(m, c), w1, b1.astype(jnp.float32),
                          w2, b2.astype(jnp.float32),
                          interpret=False).reshape(x.shape[:-1] + (cout,))
    else:
        out = _mlp_xla(x, w1, b1.astype(jnp.float32), w2,
                       b2.astype(jnp.float32))
    return out, (x, w1, b1, w2, b2)


def _mlp_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_mlp_xla, x, w1, b1.astype(jnp.float32), w2,
                     b2.astype(jnp.float32))
    dx, dw1, db1, dw2, db2 = vjp(g)
    return dx, dw1, db1.astype(b1.dtype), dw2, db2.astype(b2.dtype)


geglu_mlp.defvjp(_mlp_fwd, _mlp_bwd)
