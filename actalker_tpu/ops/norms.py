"""Fused normalization kernels (Pallas TPU).

Why these exist (profiled on v5e, tools/attribute_step.py): XLA lowers a
LayerNorm as `stats-tuple fusion -> affine fusion` with the per-token
mean/var materialized as f32 (B, S) tensors. Those stats tensors put the
TOKEN axis on lanes, and layout assignment then propagates token-minor
({1,2,0}) into the surrounding activation chain: every token-space GEMM in
the transformer block gets emitted as an `EmitInputBatchInLanes` convolution
at ~4% MFU (proj_out: 5.5 ms vs 0.24 ms ideal at (56,4096,320)) plus ~5 ms
relayout fusions at the scan seam. ~22 ms/block of the 95 ms block time is
this entanglement, not real work.

The fused kernel keeps the statistics in VMEM registers — no stats tensor
ever exists in the HLO graph, the input and output share the canonical
C-minor layout, and the op is purely memory-bound (~0.35 ms at
(229376, 320)).

Numerics: statistics AND affine in f32 (strictly better than the unfused
path, which applies the affine in bf16 — see models/common.py); output cast
to the input dtype.

Replaces `nn.LayerNorm` / `F.layer_norm` usage inside the reference blocks
(`src/models/base/attention.py:29-473`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                     # (bm, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=1, keepdims=True) - jnp.square(mu)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (x - mu) * inv * g_ref[...][None, :] + b_ref[...][None, :]
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_pallas(x2, gamma, beta, eps: float, *, interpret: bool):
    m, c = x2.shape
    # Block rows scale inversely with C: the f32 working set inside the
    # kernel is ~3 copies of the (bm, C) block plus double-buffered in/out
    # DMAs, so keep bm*C <= 512k elements (~2 MB f32 per copy; the op is
    # bandwidth-bound, so rows beyond that add nothing). At C=2560 (mamba
    # out_norm) bm=1024 blew the 16 MB scoped-VMEM stack.
    bm = 1024
    while bm > 128 and bm * c > 512 * 1024:
        bm //= 2
    while m % bm:
        bm //= 2
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x2, gamma, beta)


def _ln_xla(x, gamma, beta, eps: float):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return ((xf - mu) * inv * gamma + beta).astype(x.dtype)


def _use_kernel(m: int, c: int) -> bool:
    return (jax.default_backend() == "tpu" and m >= 256 and m % 256 == 0
            and c >= 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """Fused LayerNorm over the last axis. x (..., C); gamma/beta f32 (C,)."""
    return _ln_fwd(x, gamma, beta, eps)[0]


def _ln_fwd(x, gamma, beta, eps):
    c = x.shape[-1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if _use_kernel(m, c):
        out = _ln_pallas(x.reshape(m, c), gamma, beta, eps,
                         interpret=False).reshape(x.shape)
    else:
        out = _ln_xla(x, gamma, beta, eps)
    return out, (x, gamma, beta)


def _ln_bwd(eps, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda x, a, b: _ln_xla(x, a, b, eps), x, gamma, beta)
    return vjp(g)


layer_norm.defvjp(_ln_fwd, _ln_bwd)


# ---------------------------------------------------------------------------
# GroupNorm: stats over all axes but the first and last, groups on channels
# ---------------------------------------------------------------------------


def _gn_kernel(x_ref, g_ref, b_ref, gmask_ref, o_ref, s1_ref, s2_ref,
               *, eps: float, bm: int, rows: int, cg: int):
    """Grid (N, 2, M/bm): pass 0 accumulates f32 per-GROUP sums in scratch
    (via a tiny (C, groups) membership matmul — no (groups, C/groups)
    reshapes), pass 1 expands them back per channel and applies the affine.
    The x block is read once per pass (2x HBM traffic — still ~7x cheaper
    than the layout entanglement this replaces)."""
    p = pl.program_id(1)
    mi = pl.program_id(2)
    gmask = gmask_ref[...]                                 # (C, G) 0/1

    @pl.when((p == 0) & (mi == 0))
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    @pl.when(p == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)                   # (bm, C)
        if rows % bm:  # mask tail-block padding rows out of the statistics
            base = mi * bm
            idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base
            x = jnp.where(idx < rows, x, 0.0)
        dot = lambda a: jax.lax.dot_general(                 # noqa: E731
            a, gmask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bm, G)
        s1_ref[...] += jnp.sum(dot(x), axis=0, keepdims=True)     # (1, G)
        s2_ref[...] += jnp.sum(dot(jnp.square(x)), axis=0, keepdims=True)

    @pl.when(p == 1)
    def _apply():
        cnt = jnp.float32(rows * cg)
        expand = lambda s: jax.lax.dot_general(              # noqa: E731
            s, gmask, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (1, G)@(C,G)T=(1,C)
        m1 = expand(s1_ref[...] / cnt)                     # per-channel group mean
        m2 = expand(s2_ref[...] / cnt)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        a = inv * g_ref[...][None, :]
        b = b_ref[...][None, :] - m1 * a
        x = x_ref[0].astype(jnp.float32)
        o_ref[0] = (x * a + b).astype(o_ref.dtype)


def _gn_pallas(x3, gamma, beta, groups: int, eps: float, *, interpret: bool):
    n, m, c = x3.shape
    # Same VMEM budget rule as _ln_pallas: bm*C <= 512k elements.
    bm = 1024
    while bm > 128 and bm * c > 512 * 1024:
        bm //= 2
    while bm > m:
        bm //= 2
    nm = pl.cdiv(m, bm)
    cg = c // groups
    # (C, groups) 0/1 membership: stats fold and per-channel expand both run
    # on the MXU; ~40 KB at C=320.
    gmask = (jnp.arange(c)[:, None] // cg
             == jnp.arange(groups)[None, :]).astype(jnp.float32)
    kernel = functools.partial(_gn_kernel, eps=eps, bm=bm, rows=m, cg=cg)
    return pl.pallas_call(
        kernel,
        grid=(n, 2, nm),
        in_specs=[
            pl.BlockSpec((1, bm, c), lambda n, p, mi: (n, mi, 0)),
            pl.BlockSpec((c,), lambda n, p, mi: (0,)),
            pl.BlockSpec((c,), lambda n, p, mi: (0,)),
            pl.BlockSpec((c, groups), lambda n, p, mi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, c), lambda n, p, mi: (n, mi, 0)),
        out_shape=jax.ShapeDtypeStruct((n, m, c), x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, groups), jnp.float32),
            pltpu.VMEM((1, groups), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(x3, gamma, beta, gmask)


def _gn_xla(x, gamma, beta, groups: int, eps: float):
    n, c = x.shape[0], x.shape[-1]
    red = tuple(range(1, x.ndim - 1))
    s1 = jnp.mean(x, axis=red, dtype=jnp.float32)                # (N, C)
    s2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red)
    m1 = s1.reshape(n, groups, c // groups).mean(axis=2)
    m2 = s2.reshape(n, groups, c // groups).mean(axis=2)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(inv, c // groups, axis=1) * gamma[None]
    b = beta[None] - jnp.repeat(m1, c // groups, axis=1) * a
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    return (x.astype(jnp.float32) * a.reshape(bshape)
            + b.reshape(bshape)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, gamma, beta, groups: int = 32, eps: float = 1e-5):
    """Fused GroupNorm: x (N, ..., C), stats over all but first/last axes."""
    return _gn_fwd(x, gamma, beta, groups, eps)[0]


def _gn_fwd(x, gamma, beta, groups, eps):
    n, c = x.shape[0], x.shape[-1]
    m = 1
    for d in x.shape[1:-1]:
        m *= d
    if (jax.default_backend() == "tpu" and n * m >= 256 and m >= 8
            and c >= 128 and c % groups == 0):
        out = _gn_pallas(x.reshape(n, m, c), gamma, beta, groups, eps,
                         interpret=False).reshape(x.shape)
    else:
        out = _gn_xla(x, gamma, beta, groups, eps)
    return out, (x, gamma, beta)


def _gn_bwd(groups, eps, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda x, a, b: _gn_xla(x, a, b, groups, eps),
                     x, gamma, beta)
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)
