"""Fused GroupNorm-affine + SiLU + 3x3 conv (Pallas TPU) for resnet blocks.

Why (r5 xprof attribution, outputs/perf_r05.log A2.3): XLA lowers the UNet's
``GN -> SiLU -> 3x3 conv`` chains as kOutput fusions whose convolution gets a
"batch in sublanes" emitter at the C=320-family widths (320 = 2.5 lane
tiles): ``%fusion.65`` (up3/resnet_0 conv1, (56,64,64,320)) runs 8.92 ms
against a 2.14 ms MXU roofline (~24% MFU), while the very same geometry at
C=640 (``%convolution_add_fusion``) runs at ~99%. The conv+stats pool is
162.7 ms/step of the 958 ms r5 step.

This kernel recasts the conv as 9 shifted GEMMs on the MXU: per image, the
normalized+gated input is zero-padded into a (H+2, W+2, C) VMEM scratch and
each tap (dy, dx) contributes ``xp[dy:dy+H, dx:dx+W] @ w[dy, dx]`` into an
f32 accumulator — M = H*W (4096/1024/256), K = C, N = Co, all MXU-shaped.
GroupNorm statistics stay OUTSIDE (two cheap fp32 reduces, memory-bound);
the kernel takes the folded per-(N, C) affine (a, b) so normalize + SiLU are
one pass over VMEM-resident data.

Backward: custom_vjp recomputes through the pure-XLA twin (repo convention —
kernels carry no autodiff; training tolerates the materialization).

Replaces the lowering of the reference's ``resnet_blocks``
(``diffusers ResnetBlock2D``: norm1/conv1, norm2/conv2 —
``src/models/base/unet_3d_blocks.py`` imports); numerics match the XLA path
(f32 normalize/gate, bf16 matmul, f32 accumulate).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu_f32(y):
    # y * sigmoid(y) with an explicit exp (Mosaic-safe)
    return y / (1.0 + jnp.exp(-y))


def _gnconv_kernel(x_ref, a_ref, b_ref, w2_ref, cb_ref, o_ref, cat_ref,
                   *, H: int, W: int):
    """Flat-row im2col-in-VMEM formulation.

    Everything stays 2-D with C on lanes and flattened H*W rows on sublanes
    — v1 kept (H, W, C) blocks and paid a Mosaic relayout per tap slice
    (measured 15-50x slower than XLA). Here:
      * cat ((H+2)*W, 3C) holds the normalized+gated input three times:
        column group g = column-offset dx = g-1, i.e. cat[W+r, gC:(g+1)C] =
        y[r + g - 1] with row-wrap entries zeroed (the only sublane-
        misaligned ops are the two +-1 shifted copies, done ONCE);
      * tap dy is then a W-ALIGNED row slice: out += cat[dy*W : dy*W+H*W]
        @ w2[dy], three MXU GEMMs with K = 3C.
    """
    c = x_ref.shape[-1]
    hw = H * W
    i = pl.program_id(0)
    xf = x_ref[0].astype(jnp.float32)                    # (HW, C)
    y = xf * a_ref[i][None, :] + b_ref[i][None, :]
    yb = _silu_f32(y).astype(cat_ref.dtype)

    # row-position mask helpers: x-position of flat row r is r % W
    xpos = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % W

    cat_ref[...] = jnp.zeros_like(cat_ref)
    cat_ref[W:W + hw, c:2 * c] = yb                      # dx = 0
    # dx = +1: value at flat r is y[r+1], zero where x == W-1 (row wrap)
    cat_ref[W:W + hw - 1, 2 * c:3 * c] = jnp.where(
        xpos[:hw - 1] == W - 1, 0.0, yb[1:].astype(jnp.float32)
    ).astype(cat_ref.dtype)
    # dx = -1: value at flat r is y[r-1], zero where x == 0
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


def _gnconv_pallas(x, a, b, w, cb, *, interpret: bool):
    n, h, wd, c = x.shape
    co = w.shape[-1]
    # w2[dy] rows [g*C:(g+1)*C] = w[dy, g] — tap dx folded into K
    w2 = jnp.concatenate([w[:, 0], w[:, 1], w[:, 2]], axis=1)  # (3, 3C, Co)
    xf = x.reshape(n, h * wd, c)
    out = pl.pallas_call(
        functools.partial(_gnconv_kernel, H=h, W=wd),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * wd, c), lambda i: (i, 0, 0)),
            # (N, C) affine tables ride whole (tiny, f32) — a (1, C) block
            # is not (8, 128)-tileable; the kernel indexes by program_id
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((n, c), lambda i: (0, 0)),
            pl.BlockSpec((3, 3 * c, co), lambda i: (0, 0, 0)),
            pl.BlockSpec((co,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h * wd, co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h * wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((h + 2) * wd, 3 * c), x.dtype),  # padded im2col rows
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 2**20,
        ),
    )(xf, a, b, w2, cb)
    return out.reshape(n, h, wd, co)


def _gn_affine(x, gamma, beta, groups: int, eps: float):
    """Per-(N, C) fp32 (a, b) with GroupNorm stats over (H, W, C//G)."""
    n, c = x.shape[0], x.shape[-1]
    red = tuple(range(1, x.ndim - 1))
    s1 = jnp.mean(x, axis=red, dtype=jnp.float32)               # (N, C)
    s2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red)
    m1 = s1.reshape(n, groups, c // groups).mean(axis=2)
    m2 = s2.reshape(n, groups, c // groups).mean(axis=2)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(inv, c // groups, axis=1) * gamma[None]
    b = beta[None] - jnp.repeat(m1, c // groups, axis=1) * a
    return a, b


def _gnconv_xla(x, gamma, beta, groups, eps, w, cb, dtype):
    a, b = _gn_affine(x, gamma, beta, groups, eps)
    bshape = (x.shape[0], 1, 1, x.shape[-1])
    y = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    y = (y * jax.nn.sigmoid(y)).astype(dtype)
    return (jax.lax.conv_general_dilated(
        y, w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + cb[None, None, None, :]).astype(dtype)


def _use_kernel(n, h, w, cin, cout, dtype) -> bool:
    if jax.default_backend() != "tpu":
        return False
    item = jnp.dtype(dtype).itemsize
    wbytes = 9 * cin * cout * item
    catb = (h + 2) * w * 3 * cin * item
    accb = h * w * cout * 4
    return (cin % 8 == 0 and cout % 8 == 0 and h * w >= 256 and w % 8 == 0
            and wbytes + catb + accb + 2 * h * w * cin * item <= 72 * 2**20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_silu_conv3x3(x, gamma, beta, groups: int, eps: float, w, cb):
    """y = conv3x3(silu(group_norm(x))) + bias, NHWC, stride 1, SAME.

    x (N, H, W, C); gamma/beta f32 (C,); w (3, 3, C, Co); cb f32 (Co,).
    """
    return _fwd(x, gamma, beta, groups, eps, w, cb)[0]


def _fwd(x, gamma, beta, groups, eps, w, cb):
    n, h, wd, c = x.shape
    co = w.shape[-1]
    if _use_kernel(n, h, wd, c, co, x.dtype):
        a, b = _gn_affine(x, gamma, beta, groups, eps)
        out = _gnconv_pallas(x, a, b, w.astype(x.dtype),
                             cb.astype(jnp.float32), interpret=False)
    else:
        out = _gnconv_xla(x, gamma, beta, groups, eps, w, cb, x.dtype)
    return out, (x, gamma, beta, w, cb)


def _bwd(groups, eps, res, g):
    x, gamma, beta, w, cb = res
    _, vjp = jax.vjp(
        lambda x, ga, be, w, cb: _gnconv_xla(x, ga, be, groups, eps, w, cb,
                                             x.dtype),
        x, gamma, beta, w, cb)
    return vjp(g)


gn_silu_conv3x3.defvjp(_fwd, _bwd)
