"""Pallas TPU kernel for the selective scan (Mamba S6) recurrence.

Replaces the reference's CUDA ``selective_scan_fn`` (mamba-ssm, invoked at
``src/models/base/mamba_layer.py:1532-1538``) with a TPU-native kernel.

Why this shape: the S6 recurrence has a *per-channel* step size
``delta[b, l, d]``, so the decay ``exp(delta * A)`` varies over (l, d, n)
jointly — unlike Mamba-2 there is no shared-decay matmul (MXU) formulation,
and the scan is inherently a VPU (elementwise) workload. The kernel wins over
XLA's scan lowering (~500 ms/call at production sizes) by:

  1. never materializing the discretized (B, L, D, N) tensors in HBM — they
     are built per L-chunk in VMEM scratch;
  2. carrying the hidden state in VMEM across the L-chunked grid, so HBM
     traffic is just u/delta in + y out;
  3. a layout engineered so the sequential inner loop does *no* data
     relayouts: the state is an (8, N*Dp) tile — 8 batch sequences on
     sublanes, the (state x channel) product on lanes — and each step is two
     full-tile VPU ops (exp + fma) plus row loads/stores. All B/C/A
     expansions happen in bulk phases as static, 128-aligned lane-segment
     ops (Dp is padded to a multiple of 128, so segment n*Dp is aligned).

fp32 state and accumulation throughout (the recurrence is precision-critical;
the reference forces fp32 the same way, ``mamba_layer.py:319-325``).

Public API (single scan group — one (B, C) projection pair per direction,
which is how the SS2D units invoke it):
    u:     (B, L, D)    input sequence (any float dtype)
    delta: (B, L, D)    pre-softplus step sizes
    A:     (D, N)       state matrix (negative reals)
    Bmat:  (B, L, N)    input projection per token
    Cmat:  (B, L, N)    output projection per token
    D:     (D,)         skip weight (optional)
    delta_bias: (D,)    added to delta before softplus (optional)
Returns y: (B, L, D) float32. ``reverse=True`` scans right-to-left (equal to
flip-scan-flip) with no flipped HBM copies: the L-block index map runs
backwards and the inner loop walks rows back-to-front.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 8  # batch sequences per sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ssm_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, Dskip_ref, bias_ref,
                y_ref, h_scr, dtA_scr, hb_scr,
                *, lc: int, n_state: int, dp: int, reverse: bool):
    """One (batch-group, L-chunk) grid step.

    Ref shapes:
      u_ref, dt_ref, y_ref: (lc, 8, Dp)     A_ref: (1, N*Dp) (row n*Dp+d)
      B_ref, C_ref: (lc, 8, Np)             Dskip_ref, bias_ref: (1, Dp)
      h_scr: (8, N*Dp) — state, persists across the L grid axis
      dtA_scr, hb_scr: (lc, 8, N*Dp) — per-chunk delta*A and dBu/h rows.
    """
    lblk = pl.program_id(1)

    @pl.when(lblk == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    bias = bias_ref[:].astype(jnp.float32).reshape(1, 1, dp)
    dskip = Dskip_ref[:].astype(jnp.float32).reshape(1, 1, dp)

    u_blk = u_ref[:].astype(jnp.float32)                      # (lc, 8, Dp)
    dt_sp = jax.nn.softplus(dt_ref[:].astype(jnp.float32) + bias)
    dtu = dt_sp * u_blk                                       # (lc, 8, Dp)
    b_blk = B_ref[:].astype(jnp.float32)                      # (lc, 8, Np)
    c_blk = C_ref[:].astype(jnp.float32)

    # Bulk expansion: for each state index n, fill the 128-aligned lane
    # segment [n*Dp, (n+1)*Dp) of the scratch arrays. Static python loop.
    for n in range(n_state):
        a_seg = A_ref[:, n * dp:(n + 1) * dp].reshape(1, 1, dp)
        dtA_scr[:, :, n * dp:(n + 1) * dp] = dt_sp * a_seg
        b_col = b_blk[:, :, n:n + 1]                          # (lc, 8, 1)
        hb_scr[:, :, n * dp:(n + 1) * dp] = dtu * b_col

    def step(t, h):
        i = (lc - 1 - t) if reverse else t
        da = jnp.exp(dtA_scr[pl.ds(i, 1)][0])                 # (8, N*Dp)
        h = da * h + hb_scr[pl.ds(i, 1)][0]
        hb_scr[pl.ds(i, 1)] = h[None]                         # overwrite with h
        return h

    h_scr[:] = jax.lax.fori_loop(0, lc, step, h_scr[:])

    # Bulk output: y = sum_n C_n * h_n (+ D * u), again per lane segment.
    acc = dskip * u_blk
    for n in range(n_state):
        c_col = c_blk[:, :, n:n + 1]
        acc = acc + hb_scr[:, :, n * dp:(n + 1) * dp] * c_col
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("reverse", "lc"))
def ssm_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    Cmat: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    reverse: bool = False,
    lc: int = 16,
) -> jax.Array:
    """Selective scan via Pallas; see module docstring. Returns (B, L, D) fp32."""
    b, l, d = u.shape
    n = A.shape[-1]
    dp = _round_up(d, 128)
    bp = _round_up(b, _BT)
    np_ = _round_up(n, 128)  # B/C storage minor dim (lane dim)
    # Fit the two (lc, 8, N*Dp) fp32 scratch buffers in ~10 MB of VMEM
    # (v5e has 16 MB/core; the rest goes to pipelined in/out blocks).
    budget = 10 * 2**20
    lc_fit = max(2, budget // (2 * _BT * n * dp * 4))
    lc = max(1, min(lc, lc_fit, _round_up(l, 8)))
    lp = _round_up(l, lc)

    # Arrange to (L, B, D) with padding. Batch pad rows are harmless garbage
    # lanes; L pad uses delta = -30 => softplus ~ 1e-13: identity steps.
    def arrange(x, minor, minor_pad, l_pad_value=0.0):
        x = jnp.moveaxis(x, 0, 1)  # (L, B, minor)
        return jnp.pad(
            x,
            ((0, lp - l), (0, bp - b), (0, minor_pad - minor)),
            constant_values=l_pad_value,
        ) if (lp != l or bp != b or minor_pad != minor) else x

    u_a = arrange(u, d, dp)
    # L-padding must make delta very negative; pad separately.
    dt_a = jnp.moveaxis(delta, 0, 1)
    dt_a = jnp.pad(dt_a, ((0, 0), (0, bp - b), (0, dp - d)))
    dt_a = jnp.pad(dt_a, ((0, lp - l), (0, 0), (0, 0)), constant_values=-30.0)
    b_a = arrange(Bmat, n, np_)
    c_a = arrange(Cmat, n, np_)

    # A flattened to a single (1, N*Dp) row: entry n*Dp + d = A[d, n].
    a_exp = jnp.pad(jnp.transpose(A.astype(jnp.float32)), ((0, 0), (0, dp - d)))
    a_exp = a_exp.reshape(1, n * dp)
    Dv = jnp.zeros((d,), jnp.float32) if D is None else D.astype(jnp.float32)
    Dv = jnp.pad(Dv, (0, dp - d)).reshape(1, dp)
    bias = (jnp.zeros((d,), jnp.float32) if delta_bias is None
            else delta_bias.astype(jnp.float32))
    bias = jnp.pad(bias, (0, dp - d)).reshape(1, dp)

    nl = lp // lc
    ng = bp // _BT
    if reverse:
        lmap = lambda gi, li: (nl - 1 - li, gi, 0)  # noqa: E731
    else:
        lmap = lambda gi, li: (li, gi, 0)  # noqa: E731
    cmap = lambda gi, li: (0, 0)  # noqa: E731

    y = pl.pallas_call(
        functools.partial(
            _ssm_kernel, lc=lc, n_state=n, dp=dp, reverse=reverse
        ),
        grid=(ng, nl),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, np_), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, np_), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, bp, dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BT, n * dp), jnp.float32),
            pltpu.VMEM((lc, _BT, n * dp), jnp.float32),
            pltpu.VMEM((lc, _BT, n * dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(u_a, dt_a, a_exp, b_a, c_a, Dv, bias)

    return jnp.moveaxis(y[:l, :b, :d], 0, 1)
