"""Pallas TPU kernel for the selective scan (Mamba S6) recurrence.

Replaces the reference's CUDA ``selective_scan_fn`` (mamba-ssm, invoked at
``src/models/base/mamba_layer.py:1532-1538``) with a TPU-native kernel.

Why this shape: the S6 recurrence has a *per-channel* step size
``delta[b, l, d]``, so the decay ``exp(delta * A)`` varies over (l, d, n)
jointly — unlike Mamba-2 there is no shared-decay matmul (MXU) formulation,
and the scan is inherently a VPU (elementwise) workload. The kernel wins over
XLA's scan lowering (~500 ms/call at production sizes) by:

  1. never materializing the discretized (B, L, D, N) tensors anywhere — the
     N-fold expansion happens purely in vector registers;
  2. carrying the hidden state across the L-chunked grid (VMEM scratch at
     chunk boundaries, registers inside), so HBM traffic is just the operand
     rows in + y out;
  3. a relayout-free layout: 8 batch sequences on sublanes, channels on
     lanes; the state is n_state separate (8, Dp) register values; B and C
     are packed into one 128-lane block; per token the kernel does one
     (8, Dp) softplus, n_state exp+fma segments, and one y-row store. The
     per-token cost is VPU-transcendental-bound (the n_state * D exps are
     the irreducible core of the S6 recurrence).

The bidirectional units amortize layouts via ``arrange_ssm_inputs`` +
``ssm_scan_arranged`` (one transpose in/out per unit, not per direction).

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

# Grouped-kernel token loop: "v1" walks tokens with the full per-token body
# in the serial loop; "v2" is state-major with batched transcendentals and a
# mul-add-only serial core (see _ssm_kernel_grouped_v2). A/B on chip via
# ACTALKER_SCAN; equivalence tests run both (interpret mode).
import os as _os

_SCAN_IMPL = _os.environ.get("ACTALKER_SCAN", "v1")
assert _SCAN_IMPL in ("v1", "v2"), _SCAN_IMPL


def set_scan_impl(impl: str) -> None:
    global _SCAN_IMPL
    assert impl in ("v1", "v2"), impl
    _SCAN_IMPL = impl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ssm_kernel(u_ref, dt_ref, A_ref, BC_ref, Dskip_ref, bias_ref,
                y_ref, h_scr, *, lc: int, n_state: int, dp: int,
                reverse: bool, unroll: int):
    """One (batch-group, L-chunk) grid step — register-resident state.

    The hidden state lives as ``n_state`` separate (8, Dp) values carried
    through the fori_loop (vector registers, Mosaic willing); per step the
    kernel reads one token row, runs the recurrence per state segment, and
    writes one y row. VMEM traffic per token is just the operand rows
    (~4 * 8 * Dp) instead of the 2 * N-expanded scratch of the previous
    design — the N-fold expansion happens purely in registers.

    Ref shapes:
      u_ref, dt_ref: (lc, 8, Dp) (model dtype)
      y_ref: (lc, 8, Dp) (model dtype)
      A_ref: (1, N*Dp) fp32 (row n*Dp + d)
      BC_ref: (lc, 8, 128) — B tokens in lanes [0, N), C in [N, 2N)
      Dskip_ref, bias_ref: (1, Dp) fp32
      h_scr: (8, N*Dp) fp32 — persists across the L grid axis.
    """
    lblk = pl.program_id(1)

    @pl.when(lblk == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    bias = bias_ref[:].astype(jnp.float32)                    # (1, Dp)
    dskip = Dskip_ref[:].astype(jnp.float32)
    a_segs = [A_ref[:, n * dp:(n + 1) * dp] for n in range(n_state)]

    h0 = tuple(h_scr[:, n * dp:(n + 1) * dp] for n in range(n_state))

    def one_token(i, h):
        u_t = u_ref[pl.ds(i, 1)][0].astype(jnp.float32)       # (8, Dp)
        dt_t = jax.nn.softplus(
            dt_ref[pl.ds(i, 1)][0].astype(jnp.float32) + bias
        )
        dtu = dt_t * u_t
        bc_t = BC_ref[pl.ds(i, 1)][0].astype(jnp.float32)     # (8, 128)
        y = dskip * u_t
        hs = []
        for n in range(n_state):
            da = jnp.exp(dt_t * a_segs[n])
            hn = da * h[n] + bc_t[:, n:n + 1] * dtu
            y = y + bc_t[:, n_state + n:n_state + n + 1] * hn
            hs.append(hn)
        y_ref[pl.ds(i, 1)] = y[None].astype(y_ref.dtype)
        return tuple(hs)

    # Token unroll: amortizes loop control and lets the scheduler overlap
    # the tokens' exp pipelines (the h-update fma chain is the only
    # cross-token dependency). The unroll factor is width-adaptive — wide
    # channel blocks would overflow the Mosaic vector stack at 4.
    assert lc % unroll == 0, (lc, unroll)

    def step(ti, h):
        t = ti * unroll
        for j in range(unroll):
            h = one_token(lc - 1 - t - j if reverse else t + j, h)
        return h

    h = jax.lax.fori_loop(0, lc // unroll, step, h0)
    for n in range(n_state):
        h_scr[:, n * dp:(n + 1) * dp] = h[n]


def _unroll_for(dp: int) -> int:
    return 4 if dp <= 1280 else 2


def _pick_lc(lc, l, dp, np_, itemsize):
    budget = 8 * 2**20
    per_row = _BT * (3 * dp + np_) * itemsize * 2
    lc_fit = max(8, budget // per_row)
    u = _unroll_for(dp)
    picked = max(u, min(lc, lc_fit, _round_up(l, 8)))
    return max(u, picked - (picked % u))


def _boundary_kernel(u_ref, dt_ref, A_ref, BC_ref, bias_ref, bnd_ref, h_scr,
                     *, lc: int, n_state: int, dp: int, reverse: bool,
                     unroll: int):
    """Forward replay that records the state ENTERING each L-chunk.

    Same walk as ``_ssm_kernel`` minus the y output; ``bnd_ref`` gets the
    (8, N*Dp) hidden state before the chunk's first token (zeros for the
    first chunk). The backward kernel re-runs each chunk forward from these
    checkpoints, so the O(L) state history never hits HBM in fp32 — only
    O(L / lc) boundary rows do.
    """
    lblk = pl.program_id(1)

    @pl.when(lblk == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    bnd_ref[0] = h_scr[:]

    bias = bias_ref[:].astype(jnp.float32)
    a_segs = [A_ref[:, n * dp:(n + 1) * dp] for n in range(n_state)]
    h0 = tuple(h_scr[:, n * dp:(n + 1) * dp] for n in range(n_state))

    def one_token(i, h):
        u_t = u_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        dt_t = jax.nn.softplus(
            dt_ref[pl.ds(i, 1)][0].astype(jnp.float32) + bias)
        dtu = dt_t * u_t
        bc_t = BC_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        hs = []
        for n in range(n_state):
            da = jnp.exp(dt_t * a_segs[n])
            hs.append(da * h[n] + bc_t[:, n:n + 1] * dtu)
        return tuple(hs)

    def step(ti, h):
        t = ti * unroll
        for j in range(unroll):
            h = one_token(lc - 1 - t - j if reverse else t + j, h)
        return h

    h = jax.lax.fori_loop(0, lc // unroll, step, h0)
    for n in range(n_state):
        h_scr[:, n * dp:(n + 1) * dp] = h[n]


def _bwd_kernel(u_ref, dt_ref, A_ref, BC_ref, Dskip_ref, bias_ref, bnd_ref,
                dy_ref, du_ref, ddt_ref, dbc_ref, dA_ref, dD_ref,
                g_scr, hist_scr, *, lc: int, n_state: int, dp: int,
                reverse: bool):
    """Adjoint of the arranged scan, one (batch-group, L-chunk) grid step;
    the L grid axis walks chunks in REVERSE scan order.

    Recurrence (per channel d, state n; a = exp(delta*A), p = delta*u):
        h_t = a_t h_{t-1} + B_t p_t ;  y_t = sum_n C_n h_n + D u_t
    Adjoint g_t = dL/dh_t satisfies the reverse recurrence
        g_t = dy_t C_t + a_{t+1} g_{t+1}
    and the input gradients are
        dC_t  = sum_d dy_t h_t            dB_t   = sum_d g_t p_t
        du_t  = delta_t sum_n g_n B_n + D dy_t
        ddelta_t = (u_t sum_n g_n B_n + sum_n g_n A_n a_n h_{t-1,n})
                   * sigmoid(dtr_t + bias)          [softplus chain]
        dA_n += sum_t g_n h_{t-1,n} delta_t a_n      dD += sum_t dy_t u_t

    Each chunk is recomputed forward from its boundary checkpoint into a
    VMEM history (``hist_scr``), then walked backwards accumulating g.
    ``dA/dD`` accumulate into per-batch-group rows (reduced by the caller).
    """
    gi = pl.program_id(0)
    lblk = pl.program_id(1)

    @pl.when(lblk == 0)
    def _():
        g_scr[:] = jnp.zeros_like(g_scr)
        dA_ref[0] = jnp.zeros_like(dA_ref[0])
        dD_ref[0] = jnp.zeros_like(dD_ref[0])

    del gi
    bias = bias_ref[:].astype(jnp.float32)
    dskip = Dskip_ref[:].astype(jnp.float32)
    a_segs = [A_ref[:, n * dp:(n + 1) * dp] for n in range(n_state)]

    # ---- forward recompute of this chunk into hist (state AFTER token i) --
    h0 = tuple(bnd_ref[0, :, n * dp:(n + 1) * dp] for n in range(n_state))

    def fwd_token(i, h):
        u_t = u_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        dt_t = jax.nn.softplus(
            dt_ref[pl.ds(i, 1)][0].astype(jnp.float32) + bias)
        dtu = dt_t * u_t
        bc_t = BC_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        hs = []
        for n in range(n_state):
            da = jnp.exp(dt_t * a_segs[n])
            hn = da * h[n] + bc_t[:, n:n + 1] * dtu
            hist_scr[pl.ds(i, 1), :, n * dp:(n + 1) * dp] = hn[None]
            hs.append(hn)
        return tuple(hs)

    def fwd_step(tg, h):
        for j in range(2):
            ti = tg * 2 + j
            h = fwd_token(lc - 1 - ti if reverse else ti, h)
        return h

    jax.lax.fori_loop(0, lc // 2, fwd_step, h0)

    # ---- backward walk (reverse scan order within the chunk) -------------
    g0 = tuple(g_scr[:, n * dp:(n + 1) * dp] for n in range(n_state))

    def bwd_token(i, iprev, first_in_scan, g):
        u_t = u_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        dtr_t = dt_ref[pl.ds(i, 1)][0].astype(jnp.float32) + bias
        dt_t = jax.nn.softplus(dtr_t)
        sig_t = jax.nn.sigmoid(dtr_t)
        bc_t = BC_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        dy_t = dy_ref[pl.ds(i, 1)][0].astype(jnp.float32)
        # h_{t-1}: previous token's hist row, or the chunk boundary state
        gBsum = jnp.zeros_like(u_t)
        gAah = jnp.zeros_like(u_t)
        dB_cols, dC_cols, dA_segs = [], [], []
        for n in range(n_state):
            h_t = hist_scr[pl.ds(i, 1), :, n * dp:(n + 1) * dp][0]
            hm1 = jnp.where(
                first_in_scan,
                bnd_ref[0, :, n * dp:(n + 1) * dp],
                hist_scr[pl.ds(iprev, 1), :, n * dp:(n + 1) * dp][0])
            g_n = g[n] + dy_t * bc_t[:, n_state + n:n_state + n + 1]
            da = jnp.exp(dt_t * a_segs[n])
            gBsum = gBsum + g_n * bc_t[:, n:n + 1]
            gAah = gAah + g_n * a_segs[n] * da * hm1
            dC_cols.append(jnp.sum(dy_t * h_t, axis=1, keepdims=True))
            dB_cols.append(jnp.sum(g_n * dt_t * u_t, axis=1, keepdims=True))
            dA_segs.append(
                jnp.sum(g_n * hm1 * dt_t * da, axis=0, keepdims=True))
            g = g[:n] + (g_n * da,) + g[n + 1:]
        du_ref[pl.ds(i, 1)] = (dt_t * gBsum + dskip * dy_t)[None].astype(
            du_ref.dtype)
        ddt_ref[pl.ds(i, 1)] = ((u_t * gBsum + gAah) * sig_t)[None].astype(
            ddt_ref.dtype)
        row = jnp.concatenate(
            dB_cols + dC_cols
            + [jnp.zeros((8, BC_ref.shape[-1] - 2 * n_state), jnp.float32)],
            axis=1)
        dbc_ref[pl.ds(i, 1)] = row[None].astype(dbc_ref.dtype)
        return g, jnp.concatenate(dA_segs, axis=1), \
            jnp.sum(dy_t * u_t, axis=0, keepdims=True)

    ub = 2
    assert lc % ub == 0, (lc, ub)

    def bwd_step(tg, g):
        # walk tokens opposite to scan order within the chunk; the last
        # walked token (ti == lc-1) is the chunk's scan-first token, whose
        # h_{t-1} is the boundary checkpoint. dA/dD accumulate locally per
        # unrolled group (one VMEM read-modify-write per ub tokens).
        dA_acc = None
        dD_acc = None
        for j in range(ub):
            ti = tg * ub + j
            if reverse:
                i, iprev = ti, jnp.minimum(ti + 1, lc - 1)
            else:
                i, iprev = lc - 1 - ti, jnp.maximum(lc - 2 - ti, 0)
            g, dA_row, dD_row = bwd_token(i, iprev, ti == lc - 1, g)
            dA_acc = dA_row if dA_acc is None else dA_acc + dA_row
            dD_acc = dD_row if dD_acc is None else dD_acc + dD_row
        dA_ref[0] = dA_ref[0] + dA_acc
        dD_ref[0] = dD_ref[0] + dD_acc
        return g

    g = jax.lax.fori_loop(0, lc // ub, bwd_step, g0, unroll=False)
    for n in range(n_state):
        g_scr[:, n * dp:(n + 1) * dp] = g[n]


def _pick_lc_bwd(lp: int, dp: int, n: int) -> int:
    """Backward chunk size: the fp32 state history (lc, 8, N*Dp) must fit
    the kernel's scoped-VMEM budget (16 MB default; we raise it via
    CompilerParams but keep the history near 12 MB). Power of two so it
    divides the forward's lp paddings; lp is re-padded by the caller."""
    budget = 12 * 2**20
    cap = budget // (8 * n * dp * 4)
    lc = 8
    while lc * 2 <= min(64, cap):
        lc *= 2
    return lc


def _arranged_grad_tpu(u_a, dt_a, bc_a, A, D, bias, dy, reverse):
    """(du, ddt, dbc, dA, dD, dbias) via the boundary + adjoint kernels."""
    lp0, bp, dp = u_a.shape
    d, n = A.shape
    np_ = bc_a.shape[-1]
    lc = _pick_lc_bwd(lp0, dp, n)
    lp = _round_up(lp0, lc)
    if dp != d:
        # pad-channel cotangents are zero in real use (the caller crops the
        # output to d channels); enforce it so the pad channels' undecayed
        # (A = 0 => a = 1) adjoint never leaks into the cross-channel
        # reductions (dB, dC).
        dy = jnp.concatenate(
            [dy[:, :, :d], jnp.zeros_like(dy[:, :, d:])], axis=-1)
    if lp != lp0:
        # transparent pad rows: delta -> -1e9 (identity steps), zero dy
        pad = ((0, lp - lp0), (0, 0), (0, 0))
        u_a = jnp.pad(u_a, pad)
        dt_a = jnp.pad(dt_a, pad, constant_values=-1e9)
        bc_a = jnp.pad(bc_a, pad)
        dy = jnp.pad(dy, pad)

    a_exp = jnp.pad(jnp.transpose(A.astype(jnp.float32)),
                    ((0, 0), (0, dp - d))).reshape(1, n * dp)
    Dv = jnp.pad(D.astype(jnp.float32), (0, dp - d)).reshape(1, dp)
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, dp - d)).reshape(1, dp)

    nl = lp // lc
    ng = bp // _BT
    if reverse:
        lmap = lambda gi, li: (nl - 1 - li, gi, 0)  # noqa: E731
    else:
        lmap = lambda gi, li: (li, gi, 0)  # noqa: E731
    # backward grid walks chunks in reverse scan order
    if reverse:
        blmap = lambda gi, li: (li, gi, 0)  # noqa: E731
    else:
        blmap = lambda gi, li: (nl - 1 - li, gi, 0)  # noqa: E731
    bndmap_f = lambda gi, li: (li, gi, 0)  # noqa: E731
    bndmap_b = lambda gi, li: (nl - 1 - li, gi, 0)  # noqa: E731
    cmap = lambda gi, li: (0, 0)  # noqa: E731
    gmap = lambda gi, li: (gi, 0, 0)  # noqa: E731

    interpret = jax.default_backend() != "tpu"
    bnd = pl.pallas_call(
        functools.partial(_boundary_kernel, lc=lc, n_state=n, dp=dp,
                          reverse=reverse, unroll=1),
        grid=(ng, nl),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, np_), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BT, n * dp), bndmap_f,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, bp, n * dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BT, n * dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(u_a, dt_a, a_exp, bc_a, bias_p)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, lc=lc, n_state=n, dp=dp,
                          reverse=reverse),
        grid=(ng, nl),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((lc, _BT, dp), blmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, dp), blmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, np_), blmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BT, n * dp), bndmap_b,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, dp), blmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lc, _BT, dp), blmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, dp), blmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, np_), blmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n * dp), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp), gmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lp, bp, dp), u_a.dtype),
            jax.ShapeDtypeStruct((lp, bp, dp), dt_a.dtype),
            jax.ShapeDtypeStruct((lp, bp, np_), bc_a.dtype),
            jax.ShapeDtypeStruct((ng, 1, n * dp), jnp.float32),
            jax.ShapeDtypeStruct((ng, 1, dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_BT, n * dp), jnp.float32),
                        pltpu.VMEM((lc, _BT, n * dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(u_a, dt_a, a_exp, bc_a, Dv, bias_p, bnd, dy)

    du, ddt, dbc, dA_p, dD_p = outs
    du, ddt, dbc = du[:lp0], ddt[:lp0], dbc[:lp0]
    dA = jnp.sum(dA_p, axis=(0, 1)).reshape(n, dp)[:, :d].T
    dD = jnp.sum(dD_p, axis=(0, 1))[:d]
    dbias = jnp.sum(ddt[:, :, :d].astype(jnp.float32), axis=(0, 1))
    return (du, ddt, dbc, dA.astype(A.dtype), dD.astype(D.dtype),
            dbias.astype(bias.dtype))


def _arranged_xla(u_a, dt_a, bc_a, A, D, bias, reverse):
    """Differentiable pure-XLA twin of the arranged kernel (same function;
    drives the backward pass — the Pallas kernel has no autodiff rule)."""
    from actalker_tpu.ops.selective_scan import selective_scan

    lp, bp, dp = u_a.shape
    d, n = A.shape
    u = jnp.moveaxis(u_a[:, :, :d], 0, 1)
    dt = jnp.moveaxis(dt_a[:, :, :d], 0, 1)
    bc = jnp.moveaxis(bc_a, 0, 1)
    flip = (lambda t: jnp.flip(t, axis=1)) if reverse else (lambda t: t)
    y = selective_scan(
        flip(u), flip(dt), A, flip(bc[:, :, :n])[:, :, None],
        flip(bc[:, :, n:2 * n])[:, :, None], D, bias, impl="blocked")
    y = jnp.moveaxis(flip(y), 0, 1).astype(u_a.dtype)
    if dp != d:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, dp - d)))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _arranged(u_a, dt_a, bc_a, A, D, bias, reverse, lc):
    return _arranged_pallas(u_a, dt_a, bc_a, A, D, bias, reverse, lc)


def _arranged_fwd(u_a, dt_a, bc_a, A, D, bias, reverse, lc):
    out = _arranged_pallas(u_a, dt_a, bc_a, A, D, bias, reverse, lc)
    return out, (u_a, dt_a, bc_a, A, D, bias)


def _arranged_bwd(reverse, lc, res, g):
    if jax.default_backend() == "tpu":
        return _arranged_grad_tpu(*res, g, reverse)
    _, vjp = jax.vjp(
        lambda *p: _arranged_xla(*p, reverse=reverse), *res)
    return vjp(g)


_arranged.defvjp(_arranged_fwd, _arranged_bwd)


@functools.partial(jax.jit, static_argnames=("reverse", "lc", "orig_l"))
def ssm_scan_arranged(
    u_a: jax.Array,        # (Lp, Bp, Dp) — pre-arranged, padded
    dt_a: jax.Array,       # (Lp, Bp, Dp) — L-pad rows must be very negative
    bc_a: jax.Array,       # (Lp, Bp, 128) — packed B | C lanes
    A: jax.Array,          # (D, N)
    D: Optional[jax.Array],
    delta_bias: Optional[jax.Array],
    reverse: bool = False,
    lc: int = 64,
    orig_l: Optional[int] = None,
) -> jax.Array:
    """Low-level entry on pre-arranged (L-major) buffers; returns
    (Lp, Bp, Dp) in u's dtype. Lets callers amortize the layout transposes
    across the forward+reverse directions and multiple units. Forward runs
    the Pallas kernel; gradients flow through a pure-XLA twin (custom_vjp)."""
    d = A.shape[0]
    if D is None:
        D = jnp.zeros((d,), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((d,), jnp.float32)
    lc = _pick_lc(lc, u_a.shape[0], u_a.shape[2], bc_a.shape[-1],
                  u_a.dtype.itemsize)
    return _arranged(u_a, dt_a, bc_a, A, D, delta_bias, reverse, lc)


def _arranged_pallas(u_a, dt_a, bc_a, A, D, bias, reverse, lc):
    lp, bp, dp = u_a.shape
    d = A.shape[0]
    n = A.shape[-1]
    np_ = bc_a.shape[-1]
    delta_bias = bias
    assert lp % lc == 0, (lp, lc)

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

    return pl.pallas_call(
        functools.partial(
            _ssm_kernel, lc=lc, n_state=n, dp=dp, reverse=reverse,
            unroll=_unroll_for(dp),
        ),
        grid=(ng, nl),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, np_), lmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), cmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lc, _BT, dp), lmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, bp, dp), u_a.dtype),
        scratch_shapes=[pltpu.VMEM((_BT, n * dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(u_a, dt_a, a_exp, bc_a, Dv, bias)


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
    lc: int = 64,
) -> jax.Array:
    """Selective scan via Pallas; see module docstring. Returns (B, L, D) in
    u's dtype. Thin wrapper over ``ssm_scan_arranged`` for (B, L, D) callers."""
    b, l, d = u.shape
    n = A.shape[-1]
    u_a, dt_a, bc_a = arrange_ssm_inputs(u, delta, Bmat, Cmat, lc=lc)
    y = ssm_scan_arranged(u_a, dt_a, bc_a, A, D, delta_bias,
                          reverse=reverse, lc=lc)
    return jnp.moveaxis(y[:l, :b, :d], 0, 1)


def _ssm_kernel_grouped(u_ref, slab_ref, dtw_ref, A_ref, Dskip_ref,
                        bias_ref, y_ref, h_scr, dt_scr, *, lc: int,
                        n_state: int, dp: int, rank_off: int, unroll: int):
    """Grouped variant: grid (G, ng, nl); G = branches x directions.

    Fuses the dt projection (dts @ dtw + bias), the transparency masking
    (inactive rows -> exact identity steps) and the softplus into the kernel,
    so the (L, B, D)-sized delta tensor never exists in HBM — the host side
    only materializes the packed 128-lane slab [dts | B | C | mask] per
    group. Masking rides the same matmul: slab lane ``MASK_LANE`` is 1.0 for
    inactive tokens and the matching ``dtw`` row is -1e9, so inactive rows
    come out of the projection at delta ~ -1e9 (softplus -> 0 => exact
    identity recurrence steps), with no separate mask operand.

    Ref shapes (per grid step):
      u_ref:  (lc, 8, dp)   — the group's in_proj activations (model dtype)
      slab_ref: (lc, 8, 128) — lanes [0, rank) dts, [rank_off, rank_off+2n)
                 B|C, lane MASK_LANE the inactivity flag
      dtw_ref: (1, 128, dp) f32 — dt projection; rows in [rank, MASK_LANE)
                 and above are zero, row MASK_LANE is -1e9
      A_ref: (1, 1, n*dp), Dskip/bias: (1, 1, dp) f32
      h_scr: (8, n*dp) f32 — persists across the innermost (L) grid axis.

    Odd group indices scan right-to-left (both the L-block index map and the
    in-chunk walk run backwards).
    """
    g = pl.program_id(0)
    lblk = pl.program_id(2)
    rev = g % 2 == 1

    @pl.when(lblk == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    bias = bias_ref[0].astype(jnp.float32)                    # (1, dp)
    dskip = Dskip_ref[0].astype(jnp.float32)
    a_segs = [A_ref[0, :, n * dp:(n + 1) * dp] for n in range(n_state)]

    # whole-chunk dt projection on the MXU: (lc*8, 128) @ (128, dp).
    dts = slab_ref[:].astype(jnp.float32).reshape(lc * 8, 128)
    dt_scr[:] = jax.lax.dot_general(
        dts, dtw_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(lc, 8, dp) + bias[None]

    h0 = tuple(h_scr[:, n * dp:(n + 1) * dp] for n in range(n_state))

    def one_token(i, h):
        u_t = u_ref[pl.ds(i, 1)][0].astype(jnp.float32)       # (8, dp)
        dt_t = jax.nn.softplus(dt_scr[pl.ds(i, 1)][0])
        dtu = dt_t * u_t
        bc_t = slab_ref[pl.ds(i, 1)][0].astype(jnp.float32)   # (8, 128)
        y = dskip * u_t
        hs = []
        for n in range(n_state):
            da = jnp.exp(dt_t * a_segs[n])
            hn = da * h[n] + bc_t[:, rank_off + n:rank_off + n + 1] * dtu
            y = y + bc_t[:, rank_off + n_state + n:
                         rank_off + n_state + n + 1] * hn
            hs.append(hn)
        y_ref[pl.ds(i, 1)] = y[None].astype(y_ref.dtype)
        return tuple(hs)

    assert lc % unroll == 0, (lc, unroll)

    def step(ti, h):
        t = ti * unroll
        for j in range(unroll):
            fwd = t + j
            h = one_token(jnp.where(rev, lc - 1 - fwd, fwd), h)
        return h

    h = jax.lax.fori_loop(0, lc // unroll, step, h0)
    for n in range(n_state):
        h_scr[:, n * dp:(n + 1) * dp] = h[n]


def _ssm_kernel_grouped_v2(u_ref, slab_ref, dtw_ref, A_ref, Dskip_ref,
                           bias_ref, y_ref, h_scr, dt_scr, du_scr, da_scr,
                           hn_scr, y_scr, *, lc: int, n_state: int, dp: int,
                           rank_off: int, unroll: int):
    """State-major grouped kernel: batched transcendentals, minimal serial core.

    The v1 kernel walks tokens serially with the FULL per-token body inside
    the recurrence — including 16 ``exp``s and a softplus per token, which
    stall the VPU on the loop-carried dependency (21.9 ms per res-64 block,
    outputs/profile_r04.log). Here the loop nest is inverted to state-major:
    for each state n, ``da = exp(dt * a_n)`` and ``bu = B_n * (dt * u)`` are
    computed for the WHOLE chunk as batched vector ops (no serial
    dependency), and the serial core is only ``h = da[t] * h + bu[t]`` — one
    multiply-add per token per state. The y accumulation
    (``y += C_n * h_n``) is batched per state after its scan.

    Numerics match v1: f32 throughout, y adds in ascending state order,
    softplus(delta ~ -1e9) = 0 keeps masked tokens exact identity steps.
    Scratch: dt (softplus'd), dt*u, da, hn (holds bu before the scan
    overwrites position t after reading it), y accumulator — all
    (lc, 8, dp) f32.
    """
    g = pl.program_id(0)
    lblk = pl.program_id(2)
    rev = g % 2 == 1

    @pl.when(lblk == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    bias = bias_ref[0].astype(jnp.float32)                    # (1, dp)
    dskip = Dskip_ref[0].astype(jnp.float32)

    dts = slab_ref[:].astype(jnp.float32).reshape(lc * _BT, 128)
    dt_scr[:] = jax.nn.softplus(jax.lax.dot_general(
        dts, dtw_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(lc, _BT, dp) + bias[None])
    u = u_ref[:].astype(jnp.float32)                          # (lc, 8, dp)
    du_scr[:] = dt_scr[:] * u
    y_scr[:] = dskip[None] * u

    slab32 = slab_ref[:].astype(jnp.float32)                  # (lc, 8, 128)

    assert lc % unroll == 0, (lc, unroll)

    for n in range(n_state):
        a_n = A_ref[0, :, n * dp:(n + 1) * dp]                # (1, dp)
        da_scr[:] = jnp.exp(dt_scr[:] * a_n[None])
        b_n = slab32[:, :, rank_off + n:rank_off + n + 1]     # (lc, 8, 1)
        hn_scr[:] = b_n * du_scr[:]                           # bu, in place

        def one(fwd, h):
            t = jnp.where(rev, lc - 1 - fwd, fwd)
            bu_t = hn_scr[pl.ds(t, 1)][0]
            h = da_scr[pl.ds(t, 1)][0] * h + bu_t
            hn_scr[pl.ds(t, 1)] = h[None]
            return h

        def step(ti, h):
            t0 = ti * unroll
            for j in range(unroll):
                h = one(t0 + j, h)
            return h

        h = jax.lax.fori_loop(0, lc // unroll, step,
                              h_scr[:, n * dp:(n + 1) * dp])
        h_scr[:, n * dp:(n + 1) * dp] = h

        c_n = slab32[:, :, rank_off + n_state + n:
                     rank_off + n_state + n + 1]
        y_scr[:] = y_scr[:] + c_n * hn_scr[:]

    y_ref[:] = y_scr[:].astype(y_ref.dtype)


MASK_LANE = 126  # slab lane carrying the inactivity flag (see kernel docs)


def _grouped_xla(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank):
    """Differentiable pure-XLA twin of the grouped kernel (drives backward).

    Reproduces the kernel's semantics exactly: per group, delta = full
    128-lane slab @ dtw (the -1e9 mask-lane row rides the same matmul),
    bias + softplus inside the scan, B/C at lanes [rank, rank+2n)."""
    from actalker_tpu.ops.selective_scan import selective_scan

    lp, bp, _ = u_g.shape
    g = dtw_g.shape[0]
    dp = u_g.shape[2] // (g // 2)
    n = A_g.shape[-1]
    outs = []
    for gi in range(g):
        branch = gi // 2
        u = jnp.moveaxis(u_g[:, :, branch * dp:(branch + 1) * dp], 0, 1)
        slab = jnp.moveaxis(
            slab_g[:, :, gi * 128:(gi + 1) * 128], 0, 1).astype(jnp.float32)
        dt = jnp.einsum("blc,cd->bld", slab, dtw_g[gi])
        Bm = slab[:, :, rank:rank + n][:, :, None]
        Cm = slab[:, :, rank + n:rank + 2 * n][:, :, None]
        flip = ((lambda t: jnp.flip(t, axis=1)) if gi % 2 == 1
                else (lambda t: t))
        y = selective_scan(flip(u), flip(dt), A_g[gi], flip(Bm), flip(Cm),
                           D_g[gi], bias_g[gi], impl="blocked")
        outs.append(jnp.moveaxis(flip(y), 0, 1).astype(u_g.dtype))
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _grouped(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank, lc):
    return _grouped_pallas(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank, lc)


def _grouped_fwd(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank, lc):
    out = _grouped_pallas(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank, lc)
    return out, (u_g, slab_g, dtw_g, A_g, D_g, bias_g)


def _grouped_bwd(rank, lc, res, gbar):
    if jax.default_backend() != "tpu":
        _, vjp = jax.vjp(lambda *p: _grouped_xla(*p, rank=rank), *res)
        return vjp(gbar)
    # Kernel path: per group, reconstruct the scan-level operands (raw delta
    # = slab @ dtw, B/C lanes) and run the adjoint kernels; then push the
    # delta cotangent back through the slab matmul in XLA.
    u_g, slab_g, dtw_g, A_g, D_g, bias_g = res
    g = dtw_g.shape[0]
    dp = u_g.shape[2] // (g // 2)
    n = A_g.shape[-1]
    du_g = jnp.zeros_like(u_g)
    dslab_g = jnp.zeros_like(slab_g)
    ddtw, dA_o, dD_o, dbias_o = [], [], [], []
    for gi in range(g):
        branch = gi // 2
        u = u_g[:, :, branch * dp:(branch + 1) * dp]
        slab = slab_g[:, :, gi * 128:(gi + 1) * 128]
        dtr = jnp.einsum("lbc,cd->lbd", slab.astype(jnp.float32), dtw_g[gi])
        bc = jnp.pad(slab[:, :, rank:rank + 2 * n].astype(u.dtype),
                     ((0, 0), (0, 0), (0, 128 - 2 * n)))
        dy = gbar[:, :, gi * dp:(gi + 1) * dp]
        du, ddt, dbc, dA, dD, dbias = _arranged_grad_tpu(
            u, dtr, bc, A_g[gi], D_g[gi], bias_g[gi], dy,
            reverse=bool(gi % 2))
        du_g = du_g.at[:, :, branch * dp:(branch + 1) * dp].add(
            du.astype(u_g.dtype))
        ddt32 = ddt.astype(jnp.float32)
        dslab = jnp.einsum("lbd,cd->lbc", ddt32, dtw_g[gi])
        dbc32 = dbc[:, :, :2 * n].astype(jnp.float32)
        dslab = dslab + jnp.concatenate(
            [jnp.zeros_like(dslab[:, :, :rank]), dbc32,
             jnp.zeros_like(dslab[:, :, rank + 2 * n:])], axis=-1)
        dslab_g = dslab_g.at[:, :, gi * 128:(gi + 1) * 128].add(
            dslab.astype(slab_g.dtype))
        ddtw.append(jnp.einsum("lbc,lbd->cd", slab.astype(jnp.float32),
                               ddt32))
        dA_o.append(dA)
        dD_o.append(dD)
        dbias_o.append(dbias)
    return (du_g, dslab_g, jnp.stack(ddtw).astype(dtw_g.dtype),
            jnp.stack(dA_o).astype(A_g.dtype),
            jnp.stack(dD_o).astype(D_g.dtype),
            jnp.stack(dbias_o).astype(bias_g.dtype))


_grouped.defvjp(_grouped_fwd, _grouped_bwd)


@functools.partial(jax.jit, static_argnames=("rank", "lc"))
def ssm_scan_grouped(
    u_g: jax.Array,        # (Lp, Bp, G//2 * Dp) — per-branch in_proj slabs
    slab_g: jax.Array,     # (Lp, Bp, G * 128) — [dts | B | C | mask] per group
    dtw_g: jax.Array,      # (G, 128, Dp) f32 — dt projection; row MASK_LANE
                           #   must be -1e9, rows in [rank, MASK_LANE) zero
    A_g: jax.Array,        # (G, Dp, N) f32 (pad channels arbitrary)
    D_g: jax.Array,        # (G, Dp) f32
    bias_g: jax.Array,     # (G, Dp) f32
    rank: int,             # dt rank (lanes [0, rank) of each slab are dts)
    lc: int = 64,
) -> jax.Array:
    """All (branch, direction) scans of one SS2D block in a single launch.

    Group g reads activations from branch slab ``g // 2`` of ``u_g`` and scans
    left-to-right for even g, right-to-left for odd g. Returns
    (Lp, Bp, G * Dp) with each group's output in its own minor slab (the
    caller sums direction pairs and applies the masked-select combine).
    Forward runs the Pallas kernel; gradients flow through the pure-XLA twin
    (custom_vjp)."""
    lc = _pick_lc(lc, u_g.shape[0], u_g.shape[2] // (dtw_g.shape[0] // 2),
                  128, u_g.dtype.itemsize)
    return _grouped(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank, lc)


def _grouped_pallas(u_g, slab_g, dtw_g, A_g, D_g, bias_g, rank, lc):
    lp, bp, cg = u_g.shape
    g = dtw_g.shape[0]
    dp = cg // (g // 2)
    n = A_g.shape[-1]
    assert lp % lc == 0 and bp % _BT == 0, (lp, lc, bp)
    assert slab_g.shape == (lp, bp, g * 128), slab_g.shape
    assert 2 * n + rank <= MASK_LANE, (n, rank)

    a_exp = jnp.transpose(A_g.astype(jnp.float32), (0, 2, 1))   # (G, N, Dp)
    a_exp = a_exp.reshape(g, 1, n * dp)
    Dv = D_g.astype(jnp.float32).reshape(g, 1, dp)
    bias = bias_g.astype(jnp.float32).reshape(g, 1, dp)

    nl = lp // lc
    ng = bp // _BT

    def lmap_u(gi_, bi, li):
        li = jnp.where(gi_ % 2 == 1, nl - 1 - li, li)
        return (li, bi, gi_ // 2)

    def lmap_slab(gi_, bi, li):
        li = jnp.where(gi_ % 2 == 1, nl - 1 - li, li)
        return (li, bi, gi_)

    def lmap_y(gi_, bi, li):
        li = jnp.where(gi_ % 2 == 1, nl - 1 - li, li)
        return (li, bi, gi_)

    gmap = lambda gi_, bi, li: (gi_, 0, 0)  # noqa: E731

    if _SCAN_IMPL == "v2":
        kernel = functools.partial(
            _ssm_kernel_grouped_v2, lc=lc, n_state=n, dp=dp, rank_off=rank,
            unroll=_unroll_for(dp))
        scratch = [pltpu.VMEM((_BT, n * dp), jnp.float32)] + \
            [pltpu.VMEM((lc, _BT, dp), jnp.float32) for _ in range(5)]
    else:
        kernel = functools.partial(
            _ssm_kernel_grouped, lc=lc, n_state=n, dp=dp, rank_off=rank,
            unroll=_unroll_for(dp))
        scratch = [pltpu.VMEM((_BT, n * dp), jnp.float32),
                   pltpu.VMEM((lc, _BT, dp), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(g, ng, nl),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((lc, _BT, dp), lmap_u, memory_space=pltpu.VMEM),
            pl.BlockSpec((lc, _BT, 128), lmap_slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, dp), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n * dp), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dp), gmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lc, _BT, dp), lmap_y, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, bp, g * dp), u_g.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # state carries only along the L axis (reset at lblk == 0), so the
            # group/batch dims are free to pipeline
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v2's five (lc, 8, dp) f32 scratches exceed the 30 MB default
            # scoped-vmem limit at dp=1280/lc=64
            vmem_limit_bytes=100 * 2**20,
        ),
    )(u_g, slab_g, dtw_g, a_exp, Dv, bias)


def arrange_ssm_inputs(u, delta, Bmat, Cmat, lc: int = 64):
    """(B, L, ...) -> padded (L, B, ...) buffers for ``ssm_scan_arranged``.

    Batch pad rows are harmless garbage lanes; L-pad rows get delta = -30
    (softplus ~ 1e-13 => identity recurrence steps)."""
    b, l, d = u.shape
    n = Bmat.shape[-1]
    dp = _round_up(d, 128)
    bp = _round_up(b, _BT)
    np_ = 128
    assert 2 * n <= np_, f"d_state {n} too large for packed B|C"
    lc = _pick_lc(lc, l, dp, np_, u.dtype.itemsize)
    lp = _round_up(l, lc)

    def arrange(x, minor, minor_pad):
        x = jnp.moveaxis(x, 0, 1)
        if lp != l or bp != b or minor_pad != minor:
            x = jnp.pad(x, ((0, lp - l), (0, bp - b), (0, minor_pad - minor)))
        return x

    u_a = arrange(u, d, dp)
    dt_a = jnp.moveaxis(delta, 0, 1)
    dt_a = jnp.pad(dt_a, ((0, 0), (0, bp - b), (0, dp - d)))
    dt_a = jnp.pad(dt_a, ((0, lp - l), (0, 0), (0, 0)), constant_values=-30.0)
    bc = jnp.concatenate([Bmat, Cmat], axis=-1).astype(u.dtype)
    bc_a = arrange(bc, 2 * n, np_)
    return u_a, dt_a, bc_a
