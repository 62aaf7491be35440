"""Multi-head attention kernels in TOKEN layout — (B, S, C) with C = H*Dh
contiguous — so the q/k/v projections stay plain 2-D GEMMs and no
(B,S,H,D) <-> (B,H,S,D) relayouts ever materialize.

Why this exists (profiled on v5e, tools/attribute_step.py): the previous
design projected straight to (B,H,S,D) via 4-D einsums ("bsc,chd->bhsd") so
the stock Pallas flash kernel could consume them. XLA lowers those einsums
as convolutions with the *sequence* dim on lanes and settles the whole
transformer block into an [B][C][S] physical layout; every FF/projection
matmul then flips [B][C][S] <-> [B][S][C] inside its fusion, dropping
token-space GEMMs to 4-25%% MFU (~250 ms/step of pure relayout work at the
bench shape). Keeping attention in token layout anchors the block to the
canonical C-minor layout end to end.

Kernels:
  * ``mha_tokens(q, k, v, heads)`` — flash attention over the S axis.
    Grid (B, S/bq, S/bk), k-blocks innermost; the head loop runs *inside*
    the kernel over the VMEM-resident blocks, so HBM traffic is one
    contiguous (bq, C) row-block per operand (vs per-head strided reads).
    Online softmax in f32; the per-head (bq, bk) score tile is the only
    VMEM-heavy temporary.
  * ``frame_attention_tokens(x_qkv..., num_frames)`` — attention over the
    frame axis (F ~ 14) for each spatial token. Scores are (F, F) per
    token: far too small for the MXU, and XLA materializes them with F on
    lanes (14/128 used => ~10x physical blowup + reduce-window softmax,
    ~11 ms/block). Here a VPU kernel computes the (F, F, ts) score slab per
    (batch, head, s-tile) block in one pass, softmaxes over the key-frame
    axis on sublanes, and accumulates p@v as broadcasts — bandwidth-bound.

Both fall back to pure-XLA einsum paths off-TPU (tests run the fallback and
an interpret-mode kernel against each other).

Replaces the reference's ``F.scaled_dot_product_attention`` on the
(B*F, S, C) spatial path and the (B*S, F, C) temporal path
(``src/models/base/attention.py:29-473``).
"""
from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# flash attention over S, token layout
# ---------------------------------------------------------------------------


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                *, heads: int, scale: float, nk: int,
                kv_len: Optional[int] = None):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = q_ref.shape[-1] // heads
    q = q_ref[0]                                   # (bq, C)
    k = k_ref[0]                                   # (bk, C)
    v = v_ref[0]
    bk = k.shape[0]
    kmask = None
    if kv_len is not None:
        # sequence padded to the block grid (S not a multiple of 256, e.g.
        # 5184 tokens at the 576-px production shape): keys past kv_len are
        # pad rows — mask their scores so softmax ignores them. Pad QUERY
        # rows attend uniformly over valid keys (q = 0) and are sliced off
        # by the caller.
        idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        kmask = idx < kv_len
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = (q[:, sl] * jnp.asarray(scale, q.dtype))
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (bq, bk)
        if kmask is not None:
            s = jnp.where(kmask, s, -jnp.inf)
        m_prev = m_ref[:, h:h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, h:h + 1] = l_ref[:, h:h + 1] * alpha \
            + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, h:h + 1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (bq, d)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv

    @pl.when(ki == nk - 1)
    def _flush():
        acc = acc_ref[...]
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            o_ref[0, :, sl] = (acc[:, sl] / l_ref[:, h:h + 1]
                               ).astype(o_ref.dtype)


_LOG2E = 1.4426950408889634


def _mha_kernel_1pass(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float,
                      kv_len: Optional[int] = None):
    """Whole-sequence key block (nk=1): plain softmax, no online rescale.

    Dropping the running (m, l, alpha) bookkeeping removes ~1/3 of the VPU
    ops per score element; log2(e) is folded into the query scale so the
    softmax exponential is a bare exp2 (exp lowers to exp2+mul on the VPU).
    """
    d = q_ref.shape[-1] // heads
    q = q_ref[0]                                   # (bq, C)
    k = k_ref[0]                                   # (S, C)
    v = v_ref[0]
    kmask = None
    if kv_len is not None:
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, k.shape[0]), 1)
        kmask = idx < kv_len
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl] * jnp.asarray(scale * _LOG2E, q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (bq, S), log2 domain
        if kmask is not None:
            s = jnp.where(kmask, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (bq, d)
        o_ref[0, :, sl] = (pv / l).astype(o_ref.dtype)


def _pick_blocks(s: int, c: int) -> tuple:
    # VMEM: scores (bq, bk) f32 dominate; acc (bq, C) f32.
    # Swept on v5e (outputs/perf_r05.log sweep_mha): the whole-sequence key
    # block wins at every bench shape — bk=s drops the online-softmax
    # rescale entirely (nk=1 routes to the single-pass kernel below) and
    # small bq keeps the score tile cheap: (512, 4096) = 16.7 ms vs the r4
    # default (2048, 1024) = 17.9 at (56,4096,320,h5). bk=s is capped by
    # score VMEM (bq*s*4 <= ~24 MB). ACTALKER_MHA_BLOCKS="bq,bk" overrides
    # (A/B sweeps, tools/sweep_mha.py); non-divisors fall back here.
    env = _os.environ.get("ACTALKER_MHA_BLOCKS", "")
    if env:
        bq, bk = (int(t) for t in env.split(","))
        if s % bq == 0 and s % bk == 0:
            return bq, bk

    def largest(cap):
        best, m = 0, 256
        while m <= min(cap, s):
            if s % m == 0:
                best = m
            m += 256
        if not best:               # s < 256 or no 256-multiple divides s
            best = min(cap, s)
            while s % best:
                best //= 2
        return best

    # bq by sweep (outputs/perf_r05.log A2.2 + E1): 512 wins where it
    # divides s (2.544 vs 2.677 ms at s=1024); where it does not (s=5376,
    # the padded 576-px shape) bq=256 beats 768 by 11% (54.1 vs 60.6 ms).
    if s % 512 == 0:
        bq = 512
    elif s % 256 == 0:
        bq = 256
    else:
        bq = largest(768)
    if bq * s * 4 <= 24 * 2**20:   # single-pass whole-sequence key block
        return bq, s
    return largest(2048), largest(1024)


def _mha_pallas(q, k, v, heads: int, scale: float, *, interpret: bool,
                kv_len: Optional[int] = None):
    b, s, c = q.shape
    bq, bk = _pick_blocks(s, c)
    nq, nk = s // bq, s // bk
    kvl = None if (kv_len is None or kv_len == s) else kv_len
    if nk == 1:
        return pl.pallas_call(
            functools.partial(_mha_kernel_1pass, heads=heads, scale=scale,
                              kv_len=kvl),
            grid=(b, nq),
            in_specs=[
                pl.BlockSpec((1, bq, c), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, s, c), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, s, c), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, c), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 2**20,
            ),
        )(q, k, v)
    kernel = functools.partial(
        _mha_kernel, heads=heads, scale=scale, nk=nk, kv_len=kvl)
    return pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, c), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, c), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),      # acc
            pltpu.VMEM((bq, heads), jnp.float32),  # m
            pltpu.VMEM((bq, heads), jnp.float32),  # l
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(q, k, v)


def _mha_xla(q, k, v, heads: int, scale: float):
    b, s, c = q.shape
    d = c // heads
    q4 = q.reshape(b, s, heads, d)
    k4 = k.reshape(b, s, heads, d)
    v4 = v.reshape(b, s, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q4, k4).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v4).reshape(b, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mha_tokens(q, k, v, heads: int, scale: Optional[float] = None):
    """Self-attention in token layout: q/k/v (B, S, C=H*Dh) -> (B, S, C)."""
    return _mha_fwd(q, k, v, heads, scale)[0]


def _use_kernel(s: int, c: int, heads: int) -> bool:
    # c need only be a multiple of 64: head slices land on half-lane-tile
    # boundaries, which Mosaic lowers as lane selects inside VMEM (measured
    # fine at C=320/D=64 — the flagship down0/up3 width). Any s >= 256
    # works: non-256-multiples are padded with masked keys (the 576-px
    # production shape has S = 5184 = 72^2 — the XLA fallback there
    # materializes a 54 GB f32 score tensor and cannot even compile).
    d = c // heads
    return (jax.default_backend() == "tpu" and s >= 256
            and d % 8 == 0 and c % 64 == 0)


def _mha_fwd(q, k, v, heads, scale):
    b, s, c = q.shape
    sc = (c // heads) ** -0.5 if scale is None else scale
    if _use_kernel(s, c, heads):
        if s % 256:
            sp = (s + 255) // 256 * 256
            pad = ((0, 0), (0, sp - s), (0, 0))
            out = _mha_pallas(jnp.pad(q, pad), jnp.pad(k, pad),
                              jnp.pad(v, pad), heads, sc,
                              interpret=False, kv_len=s)[:, :s]
        else:
            out = _mha_pallas(q, k, v, heads, sc, interpret=False)
    else:
        out = _mha_xla(q, k, v, heads, sc)
    return out, (q, k, v)


def _mha_bwd(heads, scale, res, g):
    """Backward via the stock flash-attention vjp on (B,H,S,D) transposes —
    the training path tolerates the two relayouts; inference never pays them.

    Non-512-multiple sequences (e.g. the 576-px S=5184 shape) are padded to
    the flash block grid with the pad tokens fenced off via segment ids —
    without this the backward would fall to the einsum path and materialize
    the same ~54 GB f32 score tensor the forward padding exists to avoid
    (r4 advisor finding)."""
    q, k, v = res
    b, s, c = q.shape
    d = c // heads
    sc = d ** -0.5 if scale is None else scale

    pad_flash = (jax.default_backend() == "tpu" and s >= 1024
                 and s % 512 != 0 and d in (64, 128, 256))
    if pad_flash:
        from jax.experimental.pallas.ops.tpu import flash_attention as FA

        from actalker_tpu.ops.attention import _flash_block_sizes

        sp = (s + 511) // 512 * 512
        pad = ((0, 0), (0, sp - s), (0, 0))
        # segment 0 = real tokens, 1 = pad: flash masks cross-segment pairs,
        # so real queries ignore pad keys; pad queries attend only pad keys
        # (uniform softmax over zero logits — finite) and their grads are
        # sliced off below.
        seg = jnp.broadcast_to(
            (jnp.arange(sp) >= s).astype(jnp.int32), (b, sp))

        def ref(qp, kp, vp):
            qt = jnp.moveaxis(qp.reshape(b, sp, heads, d), 1, 2)
            kt = jnp.moveaxis(kp.reshape(b, sp, heads, d), 1, 2)
            vt = jnp.moveaxis(vp.reshape(b, sp, heads, d), 1, 2)
            o = FA.flash_attention(
                qt, kt, vt, sm_scale=sc,
                segment_ids=FA.SegmentIds(q=seg, kv=seg),
                block_sizes=_flash_block_sizes(sp, sp))
            return jnp.moveaxis(o, 1, 2).reshape(b, sp, c)

        _, vjp = jax.vjp(ref, jnp.pad(q, pad), jnp.pad(k, pad),
                         jnp.pad(v, pad))
        dq, dk, dv = vjp(jnp.pad(g, pad))
        return dq[:, :s], dk[:, :s], dv[:, :s]

    def ref(q, k, v):
        from actalker_tpu.ops.attention import self_attention_bhsd

        qt = jnp.moveaxis(q.reshape(b, s, heads, d), 1, 2)
        kt = jnp.moveaxis(k.reshape(b, s, heads, d), 1, 2)
        vt = jnp.moveaxis(v.reshape(b, s, heads, d), 1, 2)
        o = self_attention_bhsd(qt, kt, vt, scale=sc)
        return jnp.moveaxis(o, 1, 2).reshape(b, s, c)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


mha_tokens.defvjp(_mha_fwd, _mha_bwd)


# ---------------------------------------------------------------------------
# frame-axis attention (temporal blocks)
# ---------------------------------------------------------------------------


def _frame_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    f, ts, c = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    d = c // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, :, sl].astype(jnp.float32) * scale   # (f, ts, d)

        # Online softmax over key frames in ONE fori_loop (6 vector ops in
        # the body instead of ~4*F unrolled ops — unrolling made Mosaic
        # compile times explode: 179 s at (56,1024,640,h10)). Key/value
        # frames are loaded from the VMEM refs inside the body (Mosaic has
        # no dynamic_slice on loaded vectors, but dynamic ref indexing is
        # just an address offset). All reductions stay 2-D / last-axis —
        # Mosaic can't lower leading-axis reduces of 3-D vectors
        # ("unsupported output implicit dimension").
        def body(g, carry):
            m, l, acc = carry
            kg = k_ref[0, g, :, sl].astype(jnp.float32)      # (ts, d)
            vg = v_ref[0, g, :, sl].astype(jnp.float32)
            s = jnp.sum(q * kg[None], axis=2)                # (f, ts)
            m_new = jnp.maximum(m, s)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + p
            acc = acc * alpha[:, :, None] + p[:, :, None] * vg[None]
            return m_new, l, acc

        m0 = jnp.full((f, ts), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((f, ts), jnp.float32)
        a0 = jnp.zeros((f, ts, d), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, f, body, (m0, l0, a0))
        o_ref[0, :, :, sl] = (acc / l[:, :, None]).astype(o_ref.dtype)


def _frame_pallas(q, k, v, heads: int, scale: float, *, interpret: bool):
    b, f, s, c = q.shape
    ts = 256 if s % 256 == 0 else 128
    while s % ts:
        ts //= 2
    grid = (b, s // ts)
    spec = pl.BlockSpec((1, f, ts, c), lambda b, si: (b, 0, si, 0))
    return pl.pallas_call(
        functools.partial(_frame_kernel, heads=heads, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, f, s, c), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(q, k, v)


def _frame_kernel_v2(q_ref, k_ref, v_ref, o_ref, qT, kT, vT,
                     *, heads: int, scale: float, f: int):
    """Frame attention with d on SUBLANES and tokens on LANES.

    The XLA lowering runs at <1%% MFU (11 ms/res-64 block) and drags ~3 ms
    of reshape/transpose copies per block (outputs/perf_notes_r04.md); the
    v1 kernel put d on lanes, making every score a lane-reduction (19.6 ms).
    Here each (head, frame) slab is transposed ONCE in VMEM to (d, ts), so
    scores are (d, ts) elementwise products + native sublane reductions and
    the p*v accumulation is a sublane broadcast. Frame loops are fori (no
    giant unrolls — unrolling exploded Mosaic compile times before).
    """
    ts = q_ref.shape[2]
    c = q_ref.shape[3]
    d = c // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)

        def load(fi, _):
            qT[pl.ds(fi, 1)] = jnp.transpose(
                q_ref[0, fi, :, sl].astype(jnp.float32) * scale)[None]
            kT[pl.ds(fi, 1)] = jnp.transpose(
                k_ref[0, fi, :, sl].astype(jnp.float32))[None]
            vT[pl.ds(fi, 1)] = jnp.transpose(
                v_ref[0, fi, :, sl].astype(jnp.float32))[None]
            return 0

        jax.lax.fori_loop(0, f, load, 0)

        def one_frame(fi, _):
            qf = qT[pl.ds(fi, 1)][0]                        # (d, ts)

            def one_key(g, carry):
                m, l, acc = carry
                s = jnp.sum(qf * kT[pl.ds(g, 1)][0], axis=0,
                            keepdims=True)                   # (1, ts)
                m_new = jnp.maximum(m, s)
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * alpha + p
                acc = acc * alpha + p * vT[pl.ds(g, 1)][0]
                return m_new, l, acc

            m0 = jnp.full((1, ts), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((1, ts), jnp.float32)
            a0 = jnp.zeros((d, ts), jnp.float32)
            _, l, acc = jax.lax.fori_loop(0, f, one_key, (m0, l0, a0))
            o_ref[0, fi, :, sl] = jnp.transpose(acc / l).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, f, one_frame, 0)


def _frame_pallas_v2(q, k, v, heads: int, scale: float, *, interpret: bool):
    b, f, s, c = q.shape
    d = c // heads
    ts = 256
    while s % ts:
        ts //= 2
    spec = pl.BlockSpec((1, f, ts, c), lambda b, si: (b, 0, si, 0))
    return pl.pallas_call(
        functools.partial(_frame_kernel_v2, heads=heads, scale=scale, f=f),
        grid=(b, s // ts),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, f, s, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((f, d, ts), jnp.float32)
                        for _ in range(3)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(q, k, v)


def _frame_xla(q, k, v, heads: int, scale: float):
    b, f, s, c = q.shape
    d = c // heads
    q5 = q.reshape(b, f, s, heads, d)
    k5 = k.reshape(b, f, s, heads, d)
    v5 = v.reshape(b, f, s, heads, d)
    scores = jnp.einsum("bfshd,bgshd->bshfg", q5, k5).astype(jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(q.dtype)
    o = jnp.einsum("bshfg,bgshd->bfshd", probs, v5)
    return o.reshape(b, f, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def frame_attention_tokens(q, k, v, num_frames: int, heads: int,
                           scale: Optional[float] = None):
    """Attention over the frame axis per spatial token.

    q/k/v: (B*F, S, C) token layout; attention mixes the F frames of each
    (batch, token) pair. Returns (B*F, S, C).
    """
    return _frame_fwd(q, k, v, num_frames, heads, scale)[0]


def _frame_fwd(q, k, v, num_frames, heads, scale):
    bf, s, c = q.shape
    b = bf // num_frames
    d = c // heads
    sc = d ** -0.5 if scale is None else scale
    q4 = q.reshape(b, num_frames, s, c)
    k4 = k.reshape(b, num_frames, s, c)
    v4 = v.reshape(b, num_frames, s, c)
    # Lowering choice (ACTALKER_FRAME_KERNEL): "v2" (default) = the
    # d-on-sublanes kernel (_frame_kernel_v2; micro 10.6/4.98 ms vs XLA
    # 11.9/7.70 at the res-64/res-32 shapes, and it avoids the ~3 ms/block
    # of reshape/transpose copies the XLA path drags in-situ —
    # outputs/profile_r04.log micro_frame); "1" = the v1 kernel (d-on-lanes;
    # measured SLOWER than XLA: 19.6 vs 9.9 ms); "xla" / unset-invalid =
    # the XLA einsum lowering.
    impl = _os.environ.get("ACTALKER_FRAME_KERNEL", "v2")
    ok = (jax.default_backend() == "tpu" and s % 128 == 0
          and c % 64 == 0 and d % 8 == 0)
    if impl == "1" and ok and s % 256 == 0:
        out = _frame_pallas(q4, k4, v4, heads, sc, interpret=False)
    elif impl == "v2" and ok:
        out = _frame_pallas_v2(q4, k4, v4, heads, sc, interpret=False)
    else:
        out = _frame_xla(q4, k4, v4, heads, sc)
    return out.reshape(bf, s, c), (q, k, v)


def _frame_bwd(num_frames, heads, scale, res, g):
    q, k, v = res
    bf, s, c = q.shape
    b = bf // num_frames
    d = c // heads
    sc = d ** -0.5 if scale is None else scale

    def ref(q, k, v):
        return _frame_xla(q.reshape(b, num_frames, s, c),
                          k.reshape(b, num_frames, s, c),
                          v.reshape(b, num_frames, s, c),
                          heads, sc).reshape(bf, s, c)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


frame_attention_tokens.defvjp(_frame_fwd, _frame_bwd)
