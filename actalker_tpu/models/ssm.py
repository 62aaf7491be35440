"""Selective-state-space (Mamba) control blocks — the paper's novelty.

Parity targets in the reference:
  * ``SS2D_Unit`` (``src/models/base/mamba_layer.py:1394-1553``): a bare
    bidirectional 1-D selective scan over a token sequence ('sweep' order,
    ``num_direction=2``) with per-direction input/dt projections and S4D-real
    initialized state matrices.
  * ``SS2D_cond_v10`` (``mamba_layer.py:1902-1986``): the masked-select block.
    Per control branch (audio / expression): project tokens with ``in_proj``,
    *gather only the tokens inside the region mask*, append projected identity
    and control tokens, scan, scatter results back, then sum branches ->
    LayerNorm -> out_proj.

TPU-native redesign — masked-dense scan instead of gather/scatter: XLA needs
static shapes, and a data-dependent gather would force recompilation (or
host sync) per mask. Instead we scan *all* tokens in place and force
``delta -> -inf`` (=> softplus(delta) ~ 0) at unselected positions, which
makes them exact identity elements of the recurrence: the state seen by
selected tokens (in both scan directions) is bit-for-bit the same as if the
unselected tokens had been gathered away (see
``tests/test_selective_scan.py::test_padding_transparency``). Outputs at
unselected positions are replaced by the branch's in_proj activations, which
reproduces the reference's scatter semantics exactly.

Static-capacity gather (``capacity_frac``): when the caller knows an upper
bound on the masked-region fraction (the pipeline computes it host-side from
the clip's region masks, which are constant over a generation), the block
switches to the reference's gather/scatter formulation with a *static* token
budget ``K = ceil(frac * L)`` per branch: active tokens are compacted to the
front of a (K + n_tail)-row buffer via a cumsum slot assignment (no sort),
scanned, and scattered back; slots past the active count are transparent.
This recovers the reference's cost model — a zeroed branch (modes 0/1,
``Inference.py:469-476``) scans only its id/cond tail, and a face-box mask
scans the box fraction instead of the full frame — while staying a single
compiled program per (frac-bucket) capacity.

The scan itself runs on the Pallas kernel (``ops/selective_scan_pallas``) on
TPU; tests use the pure-XLA blocked scan.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

import os as _os

from actalker_tpu.models.attention_blocks import (
    downsample_ip_mask,
    expand_mask_rows,
)
from actalker_tpu.models.common import LayerNormF32, dense
from actalker_tpu.ops.selective_scan import selective_scan

# Out-seam lowering for the grouped block (A/B, tools/micro_block.py):
#   "token"    (default) — moveaxis the summed branch output back to token
#              layout BEFORE out_norm/out_proj, so the out_proj GEMM runs in
#              the canonical C-minor layout. The r3 design ("arranged") kept
#              norm+proj in the L-major arranged layout and let XLA fuse the
#              transpose into the matmul — profiled at 4% MFU (5.5 ms vs
#              0.24 ms ideal per block, outputs/attr_r4: fusion.3575).
#   "arranged" — the r3 behavior.
#   "fused"    — like "arranged" but out_norm uses the Pallas LN kernel.
_SSM_SEAM = _os.environ.get("ACTALKER_SSM_SEAM", "token")
assert _SSM_SEAM in ("token", "arranged", "fused"), _SSM_SEAM


def set_ssm_seam(impl: str) -> None:
    global _SSM_SEAM
    assert impl in ("token", "arranged", "fused"), impl
    _SSM_SEAM = impl


def _scan_one_direction(u, delta, A, Bm, Cm, D, bias, reverse, impl, dtype):
    """(B, L, d) scan in one direction with the chosen backend."""
    if impl == "pallas":
        from actalker_tpu.ops.selective_scan_pallas import ssm_scan

        y = ssm_scan(u, delta, A, Bm, Cm, D, bias, reverse=reverse)
    else:
        flip = (lambda t: jnp.flip(t, axis=1)) if reverse else (lambda t: t)
        y = selective_scan(
            flip(u), flip(delta), A, flip(Bm)[:, :, None], flip(Cm)[:, :, None],
            D, bias, impl=impl,
        )
        y = flip(y)
    return y.astype(dtype)


class SS2DUnit(nn.Module):
    """Bidirectional selective scan over (B, L, d_inner) sequences."""

    d_inner: int
    d_state: int = 16
    dt_rank: Optional[int] = None
    num_direction: int = 2
    scan_impl: str = "pallas"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        k = self.num_direction
        d, n = self.d_inner, self.d_state
        rank = self.dt_rank or math.ceil(self.d_inner / 2 / 16)
        self.rank = rank
        # per-direction projections; mamba-style inits.
        dt_std = rank**-0.5
        self.x_proj_weight = self.param(
            "x_proj_weight",
            lambda key: jax.random.uniform(
                key, (k, rank + 2 * n, d), jnp.float32,
                -(d**-0.5), d**-0.5,
            ),
        )
        self.dt_projs_weight = self.param(
            "dt_projs_weight",
            lambda key: jax.random.uniform(
                key, (k, d, rank), jnp.float32, -dt_std, dt_std
            ),
        )

        def dt_bias_init(key):
            dt_min, dt_max, floor = 1e-3, 0.1, 1e-4
            u = jax.random.uniform(key, (k, d))
            dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
            dt = jnp.maximum(dt, floor)
            return dt + jnp.log(-jnp.expm1(-dt))  # inverse softplus

        self.dt_projs_bias = self.param("dt_projs_bias", dt_bias_init)
        self.A_logs = self.param(
            "A_logs",
            lambda key: jnp.log(
                jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32)[None], (k * d, 1))
            ),
        )
        self.Ds = self.param("Ds", lambda key: jnp.ones((k * d,), jnp.float32))

    def weights(self):
        """Raw per-direction projection/state params, for callers that drive
        the grouped Pallas kernel directly (param tree unchanged)."""
        return (self.x_proj_weight, self.dt_projs_weight, self.dt_projs_bias,
                self.A_logs, self.Ds)

    def scan_arranged(self, x_a, tm_a=None, lc: int = 64):
        """Bidirectional scan on a pre-arranged padded buffer.

        x_a: (Lp, Bp, Dp) with Lp % lc == 0, Bp % 8 == 0, Dp % 128 == 0 and
        zero padding; tm_a: (Lp, Bp) bool activity mask (False rows — pads or
        mask-deselected tokens — are exact identity steps). Projections run
        in the arranged layout with zero-padded weights (pad channels are
        transparent), so no per-direction relayouts or pads occur.
        """
        from actalker_tpu.ops.selective_scan_pallas import ssm_scan_arranged

        lp, bp, dp = x_a.shape
        d = self.d_inner
        n, rank = self.d_state, self.rank
        y = jnp.zeros((lp, bp, dp), self.dtype)
        for k in range(self.num_direction):
            xw = jnp.pad(self.x_proj_weight[k].astype(self.dtype),
                         ((0, 0), (0, dp - d)))
            x_dbl = jnp.einsum("lbd,cd->lbc", x_a, xw)
            dts = x_dbl[..., :rank]
            bcm = x_dbl[..., rank:rank + 2 * n]                # B | C packed
            dtw = jnp.pad(self.dt_projs_weight[k].astype(self.dtype),
                          ((0, dp - d), (0, 0)))
            dt_a = jnp.einsum("lbr,dr->lbd", dts, dtw)
            if tm_a is not None:
                dt_a = jnp.where(tm_a[:, :, None], dt_a, -1e9)
            bc_a = jnp.pad(bcm.astype(x_a.dtype),
                           ((0, 0), (0, 0), (0, 128 - 2 * n)))
            A = -jnp.exp(self.A_logs[k * d:(k + 1) * d].astype(jnp.float32))
            yk = ssm_scan_arranged(
                x_a, dt_a, bc_a, A, self.Ds[k * d:(k + 1) * d],
                self.dt_projs_bias[k], reverse=(k % 2 == 1), lc=lc,
            )
            y = y + yk.astype(self.dtype)
        return y

    def __call__(self, x, transparent_mask=None):
        """x: (B, L, d_inner); transparent_mask: (B, L) bool, False -> the
        token is an identity element of the scan (masked-dense select)."""
        b, l, d = x.shape
        n, rank = self.d_state, self.rank

        if self.scan_impl == "pallas":
            # Arrange once, scan both directions in the arranged layout.
            from actalker_tpu.ops.selective_scan_pallas import (
                _BT, _pick_lc, _round_up,
            )

            dp = _round_up(d, 128)
            lc = _pick_lc(64, l, dp, 128, x.dtype.itemsize)
            lp = _round_up(l, lc)
            bp = _round_up(b, _BT)
            x_a = jnp.moveaxis(x, 0, 1)
            x_a = jnp.pad(x_a, ((0, lp - l), (0, bp - b), (0, dp - d)))
            if transparent_mask is not None:
                tm = jnp.pad(jnp.moveaxis(transparent_mask, 0, 1),
                             ((0, lp - l), (0, bp - b)))
            else:
                tm = jnp.zeros((lp, 1), bool).at[:l].set(True)
            y = self.scan_arranged(x_a, tm, lc=lc)
            return jnp.moveaxis(y[:l, :b, :d], 0, 1)

        y = jnp.zeros((b, l, d), self.dtype)
        for k in range(self.num_direction):
            xw = self.x_proj_weight[k].astype(self.dtype)      # (rank+2n, d)
            x_dbl = jnp.einsum("bld,cd->blc", x, xw)
            dts = x_dbl[..., :rank]
            Bm = x_dbl[..., rank:rank + n]
            Cm = x_dbl[..., rank + n:]
            delta = jnp.einsum(
                "blr,dr->bld", dts, self.dt_projs_weight[k].astype(self.dtype)
            )
            if transparent_mask is not None:
                delta = jnp.where(transparent_mask[:, :, None], delta, -1e9)
            A = -jnp.exp(self.A_logs[k * d:(k + 1) * d].astype(jnp.float32))
            yk = _scan_one_direction(
                x, delta, A, Bm, Cm,
                self.Ds[k * d:(k + 1) * d], self.dt_projs_bias[k],
                reverse=(k % 2 == 1), impl=self.scan_impl, dtype=self.dtype,
            )
            y = y + yk
        return y


class _LinWeight(nn.Module):
    """Parameter-compatible stand-in for a bias-free ``nn.Dense`` that
    returns the raw kernel (so sibling projections can be fused into one
    matmul without changing the checkpoint tree)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features), jnp.float32)


class SS2DCondV10(nn.Module):
    """Masked-select dual-branch SSM control block (production variant).

    The ablation flags reproduce the reference's variant lineage as config
    instead of file copies (``mamba_layer.py``: ``SS2D_cond_v10_wo_id``
    1988-2070 drops the identity tokens; ``SS2D_cond_v4_wo_ssd`` 1316-1392
    skips the scan; the ``_wo_audio`` UNet variants drop the audio branch):
      use_id=False   -> no identity tokens prepended to the scan sequence
      use_audio=False-> audio branch removed (exp branch only)
      use_exp=False  -> expression branch removed (audio branch only)
      no_scan=False  -> branch output is the input projection (scan skipped)
    """

    d_model: int
    d_cond: int = 1024
    d_state: int = 16
    expand: int = 2
    scan_impl: str = "pallas"
    use_id: bool = True
    use_audio: bool = True
    use_exp: bool = True
    no_scan: bool = False
    # Static masked-token capacity fractions (audio, exp): frac < 1 switches
    # the grouped path to gather/scatter with K = ceil(frac * L) token slots
    # per branch (see module docstring). None => masked-dense full scan.
    # CORRECTNESS CONTRACT: the true active-token count at every resolution
    # must be <= K (the pipeline computes a true upper bound host-side with
    # the same mask downsample). ``capacity_overflow`` guards the contract
    # at runtime:
    #   "nan"  (default) — a violated capacity poisons the block output with
    #          NaN, so misuse fails loudly instead of silently degrading;
    #   "drop" — overflow tokens are dropped from the scan (their output is
    #          the in_proj passthrough, like deselected tokens).
    capacity_frac: Optional[tuple] = None
    capacity_overflow: str = "nan"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                         # (B, L, C) tokens
        id_emb: jax.Array,                    # (B, 1, d_cond)
        audio_cond: jax.Array,                # (B, Sa, d_cond)
        exp_cond: jax.Array,                  # (B, Se, d_cond)
        audio_mask: Optional[jax.Array],      # (Bm, 1, H, W) or None (= all on)
        exp_mask: Optional[jax.Array],
    ) -> jax.Array:
        b, l, c = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        assert self.use_audio or self.use_exp, \
            "cannot ablate both the audio and expression branches"
        id_tok = None
        if self.use_id:
            id_tok = nn.silu(dense(d_inner, use_bias=False, dtype=self.dtype,
                                   name="id_proj")(id_emb))

        def sel_of(mask):
            if mask is None:
                return jnp.ones((b, l), bool)
            m = downsample_ip_mask(mask, l)[..., 0]
            # reference selects tokens where int(mask) != 0 after the bicubic
            # downsample, i.e. values that reach 1.0.
            return expand_mask_rows(m >= 1.0 - 1e-6, b)

        if self.no_scan:
            outs = []
            if self.use_audio:
                outs.append(dense(d_inner, use_bias=False, dtype=self.dtype,
                                  name="in_proj1")(x))
            if self.use_exp:
                outs.append(dense(d_inner, use_bias=False, dtype=self.dtype,
                                  name="in_proj2")(x))
            y = LayerNormF32(name="out_norm")(sum(outs))
            return dense(self.d_model, use_bias=False, dtype=self.dtype,
                         name="out_proj")(y)

        if self.scan_impl == "pallas" and d_inner % 128 == 0:
            # Grouped fast path: ONE relayout of x and ONE Pallas launch per
            # block — all (branch, direction) scans ride a (G, ng, nl) grid;
            # the dt projection/bias/softplus and the transparency masking
            # happen inside the kernel (see ``ssm_scan_grouped``), so the
            # per-direction delta tensors, the token-tail concats and the
            # alignment pads of the previous design never hit HBM.
            from actalker_tpu.ops.selective_scan_pallas import (
                _BT, MASK_LANE, _pick_lc, _round_up, ssm_scan_grouped,
            )

            n = self.d_state
            rank = dt_rank
            branches = []
            if self.use_audio:
                branches.append(("1", "audio_proj", audio_cond, audio_mask,
                                 "audio_unit"))
            if self.use_exp:
                branches.append(("2", "exp_proj", exp_cond, exp_mask,
                                 "exp_unit"))
            nb = len(branches)
            bp = _round_up(b, _BT)

            tails, sels, units, kernels = [], [], [], []
            for name, proj_name, cond, mask, unit_name in branches:
                units.append(SS2DUnit(
                    d_inner, d_state=n, dt_rank=rank,
                    scan_impl=self.scan_impl, dtype=self.dtype,
                    name=unit_name,
                ))
                kernels.append(_LinWeight(d_inner, name=f"in_proj{name}")(c))
                cond_tok = nn.silu(dense(d_inner, use_bias=False,
                                         dtype=self.dtype,
                                         name=proj_name)(cond))
                tail = ([id_tok] if id_tok is not None else []) + [cond_tok]
                tail = jnp.concatenate(
                    [jnp.broadcast_to(t, (b,) + t.shape[1:]) for t in tail],
                    axis=1)                                  # (b, ntok, dI)
                tails.append(tail)
                sels.append(sel_of(mask))
            ntoks = [t.shape[1] for t in tails]
            ntok_max = max(ntoks)

            # static per-branch token capacities (gather path) — K < l flips
            # the branch from masked-dense to compact gather/scatter
            fracs = [None] * nb
            if self.capacity_frac is not None:
                by_name = {"1": self.capacity_frac[0],
                           "2": self.capacity_frac[1]}
                fracs = [by_name[br[0]] for br in branches]
            caps = []
            for (name, _, _, mask, _), fr in zip(branches, fracs):
                if fr is None or mask is None:
                    caps.append(l)
                else:
                    k = int(math.ceil(min(max(fr, 0.0), 1.0) * l))
                    caps.append(min(l, _round_up(k, 8)) if k else 0)
            use_gather = any(k < l for k in caps)

            # packed weight slabs [dts | B | C | inactivity] per group
            wss, dtws, a_gs, d_gs, b_gs = [], [], [], [], []
            for bi, unit in enumerate(units):
                xw, dtw, dtb, a_log, d_skip = unit.weights()
                for k in range(2):
                    wblk = jnp.zeros((nb * d_inner, 128), self.dtype)
                    wblk = wblk.at[
                        bi * d_inner:(bi + 1) * d_inner, :rank + 2 * n
                    ].set(jnp.transpose(xw[k]).astype(self.dtype))
                    wss.append(wblk)
                    row = jnp.zeros((128, d_inner), jnp.float32)
                    row = row.at[:rank].set(
                        jnp.transpose(dtw[k]).astype(jnp.float32))
                    row = row.at[MASK_LANE].set(-1e9)
                    dtws.append(row)
                    a_gs.append(-jnp.exp(
                        a_log[k * d_inner:(k + 1) * d_inner]
                        .astype(jnp.float32)))
                    d_gs.append(d_skip[k * d_inner:(k + 1) * d_inner]
                                .astype(jnp.float32))
                    b_gs.append(dtb[k].astype(jnp.float32))
            w_slab = jnp.concatenate(wss, axis=1)            # (nb*dI, G*128)
            w_in = jnp.concatenate(kernels, axis=1).astype(self.dtype)
            mask_mat = jnp.zeros((nb, 2 * nb * 128), self.dtype)
            for bi in range(nb):
                mask_mat = mask_mat.at[bi, 2 * bi * 128 + MASK_LANE].set(1.0)
                mask_mat = mask_mat.at[
                    bi, (2 * bi + 1) * 128 + MASK_LANE].set(1.0)

            def tail_arranged(bi):
                t_a = jnp.moveaxis(tails[bi], 0, 1).astype(self.dtype)
                return jnp.pad(t_a, ((0, 0), (0, bp - b), (0, 0)))

            if not use_gather:
                lc = _pick_lc(64, l + ntok_max, d_inner, 128,
                              x.dtype.itemsize)
                lp = _round_up(l + ntok_max, lc)
                x_a = jnp.moveaxis(x, 0, 1)                  # (l, b, c)
                x_a = jnp.pad(x_a, ((0, lp - l), (0, bp - b), (0, 0)))
                xz = jnp.einsum("lbc,cd->lbd", x_a.astype(self.dtype), w_in)
                for bi in range(nb):                         # token tails
                    xz = jax.lax.dynamic_update_slice(
                        xz, tail_arranged(bi), (l, 0, bi * d_inner))
                tms = []
                for bi in range(nb):
                    sel_a = jnp.moveaxis(sels[bi], 0, 1)
                    sel_a = jnp.pad(sel_a, ((0, 0), (0, bp - b)))
                    tms.append(jnp.concatenate([
                        sel_a,
                        jnp.ones((ntoks[bi], bp), bool),
                        jnp.zeros((lp - l - ntoks[bi], bp), bool),
                    ], axis=0))                              # (lp, bp)
                slab = jnp.einsum("lbd,dc->lbc", xz, w_slab)
                inact = jnp.stack(
                    [(~t).astype(slab.dtype) for t in tms], axis=-1)
                slab = slab + jnp.einsum("lbn,nc->lbc", inact, mask_mat)
                y_g = ssm_scan_grouped(
                    xz, slab, jnp.stack(dtws), jnp.stack(a_gs),
                    jnp.stack(d_gs), jnp.stack(b_gs), rank=rank, lc=lc)
                outs = []
                for bi in range(nb):
                    y_b = (y_g[:l, :, 2 * bi * d_inner:(2 * bi + 1) * d_inner]
                           + y_g[:l, :, (2 * bi + 1) * d_inner:
                                 (2 * bi + 2) * d_inner]).astype(self.dtype)
                    xz_b = xz[:l, :, bi * d_inner:(bi + 1) * d_inner]
                    outs.append(jnp.where(tms[bi][:l, :, None], y_b, xz_b))
            else:
                # gather path: compact active tokens to K_b slots per branch
                lmax = max(k + t for k, t in zip(caps, ntoks))
                lc = _pick_lc(64, lmax, d_inner, 128, x.dtype.itemsize)
                lp = _round_up(lmax, lc)
                x_a = jnp.moveaxis(x, 0, 1)                  # (l, b, c)
                x_a = jnp.pad(x_a, ((0, 0), (0, bp - b), (0, 0)))
                xz_full = jnp.einsum("lbc,cd->lbd",
                                     x_a.astype(self.dtype), w_in)
                cols = jnp.arange(bp, dtype=jnp.int32)[None, :]
                u_rows, tms, scatters = [], [], []
                overflow = jnp.zeros((), jnp.int32)
                for bi in range(nb):
                    K, ntok = caps[bi], ntoks[bi]
                    sel = sels[bi]                           # (b, l)
                    if K < l:  # runtime capacity-contract guard
                        overflow = overflow + jnp.maximum(
                            jnp.max(jnp.sum(sel.astype(jnp.int32), axis=1))
                            - K, 0)
                    # slot assignment: cumsum-compaction, stable in token
                    # order (the reference's masked_select order,
                    # mamba_layer.py:1962); overflow and inactive tokens
                    # write slot K of a scratch column and are dropped.
                    pos = jnp.cumsum(sel.astype(jnp.int32), axis=1) - 1
                    slots = jnp.where(sel & (pos < K), pos, K)
                    idxb = jnp.full((b, K + 1), l, jnp.int32)
                    idxb = idxb.at[
                        jnp.arange(b)[:, None], slots
                    ].set(jnp.broadcast_to(
                        jnp.arange(l, dtype=jnp.int32)[None], (b, l)),
                        mode="drop")
                    idx = idxb[:, :K]                        # (b, K)
                    gact = jnp.pad((idx < l).T, ((0, 0), (0, bp - b)))
                    idx_g = jnp.pad(jnp.minimum(idx, l - 1).T,
                                    ((0, 0), (0, bp - b)))   # (K, bp)
                    idx_s = jnp.pad(idx.T, ((0, 0), (0, bp - b)),
                                    constant_values=l)
                    xz_b = xz_full[:, :, bi * d_inner:(bi + 1) * d_inner]
                    gath = jnp.take_along_axis(
                        xz_b, idx_g[:, :, None], axis=0)     # (K, bp, dI)
                    u_rows.append(jnp.concatenate([
                        gath, tail_arranged(bi),
                        jnp.zeros((lp - K - ntok, bp, d_inner), gath.dtype),
                    ], axis=0))
                    tms.append(jnp.concatenate([
                        gact,
                        jnp.ones((ntok, bp), bool),
                        jnp.zeros((lp - K - ntok, bp), bool),
                    ], axis=0))
                    scatters.append((xz_b, gath, gact, idx_s, K))
                u_g = jnp.concatenate(u_rows, axis=-1)       # (lp, bp, nb*dI)
                slab = jnp.einsum("lbd,dc->lbc", u_g, w_slab)
                inact = jnp.stack(
                    [(~t).astype(slab.dtype) for t in tms], axis=-1)
                slab = slab + jnp.einsum("lbn,nc->lbc", inact, mask_mat)
                y_g = ssm_scan_grouped(
                    u_g, slab, jnp.stack(dtws), jnp.stack(a_gs),
                    jnp.stack(d_gs), jnp.stack(b_gs), rank=rank, lc=lc)
                outs = []
                for bi, (xz_b, gath, gact, idx_s, K) in enumerate(scatters):
                    y_b = (y_g[:K, :, 2 * bi * d_inner:(2 * bi + 1) * d_inner]
                           + y_g[:K, :, (2 * bi + 1) * d_inner:
                                 (2 * bi + 2) * d_inner]).astype(self.dtype)
                    upd = jnp.where(gact[:, :, None], y_b, gath)
                    outs.append(xz_b.at[idx_s, cols].set(upd, mode="drop"))
                if self.capacity_overflow == "nan":
                    # a violated capacity contract fails loudly: NaN-poison
                    # the block output instead of silently dropping tokens
                    poison = jnp.where(overflow > 0, jnp.nan, 0.0
                                       ).astype(self.dtype)
                    outs[0] = outs[0] + poison

            y = sum(outs)
            if _SSM_SEAM == "token":
                # back to token layout FIRST: one bandwidth-bound transpose,
                # then norm + out_proj run as canonical C-minor token GEMMs
                # (the arranged-layout variant fused the transpose into the
                # out_proj matmul at 4% MFU — see _SSM_SEAM docs)
                y = jnp.moveaxis(y[:, :b], 0, 1)        # (b, l, d_inner)
                y = LayerNormF32(name="out_norm")(y)
                return dense(self.d_model, use_bias=False, dtype=self.dtype,
                             name="out_proj")(y)
            y = LayerNormF32(
                name="out_norm",
                impl="fused" if _SSM_SEAM == "fused" else None)(y)
            y = dense(self.d_model, use_bias=False, dtype=self.dtype,
                      name="out_proj")(y)
            return jnp.moveaxis(y[:, :b], 0, 1)

        def branch(name, proj_name, cond, mask):
            xz = dense(d_inner, use_bias=False, dtype=self.dtype,
                       name=f"in_proj{name}")(x)
            cond_tok = nn.silu(dense(d_inner, use_bias=False, dtype=self.dtype,
                                     name=proj_name)(cond))
            if mask is None:
                sel = jnp.ones((b, l), bool)
            else:
                m = downsample_ip_mask(mask, l)[..., 0]        # (Bm, L)
                # reference selects tokens where int(mask) != 0 after bicubic
                # downsample, i.e. values that reach 1.0.
                sel = expand_mask_rows(m >= 1.0 - 1e-6, b)
            extra = [] if id_tok is None else [
                jnp.broadcast_to(id_tok, (b,) + id_tok.shape[1:])]
            extra.append(jnp.broadcast_to(cond_tok, (b,) + cond_tok.shape[1:]))
            ntok = sum(t.shape[1] for t in extra)
            seq = jnp.concatenate([xz] + extra, axis=1)
            tmask = jnp.concatenate(
                [sel, jnp.ones((b, ntok), bool)], axis=1
            )
            y = SS2DUnit(
                d_inner, d_state=self.d_state, dt_rank=dt_rank,
                scan_impl=self.scan_impl, dtype=self.dtype,
                name=f"{'audio' if name == '1' else 'exp'}_unit",
            )(seq, transparent_mask=tmask)
            return jnp.where(sel[:, :, None], y[:, :l], xz)

        outs = []
        if self.use_audio:
            outs.append(branch("1", "audio_proj", audio_cond, audio_mask))
        if self.use_exp:
            outs.append(branch("2", "exp_proj", exp_cond, exp_mask))
        y = LayerNormF32(name="out_norm")(sum(outs))
        return dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="out_proj")(y)
