"""VMamba-style spatial SS2D block, the non-production conditional SSM
lineage (v5/v6/v9), and the MambaUPNet decoder stack.

Parity targets in the reference (none are on the production v10 path, but
SURVEY §2.4 inventories them):
  * ``SS2D`` (``src/models/base/mamba_layer.py:186-420``): K-directional
    selective scan over H x W feature maps — in_proj -> depthwise conv ->
    per-direction scans (row-major / transposed / rot90 / rot90-transposed,
    each also flipped) -> inverse scans summed -> LayerNorm -> silu-gated
    out_proj.
  * ``SS2D_cond_v5`` (``mamba_layer.py:1555-1630``): N parallel SS2D_Units
    over [tokens | projected cond], averaged.
  * ``SS2D_cond_v6`` (``mamba_layer.py:1632-1706``): intra-SSM over the
    tokens first, then a cond-SSM over [intra | projected cond].
  * ``SS2D_cond_v9`` (``mamba_layer.py:1802-1899``): two branches
    (audio/exp) with identity tokens, *soft* region-mask multiply of each
    branch output (unlike v10's hard token select), then a fuse scan.
  * ``MambaUPNet`` decoder (``mamba_layer.py:2427-2660``): HSSBlock
    (LN -> SS2D residual) -> LSSModule (SSM blocks + 5x5/7x7 depthwise conv
    branches, InstanceNorm, 1x1 fuse) -> LSSLayer_up (PatchExpand2D
    upsample + modules) -> 4-stage MambaUPNet.

TPU-native design notes: scan directions are realized as host-precomputed
composite permutation tables (base spatial transform o scan order), so each
direction is one static gather on device — the reference's
view/transpose/rot90 chain (``mamba_layer.py:299-351``) collapses into the
table. All recurrences run through ``ops/selective_scan`` (XLA blocked scan
or the Pallas TPU kernel); states are fp32, mirroring the reference's
``.float()`` upcasts (``mamba_layer.py:319-325``).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models.attention_blocks import downsample_ip_mask
from actalker_tpu.models.common import LayerNormF32, dense
from actalker_tpu.models.ssm import SS2DUnit, _scan_one_direction
from actalker_tpu.ops.scan_orders import inverse_table, order_table


def direction_perms(h: int, w: int, num_direction: int,
                    scan_type: str = "scan") -> list[np.ndarray]:
    """Composite permutations for the K//2 base scan directions.

    Each entry p satisfies seq[j] = tokens_flat[p[j]] where tokens_flat is
    the row-major (H*W) flattening; the reference realizes the same
    traversals by materializing transposed / rotated copies and encoding
    with ``HSCANS`` (``mamba_layer.py:299-310``):
      base 0: row-major,
      base 1 (K>=4): transpose (column-major),
      base 2 (K>=8): rot90,
      base 3 (K>=8): transpose o rot90.
    The remaining K//2 directions are the same traversals reversed
    (``xs = cat([xs, flip(xs)])``, ``mamba_layer.py:311``) — handled by the
    caller as reverse scans, no extra tables.
    """
    assert num_direction in (2, 4, 8)
    if num_direction >= 4:
        assert h == w, "K>=4 directional scans assume a square grid"
    p = order_table(scan_type, h, w)
    perms = [p]
    if num_direction >= 4:
        # transposed grid position i=(x*H+y) holds row-major token y*W+x
        i = np.arange(h * w)
        perm_t = (i % h) * w + i // h
        perms.append(perm_t[p])
    if num_direction >= 8:
        # torch.rot90(x, 1, (H, W)): out[i, j] = in[j, W-1-i], out is (W, H)
        i = np.arange(w * h)
        ri, rj = i // h, i % h
        perm_r = rj * w + (w - 1 - ri)
        perms.append(perm_r[p])
        # transpose of the rotation: out[a, b] = in[a, W-1-b]
        a = np.arange(h * w)
        perm_rt = (a // w) * w + (w - 1 - a % w)
        perms.append(perm_rt[p])
    return perms


class DirectionalScanParams(nn.Module):
    """Per-direction scan projections/state shared by SS2D and SS2D_Unit
    (identical parameter recipe, ``mamba_layer.py:245-297,1450-1501``)."""

    d_inner: int
    d_state: int
    dt_rank: int
    num_direction: int

    def setup(self):
        k, d, n, rank = self.num_direction, self.d_inner, self.d_state, self.dt_rank
        dt_std = rank**-0.5
        self.x_proj_weight = self.param(
            "x_proj_weight",
            lambda key: jax.random.uniform(
                key, (k, rank + 2 * n, d), jnp.float32, -(d**-0.5), d**-0.5),
        )
        self.dt_projs_weight = self.param(
            "dt_projs_weight",
            lambda key: jax.random.uniform(
                key, (k, d, rank), jnp.float32, -dt_std, dt_std),
        )

        def dt_bias_init(key):
            dt_min, dt_max, floor = 1e-3, 0.1, 1e-4
            u = jax.random.uniform(key, (k, d))
            dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min))
                         + math.log(dt_min))
            dt = jnp.maximum(dt, floor)
            return dt + jnp.log(-jnp.expm1(-dt))

        self.dt_projs_bias = self.param("dt_projs_bias", dt_bias_init)
        self.A_logs = self.param(
            "A_logs",
            lambda key: jnp.log(jnp.tile(
                jnp.arange(1, n + 1, dtype=jnp.float32)[None], (k * d, 1))),
        )
        self.Ds = self.param("Ds", lambda key: jnp.ones((k * d,), jnp.float32))

    def scan_direction(self, seq, k: int, reverse: bool, impl: str, dtype):
        """Run direction k's projections + selective scan on (B, L, d)."""
        d, n, rank = self.d_inner, self.d_state, self.dt_rank
        x_dbl = jnp.einsum(
            "bld,cd->blc", seq, self.x_proj_weight[k].astype(seq.dtype))
        dts = x_dbl[..., :rank]
        Bm = x_dbl[..., rank:rank + n]
        Cm = x_dbl[..., rank + n:]
        delta = jnp.einsum(
            "blr,dr->bld", dts, self.dt_projs_weight[k].astype(seq.dtype))
        A = -jnp.exp(self.A_logs[k * d:(k + 1) * d].astype(jnp.float32))
        return _scan_one_direction(
            seq, delta, A, Bm, Cm, self.Ds[k * d:(k + 1) * d],
            self.dt_projs_bias[k], reverse, impl, dtype)


class SS2DSpatial(nn.Module):
    """K-directional selective scan over (B, H, W, C) feature maps.

    Parity: ``SS2D`` (``mamba_layer.py:186-420``). The scan core runs fp32
    like the reference's ``forward_core`` upcasts.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    num_direction: int = 4
    scan_type: str = "scan"
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        k_total = self.num_direction
        xz = dense(2 * d_inner, use_bias=False, dtype=self.dtype,
                   name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        # depthwise 3x3 (reference conv2d groups=d_inner) + SiLU
        xs = nn.Conv(d_inner, kernel_size=(self.d_conv, self.d_conv),
                     padding="SAME", feature_group_count=d_inner,
                     dtype=self.dtype, name="conv2d")(xs)
        xs = nn.silu(xs)

        tokens = xs.reshape(b, h * w, d_inner).astype(jnp.float32)
        perms = direction_perms(h, w, k_total, self.scan_type)
        invs = [inverse_table(p) for p in perms]
        params = DirectionalScanParams(
            d_inner, self.d_state, dt_rank, k_total, name="scans")
        y = jnp.zeros_like(tokens)
        for k in range(k_total):
            base = k % (k_total // 2)
            reverse = k >= k_total // 2
            seq = tokens[:, perms[base]]
            yk = params.scan_direction(seq, k, reverse, self.scan_impl,
                                       jnp.float32)
            y = y + yk[:, invs[base]]

        y = y.reshape(b, h, w, d_inner)
        y = LayerNormF32(name="out_norm")(y)
        y = y * nn.silu(z.astype(y.dtype))
        return dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="out_proj")(y)


class SS2DCondV5(nn.Module):
    """N parallel scan units over [tokens | cond], averaged
    (``mamba_layer.py:1555-1630``)."""

    d_model: int
    d_cond: int = 1024
    n_ssd_unit: int = 2
    d_state: int = 16
    expand: int = 2
    num_direction: int = 2
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        b, l, _ = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        xz = dense(d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        cp = dense(d_inner, use_bias=False, dtype=self.dtype,
                   name="cond_proj")(cond)
        seq = jnp.concatenate(
            [xz, jnp.broadcast_to(cp, (b,) + cp.shape[1:])], axis=1)
        seq = nn.silu(dense(d_inner, use_bias=False, dtype=self.dtype,
                            name="fuse_proj")(seq))
        outs = [
            SS2DUnit(d_inner, d_state=self.d_state, dt_rank=dt_rank,
                     num_direction=self.num_direction,
                     scan_impl=self.scan_impl, dtype=self.dtype,
                     name=f"ssd_unit_{i}")(seq)
            for i in range(self.n_ssd_unit)
        ]
        y = sum(outs) / self.n_ssd_unit
        y = LayerNormF32(name="out_norm")(y[:, :l])
        return dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="out_proj")(y)


class SS2DCondV6(nn.Module):
    """Two-stage scan: intra-SSM over the tokens, then a cond-SSM over
    [intra | cond] (``mamba_layer.py:1632-1706``)."""

    d_model: int
    d_cond: int = 1024
    d_state: int = 16
    expand: int = 2
    num_direction: int = 2
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        b, l, _ = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        xz = dense(d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        xz = SS2DUnit(d_inner, d_state=self.d_state, dt_rank=dt_rank,
                      num_direction=self.num_direction,
                      scan_impl=self.scan_impl, dtype=self.dtype,
                      name="intra_ssm")(xz)
        cp = dense(d_inner, use_bias=False, dtype=self.dtype,
                   name="cond_proj")(cond)
        seq = jnp.concatenate(
            [xz, jnp.broadcast_to(cp, (b,) + cp.shape[1:])], axis=1)
        seq = nn.silu(dense(d_inner, use_bias=False, dtype=self.dtype,
                            name="fuse_proj")(seq))
        y = SS2DUnit(d_inner, d_state=self.d_state, dt_rank=dt_rank,
                     num_direction=self.num_direction,
                     scan_impl=self.scan_impl, dtype=self.dtype,
                     name="cond_ssm")(seq)
        y = LayerNormF32(name="out_norm")(y[:, :l])
        return dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="out_proj")(y)


class SS2DCondV9(nn.Module):
    """Dual-branch conditional scan with *soft* region-mask multiply and a
    fuse scan (``mamba_layer.py:1802-1899``). Unlike the production v10,
    branch outputs (full token range) are multiplied by the bicubic-
    downsampled mask values rather than hard token selection, and the summed
    result runs through a third scan unit before the output norm."""

    d_model: int
    d_cond: int = 1024
    d_state: int = 16
    expand: int = 2
    num_direction: int = 2
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                     # (B, L, C)
        id_emb: jax.Array,                # (B, 1, d_cond)
        audio_cond: jax.Array,            # (B, Sa, d_cond)
        exp_cond: jax.Array,              # (B, Se, d_cond)
        audio_mask: Optional[jax.Array],  # (Bm, 1, H, W) or None
        exp_mask: Optional[jax.Array],
    ) -> jax.Array:
        b, l, _ = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        id_tok = nn.silu(dense(d_inner, use_bias=False, dtype=self.dtype,
                               name="id_proj")(id_emb))
        id_tok = jnp.broadcast_to(id_tok, (b,) + id_tok.shape[1:])

        def branch(name, proj_name, unit_name, cond, mask):
            xz = dense(d_inner, use_bias=False, dtype=self.dtype,
                       name=name)(x)
            ct = nn.silu(dense(d_inner, use_bias=False, dtype=self.dtype,
                               name=proj_name)(cond))
            ct = jnp.broadcast_to(ct, (b,) + ct.shape[1:])
            seq = jnp.concatenate([xz, id_tok, ct], axis=1)
            y = SS2DUnit(d_inner, d_state=self.d_state, dt_rank=dt_rank,
                         num_direction=self.num_direction,
                         scan_impl=self.scan_impl, dtype=self.dtype,
                         name=unit_name)(seq)[:, :l]
            if mask is not None:
                y = y * downsample_ip_mask(mask, l).astype(y.dtype)
            return y

        y = (branch("in_proj1", "audio_proj", "audio_unit", audio_cond,
                    audio_mask)
             + branch("in_proj2", "exp_proj", "exp_unit", exp_cond, exp_mask))
        y = SS2DUnit(d_inner, d_state=self.d_state, dt_rank=dt_rank,
                     num_direction=self.num_direction,
                     scan_impl=self.scan_impl, dtype=self.dtype,
                     name="fuse_unit")(y)
        y = LayerNormF32(name="out_norm")(y)
        return dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="out_proj")(y)


def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch nn.InstanceNorm2d defaults (affine=False) on NHWC."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class HSSBlock(nn.Module):
    """LayerNorm -> SS2D with residual (``mamba_layer.py:2427-2448``).
    DropPath is identity at inference (rate only matters in training)."""

    hidden_dim: int
    d_state: int = 16
    num_direction: int = 4
    scan_type: str = "scan"
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # norm_layer is nn.LayerNorm (eps 1e-5) when built from MambaUPNet
        h = LayerNormF32(name="ln_1")(x)
        h = SS2DSpatial(self.hidden_dim, d_state=self.d_state,
                        num_direction=self.num_direction,
                        scan_type=self.scan_type, scan_impl=self.scan_impl,
                        dtype=self.dtype, name="self_attention")(h)
        return x + h


class LSSModule(nn.Module):
    """SSM blocks + 5x5/7x7 depthwise conv branches fused by a 1x1 conv,
    residual (``mamba_layer.py:2450-2526``)."""

    hidden_dim: int
    depth: int = 2
    d_state: int = 16
    num_direction: int = 4
    scan_type: str = "scan"
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.hidden_dim
        out_ssm = x
        for i in range(self.depth):
            out_ssm = HSSBlock(d, d_state=self.d_state,
                               num_direction=self.num_direction,
                               scan_type=self.scan_type,
                               scan_impl=self.scan_impl, dtype=self.dtype,
                               name=f"smm_blocks_{i}")(out_ssm)

        def conv_branch(k, pre, mid, post):
            h = nn.Conv(d, kernel_size=(1, 1), dtype=self.dtype, name=pre)(x)
            h = nn.silu(_instance_norm(h))
            h = nn.Conv(d, kernel_size=(k, k), padding="SAME",
                        feature_group_count=d, use_bias=False,
                        dtype=self.dtype, name=mid)(h)
            h = nn.silu(_instance_norm(h))
            h = nn.Conv(d, kernel_size=(1, 1), dtype=self.dtype, name=post)(h)
            return nn.silu(_instance_norm(h))

        out_77 = conv_branch(7, "conv1b7", "conv77", "conv1a7")
        out_55 = conv_branch(5, "conv1b5", "conv55", "conv1a5")
        h = jnp.concatenate([out_ssm, out_55, out_77], axis=-1)
        h = nn.Conv(d, kernel_size=(1, 1), dtype=self.dtype,
                    name="finalconv11")(h)
        return h + x


class PatchExpand2D(nn.Module):
    """2x spatial upsample / 2x channel reduce via a linear pixel-shuffle
    (``mamba_layer.py:57-70``; input channels = 2 * dim)."""

    dim: int  # output channels

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        assert c == 2 * self.dim
        h_e = dense(2 * c, use_bias=False, name="expand")(x)
        h_e = h_e.reshape(b, h, w, 2, 2, c // 2)
        h_e = h_e.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 2)
        return LayerNormF32(name="norm")(h_e)


class LSSLayerUp(nn.Module):
    """Decoder stage: optional PatchExpand2D then LSSModules
    (``mamba_layer.py:2528-2610``; depth%3==0 -> depth//3 modules of
    depth 3, else depth//2 modules of depth 2)."""

    dim: int
    depth: int
    d_state: int = 16
    num_direction: int = 4
    scan_type: str = "scan"
    scan_impl: str = "blocked"
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.upsample:
            x = PatchExpand2D(self.dim, name="upsample")(x)
        inner = 3 if self.depth % 3 == 0 else 2
        for i in range(self.depth // inner):
            x = LSSModule(self.dim, depth=inner, d_state=self.d_state,
                          num_direction=self.num_direction,
                          scan_type=self.scan_type, scan_impl=self.scan_impl,
                          dtype=self.dtype, name=f"blocks_{i}")(x)
        return x


class MambaUPNet(nn.Module):
    """VM-UNet-style 4-stage decoder (``mamba_layer.py:2612-2666``): NHWC
    input at the deepest resolution; returns the upsampled stage outputs,
    shallowest first (the reference returns NCHW; we keep NHWC)."""

    dims_decoder: Sequence[int] = (512, 256, 128, 64)
    depths_decoder: Sequence[int] = (3, 4, 6, 3)
    d_state: int = 16
    num_direction: int = 4
    scan_type: str = "scan"
    scan_impl: str = "blocked"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list:
        outs = []
        for i, (dim, depth) in enumerate(
                zip(self.dims_decoder, self.depths_decoder)):
            x = LSSLayerUp(dim, depth, d_state=self.d_state,
                           num_direction=self.num_direction,
                           scan_type=self.scan_type, scan_impl=self.scan_impl,
                           upsample=i != 0, dtype=self.dtype,
                           name=f"layers_up_{i}")(x)
            if i != 0:
                outs.insert(0, x)
        return outs
