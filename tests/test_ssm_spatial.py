"""Oracle tests for the non-production SSM lineage (SURVEY §2.4 / VERDICT
round-1 item #8): spatial SS2D (K-directional H x W scan), SS2D_cond_v5/v6/v9
and the MambaUPNet decoder stack.

The spatial-SS2D oracle re-implements the reference forward chain
(``/root/reference/src/models/base/mamba_layer.py:186-420``) in plain numpy —
materialized transpose/rot90 copies, HSCANS encode/decode gathers and a
sequential fp64 recurrence — and must agree with the flax module, which
realizes each direction as one composite permutation table instead.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actalker_tpu.models.ssm_spatial import (
    MambaUPNet, SS2DCondV5, SS2DCondV6, SS2DCondV9, SS2DSpatial,
    direction_perms,
)
from actalker_tpu.ops.scan_orders import inverse_table, order_table
from tests.test_selective_scan import numpy_oracle

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


def _np_silu(x):
    return x / (1 + np.exp(-x))


def _np_layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _np_depthwise_conv(x_nhwc, kernel, bias):
    """flax depthwise conv (kernel (kh, kw, 1, d), SAME padding)."""
    kh, kw, _, d = kernel.shape
    b, h, w, _ = x_nhwc.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x_nhwc, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros_like(x_nhwc)
    for i in range(kh):
        for j in range(kw):
            out += xp[:, i:i + h, j:j + w, :] * kernel[i, j, 0]
    return out + bias


def _reference_ss2d_core(tokens_bchw, params, k_total, scan_type):
    """Reference ``forward_core`` (mamba_layer.py:299-351) in numpy:
    materialize the transformed copies, encode with the order table, run the
    fp64 sequential scan per direction, decode and un-transform, sum."""
    b, d, h, w = tokens_bchw.shape
    l = h * w
    p = order_table(scan_type, h, w)
    pinv = inverse_table(p)
    n = params["A_logs"].shape[1]
    rank = params["x_proj_weight"].shape[1] - 2 * n

    copies = [tokens_bchw.reshape(b, d, l)]
    if k_total >= 4:
        copies.append(np.swapaxes(tokens_bchw, 2, 3).reshape(b, d, l))
    if k_total >= 8:
        r = np.rot90(tokens_bchw, 1, axes=(2, 3))
        copies.append(r.reshape(b, d, l))
        copies.append(np.swapaxes(r, 2, 3).reshape(b, d, l))
    xs = [c[:, :, p] for c in copies]                       # encode
    xs = xs + [x[:, :, ::-1] for x in xs]                   # flipped dirs

    y = np.zeros((b, d, l))
    for k in range(k_total):
        seq = xs[k]                                         # (b, d, l)
        xw = params["x_proj_weight"][k]                     # (rank+2n, d)
        x_dbl = np.einsum("bdl,cd->bcl", seq, xw)
        dts = np.einsum("brl,dr->bdl", x_dbl[:, :rank],
                        params["dt_projs_weight"][k])
        Bs = np.moveaxis(x_dbl[:, rank:rank + n], 1, 2)[:, :, None]
        Cs = np.moveaxis(x_dbl[:, rank + n:], 1, 2)[:, :, None]
        A = -np.exp(params["A_logs"][k * d:(k + 1) * d])
        yk = numpy_oracle(
            np.moveaxis(seq, 1, 2), np.moveaxis(dts, 1, 2), A, Bs, Cs,
            D=params["Ds"][k * d:(k + 1) * d],
            delta_bias=params["dt_projs_bias"][k],
        )                                                   # (b, l, d)
        yk = np.moveaxis(yk, 1, 2)
        base = k % (k_total // 2)
        if k >= k_total // 2:
            yk = yk[:, :, ::-1]                             # un-flip
        yk = yk[:, :, pinv]                                 # decode
        if base == 0:
            y += yk
        elif base == 1:
            y += np.swapaxes(yk.reshape(b, d, w, h), 2, 3).reshape(b, d, l)
        elif base == 2:
            y += np.rot90(yk.reshape(b, d, w, h), 3,
                          axes=(2, 3)).reshape(b, d, l)
        else:
            y += np.rot90(np.swapaxes(yk.reshape(b, d, h, w), 2, 3), 3,
                          axes=(2, 3)).reshape(b, d, l)
    return y                                                # (b, d, l)


@pytest.mark.parametrize("k_total,scan_type", [(2, "scan"), (4, "scan"),
                                               (8, "sweep"), (4, "zigzag")])
def test_ss2d_spatial_matches_reference_chain(k_total, scan_type):
    rng = np.random.default_rng(0)
    b, h, w, dm = 2, 4, 4, 8
    mod = SS2DSpatial(dm, d_state=4, num_direction=k_total,
                      scan_type=scan_type, scan_impl="blocked")
    x = rng.standard_normal((b, h, w, dm)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, variables["params"])
    d_inner = 2 * dm
    xz = x @ p["in_proj"]["kernel"]
    xs_part, z = xz[..., :d_inner], xz[..., d_inner:]
    conv = _np_depthwise_conv(xs_part, p["conv2d"]["kernel"],
                              p["conv2d"]["bias"])
    conv = _np_silu(conv)
    tokens = np.moveaxis(conv.reshape(b, h * w, d_inner), 1, 2)
    tokens = tokens.reshape(b, d_inner, h, w)
    y = _reference_ss2d_core(tokens, p["scans"], k_total, scan_type)
    y = np.moveaxis(y, 1, 2).reshape(b, h, w, d_inner)
    y = _np_layernorm(y, p["out_norm"]["scale"], p["out_norm"]["bias"])
    y = y * _np_silu(z)
    want = y @ p["out_proj"]["kernel"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_direction_perms_roundtrip():
    for k in (2, 4, 8):
        for perm in direction_perms(6, 6, k, "scan"):
            assert np.array_equal(np.sort(perm), np.arange(36))
            inv = inverse_table(perm)
            assert np.array_equal(perm[inv], np.arange(36))


def _unit_oracle(seq, unit_params, num_direction=2):
    """Reference SS2D_Unit (mamba_layer.py:1505-1548) with 'sweep' order:
    forward + flipped sequential scans, summed."""
    b, l, d = seq.shape
    n = unit_params["A_logs"].shape[1]
    rank = unit_params["x_proj_weight"].shape[1] - 2 * n
    y = np.zeros_like(seq)
    for k in range(num_direction):
        s = seq[:, ::-1] if k % 2 else seq
        x_dbl = np.einsum("bld,cd->blc", s, unit_params["x_proj_weight"][k])
        dts = x_dbl[..., :rank] @ unit_params["dt_projs_weight"][k].T
        A = -np.exp(unit_params["A_logs"][k * d:(k + 1) * d])
        yk = numpy_oracle(
            s, dts, A, x_dbl[..., rank:rank + n][:, :, None],
            x_dbl[..., rank + n:][:, :, None],
            D=unit_params["Ds"][k * d:(k + 1) * d],
            delta_bias=unit_params["dt_projs_bias"][k],
        )
        y += yk[:, ::-1] if k % 2 else yk
    return y


def test_ss2d_cond_v5_matches_oracle():
    rng = np.random.default_rng(2)
    b, l, dm, dc, s = 2, 10, 8, 16, 3
    mod = SS2DCondV5(dm, d_cond=dc, n_ssd_unit=2, d_state=4, scan_impl="blocked")
    x = rng.standard_normal((b, l, dm)).astype(np.float32)
    cond = rng.standard_normal((b, s, dc)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(3), jnp.asarray(x),
                         jnp.asarray(cond))
    got = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(cond)))

    p = jax.tree.map(np.asarray, variables["params"])
    xz = x @ p["in_proj"]["kernel"]
    cp = cond @ p["cond_proj"]["kernel"]
    seq = np.concatenate([xz, cp], axis=1)
    seq = _np_silu(seq @ p["fuse_proj"]["kernel"])
    rst = (_unit_oracle(seq, p["ssd_unit_0"])
           + _unit_oracle(seq, p["ssd_unit_1"])) / 2
    y = _np_layernorm(rst[:, :l], p["out_norm"]["scale"],
                      p["out_norm"]["bias"])
    want = y @ p["out_proj"]["kernel"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_ss2d_cond_v6_matches_oracle():
    rng = np.random.default_rng(4)
    b, l, dm, dc, s = 2, 9, 8, 16, 2
    mod = SS2DCondV6(dm, d_cond=dc, d_state=4, scan_impl="blocked")
    x = rng.standard_normal((b, l, dm)).astype(np.float32)
    cond = rng.standard_normal((b, s, dc)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(5), jnp.asarray(x),
                         jnp.asarray(cond))
    got = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(cond)))

    p = jax.tree.map(np.asarray, variables["params"])
    xz = _unit_oracle(x @ p["in_proj"]["kernel"], p["intra_ssm"])
    cp = cond @ p["cond_proj"]["kernel"]
    seq = np.concatenate([xz, cp], axis=1)
    seq = _np_silu(seq @ p["fuse_proj"]["kernel"])
    y = _unit_oracle(seq, p["cond_ssm"])[:, :l]
    y = _np_layernorm(y, p["out_norm"]["scale"], p["out_norm"]["bias"])
    want = y @ p["out_proj"]["kernel"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_ss2d_cond_v9_matches_oracle():
    rng = np.random.default_rng(6)
    b, l, dm, dc = 1, 16, 8, 16
    mod = SS2DCondV9(dm, d_cond=dc, d_state=4, scan_impl="blocked")
    x = rng.standard_normal((b, l, dm)).astype(np.float32)
    id_emb = rng.standard_normal((b, 1, dc)).astype(np.float32)
    a_cond = rng.standard_normal((b, 3, dc)).astype(np.float32)
    e_cond = rng.standard_normal((b, 1, dc)).astype(np.float32)
    a_mask = np.zeros((1, 1, 8, 8), np.float32)
    a_mask[:, :, :4] = 1.0
    e_mask = 1.0 - a_mask
    args = (jnp.asarray(x), jnp.asarray(id_emb), jnp.asarray(a_cond),
            jnp.asarray(e_cond), jnp.asarray(a_mask), jnp.asarray(e_mask))
    variables = mod.init(jax.random.PRNGKey(7), *args)
    got = np.asarray(mod.apply(variables, *args))

    from actalker_tpu.models.attention_blocks import downsample_ip_mask

    p = jax.tree.map(np.asarray, variables["params"])
    id_tok = _np_silu(id_emb @ p["id_proj"]["kernel"])

    def branch(in_name, proj_name, unit_name, cond, mask):
        xz = x @ p[in_name]["kernel"]
        ct = _np_silu(cond @ p[proj_name]["kernel"])
        seq = np.concatenate([xz, id_tok, ct], axis=1)
        y = _unit_oracle(seq, p[unit_name])[:, :l]
        dm_mask = np.asarray(downsample_ip_mask(jnp.asarray(mask), l))
        return y * dm_mask

    y = (branch("in_proj1", "audio_proj", "audio_unit", a_cond, a_mask)
         + branch("in_proj2", "exp_proj", "exp_unit", e_cond, e_mask))
    y = _unit_oracle(y, p["fuse_unit"])
    y = _np_layernorm(y, p["out_norm"]["scale"], p["out_norm"]["bias"])
    want = y @ p["out_proj"]["kernel"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_mamba_upnet_shapes():
    """Decoder stack wiring: 4 stages, 2x upsample + channel halving per
    stage (reference __main__ usage: 512ch @ 8x8 -> [256@16, 128@32, 64@64]),
    shallowest-first output order."""
    mod = MambaUPNet(dims_decoder=(32, 16, 8), depths_decoder=(2, 2, 2),
                     d_state=4, num_direction=4, scan_impl="blocked")
    x = jnp.asarray(np.random.default_rng(8)
                    .standard_normal((1, 4, 4, 32)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(9), x)
    outs = mod.apply(variables, x)
    assert [o.shape for o in outs] == [(1, 16, 16, 8), (1, 8, 8, 16)]
