"""Model-layer tests: shapes, invariants, and torch-oracle numerics for the
standard pieces (GroupNorm/attention/GEGLU)."""
import numpy as np
import jax
import jax.numpy as jnp
import dataclasses
import pytest

from actalker_tpu.models.attention_blocks import (
    Attention,
    BasicTransformerBlock,
    FeedForward,
    TemporalBasicTransformerBlock,
    downsample_ip_mask,
)
from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.embeddings import AlphaBlender, sinusoidal_embedding
from actalker_tpu.models.pose_guider import PoseGuider
from actalker_tpu.models.projections import AudioProjModel, IDProjModel, VasaProjModel
from actalker_tpu.models.resnet import ResnetBlock2D, SpatioTemporalResBlock
from actalker_tpu.models.ssm import SS2DCondV10, SS2DUnit
from actalker_tpu.models.transformer_st import TransformerSpatioTemporal
from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


KEY = jax.random.PRNGKey(0)


def make_cond(bf=4, d_cond=32, hw=16):
    return Conditioning(
        id_tokens=jax.random.normal(jax.random.PRNGKey(1), (bf, 1, d_cond)),
        audio_tokens=jax.random.normal(jax.random.PRNGKey(2), (bf, 8, d_cond)),
        vasa_tokens=jax.random.normal(jax.random.PRNGKey(3), (bf, 1, d_cond)),
        audio_mask=jnp.ones((1, 1, hw, hw)),
        exp_mask=jnp.ones((1, 1, hw, hw)),
        ip_scales=(1.25, 1.25),
    )


def test_sinusoidal_matches_torch_formula():
    """Oracle: diffusers get_timestep_embedding semantics recomputed in numpy."""
    t = np.array([0.0, 1.0, 7.5, 999.0])
    dim = 16
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    arg = t[:, None] * freqs[None]
    want = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)  # flip_sin_to_cos
    got = sinusoidal_embedding(jnp.asarray(t), dim)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_sdpa():
    torch = pytest.importorskip("torch")
    b, s, heads, hd = 2, 10, 4, 8
    c = heads * hd
    x = np.random.default_rng(0).standard_normal((b, s, c)).astype(np.float32)
    attn = Attention(heads=heads, head_dim=hd)
    params = attn.init(KEY, jnp.asarray(x))
    y = attn.apply(params, jnp.asarray(x))
    # torch oracle with the same weights
    p = params["params"]
    xt = torch.tensor(x)
    q = xt @ torch.tensor(np.asarray(p["to_q"]["kernel"]))
    k = xt @ torch.tensor(np.asarray(p["to_k"]["kernel"]))
    v = xt @ torch.tensor(np.asarray(p["to_v"]["kernel"]))
    q = q.view(b, s, heads, hd).transpose(1, 2)
    k = k.view(b, s, heads, hd).transpose(1, 2)
    v = v.view(b, s, heads, hd).transpose(1, 2)
    o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, s, c)
    o = o @ torch.tensor(np.asarray(p["to_out"]["kernel"])) + torch.tensor(
        np.asarray(p["to_out"]["bias"])
    )
    np.testing.assert_allclose(np.asarray(y), o.numpy(), rtol=2e-4, atol=2e-4)


def test_ip_adapter_zero_scale_equals_base():
    b, s, c = 2, 9, 16
    x = jax.random.normal(KEY, (b, s, c))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (b, 1, 24))
    ip = [jax.random.normal(jax.random.PRNGKey(6), (b, 4, 24)),
          jax.random.normal(jax.random.PRNGKey(7), (b, 1, 24))]
    attn = Attention(heads=2, head_dim=8, context_dim=24, num_adapters=2)
    params = attn.init(KEY, x, context=ctx, ip_contexts=ip)
    y0 = attn.apply(params, x, context=ctx, ip_contexts=ip, ip_scales=(0.0, 0.0))
    base = Attention(heads=2, head_dim=8, context_dim=24)
    keep = [k for k in ("to_q", "to_k", "to_v", "to_out")
            if k in params["params"]]
    bp = {"params": {k: params["params"][k] for k in keep}}
    y1 = base.apply(bp, x, context=ctx)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-5)


def test_singleton_context_shortcut_is_exact():
    """Attention over a length-1 context equals full attention over that
    context duplicated twice (softmax over identical keys is uniform), so
    the broadcast shortcut is exact."""
    b, s, c = 2, 9, 16
    x = jax.random.normal(KEY, (b, s, c))
    ctx1 = jax.random.normal(jax.random.PRNGKey(5), (b, 1, 24))
    ctx2 = jnp.concatenate([ctx1, ctx1], axis=1)  # len 2 -> full attention
    attn = Attention(heads=2, head_dim=8, context_dim=24)
    params = attn.init(KEY, x, context=ctx2)  # creates to_q/to_k too
    y_full = attn.apply(params, x, context=ctx2)
    y_single = attn.apply(params, x, context=ctx1)  # broadcast shortcut
    np.testing.assert_allclose(np.asarray(y_single), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


def test_shared_context_folding_is_exact():
    """Folded shared-context attention == repeated-context attention."""
    b, s, c = 6, 5, 16
    x = jax.random.normal(KEY, (b, s, c))
    ctx_small = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 16))  # b=2 groups of 3
    attn = Attention(heads=2, head_dim=8, context_dim=16)
    params = attn.init(KEY, x, context=jnp.repeat(ctx_small, 3, axis=0))
    y_rep = attn.apply(params, x, context=jnp.repeat(ctx_small, 3, axis=0))
    y_fold = attn.apply(params, x, context=ctx_small)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_rep), rtol=1e-4, atol=1e-5)


def test_geglu_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).standard_normal((3, 7, 12)).astype(np.float32)
    ff = FeedForward()
    params = ff.init(KEY, jnp.asarray(x))
    y = ff.apply(params, jnp.asarray(x))
    p = params["params"]
    xt = torch.tensor(x)
    h = xt @ torch.tensor(np.asarray(p["proj_in"]["kernel"])) + torch.tensor(
        np.asarray(p["proj_in"]["bias"]))
    a, gate = h.chunk(2, dim=-1)
    h = a * torch.nn.functional.gelu(gate)
    o = h @ torch.tensor(np.asarray(p["proj_out"]["kernel"])) + torch.tensor(
        np.asarray(p["proj_out"]["bias"]))
    np.testing.assert_allclose(np.asarray(y), o.numpy(), rtol=2e-4, atol=2e-4)


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    from actalker_tpu.models.common import GroupNorm32

    x = np.random.default_rng(2).standard_normal((2, 6, 6, 32)).astype(np.float32)
    gn = GroupNorm32(num_groups=8, epsilon=1e-5)
    params = gn.init(KEY, jnp.asarray(x))
    y = gn.apply(params, jnp.asarray(x))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    o = torch.nn.functional.group_norm(xt, 8, eps=1e-5).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), o.numpy(), rtol=1e-4, atol=1e-4)


def test_norm_bf16_affine_error_bounded():
    """The norms apply the affine in the activation dtype (perf: avoids an
    f32 promotion of the whole map, models/common.py). When |mean| >> std the
    bf16 rounding of x*a is relative to mean/std rather than to the
    normalized output; bound that error on a pathological input so the
    tradeoff stays quantified (ADVICE round 1, models/common.py:82)."""
    from actalker_tpu.models.common import GroupNorm32, LayerNormF32

    rng = np.random.default_rng(3)
    # mean/std = 100: worst realistic conditioning for activations
    x = (100.0 + rng.standard_normal((2, 8, 8, 64))).astype(np.float32)
    for m in (GroupNorm32(num_groups=8), LayerNormF32()):
        params = m.init(KEY, jnp.asarray(x))
        want = np.asarray(m.apply(params, jnp.asarray(x)))
        got = np.asarray(
            m.apply(params, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
        # input quantization alone contributes ~(mean/std)*2^-8 ~= 0.4;
        # the affine-in-bf16 shortcut must stay within the same order.
        err = np.abs(got - want)
        assert err.max() < 1.5, (type(m).__name__, err.max())
        assert np.sqrt((err ** 2).mean()) < 0.5, (type(m).__name__,)


def test_norm_matmul_stats_match_reduce():
    """The MXU-routed (ones-einsum) statistics lowering must match the VPU
    reduce lowering within bf16 activation noise, in both norms and both
    dtypes (`set_norm_stats_impl`, models/common.py)."""
    from actalker_tpu.models import common as common_mod
    from actalker_tpu.models.common import (
        GroupNorm32, LayerNormF32, set_norm_stats_impl)

    prev_impl = common_mod._NORM_STATS_IMPL
    rng = np.random.default_rng(5)
    x32 = (0.3 + rng.standard_normal((3, 8, 8, 64))).astype(np.float32)
    try:
        for m in (GroupNorm32(num_groups=8), LayerNormF32()):
            params = m.init(KEY, jnp.asarray(x32))
            for dt, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.05)):
                xin = jnp.asarray(x32, dt)
                set_norm_stats_impl("reduce")
                want = np.asarray(m.apply(params, xin), np.float32)
                set_norm_stats_impl("matmul")
                got = np.asarray(m.apply(params, xin), np.float32)
                np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    finally:
        set_norm_stats_impl(prev_impl)


def test_resnet_block_shapes():
    x = jax.random.normal(KEY, (4, 8, 8, 16))
    temb = jax.random.normal(KEY, (4, 24))
    blk = ResnetBlock2D(out_channels=32)
    params = blk.init(KEY, x, temb)
    y = blk.apply(params, x, temb)
    assert y.shape == (4, 8, 8, 32)


def test_spatiotemporal_resblock():
    x = jax.random.normal(KEY, (2, 3, 8, 8, 16))
    temb = jax.random.normal(KEY, (6, 24))
    ind = jnp.zeros((2, 3))
    blk = SpatioTemporalResBlock(out_channels=16)
    params = blk.init(KEY, x, temb, ind)
    y = blk.apply(params, x, temb, ind)
    assert y.shape == x.shape
    # image_only_indicator = 1 selects the spatial branch only
    y_img = blk.apply(params, x, temb, jnp.ones((2, 3)))
    assert not np.allclose(np.asarray(y), np.asarray(y_img))


def test_ssm_unit_masked_dense_equals_gather():
    """The masked-dense scan must equal physically removing masked tokens."""
    b, l, d = 2, 12, 8
    x = jax.random.normal(KEY, (b, l, d))
    unit = SS2DUnit(d_inner=d, d_state=4, dt_rank=2, scan_impl="blocked")
    params = unit.init(KEY, x)
    keep = jnp.array([True, False] * (l // 2))
    mask = jnp.tile(keep[None], (b, 1))
    y_dense = unit.apply(params, x, transparent_mask=mask)
    x_gathered = x[:, keep]
    y_gather = unit.apply(params, x_gathered)
    np.testing.assert_allclose(
        np.asarray(y_dense[:, keep]), np.asarray(y_gather), rtol=1e-4, atol=1e-4
    )


def test_ss2d_cond_v10_shapes_and_zero_mask():
    b, l, c, dc = 2, 16, 8, 12
    x = jax.random.normal(KEY, (b, l, c))
    id_emb = jax.random.normal(KEY, (b, 1, dc))
    audio = jax.random.normal(KEY, (b, 4, dc))
    exp = jax.random.normal(KEY, (b, 1, dc))
    blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4, scan_impl="blocked")
    ones = jnp.ones((1, 1, 8, 8))
    params = blk.init(KEY, x, id_emb, audio, exp, ones, ones)
    y = blk.apply(params, x, id_emb, audio, exp, ones, ones)
    assert y.shape == (b, l, c)
    # zero masks: both branches pass in_proj(x) through -> output is
    # out_proj(norm(in_proj1(x) + in_proj2(x))), independent of conds
    zeros = jnp.zeros((1, 1, 8, 8))
    y0a = blk.apply(params, x, id_emb, audio, exp, zeros, zeros)
    y0b = blk.apply(params, x, id_emb, audio * 5.0, exp * -3.0, zeros, zeros)
    np.testing.assert_allclose(np.asarray(y0a), np.asarray(y0b), rtol=1e-5, atol=1e-5)


def test_transformer_st_runs():
    b, f, hh, ww, c = 1, 3, 8, 8, 16
    x = jax.random.normal(KEY, (b, f, hh, ww, c))
    cond = make_cond(bf=b * f, d_cond=32, hw=hh)
    tr = TransformerSpatioTemporal(heads=2, head_dim=8, context_dim=32,
                                   use_mamba=True, scan_impl="blocked")
    ind = jnp.zeros((b, f))
    params = tr.init(KEY, x, cond, ind)
    y = tr.apply(params, x, cond, ind)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_projections():
    audio = jax.random.normal(KEY, (1, 2, 10, 5, 384))
    m = AudioProjModel()
    p = m.init(KEY, audio)
    out = m.apply(p, audio)
    assert out.shape == (1, 2, 32, 1024)

    idp = IDProjModel()
    p = idp.init(KEY, jnp.ones((2, 512)))
    assert idp.apply(p, jnp.ones((2, 512))).shape == (2, 1024)

    vp = VasaProjModel(output_dim=1018)
    p = vp.init(KEY, jnp.ones((2, 512)))
    assert vp.apply(p, jnp.ones((2, 512))).shape == (2, 1018)


def test_pose_guider_zero_init():
    x = jax.random.normal(KEY, (1, 2, 32, 32, 3))
    pg = PoseGuider(embedding_channels=20)
    params = pg.init(KEY, x)
    y = pg.apply(params, x)
    assert y.shape == (1, 2, 4, 4, 20)
    np.testing.assert_allclose(np.asarray(y), 0.0)  # zero-init final conv


def test_tiny_unet_end_to_end():
    cfg = UNetConfig(scan_impl="blocked").micro()
    unet = UNetSpatioTemporalCondition(cfg)
    b, f, hh, ww = 1, 2, 16, 16
    sample = jax.random.normal(KEY, (b, f, hh, ww, 8))
    cond = make_cond(bf=b * f, d_cond=1024, hw=hh)
    tids = jnp.array([[6.0, 127.0, 127.0]])
    params = unet.init(KEY, sample, 0.5, cond, tids)
    y = unet.apply(params, sample, 0.5, cond, tids)
    assert y.shape == (b, f, hh, ww, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_mask_downsample_box():
    m = np.zeros((1, 1, 16, 16), np.float32)
    m[:, :, 4:12, 4:12] = 1.0
    out = downsample_ip_mask(jnp.asarray(m), 64)  # 8x8 grid
    out = np.asarray(out).reshape(8, 8)
    assert out[4, 4] > 0.9   # box interior survives
    assert out[0, 0] < 0.1   # outside stays off


def test_torch_bicubic_resize_matches_torch():
    """ops/resize.py must match F.interpolate(mode='bicubic') bit-for-bit —
    jax.image's cubic (a=-0.5) shifts IP-mask values and v10 token selection."""
    torch = pytest.importorskip("torch")
    from actalker_tpu.ops.resize import torch_bicubic_resize

    rng = np.random.default_rng(7)
    for (h, w, oh, ow) in [(64, 64, 16, 16), (64, 48, 23, 11), (9, 7, 31, 17)]:
        x = rng.standard_normal((2, h, w)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x)[None], size=(oh, ow), mode="bicubic"
        )[0].numpy()
        got = np.asarray(torch_bicubic_resize(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_with_antialiasing_matches_torch():
    """Gaussian-prefilter + align_corners bicubic must match the reference
    pipeline's `_resize_with_antialiasing` (gaussian blur with reflect pad,
    then F.interpolate(align_corners=True)) — exercised at the CLIP-size 224
    downscale of the SVD lineage."""
    torch = pytest.importorskip("torch")
    from actalker_tpu.ops.resize import resize_with_antialiasing

    rng = np.random.default_rng(3)
    for (h, w, oh, ow) in [(512, 512, 224, 224), (320, 448, 224, 224),
                           (96, 96, 224, 224)]:
        x = rng.standard_normal((1, 3, h, w)).astype(np.float32)
        # oracle: same semantics via torch library calls
        sig = (max((h / oh - 1) / 2, 0.001), max((w / ow - 1) / 2, 0.001))
        ks = [int(max(4 * sig[0], 3)), int(max(4 * sig[1], 3))]
        for i in range(2):
            if ks[i] % 2 == 0:
                ks[i] += 1

        def g1d(n, s):
            t = torch.arange(n, dtype=torch.float64) - n // 2
            if n % 2 == 0:
                t = t + 0.5
            g = torch.exp(-t**2 / (2 * s * s))
            return (g / g.sum()).float()

        xt = torch.from_numpy(x)
        pw = (ks[1] - 1) // 2
        xt = torch.nn.functional.pad(
            xt, (pw, ks[1] - 1 - pw, 0, 0), mode="reflect")
        xt = torch.nn.functional.conv2d(
            xt, g1d(ks[1], sig[1]).view(1, 1, 1, -1).expand(3, 1, 1, ks[1]),
            groups=3)
        ph = (ks[0] - 1) // 2
        xt = torch.nn.functional.pad(
            xt, (0, 0, ph, ks[0] - 1 - ph), mode="reflect")
        xt = torch.nn.functional.conv2d(
            xt, g1d(ks[0], sig[0]).view(1, 1, -1, 1).expand(3, 1, ks[0], 1),
            groups=3)
        want = torch.nn.functional.interpolate(
            xt, size=(oh, ow), mode="bicubic", align_corners=True).numpy()
        got = np.asarray(resize_with_antialiasing(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ssm_unit_pallas_path_matches_blocked():
    """The arranged pallas fast path must equal the legacy blocked path."""
    b, l, d = 2, 20, 8
    x = jax.random.normal(KEY, (b, l, d))
    unit_b = SS2DUnit(d_inner=d, d_state=4, dt_rank=2, scan_impl="blocked")
    params = unit_b.init(KEY, x)
    unit_p = SS2DUnit(d_inner=d, d_state=4, dt_rank=2, scan_impl="pallas")
    y_b = unit_b.apply(params, x)
    y_p = unit_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_b), rtol=2e-4,
                               atol=2e-4)
    # with a transparent mask
    keep = jnp.tile(jnp.array([True, True, False, True] * 5)[None], (b, 1))
    y_b = unit_b.apply(params, x, transparent_mask=keep)
    y_p = unit_p.apply(params, x, transparent_mask=keep)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_b), rtol=2e-4,
                               atol=2e-4)


def test_ss2d_cond_v10_pallas_fast_path_matches_blocked():
    b, l, c, dc = 2, 20, 64, 12  # d_inner = 128 -> fast path eligible
    x = jax.random.normal(KEY, (b, l, c))
    id_emb = jax.random.normal(KEY, (b, 1, dc))
    audio = jax.random.normal(KEY, (b, 4, dc))
    exp = jax.random.normal(KEY, (b, 1, dc))
    mask = np.zeros((1, 1, 8, 8), np.float32)
    mask[:, :, 2:7, 2:7] = 1.0
    mask = jnp.asarray(mask)
    blk_b = SS2DCondV10(d_model=c, d_cond=dc, d_state=4, scan_impl="blocked")
    params = blk_b.init(KEY, x, id_emb, audio, exp, mask, mask)
    blk_p = SS2DCondV10(d_model=c, d_cond=dc, d_state=4, scan_impl="pallas")
    y_b = blk_b.apply(params, x, id_emb, audio, exp, mask, mask)
    y_p = blk_p.apply(params, x, id_emb, audio, exp, mask, mask)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_b), rtol=3e-4,
                               atol=3e-4)


@pytest.mark.parametrize("fracs", [
    (0.6, 0.6),    # both branches gathered with slack capacity
    (0.0, 0.6),    # zeroed-out audio branch (mode-1 shape): tail-only scan
    (1.0, 0.5),    # mixed: one dense-capacity, one gathered
])
def test_ss2d_cond_v10_gather_path_matches_dense(fracs):
    """The static-capacity gather/scatter path must reproduce the
    masked-dense scan exactly (same active tokens, same order — the
    reference's masked_select semantics, mamba_layer.py:1955-1985)."""
    b, l, c, dc = 2, 64, 64, 12  # d_inner = 128 -> grouped path
    x = jax.random.normal(KEY, (b, l, c))
    id_emb = jax.random.normal(KEY, (b, 1, dc))
    audio = jax.random.normal(KEY, (b, 4, dc))
    exp = jax.random.normal(KEY, (b, 1, dc))
    amask = np.zeros((1, 1, 8, 8), np.float32)
    amask[:, :, 5:8, 1:7] = 1.0            # "mouth": lower rows
    emask = np.zeros((1, 1, 8, 8), np.float32)
    emask[:, :, 1:5, 1:7] = 1.0            # "exp": upper face
    if fracs[0] == 0.0:
        amask[:] = 0.0
    amask, emask = jnp.asarray(amask), jnp.asarray(emask)
    dense_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                            scan_impl="pallas")
    params = dense_blk.init(KEY, x, id_emb, audio, exp, amask, emask)
    y_dense = dense_blk.apply(params, x, id_emb, audio, exp, amask, emask)
    gather_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                             scan_impl="pallas", capacity_frac=fracs)
    y_gather = gather_blk.apply(params, x, id_emb, audio, exp, amask, emask)
    np.testing.assert_allclose(np.asarray(y_gather), np.asarray(y_dense),
                               rtol=3e-4, atol=3e-4)


def test_ss2d_gather_path_gradients_match_dense():
    """Gradients through the gather/scatter formulation (XLA gather + the
    scan's custom_vjp) must match the masked-dense path so trainers can use
    static capacities too."""
    b, l, c, dc = 1, 32, 64, 12
    x = jax.random.normal(KEY, (b, l, c))
    id_emb = jax.random.normal(KEY, (b, 1, dc))
    audio = jax.random.normal(KEY, (b, 4, dc))
    exp = jax.random.normal(KEY, (b, 1, dc))
    amask = np.zeros((1, 1, 8, 8), np.float32)
    amask[:, :, 4:8, :] = 1.0
    emask = np.zeros((1, 1, 8, 8), np.float32)
    emask[:, :, 0:4, :] = 1.0
    amask, emask = jnp.asarray(amask), jnp.asarray(emask)
    dense_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                            scan_impl="pallas")
    params = dense_blk.init(KEY, x, id_emb, audio, exp, amask, emask)
    gather_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                             scan_impl="pallas", capacity_frac=(0.6, 0.6))

    def loss(blk):
        def f(p, xx):
            y = blk.apply(p, xx, id_emb, audio, exp, amask, emask)
            return jnp.sum(y * y)
        return f

    g_dense = jax.grad(loss(dense_blk), argnums=(0, 1))(params, x)
    g_gather = jax.grad(loss(gather_blk), argnums=(0, 1))(params, x)
    flat_d = jax.tree.leaves(g_dense)
    flat_g = jax.tree.leaves(g_gather)
    for a, bb in zip(flat_d, flat_g):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_ss2d_gather_capacity_overflow_guard():
    """Capacity-contract runtime guard (VERDICT r2 weak #4): a violated
    static capacity NaN-poisons the output by default (loud failure);
    ``capacity_overflow='drop'`` keeps the legacy drop semantics (overflow
    tokens fall back to in_proj passthrough, shape/finiteness preserved).
    A capacity that holds (even with a tight production-size box mask)
    stays finite and matches the masked-dense block exactly."""
    b, l, c, dc = 1, 64, 64, 12
    x = jax.random.normal(KEY, (b, l, c))
    id_emb = jax.random.normal(KEY, (b, 1, dc))
    audio = jax.random.normal(KEY, (b, 4, dc))
    exp = jax.random.normal(KEY, (b, 1, dc))
    ones = jnp.ones((1, 1, 8, 8))
    dense_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                            scan_impl="pallas")
    params = dense_blk.init(KEY, x, id_emb, audio, exp, ones, ones)
    # all 64 tokens active but capacity 8: poisoned by default...
    gather_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                             scan_impl="pallas", capacity_frac=(0.125, 0.125))
    y = gather_blk.apply(params, x, id_emb, audio, exp, ones, ones)
    assert y.shape == (b, l, c)
    assert np.isnan(np.asarray(y)).all()
    # ...and jit-compatible (the guard is in-graph, not host-side)
    yj = jax.jit(lambda p: gather_blk.apply(p, x, id_emb, audio, exp,
                                            ones, ones))(params)
    assert np.isnan(np.asarray(yj)).all()
    # legacy drop mode: still runs, finite output
    drop_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                           scan_impl="pallas", capacity_frac=(0.125, 0.125),
                           capacity_overflow="drop")
    yd = drop_blk.apply(params, x, id_emb, audio, exp, ones, ones)
    assert np.isfinite(np.asarray(yd)).all()

    # production-size mask at a capacity that holds: finite and exact vs
    # the masked-dense path (overflow guard must not perturb valid runs)
    h = int(np.sqrt(l)) * 8
    box = np.zeros((1, 1, h, h), np.float32)
    box[:, :, : h // 2, : h // 2] = 1.0  # ~1/4 of tokens active
    box = jnp.asarray(box)
    ok_blk = SS2DCondV10(d_model=c, d_cond=dc, d_state=4,
                         scan_impl="pallas", capacity_frac=(0.5, 0.5))
    y_ok = ok_blk.apply(params, x, id_emb, audio, exp, box, box)
    y_dense = dense_blk.apply(params, x, id_emb, audio, exp, box, box)
    assert np.isfinite(np.asarray(y_ok)).all()
    np.testing.assert_allclose(np.asarray(y_ok), np.asarray(y_dense),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ablate", [
    ("audio",), ("vasa",), ("id",), ("ssd",), ("cross_attn",),
    ("audio", "id"),
])
def test_unet_ablation_variants(ablate):
    """Config-driven counterparts of the reference's _wo_* UNet/transformer
    file copies (SURVEY.md section 2): each variant must build and run, and
    its parameter tree must actually drop the ablated component."""
    cfg = dataclasses.replace(UNetConfig(scan_impl="blocked").micro(),
                              ablate=ablate)
    unet = UNetSpatioTemporalCondition(cfg)
    b, f, hh, ww = 1, 2, 16, 16
    sample = jax.random.normal(KEY, (b, f, hh, ww, 8))
    cond = make_cond(bf=b * f, d_cond=1024, hw=hh)
    tids = jnp.array([[6.0, 127.0, 127.0]])
    params = unet.init(KEY, sample, 0.5, cond, tids)
    y = unet.apply(params, sample, 0.5, cond, tids)
    assert y.shape == (b, f, hh, ww, 4)
    assert np.isfinite(np.asarray(y)).all()

    flat = "\n".join("/".join(str(k) for k in p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(params)[0])
    if "audio" in ablate:
        assert "audio_unit" not in flat and "in_proj1" not in flat
    if "id" in ablate:
        assert "id_proj" not in flat
    if "ssd" in ablate:
        assert "A_logs" not in flat  # no scan params anywhere
    if "cross_attn" in ablate:
        assert "attn2" not in flat
    if ablate == ():
        assert "attn2" in flat and "A_logs" in flat


def test_gradient_checkpointing_matches_plain():
    """Remat blocks must reproduce the plain forward AND its gradients
    (reference trains with activation checkpointing, train.yaml solver)."""
    cfg = UNetConfig(scan_impl="blocked").micro()
    cfg_gc = dataclasses.replace(cfg, gradient_checkpointing=True)
    b, f, hw = 1, 2, 8
    from actalker_tpu.models.conditioning import Conditioning

    cond = Conditioning(
        id_tokens=jnp.zeros((b * f, 1, 1024)),
        audio_tokens=jax.random.normal(KEY, (b * f, 32, 1024)) * 0.1,
        vasa_tokens=jnp.zeros((b * f, 1, 1024)),
        audio_mask=jnp.ones((1, 1, hw, hw)),
        exp_mask=jnp.ones((1, 1, hw, hw)),
    )
    x = jax.random.normal(KEY, (b, f, hw, hw, 8))
    tids = jnp.zeros((b, 3))
    unet = UNetSpatioTemporalCondition(cfg)
    unet_gc = UNetSpatioTemporalCondition(cfg_gc)
    params = unet.init(KEY, x, 0.5, cond, tids)

    def loss(m, p):
        return jnp.sum(m.apply(p, x, 0.5, cond, tids) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(unet, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(unet_gc, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4),
        g0, g1)


def test_per_sample_masks_route_per_sample():
    """Per-sample (B, 1, H, W) region masks: changing sample 1's mask must
    change sample 1's output only (VERDICT r2 weak #3 — the reference dataset
    emits one mouth/exp mask per sample,
    portrait_audio_dataset_arcface_vasa.py:725-735)."""
    import dataclasses as _dc

    from actalker_tpu.training import trainer as T

    cfg = UNetConfig(scan_impl="blocked").micro()
    unet = UNetSpatioTemporalCondition(cfg)
    b, f, hw = 2, 2, 16
    r = np.random.default_rng(0)
    g = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32))
    sample = g(b, f, hw, hw, 8)
    bf = b * f
    cond_base = Conditioning(
        id_tokens=g(bf, 1, 1024),
        audio_tokens=g(bf, 8, 1024),
        vasa_tokens=g(bf, 1, 1024),
        audio_mask=None, exp_mask=None,
    )
    tids = jnp.tile(jnp.array([[6.0, 127.0, 127.0]]), (b, 1))
    params = unet.init(KEY, sample, 0.5, cond_base, tids)

    m_full = np.ones((1, 1, hw, hw), np.float32)
    m_box = np.zeros((1, 1, hw, hw), np.float32)
    m_box[:, :, 4:12, 4:12] = 1.0
    masks_aa = jnp.asarray(np.concatenate([m_full, m_full]))   # (2, 1, hw, hw)
    masks_ab = jnp.asarray(np.concatenate([m_full, m_box]))

    def run(masks):
        c = cond_base.replace(audio_mask=masks, exp_mask=masks)
        return np.asarray(unet.apply(params, sample, 0.5, c, tids))

    out_aa, out_ab = run(masks_aa), run(masks_ab)
    np.testing.assert_allclose(out_ab[0], out_aa[0], rtol=1e-6, atol=1e-6)
    assert np.abs(out_ab[1] - out_aa[1]).max() > 1e-5

    # and through the train step: per-sample masks change the loss
    batch = T.TrainBatch(
        latents=g(b, f, hw // 8 * 8, hw // 8 * 8, 4)[:, :, :hw, :hw],
        ref_latents=g(b, hw, hw, 4),
        id_tokens=g(b, 1, 1024),
        audio_tokens=g(b, f, 8, 1024),
        vasa_tokens=g(b, f, 1, 1024),
        pose_fea=g(b, f, hw, hw, cfg.block_out_channels[0]),
        audio_mask=masks_aa, exp_mask=masks_aa,
        motion_buckets=jnp.full((b, 2), 12.0), fps=jnp.full((b,), 12.5),
    )
    tcfg = T.TrainConfig(cond_dropout_prob=0.0, noise_offset=0.0)
    key = jax.random.PRNGKey(3)
    loss_aa, _ = T.diffusion_loss(unet.apply, params, batch, key, tcfg,
                                  dtype=jnp.float32)
    batch_ab = batch._replace(audio_mask=masks_ab, exp_mask=masks_ab)
    loss_ab, _ = T.diffusion_loss(unet.apply, params, batch_ab, key, tcfg,
                                  dtype=jnp.float32)
    assert abs(float(loss_aa) - float(loss_ab)) > 1e-7
