"""Tests for scan orders, checkpointing, config loading, and observability."""
import numpy as np
import jax.numpy as jnp

from actalker_tpu.ops import scan_orders as SO
import pytest


def test_orders_are_permutations():
    for kind in SO.ORDERS:
        for h, w in ((8, 8), (4, 8)):
            if kind in ("zorder", "hilbert") and h != w:
                continue
            p = SO.order_table(kind, h, w)
            assert sorted(p.tolist()) == list(range(h * w)), kind
            inv = SO.inverse_table(p)
            np.testing.assert_array_equal(p[inv], np.arange(h * w))


def test_scan_order_boustrophedon():
    p = SO.order_table("scan", 2, 3)
    np.testing.assert_array_equal(p, [0, 1, 2, 5, 4, 3])


def test_hilbert_locality():
    p = SO.order_table("hilbert", 8, 8)
    ys, xs = p // 8, p % 8
    steps = np.abs(np.diff(ys)) + np.abs(np.diff(xs))
    assert steps.max() == 1  # hilbert is a continuous curve


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    from actalker_tpu.io import checkpoint as C

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    for step in (2, 4, 6, 8):
        C.save_checkpoint(str(tmp_path), step,
                          {"params": {"w": state["params"]["w"] + step}},
                          total_limit=2)
    assert C.list_checkpoints(str(tmp_path)) == [6, 8]
    restored = C.restore_checkpoint(str(tmp_path))  # latest
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]),
        np.asarray(state["params"]["w"]) + 8,
    )


def test_config_yaml_roundtrip(tmp_path):
    from actalker_tpu.config import MODE_GATES, InferenceConfig

    y = tmp_path / "c.yaml"
    y.write_text(
        "data:\n  n_sample_frames: 7\nnum_inference_steps: 3\n"
        "custom_key: 5\nmodel_paths:\n  whisper_model: /x\n"
    )
    cfg = InferenceConfig.from_yaml(str(y))
    assert cfg.n_sample_frames == 7
    assert cfg.num_inference_steps == 3
    assert cfg.whisper_model == "/x"
    assert cfg.extras["custom_key"] == 5
    sc = cfg.sampler_config(MODE_GATES[0])
    assert sc.frames_per_batch == 7 and sc.gate == (1, 0)


def test_metrics_emitter(tmp_path):
    from actalker_tpu.utils.observability import MetricsEmitter, phase_timer

    path = tmp_path / "m.jsonl"
    em = MetricsEmitter(str(path))
    em.emit(step=1, loss=0.5)
    with phase_timer("unit", em):
        pass
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    import json

    assert json.loads(lines[0])["loss"] == 0.5
    assert "seconds" in json.loads(lines[1])


@pytest.mark.slow
def test_teeth_enhancer_matches_torch_oracle():
    """TeethEnhancer + convert_teeth vs a functional torch replay of the
    reference pnnx graph (enhance_teeth_pnnx.py forward 384-599) on random
    weights at full channel widths, 32x32 input (resize skipped)."""
    import jax
    import torch
    import torch.nn.functional as F

    from actalker_tpu.io.weights import convert_teeth
    from actalker_tpu.models.teeth import TeethEnhancer

    torch.manual_seed(0)
    ENC = [32, 64, 128, 256, 512, 512]
    DEC = [512, 512, 256, 128, 64, 32]
    sd = {}

    def conv(name, ci, co, k):
        sd[f"{name}.weight"] = torch.randn(co, ci, k, k) * (0.4 / (k * ci ** 0.5))
        sd[f"{name}.bias"] = torch.randn(co) * 0.02

    def bnorm(name, c):
        sd[f"{name}.weight"] = 1 + torch.randn(c) * 0.05
        sd[f"{name}.bias"] = torch.randn(c) * 0.05
        sd[f"{name}.running_mean"] = torch.randn(c) * 0.05
        sd[f"{name}.running_var"] = 1 + torch.rand(c) * 0.1

    def mkres(norm, cbn, conv2, ci, co, rf=None):
        bnorm(norm, ci)
        conv(cbn, ci, co, 3)
        conv(conv2, co, co, 3)
        if rf:
            conv(rf, ci, co, 1)

    def mkattn(pre, c):
        bnorm(f"{pre}_norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            conv(f"{pre}_{nm}", c, c, 1)

    conv("encoder_conv_in", 3, 32, 3)
    mkres("encoder_blocks_0_0_norm1", "convbn2d_0", "encoder_blocks_0_0_conv2", 32, 32)
    prev = 32
    for i in range(1, 6):
        conv(f"encoder_blocks_{i}_0_conv", prev, prev, 3)
        mkres(f"encoder_blocks_{i}_1_norm1", f"convbn2d_{i}",
              f"encoder_blocks_{i}_1_conv2", prev, ENC[i],
              f"encoder_blocks_{i}_1_residual_func" if i < 5 else None)
        prev = ENC[i]
    mkattn("encoder_blocks_5_2", 512)
    mkres("encoder_mid_blocks_0_norm1", "convbn2d_6", "encoder_mid_blocks_0_conv2", 512, 512)
    mkattn("encoder_mid_blocks_1", 512)
    mkres("encoder_mid_blocks_2_norm1", "convbn2d_7", "encoder_mid_blocks_2_conv2", 512, 512)
    bnorm("encoder_conv_out_0", 512)
    conv("encoder_conv_out_2", 512, 512, 3)
    conv("decoder_conv_in", 512, 512, 3)
    mkres("decoder_mid_blocks_0_norm1", "convbn2d_8", "decoder_mid_blocks_0_conv2", 512, 512)
    mkattn("decoder_mid_blocks_1", 512)
    mkres("decoder_mid_blocks_2_norm1", "convbn2d_9", "decoder_mid_blocks_2_conv2", 512, 512)
    mkres("decoder_blocks_0_0_norm1", "convbn2d_10", "decoder_blocks_0_0_conv2", 512, 512)
    mkattn("decoder_blocks_0_1", 512)
    prev = 512
    for i in range(1, 6):
        conv(f"decoder_blocks_{i}_0_conv", prev, prev, 3)
        mkres(f"decoder_blocks_{i}_1_norm1", f"convbn2d_{10 + i}",
              f"decoder_blocks_{i}_1_conv2", prev, DEC[i],
              f"decoder_blocks_{i}_1_residual_func" if i > 1 else None)
        prev = DEC[i]
    bnorm("decoder_conv_out4_0", 32)
    conv("decoder_conv_out4_1", 32, 4, 3)

    def tbn(x, n):
        return F.batch_norm(x, sd[f"{n}.running_mean"], sd[f"{n}.running_var"],
                            sd[f"{n}.weight"], sd[f"{n}.bias"], False, 0.0, 1e-5)

    def tconv(x, n, stride=1, pad=1):
        return F.conv2d(x, sd[f"{n}.weight"], sd[f"{n}.bias"], stride, pad)

    def tres(x, norm, cbn, conv2, rf=None):
        h = F.relu(tbn(x, norm))
        h = F.relu(tconv(h, cbn))
        h = tconv(h, conv2)
        if rf:
            x = tconv(x, rf, pad=0)
        return x + h

    def tattn(x, pre):
        y = tbn(x, f"{pre}_norm")
        q = tconv(y, f"{pre}_q", pad=0)
        k = tconv(y, f"{pre}_k", pad=0)
        v = tconv(y, f"{pre}_v", pad=0)
        n, c, hh, ww = q.shape
        q2 = q.reshape(n, c, hh * ww).permute(0, 2, 1)
        w = torch.softmax(torch.bmm(q2, k.reshape(n, c, -1)) / c ** 0.5, 2)
        o = torch.bmm(v.reshape(n, c, -1), w.permute(0, 2, 1))
        o = o.reshape(n, c, hh, ww)
        return x + tconv(o, f"{pre}_proj_out", pad=0)

    def torch_forward(x):
        h = tconv(x, "encoder_conv_in")
        h = tres(h, "encoder_blocks_0_0_norm1", "convbn2d_0", "encoder_blocks_0_0_conv2")
        for i in range(1, 6):
            h = F.pad(h, (0, 1, 0, 1))
            h = tconv(h, f"encoder_blocks_{i}_0_conv", stride=2, pad=0)
            h = tres(h, f"encoder_blocks_{i}_1_norm1", f"convbn2d_{i}",
                     f"encoder_blocks_{i}_1_conv2",
                     f"encoder_blocks_{i}_1_residual_func" if i < 5 else None)
        h = tattn(h, "encoder_blocks_5_2")
        h = tres(h, "encoder_mid_blocks_0_norm1", "convbn2d_6", "encoder_mid_blocks_0_conv2")
        h = tattn(h, "encoder_mid_blocks_1")
        h = tres(h, "encoder_mid_blocks_2_norm1", "convbn2d_7", "encoder_mid_blocks_2_conv2")
        h = tconv(F.relu(tbn(h, "encoder_conv_out_0")), "encoder_conv_out_2")
        h = tconv(h, "decoder_conv_in")
        h = tres(h, "decoder_mid_blocks_0_norm1", "convbn2d_8", "decoder_mid_blocks_0_conv2")
        h = tattn(h, "decoder_mid_blocks_1")
        h = tres(h, "decoder_mid_blocks_2_norm1", "convbn2d_9", "decoder_mid_blocks_2_conv2")
        h = tres(h, "decoder_blocks_0_0_norm1", "convbn2d_10", "decoder_blocks_0_0_conv2")
        h = tattn(h, "decoder_blocks_0_1")
        for i in range(1, 6):
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = tconv(h, f"decoder_blocks_{i}_0_conv")
            h = tres(h, f"decoder_blocks_{i}_1_norm1", f"convbn2d_{10 + i}",
                     f"decoder_blocks_{i}_1_conv2",
                     f"decoder_blocks_{i}_1_residual_func" if i > 1 else None)
        h = torch.tanh(tconv(tbn(h, "decoder_conv_out4_0"), "decoder_conv_out4_1"))
        return h[:, :3], (h[:, 3:4] + 1) / 2

    x = torch.rand(1, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        rgb_t, a_t = torch_forward(x)

    params = convert_teeth({k: v.numpy() for k, v in sd.items()})
    rgb_j, a_j = TeethEnhancer(resize_input=False).apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(rgb_j),
                               rgb_t.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a_j),
                               a_t.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=2e-4)


def test_similarity_transform_recovers_rotation():
    from actalker_tpu.frontend.enhance import similarity_transform

    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    src = np.random.default_rng(0).uniform(0, 100, (5, 2))
    dst = src @ R.T * 1.7 + np.array([5.0, -3.0])
    mat = similarity_transform(src, dst)
    got = src @ mat[:, :2].T + mat[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-3)


@pytest.mark.slow
def test_stylegan2_generator_runs():
    import jax
    from actalker_tpu.models.stylegan2 import GPENGenerator

    g = GPENGenerator(size=32, style_dim=16, n_mlp=2, channel_multiplier=1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3),
                           minval=-1, maxval=1)
    params = g.init(jax.random.PRNGKey(1), x)
    y = g.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_upfirdn2d_matches_manual():
    import jax.numpy as jnp
    from actalker_tpu.ops.upfirdn2d import downsample2x, upsample2x

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 2)),
                    jnp.float32)
    up = upsample2x(x)
    assert up.shape == (1, 16, 16, 2)
    down = downsample2x(up)
    assert down.shape == (1, 8, 8, 2)
    # FIR resampling preserves DC exactly
    const = jnp.ones((1, 8, 8, 2))
    np.testing.assert_allclose(np.asarray(upsample2x(const))[:, 2:-2, 2:-2],
                               1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(downsample2x(const))[:, 1:-1, 1:-1],
                               1.0, rtol=1e-5)


@pytest.mark.slow
def test_rife_interpolation_runs():
    import jax
    from actalker_tpu.models.rife import IFNet, interpolate_pairs

    net = IFNet(c=16)
    f0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    f1 = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(2), f0, f1)
    mid = net.apply(params, f0, f1)
    assert mid.shape == f0.shape
    frames = jax.random.uniform(jax.random.PRNGKey(3), (3, 32, 32, 3))
    out = interpolate_pairs(lambda p, a, b: net.apply(p, a, b), params, frames)
    assert out.shape == (5, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(frames[0]))


@pytest.mark.slow
def test_gpen_generator_matches_torch_oracle():
    """GPENGenerator + convert_bfr vs a functional torch replay of the
    reference FullGenerator_paper (model_enhance.py:778-872; isconcat=True)
    at size=32 on random weights."""
    import math

    import jax
    import torch
    import torch.nn.functional as F

    from actalker_tpu.io.weights import convert_bfr
    from actalker_tpu.models.stylegan2 import GPENGenerator

    torch.manual_seed(0)
    SIZE, STYLE, N_MLP, CM = 32, 16, 2, 1
    log_size = int(math.log2(SIZE))
    ch = {4: 512, 8: 512, 16: 512, 32: 512}
    sd = {}

    def eql(name, ci, co):
        sd[f"{name}.weight"] = torch.randn(co, ci) * 0.3
        sd[f"{name}.bias"] = torch.randn(co) * 0.05

    def modconv(name, ci, co, k):
        sd[f"{name}.weight"] = torch.randn(1, co, ci, k, k) * 0.3
        eql(f"{name}.modulation", STYLE, ci)
        sd[f"{name}.modulation.bias"] += 1.0  # bias_init=1

    def styled(name, ci, co, k=3):
        modconv(f"{name}.conv", ci, co, k)
        sd[f"{name}.noise.weight"] = torch.randn(1) * 0.5
        sd[f"{name}.activate.bias"] = torch.randn(2 * co) * 0.05

    def torgb(name, ci):
        modconv(f"{name}.conv", ci, 3, 1)
        sd[f"{name}.bias"] = torch.randn(1, 3, 1, 1) * 0.05

    sd["ecd0.0.0.weight"] = torch.randn(ch[SIZE], 3, 1, 1) * 0.3
    sd["ecd0.0.1.bias"] = torch.randn(ch[SIZE]) * 0.05
    prev = ch[SIZE]
    for i in range(log_size, 2, -1):
        k = log_size - i + 1
        sd[f"ecd{k}.0.1.weight"] = torch.randn(ch[2 ** (i - 1)], prev, 3, 3) * 0.1
        sd[f"ecd{k}.0.2.bias"] = torch.randn(ch[2 ** (i - 1)]) * 0.05
        prev = ch[2 ** (i - 1)]
    eql("final_linear.0", ch[4] * 16, STYLE)
    for i in range(1, N_MLP + 1):
        eql(f"generator.style.{i}", STYLE, STYLE)
    sd["generator.input.input"] = torch.randn(1, ch[4], 4, 4)
    styled("generator.conv1", ch[4], ch[4])
    torgb("generator.to_rgb1", 2 * ch[4])
    prev = ch[4]
    for j, i in enumerate(range(3, log_size + 1)):
        co = ch[2 ** i]
        styled(f"generator.convs.{2 * j}", 2 * prev, co)
        styled(f"generator.convs.{2 * j + 1}", 2 * co, co)
        torgb(f"generator.to_rgbs.{j}", 2 * co)
        prev = co

    # ---- functional torch replay
    blur_k = torch.tensor([1., 3., 3., 1.])
    k2 = torch.outer(blur_k, blur_k)
    k2 = k2 / k2.sum()

    def upfirdn(x, kern, up=1, down=1, pad=(0, 0)):
        b, c, h, w = x.shape
        if up > 1:
            z = torch.zeros(b, c, h, up, w, up)
            z[:, :, :, 0, :, 0] = x
            x = z.view(b, c, h * up, w * up)
        x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
        wk = torch.flip(kern, [0, 1]).view(1, 1, *kern.shape)
        x = F.conv2d(x, wk.expand(c, 1, -1, -1), groups=c)
        return x[:, :, ::down, ::down]

    def flrelu(x, bias):
        return F.leaky_relu(x + bias.view(1, -1, 1, 1), 0.2) * 2 ** 0.5

    def eqlin(x, name, lr_mul=1.0, act=False):
        w = sd[f"{name}.weight"]
        y = x @ (w * (lr_mul / math.sqrt(w.shape[1]))).t()
        b = sd[f"{name}.bias"] * lr_mul
        if act:
            return F.leaky_relu(y + b, 0.2) * 2 ** 0.5
        return y + b

    def mod_conv(x, name, style, demod=True, up=False):
        b, ci, h, w = x.shape
        wt = sd[f"{name}.weight"]
        co, k = wt.shape[1], wt.shape[-1]
        s = eqlin(style, f"{name}.modulation").view(b, 1, ci, 1, 1)
        weight = wt * s / math.sqrt(ci * k * k)
        if demod:
            d = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * d.view(b, co, 1, 1, 1)
        if up:
            x = x.reshape(1, b * ci, h, w)
            wg = weight.transpose(1, 2).reshape(b * ci, co, k, k)
            y = F.conv_transpose2d(x, wg, stride=2, groups=b)
            y = y.view(b, co, y.shape[-2], y.shape[-1])
            p = (4 - 2) - (k - 1)
            return upfirdn(y, k2 * 4, pad=((p + 1) // 2 + 1, p // 2 + 1))
        wg = weight.view(b * co, ci, k, k)
        y = F.conv2d(x.reshape(1, b * ci, h, w), wg, padding=k // 2, groups=b)
        return y.view(b, co, h, w)

    def styled_fwd(x, name, style, noise, up=False):
        y = mod_conv(x, f"{name}.conv", style, up=up)
        y = torch.cat([y, sd[f"{name}.noise.weight"] * noise], 1)
        return flrelu(y, sd[f"{name}.activate.bias"])

    def torgb_fwd(x, name, style, skip=None):
        y = mod_conv(x, f"{name}.conv", style, demod=False) + sd[f"{name}.bias"]
        if skip is not None:
            p = 4 - 2
            skip = upfirdn(skip, k2 * 4, up=2, pad=((p + 1) // 2 + 1, p // 2))
            y = y + skip
        return y

    def torch_forward(x):
        noises = []
        h = F.conv2d(x, sd["ecd0.0.0.weight"] / math.sqrt(3))
        h = flrelu(h, sd["ecd0.0.1.bias"])
        noises.append(h)
        for i in range(log_size, 2, -1):
            kk = log_size - i + 1
            p = 2 + 2
            h = upfirdn(h, k2, pad=((p + 1) // 2, p // 2))
            w = sd[f"ecd{kk}.0.1.weight"]
            h = F.conv2d(h, w / math.sqrt(w.shape[1] * 9), stride=2)
            h = flrelu(h, sd[f"ecd{kk}.0.2.bias"])
            noises.append(h)
        z = eqlin(h.reshape(h.shape[0], -1), "final_linear.0", act=True)
        style = z * torch.rsqrt((z * z).mean(1, keepdim=True) + 1e-8)
        for i in range(1, N_MLP + 1):
            style = eqlin(style, f"generator.style.{i}", lr_mul=0.01, act=True)
        noises = noises[::-1]
        y = sd["generator.input.input"].expand(x.shape[0], -1, -1, -1)
        y = styled_fwd(y, "generator.conv1", style, noises[0])
        rgb = torgb_fwd(y, "generator.to_rgb1", style)
        for j, i in enumerate(range(3, log_size + 1)):
            y = styled_fwd(y, f"generator.convs.{2 * j}", style,
                           noises[i - 2], up=True)
            y = styled_fwd(y, f"generator.convs.{2 * j + 1}", style,
                           noises[i - 2])
            rgb = torgb_fwd(rgb if False else y, f"generator.to_rgbs.{j}",
                            style, rgb)
        return rgb

    x = torch.rand(2, 3, SIZE, SIZE) * 2 - 1
    with torch.no_grad():
        ref = torch_forward(x)

    params = convert_bfr({k: v.numpy() for k, v in sd.items()})
    gen = GPENGenerator(size=SIZE, style_dim=STYLE, n_mlp=N_MLP,
                        channel_multiplier=CM)
    got = gen.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=5e-3, atol=5e-4)


def test_unet_cls_mapping_and_instantiate(tmp_path):
    from actalker_tpu.config import (
        InferenceConfig, import_filename, instantiate_from_config,
        unet_cls_to_ablate,
    )

    assert unet_cls_to_ablate(
        "src.models.base.unet_spatio_temporal_condition_mambaID_v10_two_ip"
        ".UNetSpatioTemporalConditionModel") == ()
    assert unet_cls_to_ablate("...v10_wo_audio.UNet") == ("audio",)
    assert unet_cls_to_ablate("...v10_wo_cross_attn.UNet") == ("cross_attn",)
    cfg = InferenceConfig.from_dict(
        {"unet_cls": "x.unet_spatio_temporal_condition_mambaID_v4_wo_ssd.U"})
    assert cfg.ablate == ("ssd",)

    spec = {"target": "collections.OrderedDict", "params": {"a": 1}}
    inst = instantiate_from_config(spec)
    assert inst["a"] == 1

    py = tmp_path / "conf.py"
    py.write_text("value = 41 + 1\n")
    mod = import_filename(str(py))
    assert mod.value == 42
