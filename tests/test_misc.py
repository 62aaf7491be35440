"""Tests for scan orders, checkpointing, config loading, and observability."""
import numpy as np
import jax.numpy as jnp

from actalker_tpu.ops import scan_orders as SO


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


def test_teeth_enhancer_identity_at_init():
    import jax
    from actalker_tpu.models.teeth import TeethEnhancer

    m = TeethEnhancer(base=8, channel_mults=(1, 2))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3),
                           minval=-1, maxval=1)
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


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
