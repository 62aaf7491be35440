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
