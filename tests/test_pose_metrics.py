"""Pose/motion evaluation metrics (eval_pm.py parity surface)."""
import numpy as np

from actalker_tpu.evaluation import pose_metrics as PM
import pytest

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


def test_pose_metrics_identical_trajectories():
    rng = np.random.default_rng(0)
    traj = {"rotation": rng.standard_normal((12, 3)) * 20,
            "translation": rng.standard_normal((12, 3)) * 0.5}
    m = PM.pose_metrics(traj, traj)
    assert m["rotation_rmse_deg"] == 0.0
    assert m["translation_rmse"] == 0.0
    assert abs(m["rotation_corr"] - 1.0) < 1e-9
    assert abs(m["motion_corr"] - 1.0) < 1e-9
    assert abs(m["motion_intensity_ratio"] - 1.0) < 1e-6


def test_pose_metrics_shifted_rotation_keeps_motion_corr():
    rng = np.random.default_rng(1)
    rot = np.cumsum(rng.standard_normal((20, 3)), axis=0)
    a = {"rotation": rot, "translation": np.zeros((20, 3))}
    b = {"rotation": rot + 10.0, "translation": np.zeros((20, 3))}
    m = PM.pose_metrics(a, b)
    assert abs(m["rotation_rmse_deg"] - 10.0) < 1e-9
    assert abs(m["motion_corr"] - 1.0) < 1e-9  # deltas unchanged by offset


def test_pose_metrics_truncates_and_static_safe():
    a = {"rotation": np.zeros((5, 3)), "translation": np.zeros((5, 3))}
    b = {"rotation": np.zeros((9, 3)), "translation": np.zeros((9, 3))}
    m = PM.pose_metrics(a, b)  # zero-variance: correlations defined as 0
    assert m["rotation_corr"] == 0.0


def test_pose_trajectory_with_jitted_tower():
    import jax
    import jax.numpy as jnp

    from actalker_tpu.models.vasa import HeadPose

    model = HeadPose(layers=(1, 1, 1, 1))
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    apply = jax.jit(lambda x: model.apply(params, x))
    frames = np.random.default_rng(2).random((5, 64, 64, 3), np.float32)
    traj = PM.pose_trajectory(frames, apply, batch=2)
    assert traj["rotation"].shape == (5, 3)
    assert np.all(np.abs(traj["rotation"]) <= 180.0)
    m = PM.evaluate_pose(frames, frames, apply)
    assert m["rotation_rmse_deg"] == 0.0
