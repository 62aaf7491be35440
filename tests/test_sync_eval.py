"""Tests for the end-to-end Sync-C/Sync-D driver (evaluation/sync_eval.py).

Oracles: scipy (DCT, medfilt), cv2 (HSV, resize), torch (the reference's
calc_pdist via torch.nn.functional.pairwise_distance), hand-built tracking
scenarios, and a full synthetic-footage driver run with injected detections.
"""
import numpy as np
import pytest

from actalker_tpu.evaluation import sync_eval


def test_dct_matches_scipy():
    from scipy.fftpack import dct

    x = np.random.default_rng(0).standard_normal((7, 26))
    got = sync_eval._dct2_ortho(x)
    want = dct(x, type=2, axis=1, norm="ortho")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_mfcc_framing_and_energy():
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal(16000) * 3000).astype(np.int16)  # 1 s
    feat = sync_eval.mfcc(sig)
    # 100 fps: 1 + ceil((16000-400)/160) = 99 frames
    assert feat.shape == (99, 13)
    # appendEnergy: c0 is log total power -> doubling amplitude adds log(4)
    feat2 = sync_eval.mfcc(sig.astype(np.float64) * 2)
    np.testing.assert_allclose(feat2[:, 0] - feat[:, 0], np.log(4),
                               rtol=1e-6, atol=1e-6)
    # higher cepstra are amplitude-invariant only in the log-shift sense:
    # log(4) enters every filterbank value equally, and an all-equal shift
    # lands entirely in DCT coefficient 0 (replaced by energy) -> c1..c12 equal
    np.testing.assert_allclose(feat2[:, 1:], feat[:, 1:], rtol=1e-8, atol=1e-8)


def test_hsv_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    got = sync_eval._rgb_to_hsv_cv(rgb)
    for i in range(3):
        want = cv2.cvtColor(rgb[i][..., ::-1], cv2.COLOR_BGR2HSV).astype(
            np.float32)
        # H is quantized to uint8 in cv2; allow 1 unit + hue wrap at 180
        dh = np.abs(got[i, ..., 0] - want[..., 0])
        dh = np.minimum(dh, 180 - dh)
        assert dh.max() <= 1.0
        assert np.abs(got[i, ..., 1] - want[..., 1]).max() <= 1.0
        np.testing.assert_allclose(got[i, ..., 2], want[..., 2], atol=0.5)


def test_scene_detect_finds_cut():
    rng = np.random.default_rng(3)
    a = np.full((20, 64, 64, 3), 40, np.uint8)
    b = np.full((25, 64, 64, 3), 200, np.uint8)
    clip = np.concatenate([a, b])
    scenes = sync_eval.scene_detect(clip, min_scene_len=5)
    assert scenes == [(0, 20), (20, 45)]
    flat = sync_eval.scene_detect(a)
    assert flat == [(0, 20)]


def test_medfilt_matches_scipy():
    from scipy.signal import medfilt

    x = np.random.default_rng(4).standard_normal(40)
    np.testing.assert_allclose(sync_eval._medfilt(x, 13), medfilt(x, 13))


def test_bilinear_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    got = sync_eval._bilinear_resize_uint8(img, (224, 224))
    want = cv2.resize(img, (224, 224))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_track_shot_interpolates_and_filters():
    # a 150-frame steady face with a 3-frame detection gap
    faces = []
    for i in range(150):
        if i in (70, 71, 72):
            faces.append([])
        else:
            faces.append([{"frame": i,
                           "bbox": [10 + i, 20, 130 + i, 140], "conf": 1.0}])
    tracks = sync_eval.track_shot(faces, min_track=100, min_face_size=100)
    assert len(tracks) == 1
    tr = tracks[0]
    assert tr["frame"][0] == 0 and tr["frame"][-1] == 149
    # gap interpolated linearly
    np.testing.assert_allclose(tr["bbox"][71][0], 81.0)
    # too-small faces are dropped
    small = [[{"frame": i, "bbox": [0, 0, 50, 50], "conf": 1.0}]
             for i in range(150)]
    assert sync_eval.track_shot(small, min_track=100) == []
    # short tracks are dropped
    assert sync_eval.track_shot(faces[:50], min_track=100) == []


def test_calc_pdist_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    f1 = rng.standard_normal((30, 16)).astype(np.float32)
    f2 = rng.standard_normal((30, 16)).astype(np.float32)
    vshift = 5
    got = sync_eval.calc_pdist(f1, f2, vshift)
    # reference calc_pdist (SyncNetInstance.py:19-30)
    win = vshift * 2 + 1
    feat2p = torch.nn.functional.pad(torch.from_numpy(f2),
                                     (0, 0, vshift, vshift))
    want = []
    for i in range(len(f1)):
        want.append(torch.nn.functional.pairwise_distance(
            torch.from_numpy(f1)[[i], :].repeat(win, 1),
            feat2p[i:i + win, :]))
    want = torch.stack(want).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_score_tube_recovers_known_offset():
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((60, 32)).astype(np.float32)
    # lip[i] == aud[i+3]: the audio matching lip window i sits 3 windows
    # later -> minidx = vshift + 3 -> offset = vshift - minidx = -3
    # (reference convention, SyncNetInstance.py:133)
    lip = emb[3:48]
    aud = emb[:45]
    offset, conf, dist = sync_eval.score_tube(lip, aud, vshift=8)
    assert offset == -3
    # the mean at the true shift includes a few zero-padded boundary windows
    # (reference semantics), so it is small but not ~0
    assert dist < 1.0
    assert conf > 1.0


def test_crop_face_tube_shape_and_content():
    frames = np.zeros((12, 120, 160, 3), np.uint8)
    frames[:, 30:90, 50:110] = 200  # bright square "face"
    track = {"frame": np.arange(12),
             "bbox": np.tile(np.array([50.0, 30.0, 110.0, 90.0]), (12, 1))}
    tube = sync_eval.crop_face_tube(frames, track)
    assert tube.shape == (12, 224, 224, 3)
    # center of the crop contains the bright face, border contains padding
    assert tube[0, 80, 112, 0] == 200


@pytest.mark.slow
def test_evaluate_video_synthetic_end_to_end():
    """The VERDICT done-criterion: a raw synthetic clip returns
    (offset, conf, dist) through detect -> scenes -> track -> tube -> towers
    -> scoring, with random tower weights and injected detections."""
    import jax

    from actalker_tpu.evaluation.syncnet import SyncNet

    rng = np.random.default_rng(8)
    t = 120
    frames = rng.integers(60, 80, (t, 96, 96, 3), dtype=np.uint8)
    frames[:, 20:80, 18:78] += 60  # static face region
    audio = (rng.standard_normal(int(t / 25 * 16000)) * 2000).astype(np.int16)

    params = SyncNet().init(
        jax.random.PRNGKey(0),
        np.zeros((1, 13, 20, 1), np.float32),
        np.zeros((1, 5, 224, 224, 3), np.float32))
    ev = sync_eval.SyncEvaluator(syncnet_params=params, s3fd=None,
                                 min_track=100, min_face_size=50,
                                 batch_size=64)
    ev.detect_faces = lambda fr: [
        [{"frame": i, "bbox": [18.0, 20.0, 78.0 + (i % 3), 80.0],
          "conf": 1.0}] for i in range(len(fr))]
    results = ev.evaluate_video(frames, audio, fps=25.0)
    assert len(results) == 1
    offset, conf, dist = results[0]
    assert isinstance(offset, int) and np.isfinite(conf) and dist > 0
