"""Frontend tests: mel features vs HF WhisperFeatureExtractor, native DSP
parity, mask construction, and the training data pipeline."""
import numpy as np
import pytest

from actalker_tpu.frontend import audio as A
from actalker_tpu.frontend import preprocess as P
from actalker_tpu.training import data as D


@pytest.mark.slow
def test_log_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # whisper defaults: 80 mels, 16 kHz
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    want = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    got = A.log_mel_spectrogram(audio, use_native=False)
    assert got.shape == want.shape == (80, 3000)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_native_mel_matches_numpy():
    if A._native_lib() is None:
        pytest.skip("native mel library not built")
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 2) * 0.2).astype(np.float32)
    a = A.log_mel_spectrogram(audio, use_native=False)
    b = A.log_mel_spectrogram(audio, use_native=True)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_whisper_frame_count():
    audio = np.zeros(16000, np.float32)  # 1 s
    mel = A.log_mel_spectrogram(audio)
    assert mel.shape == (80, 3000)  # padded to the 30 s chunk


def test_preprocess_masks_and_sizes():
    img = np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8)
    pre = P.preprocess_reference_image(img, (100, 50, 300, 250),
                                       image_size=128, area=1.2)
    h, w = pre.ref_img.shape[:2]
    assert h % 64 == 0 and w % 64 == 0
    assert pre.ref_img.min() >= -1.0 and pre.ref_img.max() <= 1.0
    assert pre.pose_img.max() > 0.9          # box present
    assert pre.mouth_mask.sum() < pre.pose_img.sum()
    assert pre.head_crop.shape == (112, 112, 3)
    # exp mask == pose - mouth (upper half of the box)
    np.testing.assert_allclose(
        pre.exp_mask + pre.mouth_mask, pre.pose_img, atol=0.1)


def test_bbox_helpers():
    sq = P.process_bbox([10, 20, 110, 140], 0.5, 400, 400)
    assert sq[2] - sq[0] == sq[3] - sq[1]  # square
    box = P.get_bbox_by_aspect([0, 0, 100, 100], "1:1", 400, 400)
    assert box == [0, 0, 100, 100]


def _static_clip_store(t=40, hw=96):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (1, hw, hw, 3), np.uint8)
    # near-static clip: large frame-to-frame motion is rejected by the
    # motion-bucket gate (faithful to the reference's resampling)
    return np.clip(
        base.astype(np.int32) + rng.integers(-3, 3, (t, hw, hw, 3)), 0, 255
    ).astype(np.uint8)


def test_dataset_pipeline():
    frames_store = _static_clip_store()

    def frame_reader(path, idxs):
        return frames_store[list(idxs)]

    clips = [{
        "video_path": "fake.mp4", "frames": 40,
        "bboxes": [[10, 10, 80, 80]] * 40,
        "landmarks": [[[20, 20], [30, 30]]] * 40,
    }]
    ds = D.PortraitAudioDataset(
        clips, D.DataConfig(n_sample_frames=8, image_size=128,
                            deterministic_shape=True),
        frame_reader,
    )
    s = ds[0]
    assert s["frames"].shape == (8, 128, 128, 3)
    assert s["ref_frame"].shape == (128, 128, 3)
    assert -1.01 <= s["frames"].min() and s["frames"].max() <= 1.01
    assert s["pose_mask"].shape == (128, 128)
    assert s["head_crop"].shape == (112, 112, 3)
    assert s["vasa_face"].shape == (8, 256, 256, 3)
    assert s["vasa_pose"].shape == (8, 256, 256, 3)
    assert 0 <= s["motion_bucket"] <= 128
    assert s["audio_step"] in (1, 2)
    # stride policy: valid 40 >= 2*8 -> step 2 (reference 703-707)
    assert s["audio_step"] == 2


def test_dataset_retry_on_bad_clip():
    good = {"video_path": "g", "frames": 40,
            "bboxes": [[0, 0, 60, 60]] * 40}
    bad = {"video_path": "b", "frames": 2, "bboxes": [[0, 0, 1, 1]] * 2}

    def frame_reader(path, idxs):
        if path == "b":
            raise IOError("corrupt")
        return np.zeros((len(idxs), 96, 96, 3), np.uint8)

    ds = D.PortraitAudioDataset(
        [bad, good], D.DataConfig(n_sample_frames=8, image_size=128,
                                  deterministic_shape=True),
        frame_reader,
    )
    s = ds[0]  # falls through to the good clip
    assert s["frames"].shape[0] == 8


def test_dataset_sampling_policy():
    """Stride / start / ref-frame decisions against hand-computed reference
    bounds (``__getitem__`` 703-717; VERDICT r1 item #6)."""
    import random

    # stride: 1 below 2T, 2 at or above
    assert D.clip_stride(40, 25) == 1
    assert D.clip_stride(49, 25) == 1
    assert D.clip_stride(50, 25) == 2
    rng = random.Random(0)
    for _ in range(200):
        drive, src, step = D.sample_clip_indices(rng, s=10, e=80, t=25)
        assert step == 2 and len(drive) == 25
        assert drive[0] >= 10 and drive[-1] <= 79
        assert drive[1] - drive[0] == 2
        assert 10 <= src <= 79          # clamped into the valid clip
    # degenerate: exactly T valid frames -> start pinned at s, stride 1
    drive, src, step = D.sample_clip_indices(rng, s=5, e=30, t=25)
    assert step == 1 and drive == list(range(5, 30)) and 5 <= src <= 29
    with pytest.raises(ValueError):
        D.sample_clip_indices(rng, s=0, e=10, t=25)


def test_dataset_motion_buckets_exact():
    """get_head_exp_motion_bucketid / check_lmk hand-computed cases
    (reference 420-456)."""
    rng = np.random.default_rng(0)
    base = rng.uniform(50, 200, (256, 2))
    # pure translation: expression variance 0, head bucket from the anchor
    lmks = [base + [i * 2.0, 0.0] for i in range(10)]
    head, exp = D.get_head_exp_motion_bucketid(lmks)
    assert exp == 0
    anchors = np.array([l[80] for l in lmks])
    init = base[:102] - base[80]
    scale = np.sqrt(((init.max(0) - init.min(0)) ** 2).sum())
    want_head = int(np.sqrt(((anchors - anchors.mean(0)) ** 2).sum(1)).mean()
                    / scale * 256)
    assert head == min(want_head, 128)

    # constant-velocity landmarks: max/mean velocity ratio == 1 -> 32
    lmks5 = [np.array([[0, 0], [10, 0], [5, 5], [2, 9], [8, 9]], float)
             + i * 3.0 for i in range(25)]
    assert D.check_lmk(lmks5) == 32
    # a single glitched frame in a 25-frame clip must trip the >128 gate
    # (ratio -> ~n/2 for one spike: two big steps inflate the mean too)
    glitch = [l.copy() for l in lmks5]
    glitch[12] = glitch[12] + 500.0
    assert D.check_lmk(glitch) > 128


def test_dataset_blur_sharpen_matches_cv2():
    """_blur_and_sharp parity: median blur and the 3x3 sharpen kernel against
    the cv2 oracle (reference 556-565)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    for k in (3, 5):
        got = D._median_blur(img, k)
        want = cv2.medianBlur(img, k)
        inner = (slice(k // 2, -k // 2), slice(k // 2, -k // 2))
        np.testing.assert_array_equal(got[inner], want[inner])
    kernel = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]])
    want = cv2.filter2D(img, -1, kernel)
    got = D._sharpen(img)
    assert np.abs(got[1:-1, 1:-1].astype(int)
                  - want[1:-1, 1:-1].astype(int)).max() <= 1


def test_dataset_color_transfer_bounds():
    import random

    rng = random.Random(3)
    img = np.full((8, 8, 3), 128, np.uint8)
    seen_change = False
    for _ in range(20):
        out = D.color_transfer(rng, img)
        assert out.shape == img.shape and out.dtype == img.dtype
        # untouched channels stay identical; touched ones stay in range
        assert out.min() >= 0 and out.max() <= 255
        seen_change |= (out != img).any()
    assert seen_change


def test_dataset_audio_window_slicing():
    """slice_audio_window semantics (``get_audio_file`` 632-654): 30 s
    windows, whole-window advance, 4 s backoff near a window end."""
    audio = np.arange(16000 * 70, dtype=np.float32)
    # start inside the first window, away from the end
    win, idx = D.slice_audio_window(audio, 100)
    assert idx == 100 and len(win) == 16000 * 30 and win[0] == 0
    # start beyond one window: advance by 30 s
    win, idx = D.slice_audio_window(audio, 25 * 30 + 10)
    assert idx == 10 and win[0] == 16000 * 30
    # start near the window end: back off 4 s
    win, idx = D.slice_audio_window(audio, 25 * 30 - 20)
    assert idx == 25 * 30 - 20 - 4 * 25
    assert win[0] == 16000 * 4 and len(win) == 16000 * 30


def test_dataset_crop_helpers():
    """crop_resize_img 64-multiples + PIL zero-pad crop; center_crop padded
    square (reference 589-597, 313-331)."""
    img = np.full((100, 80, 3), 200, np.uint8)
    out = D.crop_resize_img(img, (-10, -10, 70, 90), 128.0)
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0
    assert out[0, 0, 0] < 50          # out-of-range region zero-padded
    assert out[out.shape[0] // 2, out.shape[1] // 2, 0] > 150

    sq = D.center_crop(img, (60, 60, 100, 100), scale=1.0)
    assert sq.shape[0] == sq.shape[1]          # square even at the border
    sq17 = D.center_crop(img, (40, 40, 60, 60), scale=1.7)
    assert sq17.shape[0] == sq17.shape[1] == 2 * int(10 * 1.7)


def test_dataset_mouth_union_box():
    lmk = np.zeros((256, 2))
    lmk[102:136] = np.array([[30, 60]]) + np.arange(34)[:, None] * [1, 0.5]
    lmk2 = lmk.copy()
    lmk2[102:136] += [5, -2]
    box = D.mouth_union_box([lmk, lmk2])
    np.testing.assert_allclose(box, [30, 58, 68, 76.5])


def test_pose_draw_skeleton():
    """Skeleton renderer: limbs use the OpenPose palette and dim to 0.6,
    keypoints overdraw at full confidence, hands/face land where expected."""
    from actalker_tpu.frontend import pose_draw as P

    rng = np.random.default_rng(0)
    cand = rng.uniform(0.2, 0.8, (18, 2))
    pose = {
        "bodies": {"candidate": cand,
                   "subset": np.arange(18, dtype=float)[None],
                   "score": np.ones((1, 18))},
        "hands": rng.uniform(0.3, 0.7, (2, 21, 2)),
        "hands_score": np.ones((2, 21)),
        "faces": rng.uniform(0.4, 0.6, (1, 68, 2)),
        "faces_score": np.ones((1, 68)),
    }
    img = P.draw_pose(pose, 128, 96)
    assert img.shape == (3, 128, 96) and img.dtype == np.uint8
    assert img.max() > 200 and (img > 0).mean() > 0.005
    # keypoint 0 disc drawn at (x*w, y*h) in full color [255, 0, 0]
    x, y = int(cand[0, 0] * 96), int(cand[0, 1] * 128)
    assert img[0, y, x] == 255 and img[2, y, x] == 0
    # low-confidence limbs are skipped entirely
    pose["bodies"]["score"] = np.full((1, 18), 0.1)
    pose["hands_score"] = np.zeros((2, 21))
    pose["faces_score"] = np.zeros((1, 68))
    faint = P.draw_pose(pose, 128, 96)
    assert faint.max() <= 26  # only 0.1-alpha keypoint discs remain


def test_pose_rescale_sequence():
    """The polyfit rescale maps a shifted/scaled sequence back onto the
    reference body exactly (it's an affine fit of an affine distortion)."""
    from actalker_tpu.frontend import pose_draw as P

    rng = np.random.default_rng(1)
    ref_body = rng.uniform(0.2, 0.8, (14, 2))
    true_a, true_b = np.array([0.5, 0.5]), np.array([0.2, 0.1])
    detected = [{"bodies": {"candidate": (ref_body - true_b) / true_a,
                            "subset": np.arange(14, dtype=float)[None],
                            "score": np.ones((1, 14))},
                 "faces": (ref_body[None, :4] - true_b) / true_a,
                 "hands": (ref_body[None, :6] - true_b) / true_a}
                for _ in range(3)]
    out = P.rescale_pose_sequence(detected, ref_body, (64, 64), (64, 64))
    np.testing.assert_allclose(out[0]["bodies"]["candidate"], ref_body,
                               atol=1e-8)
    np.testing.assert_allclose(out[1]["faces"][0], ref_body[:4], atol=1e-8)


def test_landmark_estimator_fallback_and_shape():
    """estimate_landmarks always yields (5, 2); on a blank image it degrades
    to the face-box geometry prior; eye points stay inside the box."""
    from actalker_tpu.frontend.enhance import box_to_landmarks
    from actalker_tpu.frontend.landmarks import estimate_landmarks

    blank = np.zeros((96, 96, 3), np.uint8)
    box = (16.0, 16.0, 80.0, 80.0)
    lm = estimate_landmarks(blank, box)
    assert lm.shape == (5, 2)
    np.testing.assert_allclose(lm, box_to_landmarks(box), atol=1e-4)

    textured = (np.random.default_rng(0).uniform(0, 255, (96, 96, 3))
                ).astype(np.uint8)
    lm2 = estimate_landmarks(textured, box)
    assert lm2.shape == (5, 2)
    assert (lm2[:, 0] >= box[0] - 8).all() and (lm2[:, 0] <= box[2] + 8).all()


def test_farneback_recovers_known_translation():
    """Synthetic oracle: a smooth image shifted by an integer (dx, dy) must
    yield flow ~ (dx, dy) in the interior (Farneback semantics of
    motion_estimation_service.py:33)."""
    import jax.numpy as jnp

    from actalker_tpu.frontend.optical_flow import farneback_flow

    r = np.random.default_rng(0)
    base = r.random((80, 96)).astype(np.float32)
    # smooth the noise so the quadratic model holds locally
    k = np.exp(-np.linspace(-3, 3, 13) ** 2 / 2)
    k /= k.sum()
    img = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, base)
    img = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 1, img)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0

    dx, dy = 3, -2
    nxt = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    flow = np.asarray(farneback_flow(jnp.asarray(img), jnp.asarray(nxt)))
    inner = flow[15:-15, 15:-15]
    assert abs(inner[..., 0].mean() - dx) < 0.35, inner[..., 0].mean()
    assert abs(inner[..., 1].mean() - dy) < 0.35, inner[..., 1].mean()


def test_motion_score_orders_by_motion():
    from actalker_tpu.frontend.optical_flow import (
        get_motion_score, magnitude_to_bucket)

    r = np.random.default_rng(1)
    img = r.random((64, 64)).astype(np.float32)
    k = np.exp(-np.linspace(-2, 2, 9) ** 2)
    k /= k.sum()
    img = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, img)
    img = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 1, img)
    img = img / img.max() * 255

    def clip(shift):
        return np.stack([np.roll(img, i * shift, axis=1) for i in range(3)])

    slow, fast = get_motion_score(clip(1)), get_motion_score(clip(5))
    assert get_motion_score(clip(0)[:1]) == 0      # single frame
    assert 0 <= slow < fast <= 255
    assert magnitude_to_bucket(10.0) == 255 and magnitude_to_bucket(-1) == 0


def test_yoloface_landmarks_picks_best_overlap():
    from actalker_tpu.frontend.landmarks import YoloFaceLandmarks

    class FakeDet:
        def detect(self, image_bgr):
            bboxes = np.array([[0, 0, 10, 10], [40, 40, 30, 30]], np.float64)
            kpss = np.stack([np.full((5, 2), 5.0), np.full((5, 2), 55.0)])
            return bboxes, kpss, np.array([0.9, 0.8])

    lmk = YoloFaceLandmarks(FakeDet())
    img = np.zeros((100, 100, 3), np.uint8)
    out = lmk(img, (38.0, 38.0, 75.0, 75.0))
    assert out.shape == (5, 2)
    np.testing.assert_allclose(out, 55.0)


def test_estimate_landmarks_with_custom_estimator():
    from actalker_tpu.frontend.landmarks import estimate_landmarks

    sentinel = np.arange(10, dtype=np.float32).reshape(5, 2)
    out = estimate_landmarks(np.zeros((64, 64, 3), np.uint8),
                             face_box=(0, 0, 64, 64),
                             estimator=lambda img, box: sentinel)
    np.testing.assert_array_equal(out, sentinel)
