"""Side-by-side composer (eval/concate.py parity surface)."""
import numpy as np
import pytest

from actalker_tpu.evaluation import compose
from actalker_tpu.frontend import media_native, video as video_io


def _can_write():
    return media_native.lib() is not None


def _clip(tmp_path, name, f=6, h=32, w=24, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (f, h, w, 3), dtype=np.uint8)
    path = str(tmp_path / name)
    video_io.write_video(path, frames, fps=8.0)
    return path, frames


def test_resize_identity_and_shape():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    same = compose._resize(img, 4, 6)
    np.testing.assert_array_equal(same, img)
    up = compose._resize(img, 8, 12)
    assert up.shape == (8, 12, 3)


@pytest.mark.skipif(not _can_write(), reason="native media runtime unavailable")
def test_concat_video_with_image(tmp_path):
    path, frames = _clip(tmp_path, "gen.mp4")
    image = np.full((16, 16, 3), 200, np.uint8)
    out = str(tmp_path / "side.mp4")
    comp = compose.concat_video_with_image(path, image, out)
    f, h, w = frames.shape[:3]
    assert comp.shape == (f, h, 2 * w, 3)
    # left half is the (resized) still on every frame
    assert np.ptp(comp[:, :, :w].reshape(f, -1), axis=0).max() == 0
    got = video_io.read_frames(out)
    assert got.shape[1:3] == (h, 2 * w)


@pytest.mark.skipif(not _can_write(), reason="native media runtime unavailable")
def test_concat_videos_resizes_to_first(tmp_path):
    p1, f1 = _clip(tmp_path, "a.mp4", f=5, h=32, w=24, seed=1)
    p2, f2 = _clip(tmp_path, "b.mp4", f=7, h=16, w=16, seed=2)
    out = str(tmp_path / "cmp.mp4")
    comp = compose.concat_videos([p1, p2], out)
    assert comp.shape[0] == 5 and comp.shape[1] == 32
    assert comp.shape[2] == 24 + int(round(16 * 32 / 16))
