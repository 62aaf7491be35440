"""Data-curation tool -> training metadata roundtrip."""
import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from actalker_tpu.frontend import media_native, video as video_io  # noqa: E402


@pytest.mark.skipif(media_native.lib() is None,
                    reason="native media runtime unavailable")
def test_curate_to_load_metadata_roundtrip(tmp_path):
    import curate_data
    from actalker_tpu.training.data import load_metadata

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 48, 40, 3), dtype=np.uint8)
    vid = str(tmp_path / "clip.mp4")
    video_io.write_video(vid, frames, fps=8.0)
    out = str(tmp_path / "meta.json")
    curate_data.main([out, vid, "--stride", "1"])
    clips = load_metadata([out])
    assert len(clips) == 1
    rec = clips[0]
    assert rec["frames"] >= 2
    assert len(rec["bboxes"]) == rec["frames"]
    assert len(rec["landmarks"][0]) == 5
    assert rec["quality"] >= 0.0
    assert 0 <= rec["motion_bucket"] <= 128


def test_laplacian_sharpness_orders_blur():
    import curate_data

    rng = np.random.default_rng(1)
    sharp = rng.random((32, 32)) * 255
    blurry = np.full((32, 32), 128.0)
    assert curate_data.laplacian_sharpness(sharp) > \
        curate_data.laplacian_sharpness(blurry)
