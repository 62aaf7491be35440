"""Directory-level eval runner (reference ``eval/run_eval.sh`` equivalent,
VERDICT round-1 item #10): one command scores a clip directory to JSONL,
degrading gracefully per metric when weights are absent."""
import json
import os

import numpy as np
import pytest

from actalker_tpu.evaluation import run_eval as R


def _write_clip(path, seed, frames=20, size=64):
    from actalker_tpu.frontend.video import write_video

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (1, size, size, 3), np.uint8)
    drift = (np.arange(frames) % 7)[:, None, None, None]
    clip = np.clip(base.astype(np.int32) + drift * 3, 0, 255).astype(np.uint8)
    write_video(path, clip, fps=25.0)


@pytest.fixture(scope="module")
def clip_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_clips")
    gen, ref = root / "gen", root / "ref"
    gen.mkdir(), ref.mkdir()
    try:
        for i in range(2):
            _write_clip(str(gen / f"clip{i}.mp4"), seed=i)
            _write_clip(str(ref / f"clip{i}.mp4"), seed=i)
    except RuntimeError as exc:  # no encoder on this box
        pytest.skip(str(exc))
    return str(gen), str(ref)


def test_runner_no_weights_paired(clip_dirs, tmp_path):
    gen, ref = clip_dirs
    out = str(tmp_path / "results.jsonl")
    records = R.run(gen, ref, None, str(tmp_path / "nowhere"), out)
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3  # 2 clips + summary
    assert lines == records
    clip_recs = [r for r in records if not r.get("summary")]
    assert all(r["sync_c"] is None for r in clip_recs)  # no syncnet weights
    assert all(r["id_cosine"] is None for r in clip_recs)
    # paired pixel metrics need no weights; same-seed pairs are similar
    # (lossy encode => not bit-identical, but PSNR must be high)
    assert all(r["psnr"] > 25 for r in clip_recs)
    assert all(r["l1"] < 0.1 for r in clip_recs)
    summary = records[-1]
    assert summary["summary"] and summary["clips"] == 2
    assert summary["psnr"] > 25 and summary.get("fid") is None


def test_runner_unpaired(clip_dirs, tmp_path):
    gen, _ = clip_dirs
    out = str(tmp_path / "r.jsonl")
    records = R.run(gen, None, None, str(tmp_path / "nowhere"), out)
    clip_recs = [r for r in records if not r.get("summary")]
    assert all("psnr" not in r for r in clip_recs)
    assert records[-1]["clips"] == 2


def test_match_by_stem(tmp_path):
    (tmp_path / "a.png").write_bytes(b"x")
    assert R._match_by_stem("/v/a.mp4", str(tmp_path), R.IMAGE_EXTS) \
        == str(tmp_path / "a.png")
    assert R._match_by_stem("/v/b.mp4", str(tmp_path), R.IMAGE_EXTS) is None
    assert R._match_by_stem("/v/a.mp4", None, R.IMAGE_EXTS) is None
