"""Directory-level evaluation orchestrator.

Parity target: the reference's shell drivers ``eval/run_eval.sh`` /
``run_faceid.sh`` / ``sync.sh`` plus the per-metric CLIs they chain
(``eval/evaluation.py:286-333`` Sync-C/Sync-D, ``eval/eval_fid.py:109-145``
FID, ``eval/evaluation_faceid.py:187-266`` face-ID cosine,
``utils/video_level_evaluation.py:104-133`` FVD,
``utils/image_level_evaluation.py:12-50`` LPIPS/PSNR/L1) — but as ONE
command emitting structured JSONL instead of hard-coded cluster paths:

    python -m actalker_tpu.evaluation.run_eval \
        --video_dir out/visuals [--ref_video_dir data/gt] \
        [--image_dir data/refs] [--weights_dir pretrained_models/eval] \
        [--out results.jsonl]

Per-clip records carry every metric whose weights are available; missing
weight files degrade that metric to ``null`` with a note (mirroring the
reference's practice of running each metric script only when its checkpoint
exists). A final ``summary`` record aggregates means and the corpus-level
FID/FVD.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _find_clips(d: str) -> List[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.lower().endswith(VIDEO_EXTS))


def _match_by_stem(path: str, directory: Optional[str],
                   exts) -> Optional[str]:
    if not directory:
        return None
    stem = os.path.splitext(os.path.basename(path))[0]
    for ext in exts:
        cand = os.path.join(directory, stem + ext)
        if os.path.exists(cand):
            return cand
    return None


@dataclasses.dataclass
class EvalModels:
    """Lazily-built metric models; each is None when weights are absent."""

    weights_dir: str
    _cache: Dict[str, object] = dataclasses.field(default_factory=dict)

    def _load(self, key, filename, builder):
        if key in self._cache:
            return self._cache[key]
        path = os.path.join(self.weights_dir, filename)
        model = None
        if os.path.exists(path):
            try:
                model = builder(path)
            except Exception as exc:
                print(f"[run_eval] {key} unavailable: {exc}", file=sys.stderr)
        else:
            print(f"[run_eval] {key}: no weights at {path}; metric skipped",
                  file=sys.stderr)
        self._cache[key] = model
        return model

    def sync(self):
        def build(path):
            from actalker_tpu.evaluation.s3fd import S3FD, convert_s3fd
            from actalker_tpu.evaluation.syncnet import convert_syncnet
            from actalker_tpu.io.weights import load_torch_state_dict

            s3fd_path = os.path.join(self.weights_dir, "sfd_face.pth")
            if not os.path.exists(s3fd_path):
                raise FileNotFoundError(s3fd_path)
            sync_params = convert_syncnet(load_torch_state_dict(path))
            s3fd = S3FD(params=convert_s3fd(
                load_torch_state_dict(s3fd_path)))
            return sync_params, s3fd

        return self._load("syncnet", "syncnet_v2.model", build)

    def inception(self):
        def build(path):
            from actalker_tpu.evaluation.inception import (
                convert_fid_inception, make_inception_feature_fn)
            from actalker_tpu.io.weights import load_torch_state_dict

            return make_inception_feature_fn(
                convert_fid_inception(load_torch_state_dict(path)))

        return self._load("fid_inception", "pt_inception-2015-12-05.pth",
                          build)

    def i3d(self):
        def build(path):
            from actalker_tpu.evaluation.i3d import (convert_i3d,
                                                     make_i3d_feature_fn)
            from actalker_tpu.io.weights import load_torch_state_dict

            return make_i3d_feature_fn(
                convert_i3d(load_torch_state_dict(path)))

        return self._load("i3d", "i3d_rgb_charades.pt", build)

    def face_embed(self):
        def build(path):
            import jax

            from actalker_tpu.io.weights import (convert_senet50,
                                                 load_torch_state_dict)
            from actalker_tpu.models.senet import SENet50

            params = convert_senet50(load_torch_state_dict(path))
            model = SENet50()
            import functools
            fn = functools.partial(
                jax.jit(lambda p, x: model.apply(p, x)), params)

            def embed(frames_uint8):
                import jax.numpy as jnp

                from actalker_tpu.models.senet import preprocess_vggface2
                from actalker_tpu.ops.resize import torch_bicubic_resize

                x = jnp.asarray(np.asarray(frames_uint8), jnp.float32)
                x = jnp.moveaxis(x, -1, 1)                   # NCHW
                x = torch_bicubic_resize(x, 224, 224)
                x = np.asarray(jnp.moveaxis(x, 1, -1))
                return np.asarray(fn(jnp.asarray(
                    preprocess_vggface2(x))))

            return embed

        return self._load("senet50", "senet50_ft_weight.pth", build)

    def lpips(self):
        def build(path):
            import jax

            from actalker_tpu.evaluation.lpips import (LPIPSAlex,
                                                       convert_lpips)
            from actalker_tpu.io.weights import load_torch_state_dict

            params = convert_lpips(load_torch_state_dict(path))
            model = LPIPSAlex()
            import functools
            return functools.partial(
                jax.jit(lambda p, a, b: model.apply(p, a, b)), params)

        return self._load("lpips", "lpips_alex.pth", build)


def _read_clip(path: str, limit: Optional[int] = None):
    from actalker_tpu.frontend.video import read_frames

    return read_frames(path, limit=limit)


def _resize_frames01(frames01: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W, 3) float [0,1] -> (T, size, size, 3) (I3D input contract)."""
    import jax.numpy as jnp

    from actalker_tpu.ops.resize import torch_bicubic_resize

    x = jnp.moveaxis(jnp.asarray(frames01), -1, 1)
    x = torch_bicubic_resize(x, size, size)
    return np.clip(np.asarray(jnp.moveaxis(x, 1, -1)), 0.0, 1.0)


def evaluate_clip(path: str, models: EvalModels,
                  ref_video: Optional[str], ref_image: Optional[str],
                  max_frames: int = 500, frames=None, ref_frames=None) -> dict:
    """Score one clip. ``frames``/``ref_frames`` accept already-decoded
    uint8 arrays so a directory run decodes each video only once."""
    rec: dict = {"clip": os.path.basename(path)}

    sync = models.sync()
    if sync is not None:
        from actalker_tpu.evaluation.sync_eval import evaluate_sync

        try:
            tracks = evaluate_sync(path, sync[0], sync[1],
                                   max_frames=max_frames)
            if tracks:
                # reference reports the confidence-weighted best track
                off, conf, dist = max(tracks, key=lambda t: t[1])
                rec.update(sync_offset=int(off), sync_c=round(float(conf), 4),
                           sync_d=round(float(dist), 4))
            else:
                rec.update(sync_offset=None, sync_c=None, sync_d=None,
                           sync_note="no face track")
        except Exception as exc:
            rec.update(sync_c=None, sync_d=None, sync_note=str(exc))
    else:
        rec.update(sync_c=None, sync_d=None)

    if frames is None:
        frames = _read_clip(path, limit=max_frames)
    rec["frames"] = int(len(frames))

    embed = models.face_embed()
    if embed is not None and ref_image is not None:
        from PIL import Image

        from actalker_tpu.evaluation.metrics import identity_cosine

        ref = np.asarray(Image.open(ref_image).convert("RGB"))
        step = max(1, len(frames) // 32)
        rec["id_cosine"] = round(
            identity_cosine(ref, frames[::step], embed), 4)
    else:
        rec["id_cosine"] = None

    if ref_video is not None:
        from actalker_tpu.evaluation.metrics import l1 as l1_m
        from actalker_tpu.evaluation.metrics import psnr as psnr_m

        if ref_frames is None:
            ref_frames = _read_clip(ref_video, limit=max_frames)
        n = min(len(frames), len(ref_frames))
        if n and frames.shape[1:] == ref_frames.shape[1:]:
            a = frames[:n].astype(np.float32) / 255.0
            b = ref_frames[:n].astype(np.float32) / 255.0
            rec["psnr"] = round(psnr_m(a, b), 4)
            rec["l1"] = round(l1_m(a, b), 6)
            lp = models.lpips()
            if lp is not None:
                step = max(1, n // 16)
                d = np.asarray(lp(a[::step] * 2 - 1, b[::step] * 2 - 1))
                rec["lpips"] = round(float(np.mean(d)), 4)
    return rec


def run(video_dir: str, ref_video_dir: Optional[str],
        image_dir: Optional[str], weights_dir: str, out_path: str,
        max_frames: int = 500, fid_frames_per_clip: int = 16) -> List[dict]:
    clips = _find_clips(video_dir)
    if not clips:
        raise SystemExit(f"no video clips found in {video_dir}")
    models = EvalModels(weights_dir)
    records = []
    fake_frames, real_frames = [], []
    fake_clips, real_clips = [], []

    for path in clips:
        ref_video = _match_by_stem(path, ref_video_dir, VIDEO_EXTS)
        ref_image = _match_by_stem(path, image_dir, IMAGE_EXTS)
        f = _read_clip(path, limit=max_frames)
        r = (_read_clip(ref_video, limit=max_frames)
             if ref_video is not None else None)
        rec = evaluate_clip(path, models, ref_video, ref_image, max_frames,
                            frames=f, ref_frames=r)
        records.append(rec)
        print(json.dumps(rec))

        if ref_video is not None and (models.inception() is not None
                                      or models.i3d() is not None):
            step = max(1, len(f) // fid_frames_per_clip)
            # inception/i3d feature fns take float [0,1] frames; a common
            # size lets metrics.fid stack frames across clips
            fake_frames.extend(
                _resize_frames01(f[::step].astype(np.float32) / 255.0, 299))
            real_frames.extend(
                _resize_frames01(r[::step].astype(np.float32) / 255.0, 299))
            if len(f) >= 16 and len(r) >= 16:
                fake_clips.append(
                    _resize_frames01(f[:16].astype(np.float32) / 255.0, 224))
                real_clips.append(
                    _resize_frames01(r[:16].astype(np.float32) / 255.0, 224))

    summary: dict = {"summary": True, "clips": len(records)}
    for key in ("sync_c", "sync_d", "id_cosine", "psnr", "l1", "lpips"):
        vals = [r[key] for r in records if r.get(key) is not None]
        summary[key] = round(float(np.mean(vals)), 4) if vals else None

    inc = models.inception()
    if inc is not None and fake_frames:
        from actalker_tpu.evaluation.metrics import fid as fid_m

        summary["fid"] = round(fid_m(real_frames, fake_frames, inc), 4)
    i3d = models.i3d()
    if i3d is not None and fake_clips:
        from actalker_tpu.evaluation.metrics import fvd as fvd_m

        summary["fvd"] = round(
            fvd_m(np.stack(real_clips), np.stack(fake_clips), i3d), 4)
    records.append(summary)
    print(json.dumps(summary))

    with open(out_path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return records


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Score a directory of generated clips "
                    "(reference eval/run_eval.sh equivalent)")
    ap.add_argument("--video_dir", required=True,
                    help="generated clips to score")
    ap.add_argument("--ref_video_dir", default=None,
                    help="ground-truth clips (same stems) for "
                         "FID/FVD/PSNR/L1/LPIPS")
    ap.add_argument("--image_dir", default=None,
                    help="source reference images (same stems) for face-ID")
    ap.add_argument("--weights_dir", default="pretrained_models/eval",
                    help="directory holding syncnet_v2.model, sfd_face.pth, "
                         "pt_inception-2015-12-05.pth, i3d_rgb_charades.pt, "
                         "senet50_ft_weight.pth, lpips_alex.pth")
    ap.add_argument("--out", default="eval_results.jsonl")
    ap.add_argument("--max_frames", type=int, default=500)
    args = ap.parse_args(argv)
    run(args.video_dir, args.ref_video_dir, args.image_dir,
        args.weights_dir, args.out, args.max_frames)


if __name__ == "__main__":
    main()
