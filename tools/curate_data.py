#!/usr/bin/env python3
"""Training-data curation: raw videos -> clip metadata JSON.

Parity target: the reference's data-curation tree (``utils/data_preprocess.py``
— YOLO person/face detection + SAM-assisted cropping — and the quality gating
baked into ``src/dataset/portrait_audio_dataset_arcface_vasa.py``: bboxes,
landmarks, quality/similarity scores per clip). This tool produces exactly the
clip records ``actalker_tpu.training.data.load_metadata`` consumes:

    {"video_path", "audio_path", "frames", "fps",
     "bboxes": [[x1, y1, x2, y2] per frame],
     "landmarks": [[[x, y] x 5] per frame],
     "quality": float,            # sharpness x face-coverage gate
     "motion_bucket": int}        # Farneback flow score

Detection is pluggable like the inference frontend: the Viola-Jones cascade
ships with the image; pass ``--yoloface <converted.npz>`` to use the flax
YOLOv5-face detector (landmarks included). SAM-style matting and FLUX
synthetic-portrait generation (``utils/flux_img.py``) depend on external
model weights; when absent this tool performs box-crop curation only, which
is the part the training pipeline requires.

Usage:
    python tools/curate_data.py OUT.json VIDEO [VIDEO...] [--stride 1]
        [--max-frames 300] [--min-quality 20.0] [--yoloface WEIGHTS.npz]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def laplacian_sharpness(gray: np.ndarray) -> float:
    """Variance of the Laplacian — the standard blur gate."""
    lap = (-4.0 * gray[1:-1, 1:-1] + gray[:-2, 1:-1] + gray[2:, 1:-1]
           + gray[1:-1, :-2] + gray[1:-1, 2:])
    return float(lap.var())


def curate_video(path: str, detector, landmarker, stride: int = 1,
                 max_frames: int = 300) -> dict | None:
    from actalker_tpu.frontend import video as video_io
    from actalker_tpu.frontend.enhance import box_to_landmarks
    from actalker_tpu.training.data import motion_bucket_from_flow

    frames = video_io.read_frames(path, limit=max_frames * stride)[::stride]
    if len(frames) < 2:
        return None
    bboxes, landmarks, quality = [], [], []
    h, w = frames[0].shape[:2]
    for fr in frames:
        box = detector(fr) if detector is not None else None
        if box is None:
            box = (0.0, 0.0, float(w), float(h))
        bboxes.append([float(v) for v in box])
        lm = (landmarker(fr, box) if landmarker is not None
              else box_to_landmarks(box))
        landmarks.append(np.asarray(lm, np.float32).tolist())
        x1, y1, x2, y2 = box
        crop = fr[int(max(0, y1)):int(min(h, y2)),
                  int(max(0, x1)):int(min(w, x2))]
        if crop.size == 0:
            quality.append(0.0)
            continue
        gray = (0.299 * crop[..., 0] + 0.587 * crop[..., 1]
                + 0.114 * crop[..., 2])
        coverage = (x2 - x1) * (y2 - y1) / float(h * w)
        quality.append(laplacian_sharpness(gray) * min(1.0, 4.0 * coverage))
    try:
        bucket = int(motion_bucket_from_flow(frames[: min(len(frames), 16)]))
    except Exception:
        bucket = 0
    return {
        "video_path": os.path.abspath(path),
        "audio_path": os.path.abspath(path),    # muxed audio track
        "frames": len(frames),
        "fps": float(video_io.get_fps(path)) / stride,
        "bboxes": bboxes,
        "landmarks": landmarks,
        "quality": float(np.median(quality)),
        "motion_bucket": bucket,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out")
    ap.add_argument("videos", nargs="+")
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--max-frames", type=int, default=300)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--yoloface", default=None,
                    help="converted yolov5-face params (.npz) for detection"
                         " + landmarks; default: Viola-Jones cascade")
    args = ap.parse_args(argv)

    from actalker_tpu.frontend.face import detect_face
    detector = lambda img: detect_face(img)  # noqa: E731
    landmarker = None
    if args.yoloface:
        from actalker_tpu.models.yoloface import YoloFaceDetector

        raw = np.load(args.yoloface, allow_pickle=True)
        det = YoloFaceDetector(params=raw["params"].item()
                               if "params" in raw else dict(raw))

        # ONE network pass per frame: detect() returns boxes + landmarks
        # together (frames are RGB; the detector wants BGR).
        _cache = {}

        def _detect_once(img_rgb):
            key = id(img_rgb)
            if key not in _cache:
                _cache.clear()
                _cache[key] = det.detect(img_rgb[..., ::-1])
            return _cache[key]

        def detector(img_rgb):  # noqa: F811
            bboxes, _, scores = _detect_once(img_rgb)
            if len(bboxes) == 0:
                return None
            x, y, w, h = bboxes[np.argmax(scores)]
            return (float(x), float(y), float(x + w), float(y + h))

        def landmarker(img_rgb, box):
            bboxes, kpss, scores = _detect_once(img_rgb)
            if len(bboxes) == 0:
                raise RuntimeError("no face")
            x1, y1, x2, y2 = box
            bx1, by1 = bboxes[:, 0], bboxes[:, 1]
            bx2, by2 = bx1 + bboxes[:, 2], by1 + bboxes[:, 3]
            iw = np.maximum(0, np.minimum(bx2, x2) - np.maximum(bx1, x1))
            ih = np.maximum(0, np.minimum(by2, y2) - np.maximum(by1, y1))
            return kpss[int(np.argmax(iw * ih * scores))].astype(np.float32)

    clips, dropped = [], 0
    for path in args.videos:
        try:
            rec = curate_video(path, detector, landmarker,
                               stride=args.stride,
                               max_frames=args.max_frames)
        except Exception as e:  # curation is best-effort per clip
            print(f"skip {path}: {e}")
            rec = None
        if rec is None or rec["quality"] < args.min_quality:
            dropped += 1
            continue
        clips.append(rec)
    with open(args.out, "w") as f:
        json.dump(clips, f)
    print(f"wrote {len(clips)} clips to {args.out} ({dropped} dropped)")


if __name__ == "__main__":
    main()
