"""Training data pipeline (ParentDataset semantics, host-side numpy).

Parity target: ``src/dataset/portrait_audio_dataset_arcface_vasa.py`` —
JSON-metadata video-clip dataset: random clip/stride sampling (stride 1-2,
T frames), random reference frame, union face/mouth/exp box masks over the
clip, random scale/aspect/size augmentation, color jitter, per-clip whisper
audio features, ArcFace head crop, VASA face/pose crops, landmark/flow motion
buckets with quality-gate resampling, and retry-on-exception (``__getitem__``
670-845, ``get_head_exp_motion_bucketid`` 420-446, retry 841-845).

This implementation is a clean-room host pipeline: it consumes per-clip
metadata dicts (paths + per-frame bboxes/landmarks + quality scores),
produces numpy sample dicts ready for VAE/encoder preprocessing into
``TrainBatch``; exceptions resample a random index like the reference.
"""
from __future__ import annotations

import dataclasses
import json
import random
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from actalker_tpu.frontend.preprocess import (
    process_bbox,
    resize_image,
)


@dataclasses.dataclass
class DataConfig:
    n_sample_frames: int = 25
    image_size: int = 512
    area: float = 1.25
    max_stride: int = 2
    motion_bucket_max: int = 128
    color_jitter: float = 0.1
    min_quality: float = 0.0
    retry: int = 5


def load_metadata(json_paths: Sequence[str]) -> List[Dict[str, Any]]:
    """Each JSON holds a list of clip records:
    {video_path, audio_path?, frames, bboxes [[x1,y1,x2,y2]...],
     landmarks?, quality?, similarity?}."""
    clips = []
    for p in json_paths:
        with open(p) as f:
            data = json.load(f)
        clips.extend(data if isinstance(data, list) else data.get("clips", []))
    return clips


def union_box_masks(bboxes: np.ndarray, height: int, width: int,
                    area: float) -> Dict[str, np.ndarray]:
    """Union of per-frame area-expanded face boxes over the clip -> the
    pose/mouth/exp mask triplet (the reference unions them so the masks are
    static within a training clip, 725-735)."""
    x1 = bboxes[:, 0].min()
    y1 = bboxes[:, 1].min()
    x2 = bboxes[:, 2].max()
    y2 = bboxes[:, 3].max()
    ww, hh = (x2 - x1) * area, (y2 - y1) * area
    cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
    bx1, by1 = max(cx - ww // 2, 0), max(cy - hh // 2, 0)
    bx2, by2 = min(cx + ww // 2, width), min(cy + hh // 2, height)
    pose = np.zeros((height, width), np.float32)
    pose[int(by1):int(by2), int(bx1):int(bx2)] = 1.0
    mouth = np.zeros_like(pose)
    mouth[(int(by1) + int(by2) // 2):int(by2), int(bx1):int(bx2)] = 1.0
    exp = pose - mouth
    return {"pose": pose, "mouth": mouth, "exp": exp}


def motion_bucket_from_landmarks(landmarks: np.ndarray, max_value: int = 128
                                 ) -> int:
    """Landmark-displacement motion bucket (``get_motion_bucketid`` family):
    mean per-frame landmark displacement, scaled; clips above max_value are
    resampled by the caller."""
    if len(landmarks) < 2:
        return 0
    d = np.linalg.norm(np.diff(landmarks.astype(np.float64), axis=0), axis=-1)
    return int(min(d.mean() * 8.0, max_value))


def motion_bucket_from_flow(frames: np.ndarray, max_value: int = 255) -> int:
    """Farneback optical-flow motion bucket
    (``motion_estimation_service.py:113-129``): per-pair mean flow magnitude
    * 0.1, maxed over pairs, mapped to 0..255 and clamped to ``max_value``."""
    from actalker_tpu.frontend.optical_flow import get_motion_score

    if len(frames) < 2:
        return 0
    return min(get_motion_score(frames), max_value)


class PortraitAudioDataset:
    """Map-style dataset over clip metadata; ``frame_reader(path, idxs)`` and
    ``audio_reader(path)`` are injected so tests can fake media IO."""

    def __init__(
        self,
        clips: List[Dict[str, Any]],
        config: DataConfig,
        frame_reader: Callable[[str, Sequence[int]], np.ndarray],
        audio_feature_reader: Optional[Callable[[str], np.ndarray]] = None,
        rng: Optional[random.Random] = None,
    ):
        self.clips = clips
        self.cfg = config
        self.frame_reader = frame_reader
        self.audio_feature_reader = audio_feature_reader
        self.rng = rng or random.Random(0)

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        for _ in range(self.cfg.retry):
            try:
                sample = self._load(index)
                if sample is not None:
                    return sample
            except Exception:
                pass
            index = self.rng.randrange(len(self.clips))
        raise RuntimeError("dataset retries exhausted")

    def _load(self, index: int) -> Optional[Dict[str, Any]]:
        cfg = self.cfg
        clip = self.clips[index]
        n_frames = int(clip["frames"])
        t = cfg.n_sample_frames
        if n_frames < t + 1:
            return None
        if clip.get("quality", 1.0) < cfg.min_quality:
            return None  # quality gate -> resample (reference 776-786)

        stride = self.rng.randint(1, cfg.max_stride)
        max_start = n_frames - t * stride
        if max_start <= 0:
            stride = 1
            max_start = n_frames - t
        start = self.rng.randrange(max(max_start, 1))
        idxs = [start + i * stride for i in range(t)]
        ref_idx = self.rng.randrange(n_frames)

        frames = self.frame_reader(clip["video_path"], idxs)
        ref_frame = self.frame_reader(clip["video_path"], [ref_idx])[0]
        h, w = frames.shape[1:3]

        bboxes = np.asarray(clip["bboxes"], np.float32)
        clip_boxes = bboxes[idxs] if len(bboxes) == n_frames else \
            np.tile(bboxes[:1], (t, 1))
        masks = union_box_masks(clip_boxes, h, w, cfg.area)

        # random square crop around the union box + resize (scale/aspect aug)
        bx = [clip_boxes[:, 0].min(), clip_boxes[:, 1].min(),
              clip_boxes[:, 2].max(), clip_boxes[:, 3].max()]
        expand = self.rng.uniform(0.6, 1.2)
        sq = process_bbox(bx, expand, h, w)
        x1, y1, x2, y2 = [int(max(v, 0)) for v in sq]
        x2, y2 = min(x2, w), min(y2, h)
        if x2 - x1 < 32 or y2 - y1 < 32:
            x1, y1, x2, y2 = 0, 0, w, h

        def crop_resize(img):
            c = img[y1:y2, x1:x2]
            return resize_image(c, (cfg.image_size, cfg.image_size))

        frames = np.stack([crop_resize(f) for f in frames])
        ref_frame = crop_resize(ref_frame)
        mask_triplet = {
            k: resize_image((v[y1:y2, x1:x2] * 255).astype(np.uint8),
                            (cfg.image_size, cfg.image_size)).astype(np.float32)
            / 255.0
            for k, v in masks.items()
        }

        # color jitter on the clip (brightness/contrast)
        if cfg.color_jitter:
            b = 1.0 + self.rng.uniform(-cfg.color_jitter, cfg.color_jitter)
            frames = np.clip(frames.astype(np.float32) * b, 0, 255)

        mb_lmk = motion_bucket_from_landmarks(
            np.asarray(clip.get("landmarks", [[[0, 0]]] * n_frames),
                       np.float32)[idxs], cfg.motion_bucket_max,
        )
        mb_flow = motion_bucket_from_flow(frames, cfg.motion_bucket_max)
        if mb_flow >= cfg.motion_bucket_max:
            return None  # drop high-motion clips (reference resamples)

        audio = None
        if self.audio_feature_reader and clip.get("audio_path"):
            audio = self.audio_feature_reader(clip["audio_path"])

        return {
            "frames": frames.astype(np.float32) / 127.5 - 1.0,
            "ref_frame": ref_frame.astype(np.float32) / 127.5 - 1.0,
            "pose_mask": mask_triplet["pose"],
            "mouth_mask": mask_triplet["mouth"],
            "exp_mask": mask_triplet["exp"],
            "motion_bucket": mb_flow,
            "motion_bucket_exp": mb_lmk,
            "audio_features": audio,
            "frame_indices": idxs,
        }
