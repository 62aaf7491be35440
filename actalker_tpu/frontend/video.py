"""Host-side video IO.

Preferred backend: the native libav runtime (``runtime/media.cpp`` via
``media_native``) — the TPU-native replacement for the reference's ffmpeg
subprocess usage (``src/utils/ffmpeg_utils.py``, ``Inference.py:360``; this
image ships FFmpeg *libraries* but no binary). Fallbacks: the ffmpeg binary
if present, then OpenCV for reading.
"""
from __future__ import annotations

import shutil
import subprocess
from typing import Optional

import numpy as np

from actalker_tpu.frontend import media_native

_HAVE_FFMPEG_BIN = shutil.which("ffmpeg") is not None


def get_fps(path: str) -> float:
    if media_native.lib() is not None:
        return media_native.video_info(path)[2]
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        return cap.get(cv2.CAP_PROP_FPS)
    finally:
        cap.release()


def read_frames(path: str, limit: Optional[int] = None) -> np.ndarray:
    """(F, H, W, 3) uint8 RGB frames."""
    if media_native.lib() is not None:
        return media_native.read_video(path, limit=limit)
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])
        if limit and len(frames) >= limit:
            break
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames decoded from {path}")
    return np.stack(frames)


def write_video(path: str, frames: np.ndarray, fps: float = 12.5,
                crf: int = 17, audio_path: Optional[str] = None) -> None:
    """frames: (F, H, W, 3) uint8 or float [0,1]; H.264 crf 17 like the
    reference writer (``ffmpeg_utils.py:40-44``) + optional AAC audio mux."""
    if media_native.lib() is not None:
        media_native.write_video(path, frames, fps=fps, crf=crf,
                                 audio_path=audio_path)
        return
    if not _HAVE_FFMPEG_BIN:
        raise RuntimeError(
            "no video encoder available: build runtime/libactalker_media.so "
            "(make -C runtime) or install ffmpeg"
        )
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).round().astype(np.uint8)
    f, h, w, _ = frames.shape
    cmd = ["ffmpeg", "-nostdin", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
           "-s", f"{w}x{h}", "-r", str(fps), "-i", "-"]
    if audio_path:
        cmd += ["-i", audio_path, "-c:a", "aac", "-shortest"]
    cmd += ["-c:v", "libx264", "-crf", str(crf), "-pix_fmt", "yuv420p", path]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)
    proc.stdin.write(frames.tobytes())
    proc.stdin.close()
    proc.wait()
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg failed writing {path}")
