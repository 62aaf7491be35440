"""ctypes bindings to the native media runtime (runtime/libactalker_media.so,
libavformat/libavcodec-backed). See runtime/media.cpp."""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None


def lib():
    global _LIB
    if _LIB is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "runtime", "libactalker_media.so",
        )
        try:
            L = ctypes.CDLL(path)
        except OSError:
            _LIB = False
            return None
        L.decode_audio_f32.restype = ctypes.c_int64
        L.decode_audio_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        L.actalker_free.argtypes = [ctypes.c_void_p]
        L.video_info.restype = ctypes.c_int
        L.video_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        L.read_video_rgb.restype = ctypes.c_int64
        L.read_video_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int,
        ]
        L.write_video_rgb.restype = ctypes.c_int
        L.write_video_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_char_p,
        ]
        _LIB = L
    return _LIB or None


def decode_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    L = lib()
    if L is None:
        raise RuntimeError("native media library not built (make -C runtime)")
    out = ctypes.POINTER(ctypes.c_float)()
    n = L.decode_audio_f32(path.encode(), sample_rate, ctypes.byref(out))
    if n < 0:
        raise RuntimeError(f"audio decode failed ({n}): {path}")
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    L.actalker_free(out)
    return arr


def video_info(path: str) -> Tuple[int, int, float, int]:
    L = lib()
    if L is None:
        raise RuntimeError("native media library not built")
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    n = ctypes.c_int64()
    if L.video_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(fps), ctypes.byref(n)) != 0:
        raise RuntimeError(f"video probe failed: {path}")
    return w.value, h.value, fps.value, n.value


def read_video(path: str, limit: Optional[int] = None) -> np.ndarray:
    L = lib()
    if L is None:
        raise RuntimeError("native media library not built")
    w, h, _, nframes = video_info(path)
    cap = limit or (nframes if nframes > 0 else 1 << 16)
    stride_w = (w + 15) // 16 * 16  # sws_scale writes aligned row tails
    buf = np.empty((cap, h, stride_w, 3), np.uint8)
    got = L.read_video_rgb(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, stride_w,
    )
    if got < 0:
        raise RuntimeError(f"video decode failed: {path}")
    return np.ascontiguousarray(buf[:got, :, :w])


def write_video(path: str, frames: np.ndarray, fps: float = 12.5,
                crf: int = 17, audio_path: Optional[str] = None) -> None:
    L = lib()
    if L is None:
        raise RuntimeError("native media library not built")
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).round().astype(np.uint8)
    frames = np.ascontiguousarray(frames)
    n, h, w, _ = frames.shape
    r = L.write_video_rgb(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, w, h, float(fps), int(crf),
        audio_path.encode() if audio_path else b"",
    )
    if r != 0:
        raise RuntimeError(f"video encode failed ({r}): {path}")
