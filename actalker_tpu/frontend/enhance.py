"""Blind face restoration (BFR) glue: align -> GPEN -> inverse warp -> blend.

Parity target: ``src/utils/enhance/bfr_enhance.py`` + the call site in
``test_preprocess.py:286-304``: estimate a 5-point similarity transform to
the 512x512 mean-face template (``get_custom_affine_transform_512``'s
least-squares solve), enhance the aligned crop with the StyleGAN2/GPEN
generator (``models/stylegan2.py``), warp back, and composite with a
feathered rectangle mask, averaging with the original.

Without detector landmarks, 5 pseudo-landmarks are derived from the face box
(the reference does the same when alignment models are missing,
``test_preprocess.py:295``).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from actalker_tpu.models.stylegan2 import feathered_box_mask

# 512px mean-face 5-point template (reference ``test_preprocess.py:19-25``)
MEAN_FACE_5P = np.array(
    [
        [(30.2946 + 8) * 2 + 16, 51.6963 * 2],
        [(65.5318 + 8) * 2 + 16, 51.5014 * 2],
        [(48.0252 + 8) * 2 + 16, 71.7366 * 2],
        [(33.5493 + 8) * 2 + 16, 92.3655 * 2],
        [(62.7299 + 8) * 2 + 16, 92.2041 * 2],
    ],
    dtype=np.float32,
) * 2.0  # template is defined for 256; reference doubles into 512


def box_to_landmarks(box: Tuple[float, float, float, float]) -> np.ndarray:
    """Face box -> 5 pseudo-landmarks (eyes, nose, mouth corners)."""
    x1, y1, x2, y2 = box
    w, h = x2 - x1, y2 - y1
    return np.array(
        [
            [x1 + 0.3 * w, y1 + 0.4 * h],
            [x1 + 0.7 * w, y1 + 0.4 * h],
            [x1 + 0.5 * w, y1 + 0.55 * h],
            [x1 + 0.35 * w, y1 + 0.7 * h],
            [x1 + 0.65 * w, y1 + 0.7 * h],
        ],
        np.float32,
    )


def similarity_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity (rotation+scale+translation) src -> dst as a
    2x3 affine matrix (the reference's normal-equations solve,
    ``get_custom_affine_transform_512``)."""
    src = src.astype(np.float64)
    dst = dst.astype(np.float64)
    n = len(src)
    sxx = (src**2).sum()
    sx = src[:, 0].sum()
    sy = src[:, 1].sum()
    b0 = (src[:, 0] * dst[:, 0] + src[:, 1] * dst[:, 1]).sum()
    b1 = (src[:, 0] * dst[:, 1] - src[:, 1] * dst[:, 0]).sum()
    A = np.array([
        [sxx, 0, sx, sy],
        [0, sxx, -sy, sx],
        [sx, -sy, n, 0],
        [sy, sx, 0, n],
    ])
    b = np.array([b0, b1, dst[:, 0].sum(), dst[:, 1].sum()])
    a, bb, tx, ty = np.linalg.lstsq(A, b, rcond=None)[0]
    return np.array([[a, -bb, tx], [bb, a, ty]], np.float32)


def enhance_face(
    image: np.ndarray,                       # (H, W, 3) uint8 RGB
    box: Tuple[float, float, float, float],
    generator_fn: Callable[[np.ndarray], np.ndarray],
    blend_with_original: bool = True,
    landmarks: Optional[np.ndarray] = None,  # (5, 2); box prior if None
) -> np.ndarray:
    """Run BFR on the face region; ``generator_fn`` maps a (1, 512, 512, 3)
    [-1, 1] crop to the restored crop (e.g. a jitted GPENGenerator apply).
    Pass real 5-point ``landmarks`` (``frontend/landmarks.py``) for tighter
    alignment; otherwise the face-box geometry prior is used."""
    import cv2

    h, w = image.shape[:2]
    lm = box_to_landmarks(box) if landmarks is None else np.asarray(landmarks)
    mat = similarity_transform(lm, MEAN_FACE_5P / 2.0 * 2.0)
    crop = cv2.warpAffine(image, mat, (512, 512), flags=cv2.INTER_CUBIC)
    x = crop.astype(np.float32) / 127.5 - 1.0
    restored = np.asarray(generator_fn(x[None]))[0]
    restored = np.clip((restored + 1.0) * 127.5, 0, 255).astype(np.uint8)

    back = image.copy()
    cv2.warpAffine(
        restored, mat, (w, h), dst=back,
        flags=cv2.INTER_CUBIC | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_TRANSPARENT,
    )
    mask = feathered_box_mask(512)
    mask_full = np.zeros((h, w), np.float32)
    cv2.warpAffine(
        mask, mat, (w, h), dst=mask_full,
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_TRANSPARENT,
    )
    out = (image.astype(np.float32) * (1 - mask_full[..., None])
           + back.astype(np.float32) * mask_full[..., None])
    if blend_with_original:  # the reference averages with the input
        out = (out + image.astype(np.float32)) / 2.0
    return out.round().astype(np.uint8)


def enhance_teeth(
    image: np.ndarray,                       # (H, W, 3) uint8 RGB
    mouth_box: Tuple[float, float, float, float],
    teeth_fn: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
) -> np.ndarray:
    """Teeth enhancement on the mouth region: square-crop the mouth box,
    run the enhancer ((1, h, w, 3) [-1, 1] -> (rgb, alpha) at 512), and
    alpha-composite the result back (the network's alpha matte gates the
    edit — ``enhance_teeth_pnnx.py`` forward v_205-v_209 output pair)."""
    import cv2

    h, w = image.shape[:2]
    x1, y1, x2, y2 = mouth_box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    half = max(x2 - x1, y2 - y1) / 2 * 1.2
    x1, x2 = int(max(0, cx - half)), int(min(w, cx + half))
    y1, y2 = int(max(0, cy - half)), int(min(h, cy + half))
    if x2 - x1 < 8 or y2 - y1 < 8:
        return image
    crop = image[y1:y2, x1:x2].astype(np.float32) / 127.5 - 1.0
    rgb, alpha = teeth_fn(crop[None])
    rgb = np.asarray(rgb)[0]
    alpha = np.asarray(alpha)[0]
    rgb = cv2.resize(np.clip((rgb + 1) * 127.5, 0, 255),
                     (x2 - x1, y2 - y1), interpolation=cv2.INTER_CUBIC)
    alpha = cv2.resize(alpha, (x2 - x1, y2 - y1),
                       interpolation=cv2.INTER_LINEAR)[..., None]
    out = image.copy().astype(np.float32)
    region = out[y1:y2, x1:x2]
    out[y1:y2, x1:x2] = region * (1 - alpha) + rgb * alpha
    return out.round().astype(np.uint8)
