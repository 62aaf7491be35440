"""5-point facial landmarks from cascade part detectors (host side).

Fills the reference's landmark role (MediaPipe face mesh at
``src/utils/mediapipe/mp_utils_refine.py:19-60`` and the TorchScript
two-phase landmarkers at ``src/utils/face_align/align.py:14-48`` — neither
dependency exists in this image) with the parts the system does ship: the
haarcascade eye / smile models evaluated by our own Viola-Jones engine
(``frontend/viola_jones.py``). Output is the standard 5-point layout
(left eye, right eye, nose, left mouth corner, right mouth corner) used by
``frontend/enhance.py::similarity_transform`` for BFR alignment and by the
ArcFace crop; geometry-prior fallbacks cover undetected parts, degrading to
exactly the face-box prior (``enhance.py::box_to_landmarks``) when nothing
is found.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

Box = Tuple[float, float, float, float]

_EYE_XML = "/usr/share/opencv4/haarcascades/haarcascade_eye.xml"
_SMILE_XML = "/usr/share/opencv4/haarcascades/haarcascade_smile.xml"


class LandmarkEstimator:
    def __init__(self):
        from actalker_tpu.frontend.viola_jones import CascadeModel, ViolaJones

        self.eye = (ViolaJones(CascadeModel.load(_EYE_XML))
                    if os.path.exists(_EYE_XML) else None)
        self.smile = (ViolaJones(CascadeModel.load(_SMILE_XML))
                      if os.path.exists(_SMILE_XML) else None)

    @staticmethod
    def _gray(image: np.ndarray) -> np.ndarray:
        if image.ndim == 3:
            return (0.299 * image[..., 0] + 0.587 * image[..., 1]
                    + 0.114 * image[..., 2])
        return image.astype(np.float64)

    def __call__(self, image: np.ndarray, face_box: Box) -> np.ndarray:
        """(H, W[, 3]) image + face box -> (5, 2) landmark array."""
        from actalker_tpu.frontend.enhance import box_to_landmarks

        lm = box_to_landmarks(face_box).astype(np.float64)  # geometry prior
        x1, y1, x2, y2 = [int(round(v)) for v in face_box]
        h, w = image.shape[:2]
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(w, x2), min(h, y2)
        if x2 - x1 < 24 or y2 - y1 < 24:
            return lm
        gray = self._gray(image[y1:y2, x1:x2])
        fw, fh = x2 - x1, y2 - y1

        if self.eye is not None:
            # eyes live in the upper half; search each side separately
            upper = gray[: fh // 2]
            half = fw // 2
            for side, (xo, sl) in enumerate(
                    ((0, upper[:, :half]), (half, upper[:, half:]))):
                dets = self.eye.detect(sl, min_size=max(12, fw // 8),
                                       scale_factor=1.15)
                if dets:
                    ex, ey, ew, eh = max(dets, key=lambda d: d[2] * d[3])
                    lm[side] = (x1 + xo + ex + ew / 2.0,
                                y1 + ey + eh / 2.0)

        if self.smile is not None:
            lower = gray[fh // 2:]
            dets = self.smile.detect(lower, min_size=max(16, fw // 6),
                                     scale_factor=1.15)
            if dets:
                mx, my, mw, mh = max(dets, key=lambda d: d[2] * d[3])
                cy = y1 + fh // 2 + my + mh / 2.0
                lm[3] = (x1 + mx + 0.15 * mw, cy)
                lm[4] = (x1 + mx + 0.85 * mw, cy)

        # nose: between the eye midpoint and the mouth midpoint
        lm[2] = ((lm[0] + lm[1]) / 2.0 * 0.5 + (lm[3] + lm[4]) / 2.0 * 0.5)
        return lm.astype(np.float32)


class YoloFaceLandmarks:
    """5-point landmarks straight from a learned detect head
    (``models/yoloface.py`` regresses them next to each box — the same
    source the reference's aligner ultimately keys off,
    ``src/utils/face_align/yoloface.py``; ``models/scrfd.py`` exposes the
    identical ``detect`` contract, ``scrfd.py:216-268``). Preferred over
    the cascade estimator whenever converted weights are supplied."""

    def __init__(self, detector):
        # models.yoloface.YoloFaceDetector or models.scrfd.ScrfdDetector:
        # anything with .detect(bgr) -> (xywh boxes, (N,5,2) kps, scores)
        self.detector = detector

    def __call__(self, image: np.ndarray, face_box: Box) -> np.ndarray:
        bboxes, kpss, scores = self.detector.detect(image[..., ::-1])
        if len(bboxes) == 0:
            raise RuntimeError("no face")
        # pick the detection that overlaps the requested box most
        x1, y1, x2, y2 = face_box
        bx1, by1 = bboxes[:, 0], bboxes[:, 1]
        bx2, by2 = bx1 + bboxes[:, 2], by1 + bboxes[:, 3]
        iw = np.maximum(0, np.minimum(bx2, x2) - np.maximum(bx1, x1))
        ih = np.maximum(0, np.minimum(by2, y2) - np.maximum(by1, y1))
        return kpss[int(np.argmax(iw * ih * scores))].astype(np.float32)


# Index groups reducing a dense face landmark set to the 5-point contract
# (means over each group). The DEFAULT is the LaPa-106 layout used by mmpose
# RTMPose "face6" checkpoints (the models ``convert_rtmpose`` targets):
# contour 0-32, brows 33-50, nose 51-65 (tip 54), eye rings 66-74 / 75-83,
# mouth 84-103 (outer corners 84 / 90), pupils 104 / 105. insightface
# "2d106det" checkpoints use a different 106-pt layout — pass
# ``to5=INSIGHTFACE_106_TO_5`` (or custom groups, e.g. WFLW-98) explicitly.
LAPA_106_TO_5 = (
    tuple(range(66, 75)),   # left-eye ring
    tuple(range(75, 84)),   # right-eye ring
    (54,),                  # nose tip
    (84,),                  # left mouth corner
    (90,),                  # right mouth corner
)
INSIGHTFACE_106_TO_5 = (
    tuple(range(33, 43)),   # left-eye ring
    tuple(range(87, 97)),   # right-eye ring
    (86,),                  # nose tip
    (52,),                  # left mouth corner
    (61,),                  # right mouth corner
)


class RTMFaceLandmarker:
    """Dense 2D face landmarks from an RTMPose/SimCC head — the stand-in for
    the reference's opaque two-phase TorchScript 94-pt regressors
    (``src/utils/face_align/align.py:23-48``: 256x256 face crop -> dense
    points -> 5-pt reduction). Reuses the DWPose stage-2 machinery
    (``models/rtmpose.py``): same CSPNeXt+SimCC graph at a face
    configuration (mmpose RTMPose-m "face6": widen .75 / deepen .67,
    106 keypoints, 256x256 input), same top-down affine crop and SimCC
    argmax decode. ``__call__`` keeps the (image, box) -> (5, 2) estimator
    contract; ``dense()`` exposes all K points."""

    def __init__(self, params, widen: float = 0.75, deepen: float = 0.67,
                 num_keypoints: int = 106,
                 input_size: Tuple[int, int] = (256, 256),
                 to5=LAPA_106_TO_5, cfg=None):
        from actalker_tpu.models.rtmpose import RTMPoseConfig, RTMPoseWholebody

        cfg = cfg or RTMPoseConfig(widen=widen, deepen=deepen,
                                   num_keypoints=num_keypoints,
                                   input_size=input_size)
        self.engine = RTMPoseWholebody(params, cfg)
        self.to5 = to5

    def dense(self, image: np.ndarray, face_box: Box):
        """(K, 2) landmarks in original-image pixels + (K,) scores."""
        kpts, scores = self.engine(image[..., ::-1], [list(face_box)])
        return kpts[0], scores[0]

    def __call__(self, image: np.ndarray, face_box: Box) -> np.ndarray:
        kpts, _ = self.dense(image, face_box)
        return np.stack([kpts[list(g)].mean(axis=0) for g in self.to5]
                        ).astype(np.float32)


def resolve_landmark_estimator(det_path: str = "", scrfd_path: str = "",
                               face_landmark_path: str = "",
                               to5=LAPA_106_TO_5):
    """Best available landmarker: a dense RTMPose face head when its
    converted checkpoint exists (the preferred substitute for the
    reference's p1/p2 94-pt regressors), then learned detect-head keypoints
    (yoloface, then SCRFD), else the cascade part-detector estimator
    (already a loud-warned degradation at the detector level)."""
    import os

    if face_landmark_path and os.path.exists(face_landmark_path):
        from actalker_tpu.io.weights import load_torch_state_dict
        from actalker_tpu.models.rtmpose import convert_rtmpose

        return RTMFaceLandmarker(
            convert_rtmpose(load_torch_state_dict(face_landmark_path)),
            to5=to5)
    if ((det_path and os.path.exists(det_path))
            or (scrfd_path and os.path.exists(scrfd_path))):
        from actalker_tpu.frontend.face import resolve_face_detector

        return YoloFaceLandmarks(
            resolve_face_detector(det_path, scrfd_path))
    return LandmarkEstimator()


def estimate_landmarks(image: np.ndarray, face_box: Optional[Box] = None,
                       estimator=None) -> np.ndarray:
    """Convenience entry: detect the face if no box given, then estimate.

    ``estimator`` may be a ``YoloFaceLandmarks`` (preferred when converted
    yolov5-face weights exist), a ``LandmarkEstimator`` (cascade parts), or
    any ``(image, box) -> (5, 2)`` callable. Always returns a (5, 2) array
    (face-box geometry prior as fallback)."""
    from actalker_tpu.frontend.enhance import box_to_landmarks
    from actalker_tpu.frontend.face import detect_face

    if face_box is None:
        h, w = image.shape[:2]
        face_box = detect_face(image) or (0.0, 0.0, float(w), float(h))
    try:
        est = estimator or LandmarkEstimator()
        return est(image, face_box)
    except Exception:
        return box_to_landmarks(face_box).astype(np.float32)
