"""YOLOv5-face detector (5-landmark face detection), TPU-native.

The reference's primary face detector is a TorchScript YOLOv5m-face model
(``src/utils/face_align/align.py`` loads it; the wrapper with resize, grid
and NMS semantics is ``src/utils/face_align/yoloface.py:213-293``). The
network itself is the public deepcam-cn/yolov5-face graph: CSP backbone with
a StemBlock, PAN neck, and a Detect head that regresses 5 facial landmarks
next to each box (output rows ``[cx, cy, w, h, obj, 10x landmark, cls]`` —
see the consumer at ``yoloface.py:139-210``).

Here the graph is a flax module in NHWC with all BatchNorms folded into
their convs at conversion time, grids computed statically under jit
(the reference feeds grid tensors into TorchScript, ``yoloface.py:247-257``),
and the host tail (resize to 32-multiples, confidence filter, greedy NMS)
mirroring ``yoloface.py:227-293``. The converter accepts a yolov5-face torch
state dict (``model.N.*`` naming, e.g. exported from ``yolov5m-face.pt``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# yolov5-face anchors (wh pairs per level, strides 8/16/32)
_ANCHORS = (
    ((4, 5), (8, 10), (13, 16)),
    ((23, 29), (43, 55), (73, 105)),
    ((146, 217), (231, 300), (335, 433)),
)
_STRIDES = (8, 16, 32)


def _make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


@dataclass
class YoloFaceConfig:
    """Width/depth multiples select the variant (s: 0.50/0.33, m: 0.75/0.67,
    l: 1.0/1.0 — the reference ships the m variant)."""
    width_multiple: float = 0.75
    depth_multiple: float = 0.67
    num_classes: int = 1
    spp_kernels: Tuple[int, ...] = (3, 5, 7)

    def ch(self, c: int) -> int:
        return _make_divisible(c * self.width_multiple)

    def depth(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1)


class _ConvBnAct(nn.Module):
    """yolov5 Conv with the BN folded in: conv(+bias) -> SiLU."""
    features: int
    kernel: int = 1
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        y = nn.Conv(self.features, (self.kernel,) * 2, (self.strides,) * 2,
                    padding=p, name="conv")(x)
        return nn.silu(y)


class _Bottleneck(nn.Module):
    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = _ConvBnAct(self.features, 1, name="cv1")(x)
        y = _ConvBnAct(self.features, 3, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class _C3(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        a = _ConvBnAct(c_, 1, name="cv1")(x)
        for i in range(self.n):
            a = _Bottleneck(c_, self.shortcut, name=f"m{i}")(a)
        b = _ConvBnAct(c_, 1, name="cv2")(x)
        return _ConvBnAct(self.features, 1, name="cv3")(
            jnp.concatenate([a, b], axis=-1))


class _SPP(nn.Module):
    features: int
    kernels: Tuple[int, ...] = (3, 5, 7)

    @nn.compact
    def __call__(self, x):
        y = _ConvBnAct(x.shape[-1] // 2, 1, name="cv1")(x)
        pools = [y] + [
            nn.max_pool(y, (k, k), strides=(1, 1), padding="SAME")
            for k in self.kernels
        ]
        return _ConvBnAct(self.features, 1, name="cv2")(
            jnp.concatenate(pools, axis=-1))


class _StemBlock(nn.Module):
    """stem_1 (3x3/2) -> [stem_2a/2b (1x1, 3x3/2) || 2x2 ceil maxpool] ->
    concat -> stem_3 (1x1); overall stride 4."""
    features: int

    @nn.compact
    def __call__(self, x):
        s1 = _ConvBnAct(self.features, 3, 2, name="stem_1")(x)
        a = _ConvBnAct(self.features // 2, 1, name="stem_2a")(s1)
        a = _ConvBnAct(self.features, 3, 2, name="stem_2b")(a)
        ph, pw = s1.shape[1] % 2, s1.shape[2] % 2
        p = nn.max_pool(s1, (2, 2), strides=(2, 2),
                        padding=((0, ph), (0, pw)))
        return _ConvBnAct(self.features, 1, name="stem_3")(
            jnp.concatenate([a, p], axis=-1))


class YoloFaceNet(nn.Module):
    """Input (B, H, W, 3) RGB in [0, 1], H/W multiples of 32. Returns decoded
    predictions (B, N, 5 + 10 + nc): [cx, cy, w, h, obj, lmk*10, cls...] in
    input pixels — the same contract the reference's TorchScript model
    produces for ``non_max_suppression_face`` (yoloface.py:133-210)."""
    cfg: YoloFaceConfig = field(default_factory=YoloFaceConfig)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ch, d = cfg.ch, cfg.depth
        # backbone
        x = _StemBlock(ch(64), name="m0")(x)
        x = _C3(ch(128), d(3), name="m1")(x)
        x = _ConvBnAct(ch(256), 3, 2, name="m2")(x)
        p3 = _C3(ch(256), d(9), name="m3")(x)
        x = _ConvBnAct(ch(512), 3, 2, name="m4")(p3)
        p4 = _C3(ch(512), d(9), name="m5")(x)
        x = _ConvBnAct(ch(1024), 3, 2, name="m6")(p4)
        x = _SPP(ch(1024), cfg.spp_kernels, name="m7")(x)
        x = _C3(ch(1024), d(3), shortcut=False, name="m8")(x)
        # PAN neck
        t5 = _ConvBnAct(ch(512), 1, name="m9")(x)
        x = _upsample2(t5)
        x = jnp.concatenate([x, p4], axis=-1)
        x = _C3(ch(512), d(3), shortcut=False, name="m12")(x)
        t4 = _ConvBnAct(ch(256), 1, name="m13")(x)
        x = _upsample2(t4)
        x = jnp.concatenate([x, p3], axis=-1)
        out3 = _C3(ch(256), d(3), shortcut=False, name="m16")(x)
        x = _ConvBnAct(ch(256), 3, 2, name="m17")(out3)
        x = jnp.concatenate([x, t4], axis=-1)
        out4 = _C3(ch(512), d(3), shortcut=False, name="m19")(x)
        x = _ConvBnAct(ch(512), 3, 2, name="m20")(out4)
        x = jnp.concatenate([x, t5], axis=-1)
        out5 = _C3(ch(1024), d(3), shortcut=False, name="m22")(x)

        # Detect head with landmark decode
        no = 5 + 10 + cfg.num_classes
        preds = []
        for li, feat in enumerate((out3, out4, out5)):
            raw = nn.Conv(3 * no, (1, 1), name=f"det{li}")(feat)
            b, ny, nx, _ = raw.shape
            raw = raw.reshape(b, ny, nx, 3, no)
            stride = float(_STRIDES[li])
            anchors = jnp.asarray(_ANCHORS[li], jnp.float32)  # (3, 2)
            gx, gy = jnp.meshgrid(jnp.arange(nx, dtype=jnp.float32),
                                  jnp.arange(ny, dtype=jnp.float32))
            grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (ny,nx,1,2)
            xy = (jax.nn.sigmoid(raw[..., 0:2]) * 2.0 - 0.5 + grid) * stride
            wh = (jax.nn.sigmoid(raw[..., 2:4]) * 2.0) ** 2 * anchors
            obj = jax.nn.sigmoid(raw[..., 4:5])
            lmk = (raw[..., 5:15].reshape(b, ny, nx, 3, 5, 2)
                   * anchors[:, None, :]
                   + (grid * stride)[..., None, :]).reshape(b, ny, nx, 3, 10)
            cls = jax.nn.sigmoid(raw[..., 15:])
            y = jnp.concatenate([xy, wh, obj, lmk, cls], axis=-1)
            preds.append(y.reshape(b, ny * nx * 3, no))
        return jnp.concatenate(preds, axis=1)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


# torch layer index -> our module name (indices 10/11/14/15/18/21 are
# upsample/concat layers with no params; 23 is Detect)
_LAYER_NAMES = {i: f"m{i}" for i in
                (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 16, 17, 19, 20, 22)}


def convert_yoloface(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a yolov5-face torch state dict (``model.N....`` naming, BN eps
    1e-3) to folded YoloFaceNet params. Detect head convs are
    ``model.23.m.{0,1,2}.weight/bias``."""
    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    def put(path: List[str], leaf: Dict[str, np.ndarray]):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    # fused Conv+BN pairs
    prefixes = sorted({k[:-len(".conv.weight")] for k in sd
                       if k.endswith(".conv.weight")})
    for pref in prefixes:
        w = t(sd[f"{pref}.conv.weight"])
        g = t(sd[f"{pref}.bn.weight"])
        b = t(sd[f"{pref}.bn.bias"])
        m = t(sd[f"{pref}.bn.running_mean"])
        v = t(sd[f"{pref}.bn.running_var"])
        s = g / np.sqrt(v + 1e-3)
        kernel = np.transpose(w * s[:, None, None, None], (2, 3, 1, 0))
        parts = pref.split(".")
        idx = int(parts[0])
        path = [_LAYER_NAMES[idx]]
        for p in parts[1:]:
            if p == "m":
                continue
            path.append(f"m{p}" if p.isdigit() else p)
        put(path + ["conv"], {"kernel": kernel, "bias": b - m * s})
    # Detect head (plain convs with bias, torch index 23)
    for i in range(3):
        for k in sd:
            if k.startswith(("23.m.%d.weight" % i, "24.m.%d.weight" % i)):
                w = t(sd[k])
                bias = t(sd[k[:-len("weight")] + "bias"])
                put([f"det{i}"], {
                    "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": bias})
    return {"params": params}


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray,
             iou_thres: float) -> np.ndarray:
    """Greedy IoU NMS (torchvision.ops.nms semantics, yoloface.py:195)."""
    order = scores.argsort()[::-1]
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-12)
        order = order[1:][iou <= iou_thres]
    return np.asarray(keep, np.int32)


class YoloFaceDetector:
    """Host wrapper with the reference's detect semantics
    (``yoloface.py:226-293``): BGR uint8 in; returns (bboxes (N, 4) as
    [x, y, w, h] in original pixels, kpss (N, 5, 2), scores (N,))."""

    def __init__(self, params=None, cfg: YoloFaceConfig = None,
                 conf_thres: float = 0.5, iou_thres: float = 0.45,
                 input_size: int = 416):
        self.cfg = cfg or YoloFaceConfig()
        self.net = YoloFaceNet(self.cfg)
        self.params = params
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.input_size = input_size
        self._apply = jax.jit(self.net.apply)

    def detect(self, image_bgr: np.ndarray):
        h0, w0 = image_bgr.shape[:2]
        r = self.input_size / min(h0, w0)
        h1 = (int(h0 * r) + 31) // 32 * 32
        w1 = (int(w0 * r) + 31) // 32 * 32
        img = np.asarray(jax.image.resize(
            jnp.asarray(image_bgr[..., ::-1].astype(np.float32)),
            (h1, w1, 3), "bilinear")) / 255.0
        if self.params is None:
            self.params = self.net.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, h1, w1, 3)))
        pred = np.asarray(jax.device_get(
            self._apply(self.params, jnp.asarray(img[None]))))[0]

        cand = pred[pred[:, 4] > self.conf_thres]
        if len(cand) == 0:
            return (np.zeros((0, 4)), np.zeros((0, 5, 2)), np.zeros((0,)))
        conf = cand[:, 4] * cand[:, 15:].max(axis=1)
        keep_conf = conf > self.conf_thres
        cand, conf = cand[keep_conf], conf[keep_conf]
        if len(cand) == 0:
            return (np.zeros((0, 4)), np.zeros((0, 5, 2)), np.zeros((0,)))
        boxes = np.stack([cand[:, 0] - cand[:, 2] / 2,
                          cand[:, 1] - cand[:, 3] / 2,
                          cand[:, 0] + cand[:, 2] / 2,
                          cand[:, 1] + cand[:, 3] / 2], axis=1)
        keep = nms_xyxy(boxes, conf, self.iou_thres)
        boxes, cand, conf = boxes[keep], cand[keep], conf[keep]

        sx, sy = w0 / w1, h0 / h1
        bboxes = np.stack([boxes[:, 0] * sx, boxes[:, 1] * sy,
                           (boxes[:, 2] - boxes[:, 0]) * sx,
                           (boxes[:, 3] - boxes[:, 1]) * sy], axis=1)
        kpss = cand[:, 5:15].reshape(-1, 5, 2) * np.array([[sx, sy]])
        return bboxes, kpss, conf

    def __call__(self, image_rgb: np.ndarray):
        """frontend.face.FaceDetector protocol: best box as (x1,y1,x2,y2).

        The protocol delivers RGB frames; ``detect`` expects BGR (it flips
        internally, matching the reference yoloface input contract), so flip
        here."""
        bboxes, _, scores = self.detect(np.ascontiguousarray(image_rgb[..., ::-1]))
        if len(bboxes) == 0:
            return None
        x, y, w, h = bboxes[np.argmax(scores)]
        return (float(x), float(y), float(x + w), float(y + h))
