"""YOLOX person detector (DWPose stage 1), TPU-native.

The reference's DWPose training-data frontend runs a YOLOX-L ONNX model for
person detection (``src/dwpose/wholebody.py:20-26``,
``src/dwpose/onnxdet.py:116-145``). Here the network (CSPDarknet + PAFPN +
decoupled head — the public Megvii YOLOX graph) is a flax NHWC module with
BatchNorms folded into convs at conversion time; the converter accepts the
released ``yolox_l.pth``-style torch state dict
(``backbone.backbone.*`` / ``backbone.*`` / ``head.*`` naming).

The host tail (letterbox-to-114 resize, grid/stride decode, class-aware NMS,
person-class + score filter) mirrors ``onnxdet.py:76-145`` exactly: the
model returns raw ``[dx, dy, log w, log h, obj, cls...]`` rows that
``decode_predictions`` folds with the anchor grid like ``demo_postprocess``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_STRIDES = (8, 16, 32)


@dataclass
class YoloXConfig:
    """l: 1.0/1.0 (the DWPose detector), s: 0.33/0.50, m: 0.67/0.75."""
    depth: float = 1.0
    width: float = 1.0
    num_classes: int = 80

    def ch(self, c: int) -> int:
        return int(c * self.width)

    def n(self, d: int) -> int:
        return max(round(d * self.depth), 1)


class _Conv(nn.Module):
    """BaseConv with BN folded: conv(+bias) -> SiLU."""
    features: int
    kernel: int = 1
    strides: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel,) * 2, (self.strides,) * 2,
                    padding=self.kernel // 2, feature_group_count=self.groups,
                    name="conv")(x)
        return nn.silu(y)


class _Bottleneck(nn.Module):
    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = _Conv(self.features, 1, name="conv1")(x)
        y = _Conv(self.features, 3, name="conv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class _CSPLayer(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        a = _Conv(c_, 1, name="conv1")(x)
        for i in range(self.n):
            a = _Bottleneck(c_, self.shortcut, name=f"m{i}")(a)
        b = _Conv(c_, 1, name="conv2")(x)
        return _Conv(self.features, 1, name="conv3")(
            jnp.concatenate([a, b], axis=-1))


class _SPPBottleneck(nn.Module):
    features: int
    kernels: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x):
        y = _Conv(x.shape[-1] // 2, 1, name="conv1")(x)
        pools = [y] + [nn.max_pool(y, (k, k), strides=(1, 1), padding="SAME")
                       for k in self.kernels]
        return _Conv(self.features, 1, name="conv2")(
            jnp.concatenate(pools, axis=-1))


class _Focus(nn.Module):
    """Space-to-depth 2x then conv (YOLOX stem)."""
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        y = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return _Conv(self.features, self.kernel, name="conv")(y)


class YoloXNet(nn.Module):
    """Input (B, H, W, 3) float32 (raw 0..255 letterboxed pixels — the ONNX
    export takes unnormalized input, ``onnxdet.py:98-114``). Returns raw
    predictions (B, N, 5 + nc): [dx, dy, logw, logh, obj, cls...] with
    obj/cls already sigmoided, pre grid-decode (``onnxdet.py:93-94``)."""
    cfg: YoloXConfig = field(default_factory=YoloXConfig)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ch, n = c.ch, c.n
        # CSPDarknet
        x = _Focus(ch(64), 3, name="stem")(x)
        x = _Conv(ch(128), 3, 2, name="dark2_0")(x)
        x = _CSPLayer(ch(128), n(3), name="dark2_1")(x)
        x = _Conv(ch(256), 3, 2, name="dark3_0")(x)
        d3 = _CSPLayer(ch(256), n(9), name="dark3_1")(x)
        x = _Conv(ch(512), 3, 2, name="dark4_0")(d3)
        d4 = _CSPLayer(ch(512), n(9), name="dark4_1")(x)
        x = _Conv(ch(1024), 3, 2, name="dark5_0")(d4)
        x = _SPPBottleneck(ch(1024), name="dark5_1")(x)
        d5 = _CSPLayer(ch(1024), n(3), shortcut=False, name="dark5_2")(x)
        # PAFPN
        l0 = _Conv(ch(512), 1, name="lateral_conv0")(d5)
        x = jnp.concatenate([_up2(l0), d4], axis=-1)
        p4 = _CSPLayer(ch(512), n(3), shortcut=False, name="C3_p4")(x)
        r1 = _Conv(ch(256), 1, name="reduce_conv1")(p4)
        x = jnp.concatenate([_up2(r1), d3], axis=-1)
        out2 = _CSPLayer(ch(256), n(3), shortcut=False, name="C3_p3")(x)
        x = _Conv(ch(256), 3, 2, name="bu_conv2")(out2)
        x = jnp.concatenate([x, r1], axis=-1)
        out1 = _CSPLayer(ch(512), n(3), shortcut=False, name="C3_n3")(x)
        x = _Conv(ch(512), 3, 2, name="bu_conv1")(out1)
        x = jnp.concatenate([x, l0], axis=-1)
        out0 = _CSPLayer(ch(1024), n(3), shortcut=False, name="C3_n4")(x)

        # decoupled head
        outs = []
        for i, feat in enumerate((out2, out1, out0)):
            s = _Conv(ch(256), 1, name=f"stem{i}")(feat)
            cf = _Conv(ch(256), 3, name=f"cls_conv{i}_0")(s)
            cf = _Conv(ch(256), 3, name=f"cls_conv{i}_1")(cf)
            rf = _Conv(ch(256), 3, name=f"reg_conv{i}_0")(s)
            rf = _Conv(ch(256), 3, name=f"reg_conv{i}_1")(rf)
            cls = jax.nn.sigmoid(
                nn.Conv(c.num_classes, (1, 1), name=f"cls_pred{i}")(cf))
            reg = nn.Conv(4, (1, 1), name=f"reg_pred{i}")(rf)
            obj = jax.nn.sigmoid(nn.Conv(1, (1, 1), name=f"obj_pred{i}")(rf))
            y = jnp.concatenate([reg, obj, cls], axis=-1)
            b, hh, ww, no = y.shape
            outs.append(y.reshape(b, hh * ww, no))
        return jnp.concatenate(outs, axis=1)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


def decode_predictions(outputs: np.ndarray,
                       img_size: Tuple[int, int]) -> np.ndarray:
    """``demo_postprocess`` (onnxdet.py:76-96): fold the anchor grid in."""
    grids, strides = [], []
    for s in _STRIDES:
        hs, ws = img_size[0] // s, img_size[1] // s
        xv, yv = np.meshgrid(np.arange(ws), np.arange(hs))
        grids.append(np.stack((xv, yv), 2).reshape(1, -1, 2))
        strides.append(np.full((1, hs * ws, 1), s))
    grid = np.concatenate(grids, 1).astype(np.float32)
    stride = np.concatenate(strides, 1).astype(np.float32)
    out = outputs.copy()
    out[..., :2] = (out[..., :2] + grid) * stride
    out[..., 2:4] = np.exp(out[..., 2:4]) * stride
    return out


def nms_plus1(boxes: np.ndarray, scores: np.ndarray,
              thr: float) -> List[int]:
    """Greedy NMS with the legacy +1 area convention (onnxdet.py:5-41)."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thr]
    return keep


def multiclass_nms(boxes, scores, nms_thr, score_thr):
    """Class-aware NMS (onnxdet.py:43-74); returns (N, 6) or None."""
    final = []
    for cls in range(scores.shape[1]):
        cs = scores[:, cls]
        m = cs > score_thr
        if not m.any():
            continue
        keep = nms_plus1(boxes[m], cs[m], nms_thr)
        if keep:
            final.append(np.concatenate(
                [boxes[m][keep], cs[m][keep, None],
                 np.full((len(keep), 1), cls, np.float32)], 1))
    return np.concatenate(final, 0) if final else None


def letterbox(img: np.ndarray, input_size: Tuple[int, int]):
    """Pad-to-114 resize (onnxdet.py:98-114). Returns (padded, ratio)."""
    padded = np.full((input_size[0], input_size[1], 3), 114.0, np.float32)
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    nh, nw = int(img.shape[0] * r), int(img.shape[1] * r)
    resized = np.asarray(jax.image.resize(
        jnp.asarray(img.astype(np.float32)), (nh, nw, 3), "bilinear"))
    padded[:nh, :nw] = resized
    return padded, r


def convert_yolox(state_dict: Dict[str, Any],
                  cfg: YoloXConfig = None) -> Dict[str, Any]:
    """Map a Megvii YOLOX torch state dict to folded YoloXNet params."""
    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    # torch prefix -> flax module name
    renames = {
        "backbone.backbone.stem.conv": "stem.conv",
        "backbone.backbone.dark2.0": "dark2_0",
        "backbone.backbone.dark2.1": "dark2_1",
        "backbone.backbone.dark3.0": "dark3_0",
        "backbone.backbone.dark3.1": "dark3_1",
        "backbone.backbone.dark4.0": "dark4_0",
        "backbone.backbone.dark4.1": "dark4_1",
        "backbone.backbone.dark5.0": "dark5_0",
        "backbone.backbone.dark5.1": "dark5_1",
        "backbone.backbone.dark5.2": "dark5_2",
        "backbone.lateral_conv0": "lateral_conv0",
        "backbone.C3_p4": "C3_p4",
        "backbone.reduce_conv1": "reduce_conv1",
        "backbone.C3_p3": "C3_p3",
        "backbone.bu_conv2": "bu_conv2",
        "backbone.C3_n3": "C3_n3",
        "backbone.bu_conv1": "bu_conv1",
        "backbone.C3_n4": "C3_n4",
    }
    for i in range(3):
        renames[f"head.stems.{i}"] = f"stem{i}"
        for j in range(2):
            renames[f"head.cls_convs.{i}.{j}"] = f"cls_conv{i}_{j}"
            renames[f"head.reg_convs.{i}.{j}"] = f"reg_conv{i}_{j}"

    params: Dict[str, Any] = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    sd = dict(state_dict)
    # fused conv+bn units
    prefixes = sorted({k[:-len(".conv.weight")] for k in sd
                       if k.endswith(".conv.weight")
                       and k[:-len(".conv.weight")] + ".bn.weight" in sd})
    for pref in prefixes:
        w = t(sd[f"{pref}.conv.weight"])
        g = t(sd[f"{pref}.bn.weight"])
        b = t(sd[f"{pref}.bn.bias"])
        mu = t(sd[f"{pref}.bn.running_mean"])
        var = t(sd[f"{pref}.bn.running_var"])
        s = g / np.sqrt(var + 1e-3)
        kernel = w * s[:, None, None, None]
        bias = b - mu * s
        kernel_nhwc = np.transpose(kernel, (2, 3, 1, 0))
        # resolve the flax path
        best = max((p for p in renames if pref.startswith(p)),
                   key=len, default=None)
        if best is None:
            continue
        rest = pref[len(best):].strip(".")
        path = renames[best].split(".")
        for part in rest.split("."):
            if not part or part == "conv":
                continue
            if part == "m":
                continue
            path.append(f"m{part}" if part.isdigit() else part)
        put(path + ["conv"], {"kernel": kernel_nhwc, "bias": bias})
    # head 1x1 prediction convs (bias, no BN)
    for kind in ("cls_pred", "reg_pred", "obj_pred"):
        for i in range(3):
            key = f"head.{kind}s.{i}.weight"
            if key in sd:
                put([f"{kind}{i}"], {
                    "kernel": np.transpose(t(sd[key]), (2, 3, 1, 0)),
                    "bias": t(sd[f"head.{kind}s.{i}.bias"])})
    return {"params": params}


class YoloXPersonDetector:
    """``inference_detector`` semantics (onnxdet.py:116-145): BGR image in,
    (N, 4) xyxy person boxes out (score > 0.3, class 0, NMS 0.45/0.1)."""

    def __init__(self, params=None, cfg: YoloXConfig = None,
                 input_size: Tuple[int, int] = (640, 640)):
        self.cfg = cfg or YoloXConfig()
        self.net = YoloXNet(self.cfg)
        self.params = params
        self.input_size = input_size
        self._apply = jax.jit(self.net.apply)

    def __call__(self, image_bgr: np.ndarray) -> np.ndarray:
        padded, ratio = letterbox(image_bgr, self.input_size)
        if self.params is None:
            self.params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1,) + padded.shape))
        raw = np.asarray(jax.device_get(
            self._apply(self.params, jnp.asarray(padded[None]))))
        pred = decode_predictions(raw, self.input_size)[0]
        boxes = pred[:, :4]
        scores = pred[:, 4:5] * pred[:, 5:]
        xyxy = np.stack([boxes[:, 0] - boxes[:, 2] / 2,
                         boxes[:, 1] - boxes[:, 3] / 2,
                         boxes[:, 0] + boxes[:, 2] / 2,
                         boxes[:, 1] + boxes[:, 3] / 2], 1) / ratio
        dets = multiclass_nms(xyxy, scores, nms_thr=0.45, score_thr=0.1)
        if dets is None:
            return np.zeros((0, 4), np.float32)
        keep = (dets[:, 4] > 0.3) & (dets[:, 5] == 0)
        return dets[keep, :4]
