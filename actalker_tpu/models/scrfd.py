"""SCRFD face detector + 5-point landmarker, TPU-native.

The reference offers SCRFD as the alternate face/landmark stage of its
aligner (``src/utils/face_align/scrfd.py`` — ``SCRFD`` loads a TorchScript
binary at :142, ``SCRFDONNX`` an ONNX session at :20; instantiation is the
commented-out default of ``AlignImage``, ``align.py:272``). Both ship only
opaque compiled graphs; the recoverable parts are the host pipeline —
keep-ratio resize with center padding (``scrfd.py:151-169``), the
`[0,3,6,1,4,7,2,5,8]` output permutation (:224), per-stride anchor-center
decode ``distance2bbox``/``distance2kps`` (:193-214), rescale to source
pixels and NMS (:254-268) — which this module reproduces exactly.

The network itself follows the public insightface SCRFD-10G-bnkps
configuration (the graph behind the reference's
``scrfd_10g_bnkps_shape640x640.onnx`` checkpoint name, ``scrfd.py:10``):
ResNetV1e backbone (deep 3x3x3 stem, avg-pool downsample shortcuts,
BasicBlocks with stage depths (3, 4, 2, 3) and widths (56, 88, 88, 224)),
PAFPN neck (out 56, levels P2..P4 used for strides 8/16/32), and a shared
head of 4 stacked 3x3 conv+GN(16) blocks with per-stride cls(2)/bbox(8)/
kps(20) 3x3 output convs. BatchNorms are folded into convs at conversion
time (the detector is frozen at inference — same treatment as
``models/yolox.py``); GroupNorms stay live. The converter reads a torch
state dict in that layout (``convert_scrfd``); ``tests/test_scrfd.py``
builds the matching torch oracle and asserts end-to-end agreement.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from actalker_tpu.models.yoloface import nms_xyxy

_STRIDES = (8, 16, 32)


@dataclass
class ScrfdConfig:
    """SCRFD-10G-bnkps: the checkpoint family named by the reference
    (``scrfd.py:8-10``)."""
    stage_blocks: Tuple[int, ...] = (3, 4, 2, 3)
    stage_planes: Tuple[int, ...] = (56, 88, 88, 224)
    stem_channels: int = 28          # deep-stem width = base_channels // 2
    neck_channels: int = 56
    head_channels: int = 80
    stacked_convs: int = 4
    num_anchors: int = 2
    gn_groups: int = 16

    def micro(self) -> "ScrfdConfig":
        return ScrfdConfig(stage_blocks=(1, 1, 1, 1),
                           stage_planes=(8, 16, 16, 32), stem_channels=4,
                           neck_channels=16, head_channels=16,
                           stacked_convs=2, gn_groups=4)


class _ConvBN(nn.Module):
    """conv + (folded) BN [+ ReLU]. Bias carries the folded BN shift."""
    features: int
    kernel: int = 3
    strides: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel,) * 2, (self.strides,) * 2,
                    padding=self.kernel // 2, name="conv")(x)
        return nn.relu(y) if self.relu else y


class _BasicBlock(nn.Module):
    """ResNetV1e BasicBlock: two 3x3 convs; stride-2 shortcut is
    avg_pool(2) -> 1x1 conv (the "e"/"d" trick)."""
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        y = _ConvBN(self.features, 3, self.strides, name="conv1")(x)
        y = _ConvBN(self.features, 3, 1, relu=False, name="conv2")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            if self.strides != 1:
                x = nn.avg_pool(x, (2, 2), (2, 2))
            x = _ConvBN(self.features, 1, 1, relu=False, name="downsample")(x)
        return nn.relu(x + y)


class _ResNetV1e(nn.Module):
    cfg: ScrfdConfig

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        c = self.cfg
        # deep stem: 3x3 s2 -> 3x3 -> 3x3 (channels c/2, c/2, c), then maxpool
        x = _ConvBN(c.stem_channels, 3, 2, name="stem0")(x)
        x = _ConvBN(c.stem_channels, 3, 1, name="stem1")(x)
        x = _ConvBN(c.stage_planes[0], 3, 1, name="stem2")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for si, (blocks, planes) in enumerate(
                zip(c.stage_blocks, c.stage_planes)):
            for bi in range(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = _BasicBlock(planes, stride, name=f"layer{si}_{bi}")(x)
            outs.append(x)
        return outs  # strides 4, 8, 16, 32


class _PAFPN(nn.Module):
    """PAFPN over backbone levels 1..3 (strides 8/16/32): lateral 1x1,
    top-down sum + 3x3 fpn conv, then bottom-up path (stride-2 3x3
    downsample convs + 3x3 pafpn convs)."""
    cfg: ScrfdConfig

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        c = self.cfg.neck_channels
        used = feats[1:]  # start_level=1
        lat = [_ConvBN(c, 1, relu=False, name=f"lateral{i}")(f)
               for i, f in enumerate(used)]
        # top-down
        for i in range(len(lat) - 1, 0, -1):
            up = jax.image.resize(lat[i], lat[i - 1].shape, "nearest")
            lat[i - 1] = lat[i - 1] + up
        inter = [_ConvBN(c, 3, relu=False, name=f"fpn{i}")(l)
                 for i, l in enumerate(lat)]
        # bottom-up
        outs = [inter[0]]
        for i in range(len(inter) - 1):
            d = _ConvBN(c, 3, 2, relu=False, name=f"down{i}")(outs[-1])
            outs.append(_ConvBN(c, 3, relu=False, name=f"pafpn{i}")(
                inter[i + 1] + d))
        return outs


class _GNConv(nn.Module):
    """3x3 conv (no folded BN — SCRFD head uses GroupNorm) + GN + ReLU."""
    features: int
    groups: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv")(x)
        y = nn.GroupNorm(num_groups=self.groups, name="gn")(y)
        return nn.relu(y)


class ScrfdNet(nn.Module):
    """Input (B, H, W, 3) float32 normalized ``x/127.5 - 1`` RGB->BGR?? —
    the reference feeds BGR source flipped to RGB then ``/127.5 - 1``
    (``scrfd.py:219-221``; the ONNX path uses blobFromImage swapRB=True with
    mean 127.5 scale 1/128, :84). Returns, per stride (8, 16, 32), the
    tuple (scores (B, H*W*A, 1) sigmoided, bbox (B, H*W*A, 4),
    kps (B, H*W*A, 10)) in stride units — the layout of the reference's
    permuted outputs (``scrfd.py:224-233``)."""
    cfg: ScrfdConfig = field(default_factory=ScrfdConfig)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        feats = _ResNetV1e(c, name="backbone")(x)
        feats = _PAFPN(c, name="neck")(feats)
        # stem convs are shared across strides (strides_share=True):
        # instantiate once, apply per level
        head_stem = [_GNConv(c.head_channels, c.gn_groups,
                             name=f"head_conv{j}")
                     for j in range(c.stacked_convs)]
        outs = []
        for i, f in enumerate(feats):
            h = f
            for conv in head_stem:
                h = conv(h)
            b, hh, ww, _ = h.shape
            a = c.num_anchors
            cls = nn.Conv(a, (3, 3), padding=1, name=f"cls_out{i}")(h)
            box = nn.Conv(4 * a, (3, 3), padding=1, name=f"bbox_out{i}")(h)
            kps = nn.Conv(10 * a, (3, 3), padding=1, name=f"kps_out{i}")(h)
            outs.append((
                jax.nn.sigmoid(cls).reshape(b, hh * ww * a, 1),
                box.reshape(b, hh * ww, a, 4).reshape(b, hh * ww * a, 4),
                kps.reshape(b, hh * ww, a, 10).reshape(b, hh * ww * a, 10),
            ))
        return outs


# --------------------------------------------------------------------------
# Torch state-dict converter
# --------------------------------------------------------------------------

def _fold_bn(sd: Dict[str, np.ndarray], conv: str, bn: str):
    """HWIO kernel + bias with BN(gamma, beta, mean, var) folded in."""
    w = np.asarray(sd[conv + ".weight"], np.float32)
    g = np.asarray(sd[bn + ".weight"], np.float32)
    b = np.asarray(sd[bn + ".bias"], np.float32)
    m = np.asarray(sd[bn + ".running_mean"], np.float32)
    v = np.asarray(sd[bn + ".running_var"], np.float32)
    s = g / np.sqrt(v + 1e-5)
    kernel = np.transpose(w * s[:, None, None, None], (2, 3, 1, 0))
    bias = b - m * s
    if conv + ".bias" in sd:
        bias = bias + np.asarray(sd[conv + ".bias"], np.float32) * s
    return {"kernel": kernel, "bias": bias}


def _conv(sd: Dict[str, np.ndarray], name: str):
    out = {"kernel": np.transpose(
        np.asarray(sd[name + ".weight"], np.float32), (2, 3, 1, 0))}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"], np.float32)
    return out


def convert_scrfd(sd: Dict[str, np.ndarray],
                  cfg: ScrfdConfig = None) -> dict:
    """Torch state dict (mmdet-style ``backbone.stem.* / backbone.layerN.* /
    neck.lateral_convs.* / neck.fpn_convs.* / neck.downsample_convs.* /
    neck.pafpn_convs.* / bbox_head.cls_convs.* / bbox_head.stride_cls.*``
    naming, the insightface SCRFD export layout) -> flax params with BN
    folded."""
    cfg = cfg or ScrfdConfig()
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {}

    def put(path, leaf):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    # backbone: deep stem convs are stem.{0,3,6} with bn at stem.{1,4,7}
    for i, name in enumerate(("stem0", "stem1", "stem2")):
        put(["backbone", name, "conv"],
            _fold_bn(sd, f"backbone.stem.{3 * i}", f"backbone.stem.{3 * i + 1}"))
    for si, blocks in enumerate(cfg.stage_blocks):
        for bi in range(blocks):
            t = f"backbone.layer{si + 1}.{bi}"
            f = ["backbone", f"layer{si}_{bi}"]
            put(f + ["conv1", "conv"], _fold_bn(sd, t + ".conv1", t + ".bn1"))
            put(f + ["conv2", "conv"], _fold_bn(sd, t + ".conv2", t + ".bn2"))
            if t + ".downsample.1.weight" in sd:
                # V1e downsample = [AvgPool, Conv, BN] (stride 1 variant has
                # no pool: [Conv, BN] — detected by key count)
                conv_i = 1 if t + ".downsample.2.weight" in sd else 0
                put(f + ["downsample", "conv"],
                    _fold_bn(sd, f"{t}.downsample.{conv_i}",
                             f"{t}.downsample.{conv_i + 1}"))
    # neck
    for i in range(3):
        put(["neck", f"lateral{i}", "conv"],
            _fold_bn(sd, f"neck.lateral_convs.{i}.conv",
                     f"neck.lateral_convs.{i}.bn"))
        put(["neck", f"fpn{i}", "conv"],
            _fold_bn(sd, f"neck.fpn_convs.{i}.conv",
                     f"neck.fpn_convs.{i}.bn"))
    for i in range(2):
        put(["neck", f"down{i}", "conv"],
            _fold_bn(sd, f"neck.downsample_convs.{i}.conv",
                     f"neck.downsample_convs.{i}.bn"))
        put(["neck", f"pafpn{i}", "conv"],
            _fold_bn(sd, f"neck.pafpn_convs.{i}.conv",
                     f"neck.pafpn_convs.{i}.bn"))
    # head: shared stem convs with GN
    for j in range(cfg.stacked_convs):
        t = f"bbox_head.cls_convs.{j}"
        put([f"head_conv{j}", "conv"], _conv(sd, t + ".conv"))
        put([f"head_conv{j}", "gn"], {
            "scale": np.asarray(sd[t + ".gn.weight"], np.float32),
            "bias": np.asarray(sd[t + ".gn.bias"], np.float32)})
    for i in range(3):
        put([f"cls_out{i}"], _conv(sd, f"bbox_head.stride_cls.{i}"))
        put([f"bbox_out{i}"], _conv(sd, f"bbox_head.stride_reg.{i}"))
        put([f"kps_out{i}"], _conv(sd, f"bbox_head.stride_kps.{i}"))
    return {"params": p}


# --------------------------------------------------------------------------
# Host pipeline — exact scrfd.py:151-268 semantics
# --------------------------------------------------------------------------

def resize_image_keep_ratio(srcimg: np.ndarray, inp_h: int = 640,
                            inp_w: int = 640):
    """``SCRFD.resize_image`` (scrfd.py:151-169): fit into inp_h x inp_w
    preserving aspect, zero-pad centered; bilinear like cv2 default."""
    padh, padw, newh, neww = 0, 0, inp_h, inp_w
    h, w = srcimg.shape[:2]
    img = np.zeros((inp_h, inp_w, 3), dtype=np.uint8)
    if h != w:
        hw_scale = h / w
        if hw_scale > 1:
            newh, neww = inp_h, int(inp_w / hw_scale)
            padw = int((inp_w - neww) * 0.5)
        else:
            newh, neww = int(inp_h * hw_scale) + 1, inp_w
            padh = int((inp_h - newh) * 0.5)
    resized = _cv_bilinear(srcimg, newh, neww)
    img[padh:padh + newh, padw:padw + neww] = resized
    return img, newh, neww, padh, padw


def _cv_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    from actalker_tpu.frontend.preprocess import cv_bilinear_resize

    return cv_bilinear_resize(img, oh, ow)


def distance2bbox(points: np.ndarray, distance: np.ndarray) -> np.ndarray:
    """scrfd.py:193-203 (no clamping on the inference path)."""
    return np.stack([points[:, 0] - distance[:, 0],
                     points[:, 1] - distance[:, 1],
                     points[:, 0] + distance[:, 2],
                     points[:, 1] + distance[:, 3]], axis=-1)


def distance2kps(points: np.ndarray, distance: np.ndarray) -> np.ndarray:
    """scrfd.py:204-214."""
    preds = []
    for i in range(0, distance.shape[1], 2):
        preds.append(points[:, i % 2] + distance[:, i])
        preds.append(points[:, i % 2 + 1] + distance[:, i + 1])
    return np.stack(preds, axis=-1)


def anchor_centers(height: int, width: int, stride: int,
                   num_anchors: int = 2) -> np.ndarray:
    """scrfd.py:236-239: (H*W*A, 2) pixel centers, x-major mgrid order."""
    ac = np.stack(np.mgrid[:height, :width][::-1], axis=-1).astype(np.float32)
    ac = (ac * stride).reshape(-1, 2)
    if num_anchors > 1:
        ac = np.stack([ac] * num_anchors, axis=1).reshape(-1, 2)
    return ac


class ScrfdDetector:
    """Host wrapper with the reference ``SCRFD.detect`` semantics
    (``scrfd.py:216-268``): **BGR** uint8 in (the torch path flips to RGB
    itself, :219); returns (bboxes (N, 4) [x, y, w, h] source pixels,
    kpss (N, 5, 2), scores (N,))."""

    def __init__(self, params=None, cfg: ScrfdConfig = None,
                 conf_thres: float = 0.5, nms_thres: float = 0.45,
                 input_size: int = 640):
        self.cfg = cfg or ScrfdConfig()
        self.net = ScrfdNet(self.cfg)
        self.params = params
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self.input_size = input_size
        self._apply = jax.jit(self.net.apply)

    def detect(self, srcimg_bgr: np.ndarray):
        inp = self.input_size
        img, newh, neww, padh, padw = resize_image_keep_ratio(
            srcimg_bgr, inp, inp)
        x = img[..., ::-1].astype(np.float32) / 127.5 - 1.0  # -> RGB
        if self.params is None:
            self.params = self.net.init(
                jax.random.PRNGKey(0), jnp.zeros((1, inp, inp, 3)))
        outs = jax.device_get(self._apply(self.params, jnp.asarray(x[None])))

        scores_list, bboxes_list, kpss_list = [], [], []
        for (scores, bbox_p, kps_p), stride in zip(outs, _STRIDES):
            scores = np.asarray(scores)[0, :, 0]
            bbox_p = np.asarray(bbox_p)[0] * stride
            kps_p = np.asarray(kps_p)[0] * stride
            ac = anchor_centers(inp // stride, inp // stride, stride,
                                self.cfg.num_anchors)
            pos = np.where(scores >= self.conf_thres)[0]
            bboxes = distance2bbox(ac, bbox_p)
            kpss = distance2kps(ac, kps_p).reshape(len(ac), -1, 2)
            scores_list.append(scores[pos])
            bboxes_list.append(bboxes[pos])
            kpss_list.append(kpss[pos])
        scores = np.concatenate(scores_list)
        if len(scores) == 0:
            return (np.zeros((0, 4)), np.zeros((0, 5, 2)), np.zeros((0,)))
        bboxes = np.concatenate(bboxes_list)
        kpss = np.concatenate(kpss_list)
        # xyxy -> xywh, then un-pad / un-scale (scrfd.py:259-266)
        bboxes[:, 2:4] -= bboxes[:, 0:2]
        ratioh = srcimg_bgr.shape[0] / newh
        ratiow = srcimg_bgr.shape[1] / neww
        bboxes[:, 0] = (bboxes[:, 0] - padw) * ratiow
        bboxes[:, 1] = (bboxes[:, 1] - padh) * ratioh
        bboxes[:, 2] *= ratiow
        bboxes[:, 3] *= ratioh
        kpss[:, :, 0] = (kpss[:, :, 0] - padw) * ratiow
        kpss[:, :, 1] = (kpss[:, :, 1] - padh) * ratioh
        xyxy = np.stack([bboxes[:, 0], bboxes[:, 1],
                         bboxes[:, 0] + bboxes[:, 2],
                         bboxes[:, 1] + bboxes[:, 3]], axis=1)
        keep = nms_xyxy(xyxy, scores, self.nms_thres)
        return bboxes[keep], kpss[keep], scores[keep]

    def __call__(self, image_rgb: np.ndarray):
        """frontend.face.FaceDetector protocol (RGB in, best xyxy box)."""
        bboxes, _, scores = self.detect(
            np.ascontiguousarray(image_rgb[..., ::-1]))
        if len(bboxes) == 0:
            return None
        x, y, w, h = bboxes[np.argmax(scores)]
        return (float(x), float(y), float(x + w), float(y + h))
