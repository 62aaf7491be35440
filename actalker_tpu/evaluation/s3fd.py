"""S3FD face detector for the sync-evaluation harness, TPU-native.

The reference's SyncNet evaluation tracks faces with an S3FD (SSD-style VGG16)
detector (``eval/detectors/s3fd/nets.py:28-174``,
``eval/detectors/s3fd/__init__.py:13-61``). Here the conv backbone + multibox
heads are one jitted NHWC flax module; the tiny prior/decode/NMS tail is
host-side numpy exactly mirroring ``eval/detectors/s3fd/box_utils.py``
(greedy NMS, center-offset decode with variances [0.1, 0.2], the
max-over-first-3-channels background trick of ``nets.py:144-145``).

Converter accepts the published ``sfd_face.pth`` torch state dict.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG conv layout: torch ModuleList index -> (out_ch, dilation)
_VGG_CONVS = {
    0: (64, 1), 2: (64, 1), 5: (128, 1), 7: (128, 1),
    10: (256, 1), 12: (256, 1), 14: (256, 1),
    17: (512, 1), 19: (512, 1), 21: (512, 1),
    24: (512, 1), 26: (512, 1), 28: (512, 1),
    31: (1024, 6), 33: (1024, 0),  # 33 is a 1x1
}
_SOURCE_CH = (256, 512, 512, 1024, 512, 256)
_L2NORMS = {0: ("L2Norm3_3", 10.0), 1: ("L2Norm4_3", 8.0), 2: ("L2Norm5_3", 5.0)}
_MIN_SIZES = (16, 32, 64, 128, 256, 512)
_STEPS = (4, 8, 16, 32, 64, 128)
_VARIANCE = (0.1, 0.2)
# BGR pixel means (eval/detectors/s3fd/__init__.py:10)
_IMG_MEAN = np.array([104.0, 117.0, 123.0], np.float32)


def _conv(idx, x):
    ch, dil = _VGG_CONVS[idx]
    if dil == 0:
        return nn.Conv(ch, (1, 1), name=f"vgg{idx}")(x)
    return nn.Conv(ch, (3, 3), padding=dil, kernel_dilation=(dil, dil),
                   name=f"vgg{idx}")(x)


def _maxpool(x, ceil=False):
    if ceil:  # ceil_mode: pad the trailing edge to a multiple of 2
        ph, pw = x.shape[1] % 2, x.shape[2] % 2
        return nn.max_pool(x, (2, 2), strides=(2, 2),
                           padding=((0, ph), (0, pw)))
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class S3FDNet(nn.Module):
    """Input (B, H, W, 3) float32, BGR minus channel means; returns
    ([(B, h, w, 4) loc per scale], [(B, h, w, 2) face-prob softmax logits])."""

    @nn.compact
    def __call__(self, x) -> Tuple[List[jax.Array], List[jax.Array]]:
        sources = []
        x = nn.relu(_conv(2, nn.relu(_conv(0, x))))
        x = _maxpool(x)
        x = nn.relu(_conv(7, nn.relu(_conv(5, x))))
        x = _maxpool(x)
        for i in (10, 12, 14):
            x = nn.relu(_conv(i, x))
        sources.append(x)                       # conv3_3
        x = _maxpool(x, ceil=True)
        for i in (17, 19, 21):
            x = nn.relu(_conv(i, x))
        sources.append(x)                       # conv4_3
        x = _maxpool(x)
        for i in (24, 26, 28):
            x = nn.relu(_conv(i, x))
        sources.append(x)                       # conv5_3
        x = _maxpool(x)
        x = nn.relu(_conv(31, x))
        x = nn.relu(_conv(33, x))
        sources.append(x)                       # fc7
        x = nn.relu(nn.Conv(256, (1, 1), name="extras0")(x))
        x = nn.relu(nn.Conv(512, (3, 3), strides=(2, 2), padding=1,
                            name="extras1")(x))
        sources.append(x)
        x = nn.relu(nn.Conv(128, (1, 1), name="extras2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), strides=(2, 2), padding=1,
                            name="extras3")(x))
        sources.append(x)

        # L2Norm the three VGG sources (nets.py:117-128)
        for i, (nm, scale) in _L2NORMS.items():
            s = sources[i]
            g = self.param(nm, nn.initializers.constant(scale),
                           (s.shape[-1],), jnp.float32)
            sources[i] = g * s / (
                jnp.sqrt(jnp.sum(s * s, -1, keepdims=True)) + 1e-10)

        locs, confs = [], []
        for i, s in enumerate(sources):
            loc = nn.Conv(4, (3, 3), padding=1, name=f"loc{i}")(s)
            nconf = 4 if i == 0 else 2
            conf = nn.Conv(nconf, (3, 3), padding=1, name=f"conf{i}")(s)
            if i == 0:  # max-out background label (nets.py:144-145)
                bg = jnp.max(conf[..., 0:3], axis=-1, keepdims=True)
                conf = jnp.concatenate([bg, conf[..., 3:]], axis=-1)
            locs.append(loc)
            confs.append(jax.nn.softmax(conf, axis=-1))
        return locs, confs


def convert_s3fd(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the ``sfd_face.pth`` torch state dict to S3FDNet params."""
    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("vgg", "extras", "loc", "conf"):
            name = f"{parts[0]}{parts[1]}"
            entry = params.setdefault(name, {})
            if parts[2] == "weight":
                entry["kernel"] = np.transpose(t(val), (2, 3, 1, 0))
            else:
                entry["bias"] = t(val)
        elif parts[0].startswith("L2Norm"):
            params[parts[0]] = t(val)
    return {"params": params}


def priors_for(size_hw: Tuple[int, int],
               fmaps: Sequence[Tuple[int, int]]) -> np.ndarray:
    """PriorBox (box_utils.py:176-217): (N, 4) [cx, cy, w, h] normalized."""
    imh, imw = size_hw
    out = []
    for k, (fh, fw) in enumerate(fmaps):
        step, ms = _STEPS[k], _MIN_SIZES[k]
        j, i = np.meshgrid(np.arange(fw), np.arange(fh))
        cx = (j + 0.5) * step / imw
        cy = (i + 0.5) * step / imh
        boxes = np.stack([cx, cy, np.full_like(cx, ms / imw),
                          np.full_like(cy, ms / imh)], -1)
        out.append(boxes.reshape(-1, 4))
    return np.concatenate(out, 0).astype(np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """Center-offset decode (box_utils.py:41-59) -> (N, 4) xyxy normalized."""
    v0, v1 = _VARIANCE
    cxy = priors[:, :2] + loc[:, :2] * v0 * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * v1)
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], 1)


def nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy IoU NMS over (N, 5) [x1 y1 x2 y2 score] (box_utils.py:7-38)."""
    if len(dets) == 0:
        return np.zeros((0,), np.int32)
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int32)


class S3FD:
    """detect_faces with the reference's semantics
    (``eval/detectors/s3fd/__init__.py:27-61``): BGR uint8 image in, (N, 5)
    [x1 y1 x2 y2 score] out, conf_th filter + cross-scale NMS(0.1)."""

    def __init__(self, params=None):
        self.net = S3FDNet()
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def _ensure_params(self, x):
        if self.params is None:
            self.params = self.net.init(jax.random.PRNGKey(0), x)

    def detect_faces(self, image_bgr: np.ndarray, conf_th: float = 0.8,
                     scales: Sequence[float] = (1.0,),
                     conf_thresh: float = 0.05,
                     nms_thresh: float = 0.3) -> np.ndarray:
        h, w = image_bgr.shape[:2]
        all_dets = []
        for s in scales:
            if s == 1.0:
                img = image_bgr.astype(np.float32)
            else:
                img = _bilinear_resize(image_bgr.astype(np.float32),
                                       (int(round(h * s)), int(round(w * s))))
            x = jnp.asarray((img - _IMG_MEAN)[None])
            self._ensure_params(x)
            locs, confs = jax.device_get(self._apply(self.params, x))
            fmaps = [l.shape[1:3] for l in locs]
            priors = priors_for(img.shape[:2], fmaps)
            loc = np.concatenate([l.reshape(-1, 4) for l in locs], 0)
            prob = np.concatenate([c[..., 1].reshape(-1) for c in confs], 0)
            boxes = decode_boxes(loc, priors)
            m = prob > conf_thresh
            if not m.any():
                continue
            dets = np.concatenate([boxes[m] * [w, h, w, h],
                                   prob[m, None]], 1)
            keep = nms(dets, nms_thresh)[:750]
            dets = dets[keep]
            all_dets.append(dets[dets[:, 4] > conf_th])
        if not all_dets:
            return np.zeros((0, 5), np.float32)
        dets = np.concatenate(all_dets, 0)
        # cross-scale merge NMS (s3fd/__init__.py:58) on [xyxy, score]
        keep = nms(dets, 0.1)
        return dets[keep]


def _bilinear_resize(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    return np.asarray(jax.image.resize(
        jnp.asarray(img), (size_hw[0], size_hw[1], img.shape[2]), "bilinear"))
