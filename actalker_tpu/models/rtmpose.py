"""RTMPose wholebody pose estimator (DWPose stage 2), TPU-native.

The reference's DWPose runs an RTMPose-style ONNX model over person crops
(``src/dwpose/wholebody.py:20-46``, pre/post in ``src/dwpose/onnxpose.py``):
top-down affine crop to (w=288, h=384), ImageNet normalization, a CSPNeXt
backbone + SimCC head producing per-keypoint 1-D classification logits over
2x-upsampled x/y axes, decoded by argmax (``onnxpose.py:292-351``) and
mapped back through the bbox center/scale (``onnxpose.py:80-112``).

Here the network is a flax NHWC module — CSPNeXt (stem of three 3x3 convs,
four stages of CSPNeXt blocks with depthwise-5x5 second convs and channel
attention, SPP in the last stage) + the RTMCC head (7x7 conv -> ScaleNorm
MLP -> one GAU (gated attention unit) block -> SimCC x/y linears) — with
BatchNorms folded into convs. The converter accepts an mmpose-style torch
state dict (``backbone.stem.*``/``backbone.stageN.*``/``head.*`` naming).

Host-side pre/post (numpy) mirrors ``onnxpose.py`` exactly:
``bbox_xyxy2cs`` (padding 1.25), ``top_down_affine`` (aspect-fixed warp),
SimCC argmax decode with the x/y min-score rule, and center/scale rescale.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (in, out, blocks, add_identity, use_spp) per stage, P5 arch
_ARCH = ((64, 128, 3, True, False), (128, 256, 6, True, False),
         (256, 512, 6, True, False), (512, 1024, 3, False, True))


@dataclass
class RTMPoseConfig:
    """l (the DWPose wholebody model): widen/deepen 1.0; m: 0.75/0.67."""
    widen: float = 1.0
    deepen: float = 1.0
    num_keypoints: int = 133
    input_size: Tuple[int, int] = (288, 384)   # (w, h)
    simcc_split_ratio: float = 2.0
    gau_hidden: int = 256
    gau_s: int = 128
    gau_expansion: int = 2

    def ch(self, c: int) -> int:
        return int(c * self.widen)

    def n(self, d: int) -> int:
        return max(round(d * self.deepen), 1)


class _Conv(nn.Module):
    """ConvModule with BN folded: conv(+bias) -> SiLU."""
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel,) * 2, (self.strides,) * 2,
                    padding=self.kernel // 2, feature_group_count=self.groups,
                    name="conv")(x)
        return nn.silu(y)


class _DWSeparable(nn.Module):
    """DepthwiseSeparableConvModule: depthwise kxk + pointwise 1x1."""
    features: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        y = _Conv(x.shape[-1], self.kernel, groups=x.shape[-1],
                  name="depthwise_conv")(x)
        return _Conv(self.features, 1, name="pointwise_conv")(y)


class _CSPNeXtBlock(nn.Module):
    features: int
    add_identity: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * 0.5)
        y = _Conv(hidden, 3, name="conv1")(x)
        y = _DWSeparable(self.features, 5, name="conv2")(y)
        return x + y if self.add_identity and x.shape[-1] == self.features \
            else y


class _ChannelAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(x.shape[-1], (1, 1), name="fc")(pooled)
        return x * jax.nn.hard_sigmoid(w)


class _CSPLayer(nn.Module):
    features: int
    n: int = 1
    add_identity: bool = True

    @nn.compact
    def __call__(self, x):
        mid = int(self.features * 0.5)
        a = _Conv(mid, 1, name="main_conv")(x)
        for i in range(self.n):
            a = _CSPNeXtBlock(mid, self.add_identity, name=f"blocks{i}")(a)
        b = _Conv(mid, 1, name="short_conv")(x)
        y = jnp.concatenate([a, b], axis=-1)
        y = _ChannelAttention(name="attention")(y)
        return _Conv(self.features, 1, name="final_conv")(y)


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


class _ScaleNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), jnp.float32)
        scale = x.shape[-1] ** -0.5
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * scale
        return x / jnp.clip(norm, 1e-5, None) * g


class _GAU(nn.Module):
    """RTMCC gated attention unit (self-attn, no RoPE / rel-bias — the
    RTMPose config): ScaleNorm -> SiLU(uv) -> relu^2 attention -> gate."""
    hidden: int
    s: int
    expansion: int

    @nn.compact
    def __call__(self, x):
        e = self.hidden * self.expansion
        res = x * self.param("res_scale", nn.initializers.ones,
                             (self.hidden,), jnp.float32)
        y = _ScaleNorm(name="ln")(x)
        uv = nn.silu(nn.Dense(2 * e + self.s, name="uv")(y))
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        gamma = self.param("gamma", nn.initializers.normal(0.02),
                           (2, self.s), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (2, self.s),
                          jnp.float32)
        q = base * gamma[0] + beta[0]
        k = base * gamma[1] + beta[1]
        qk = jnp.einsum("bnd,bmd->bnm", q, k)
        kernel = jnp.square(jax.nn.relu(qk / math.sqrt(self.s)))
        out = u * jnp.einsum("bnm,bme->bne", kernel, v)
        return res + nn.Dense(self.hidden, name="o")(out)


class RTMPoseNet(nn.Module):
    """Input: (B, H, W, 3) ImageNet-normalized crops ((H, W) =
    ``input_size[::-1]``). Returns (simcc_x (B, K, W*ratio),
    simcc_y (B, K, H*ratio)) — the ONNX model's output contract
    (``onnxpose.py:102-105``)."""
    cfg: RTMPoseConfig = field(default_factory=RTMPoseConfig)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        half = int(_ARCH[0][0] * c.widen // 2)
        x = _Conv(half, 3, 2, name="stem0")(x)
        x = _Conv(half, 3, 1, name="stem1")(x)
        x = _Conv(c.ch(_ARCH[0][0]), 3, 1, name="stem2")(x)
        for i, (cin, cout, nb, ident, spp) in enumerate(_ARCH, start=1):
            x = _Conv(c.ch(cout), 3, 2, name=f"stage{i}_conv")(x)
            if spp:
                x = _SPPBottleneck(c.ch(cout), name=f"stage{i}_spp")(x)
            x = _CSPLayer(c.ch(cout), c.n(nb), ident,
                          name=f"stage{i}_csp")(x)

        k = c.num_keypoints
        y = nn.Conv(k, (7, 7), padding=3, name="final_layer")(x)
        b, fh, fw, _ = y.shape
        tokens = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, k, fh * fw)
        tokens = _ScaleNorm(name="mlp_norm")(tokens)
        tokens = nn.Dense(c.gau_hidden, use_bias=False,
                          name="mlp")(tokens)
        tokens = _GAU(c.gau_hidden, c.gau_s, c.gau_expansion,
                      name="gau")(tokens)
        w_bins = int(c.input_size[0] * c.simcc_split_ratio)
        h_bins = int(c.input_size[1] * c.simcc_split_ratio)
        simcc_x = nn.Dense(w_bins, use_bias=False, name="cls_x")(tokens)
        simcc_y = nn.Dense(h_bins, use_bias=False, name="cls_y")(tokens)
        return simcc_x, simcc_y


# ------------------------------------------------------------ conversion

def convert_rtmpose(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map an mmpose RTMPose torch state dict to folded RTMPoseNet params."""
    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    params: Dict[str, Any] = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def flax_path(pref: str) -> List[str]:
        parts = pref.split(".")
        assert parts[0] == "backbone"
        if parts[1] == "stem":
            return [f"stem{parts[2]}"]
        stage = parts[1]           # e.g. "stage2"
        idx = int(parts[2])
        has_spp = stage == "stage4"
        if idx == 0:
            head = f"{stage}_conv"
            rest = parts[3:]
        elif has_spp and idx == 1:
            head = f"{stage}_spp"
            rest = parts[3:]
        else:
            head = f"{stage}_csp"
            rest = parts[3:]
        path = [head]
        for p in rest:
            if p == "blocks":
                continue
            path.append(f"blocks{p}" if p.isdigit() else p)
        return path

    sd = dict(state_dict)
    prefixes = sorted({k[:-len(".conv.weight")] for k in sd
                       if k.endswith(".conv.weight")
                       and k[:-len(".conv.weight")] + ".bn.weight" in sd})
    for pref in prefixes:
        w = t(sd[f"{pref}.conv.weight"])
        g = t(sd[f"{pref}.bn.weight"])
        b = t(sd[f"{pref}.bn.bias"])
        mu = t(sd[f"{pref}.bn.running_mean"])
        var = t(sd[f"{pref}.bn.running_var"])
        s = g / np.sqrt(var + 1e-5)
        kernel = np.transpose(w * s[:, None, None, None], (2, 3, 1, 0))
        put(flax_path(pref) + ["conv"],
            {"kernel": kernel, "bias": b - mu * s})
    # channel attention fcs (1x1 conv with bias, no BN)
    for k in [k for k in sd if k.endswith("attention.fc.weight")]:
        pref = k[:-len(".fc.weight")]
        put(flax_path(pref) + ["fc"], {
            "kernel": np.transpose(t(sd[k]), (2, 3, 1, 0)),
            "bias": t(sd[pref + ".fc.bias"])})
    # head
    put(["final_layer"], {
        "kernel": np.transpose(t(sd["head.final_layer.weight"]), (2, 3, 1, 0)),
        "bias": t(sd["head.final_layer.bias"])})
    put(["mlp_norm"], {"g": t(sd["head.mlp.0.g"]).reshape(1)})
    put(["mlp"], {"kernel": t(sd["head.mlp.1.weight"]).T})
    put(["gau", "ln"], {"g": t(sd["head.gau.ln.g"]).reshape(1)})
    put(["gau", "uv"], {"kernel": t(sd["head.gau.uv.weight"]).T,
                        "bias": t(sd["head.gau.uv.bias"])})
    put(["gau", "o"], {"kernel": t(sd["head.gau.o.weight"]).T,
                       "bias": t(sd["head.gau.o.bias"])})
    params["gau"]["gamma"] = t(sd["head.gau.gamma"])
    params["gau"]["beta"] = t(sd["head.gau.beta"])
    params["gau"]["res_scale"] = (
        t(sd["head.gau.res_scale.scale"]).reshape(-1)
        if "head.gau.res_scale.scale" in sd
        else np.ones((t(sd["head.gau.o.weight"]).shape[0],), np.float32))
    put(["cls_x"], {"kernel": t(sd["head.cls_x.weight"]).T})
    put(["cls_y"], {"kernel": t(sd["head.cls_y.weight"]).T})
    return {"params": params}


# ----------------------------------------------------- host pre/post tail

_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


def bbox_xyxy2cs(bbox: np.ndarray, padding: float = 1.25):
    """``onnxpose.py:115-146``."""
    x1, y1, x2, y2 = bbox[:4]
    center = np.array([(x1 + x2) * 0.5, (y1 + y2) * 0.5], np.float32)
    scale = np.array([(x2 - x1) * padding, (y2 - y1) * padding], np.float32)
    return center, scale


def _fix_aspect_ratio(scale: np.ndarray, aspect: float) -> np.ndarray:
    w, h = scale
    if w > h * aspect:
        return np.array([w, w / aspect], np.float32)
    return np.array([h * aspect, h], np.float32)


def get_warp_matrix(center, scale, rot_deg, output_size) -> np.ndarray:
    """``onnxpose.py:200-252``: affine src->dst from 3 point pairs."""
    rot = math.radians(rot_deg)
    src_w = scale[0]
    dst_w, dst_h = output_size
    sn, cs = math.sin(rot), math.cos(rot)
    src_dir = np.array([0.0 * cs - (-0.5 * src_w) * sn,
                        0.0 * sn + (-0.5 * src_w) * cs], np.float32)
    dst_dir = np.array([0.0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    src[2] = third(src[0], src[1])
    dst = np.zeros((3, 2), np.float32)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])
    # solve [x y 1] @ M.T = dst for the 2x3 matrix M
    A = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1)
    return np.linalg.solve(A, dst).T.astype(np.float32)


def warp_affine(img: np.ndarray, mat: np.ndarray,
                out_wh: Tuple[int, int]) -> np.ndarray:
    """Bilinear inverse-mapped affine warp (cv2.warpAffine semantics)."""
    w, h = out_wh
    inv = np.linalg.inv(np.vstack([mat, [0, 0, 1]]))[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    x0 = np.clip(np.floor(src_x).astype(np.int64), 0, img.shape[1] - 2)
    y0 = np.clip(np.floor(src_y).astype(np.int64), 0, img.shape[0] - 2)
    fx = np.clip(src_x - x0, 0.0, 1.0)[..., None]
    fy = np.clip(src_y - y0, 0.0, 1.0)[..., None]
    inb = ((src_x >= 0) & (src_x <= img.shape[1] - 1)
           & (src_y >= 0) & (src_y <= img.shape[0] - 1))[..., None]
    f = img.astype(np.float32)
    out = ((f[y0, x0] * (1 - fx) + f[y0, x0 + 1] * fx) * (1 - fy)
           + (f[y0 + 1, x0] * (1 - fx) + f[y0 + 1, x0 + 1] * fx) * fy)
    return np.where(inb, out, 0.0)


def top_down_affine(input_size, scale, center, img):
    """``onnxpose.py:255-285``."""
    w, h = input_size
    scale = _fix_aspect_ratio(scale, w / h)
    mat = get_warp_matrix(center, scale, 0, (w, h))
    return warp_affine(img, mat, (int(w), int(h))), scale


def simcc_decode(simcc_x: np.ndarray, simcc_y: np.ndarray,
                 split_ratio: float = 2.0):
    """``get_simcc_maximum`` + ``decode`` (onnxpose.py:292-351)."""
    n, k, _ = simcc_x.shape
    fx = simcc_x.reshape(n * k, -1)
    fy = simcc_y.reshape(n * k, -1)
    locs = np.stack([fx.argmax(1), fy.argmax(1)], -1).astype(np.float32)
    vals = np.minimum(fx.max(1), fy.max(1))
    locs[vals <= 0.0] = -1
    return (locs.reshape(n, k, 2) / split_ratio), vals.reshape(n, k)


class RTMPoseWholebody:
    """``inference_pose`` semantics (onnxpose.py:354-375): person boxes +
    BGR image -> (keypoints (N, K, 2) in original pixels, scores (N, K))."""

    def __init__(self, params=None, cfg: RTMPoseConfig = None):
        self.cfg = cfg or RTMPoseConfig()
        self.net = RTMPoseNet(self.cfg)
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def __call__(self, image_bgr: np.ndarray, bboxes: Sequence):
        w, h = self.cfg.input_size
        if len(bboxes) == 0:
            bboxes = [[0, 0, image_bgr.shape[1], image_bgr.shape[0]]]
        keypoints, scores = [], []
        for bbox in bboxes:
            center, scale = bbox_xyxy2cs(np.asarray(bbox, np.float32))
            crop, scale = top_down_affine((w, h), scale, center, image_bgr)
            x = (crop - _MEAN) / _STD
            if self.params is None:
                self.params = self.net.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
            sx, sy = jax.device_get(
                self._apply(self.params, jnp.asarray(x[None], jnp.float32)))
            kpts, sc = simcc_decode(np.asarray(sx), np.asarray(sy),
                                    self.cfg.simcc_split_ratio)
            kpts = kpts / np.array([w, h]) * scale + center - scale / 2
            keypoints.append(kpts[0])
            scores.append(sc[0])
        return np.stack(keypoints), np.stack(scores)
