"""SCRFD parity tests: flax network vs a torch re-implementation of the
insightface SCRFD-10G-bnkps graph (the reference ships it only as
ONNX/TorchScript binaries, src/utils/face_align/scrfd.py:14,142), plus
host decode tails against the reference's numpy formulas
(scrfd.py:151-268)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from actalker_tpu.models.scrfd import (
    ScrfdConfig, ScrfdDetector, ScrfdNet, anchor_centers, convert_scrfd,
    distance2bbox, distance2kps, resize_image_keep_ratio)

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


def _build_torch_scrfd(cfg):
    import torch
    import torch.nn as tnn

    class ConvBN(tnn.Module):
        def __init__(self, c1, c2, k=3, s=1, relu=True):
            super().__init__()
            self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(c2)
            self.relu = relu

        def forward(self, x):
            y = self.bn(self.conv(x))
            return tnn.functional.relu(y) if self.relu else y

    class BasicBlock(tnn.Module):
        def __init__(self, c1, c2, s=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(c1, c2, 3, s, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(c2)
            self.conv2 = tnn.Conv2d(c2, c2, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(c2)
            if s != 1:
                # ResNetV1e: AvgPool -> 1x1 conv -> BN
                self.downsample = tnn.Sequential(
                    tnn.AvgPool2d(2, 2),
                    tnn.Conv2d(c1, c2, 1, 1, 0, bias=False),
                    tnn.BatchNorm2d(c2))
            elif c1 != c2:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(c1, c2, 1, 1, 0, bias=False),
                    tnn.BatchNorm2d(c2))
            else:
                self.downsample = None

        def forward(self, x):
            import torch.nn.functional as F
            y = F.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            s = x if self.downsample is None else self.downsample(x)
            return F.relu(s + y)

    class GNConv(tnn.Module):
        def __init__(self, c1, c2, groups):
            super().__init__()
            self.conv = tnn.Conv2d(c1, c2, 3, 1, 1, bias=False)
            self.gn = tnn.GroupNorm(groups, c2)

        def forward(self, x):
            return tnn.functional.relu(self.gn(self.conv(x)))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            import torch.nn.functional  # noqa: F401
            cs = cfg.stem_channels
            self.backbone = tnn.Module()
            self.backbone.stem = tnn.Sequential(
                tnn.Conv2d(3, cs, 3, 2, 1, bias=False), tnn.BatchNorm2d(cs),
                tnn.ReLU(),
                tnn.Conv2d(cs, cs, 3, 1, 1, bias=False), tnn.BatchNorm2d(cs),
                tnn.ReLU(),
                tnn.Conv2d(cs, cfg.stage_planes[0], 3, 1, 1, bias=False),
                tnn.BatchNorm2d(cfg.stage_planes[0]), tnn.ReLU())
            cin = cfg.stage_planes[0]
            for si, (blocks, planes) in enumerate(
                    zip(cfg.stage_blocks, cfg.stage_planes)):
                layers = []
                for bi in range(blocks):
                    s = 2 if (bi == 0 and si > 0) else 1
                    layers.append(BasicBlock(cin, planes, s))
                    cin = planes
                setattr(self.backbone, f"layer{si + 1}",
                        tnn.Sequential(*layers))
            nc = cfg.neck_channels
            self.neck = tnn.Module()
            in_ch = cfg.stage_planes[1:]
            self.neck.lateral_convs = tnn.ModuleList(
                [ConvBN(c, nc, 1, relu=False) for c in in_ch])
            self.neck.fpn_convs = tnn.ModuleList(
                [ConvBN(nc, nc, 3, relu=False) for _ in in_ch])
            self.neck.downsample_convs = tnn.ModuleList(
                [ConvBN(nc, nc, 3, 2, relu=False) for _ in range(2)])
            self.neck.pafpn_convs = tnn.ModuleList(
                [ConvBN(nc, nc, 3, relu=False) for _ in range(2)])
            hc = cfg.head_channels
            self.bbox_head = tnn.Module()
            self.bbox_head.cls_convs = tnn.ModuleList(
                [GNConv(nc if j == 0 else hc, hc, cfg.gn_groups)
                 for j in range(cfg.stacked_convs)])
            a = cfg.num_anchors
            self.bbox_head.stride_cls = tnn.ModuleList(
                [tnn.Conv2d(hc, a, 3, 1, 1) for _ in range(3)])
            self.bbox_head.stride_reg = tnn.ModuleList(
                [tnn.Conv2d(hc, 4 * a, 3, 1, 1) for _ in range(3)])
            self.bbox_head.stride_kps = tnn.ModuleList(
                [tnn.Conv2d(hc, 10 * a, 3, 1, 1) for _ in range(3)])

        def forward(self, x):
            import torch
            x = self.backbone.stem(x)
            x = tnn.functional.max_pool2d(x, 3, 2, 1)
            feats = []
            for si in range(4):
                x = getattr(self.backbone, f"layer{si + 1}")(x)
                feats.append(x)
            used = feats[1:]
            lat = [l(f) for l, f in zip(self.neck.lateral_convs, used)]
            for i in range(len(lat) - 1, 0, -1):
                lat[i - 1] = lat[i - 1] + tnn.functional.interpolate(
                    lat[i], scale_factor=2, mode="nearest")
            inter = [c(l) for c, l in zip(self.neck.fpn_convs, lat)]
            outs = [inter[0]]
            for i in range(2):
                d = self.neck.downsample_convs[i](outs[-1])
                outs.append(self.neck.pafpn_convs[i](inter[i + 1] + d))
            res = []
            for i, f in enumerate(outs):
                h = f
                for conv in self.bbox_head.cls_convs:
                    h = conv(h)
                b, _, hh, ww = h.shape
                a = cfg.num_anchors
                cls = torch.sigmoid(self.bbox_head.stride_cls[i](h))
                box = self.bbox_head.stride_reg[i](h)
                kps = self.bbox_head.stride_kps[i](h)
                # NCHW -> (B, H*W*A, C/A) matching the ONNX export layout
                cls = cls.permute(0, 2, 3, 1).reshape(b, hh * ww * a, 1)
                box = box.permute(0, 2, 3, 1).reshape(b, hh * ww * a, 4)
                kps = kps.permute(0, 2, 3, 1).reshape(b, hh * ww * a, 10)
                res.append((cls, box, kps))
            return res

    net = Net()
    net.eval()
    # randomize BN stats so folding is actually exercised
    import torch
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.2, 0.2)
    return net


def test_scrfd_matches_torch_oracle():
    import torch

    torch.manual_seed(0)
    cfg = ScrfdConfig().micro()
    net = _build_torch_scrfd(cfg)
    params = convert_scrfd(
        {k: v.numpy() for k, v in net.state_dict().items()}, cfg)

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    outs = ScrfdNet(cfg).apply(params, jnp.asarray(x))
    for (cj, bj, kj), (ct, bt, kt) in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(cj), ct.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(bj), bt.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(kj), kt.numpy(), atol=5e-4)


def test_scrfd_resize_and_decode_match_reference_formulas():
    # keep-ratio resize: portrait source pads width, centered
    src = (np.arange(120 * 60 * 3) % 255).astype(np.uint8).reshape(120, 60, 3)
    img, newh, neww, padh, padw = resize_image_keep_ratio(src, 64, 64)
    assert (newh, neww) == (64, 32)
    assert (padh, padw) == (0, 16)
    assert img[:, :16].sum() == 0 and img[:, 48:].sum() == 0

    # landscape pads height; reference adds +1 to newh (scrfd.py:162)
    src2 = src.transpose(1, 0, 2)
    _, newh2, neww2, padh2, padw2 = resize_image_keep_ratio(src2, 64, 64)
    assert (newh2, neww2) == (33, 64)
    assert (padh2, padw2) == (15, 0)

    ac = anchor_centers(2, 2, 8, num_anchors=2)
    # x-major (mgrid[::-1]) order, duplicated per anchor
    np.testing.assert_array_equal(
        ac, [[0, 0], [0, 0], [8, 0], [8, 0], [0, 8], [0, 8], [8, 8], [8, 8]])

    d = np.array([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(distance2bbox(ac[:1], d), [[-1, -2, 3, 4]])
    kd = np.arange(10, dtype=np.float64)[None]
    kp = distance2kps(ac[2:3], kd)
    # px = center_x + d[i], py = center_y + d[i+1] for each point pair
    # (scrfd.py:204-214: points[:, i % 2] with even i -> column 0);
    # anchor (8, 0)
    np.testing.assert_allclose(
        kp[0], [8 + 0, 0 + 1, 8 + 2, 0 + 3, 8 + 4, 0 + 5, 8 + 6, 0 + 7,
                8 + 8, 0 + 9])


def test_scrfd_detector_host_path():
    cfg = ScrfdConfig().micro()
    det = ScrfdDetector(cfg=cfg, conf_thres=0.0, input_size=64)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (96, 80, 3), dtype=np.uint8)
    bboxes, kpss, scores = det.detect(img)
    assert bboxes.shape[1] == 4 and kpss.shape[1:] == (5, 2)
    assert len(bboxes) == len(scores)
    # protocol path returns a 4-tuple or None
    r = det(img)
    assert r is None or len(r) == 4
