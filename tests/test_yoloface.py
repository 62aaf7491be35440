"""YOLOv5-face graph + converter parity vs a torch re-implementation of the
public yolov5-face network (the reference loads it as TorchScript,
src/utils/face_align/yoloface.py:213-293)."""
import numpy as np
import jax.numpy as jnp

import pytest

from actalker_tpu.models.yoloface import (
    YoloFaceConfig, YoloFaceDetector, YoloFaceNet, convert_yoloface, nms_xyxy)

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier

_ANCHORS = (
    ((4, 5), (8, 10), (13, 16)),
    ((23, 29), (43, 55), (73, 105)),
    ((146, 217), (231, 300), (335, 433)),
)


def _build_torch_net(cfg):
    import torch
    import torch.nn as tnn

    def ch(c):
        import math
        return int(math.ceil(c * cfg.width_multiple / 8) * 8)

    def d(n):
        return max(round(n * cfg.depth_multiple), 1)

    class Conv(tnn.Module):
        def __init__(self, c1, c2, k=1, s=1):
            super().__init__()
            self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(c2, eps=1e-3)
            self.act = tnn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Bottleneck(tnn.Module):
        def __init__(self, c1, c2, shortcut=True):
            super().__init__()
            self.cv1 = Conv(c1, c2, 1)
            self.cv2 = Conv(c2, c2, 3)
            self.add = shortcut and c1 == c2

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class C3(tnn.Module):
        def __init__(self, c1, c2, n=1, shortcut=True):
            super().__init__()
            c_ = c2 // 2
            self.cv1 = Conv(c1, c_, 1)
            self.cv2 = Conv(c1, c_, 1)
            self.cv3 = Conv(2 * c_, c2, 1)
            self.m = tnn.Sequential(
                *[Bottleneck(c_, c_, shortcut) for _ in range(n)])

        def forward(self, x):
            return self.cv3(torch.cat([self.m(self.cv1(x)),
                                       self.cv2(x)], 1))

    class SPP(tnn.Module):
        def __init__(self, c1, c2, ks=(3, 5, 7)):
            super().__init__()
            c_ = c1 // 2
            self.cv1 = Conv(c1, c_, 1)
            self.cv2 = Conv(c_ * (len(ks) + 1), c2, 1)
            self.m = tnn.ModuleList(
                [tnn.MaxPool2d(k, 1, k // 2) for k in ks])

        def forward(self, x):
            x = self.cv1(x)
            return self.cv2(torch.cat([x] + [m(x) for m in self.m], 1))

    class Stem(tnn.Module):
        def __init__(self, c1, c2):
            super().__init__()
            self.stem_1 = Conv(c1, c2, 3, 2)
            self.stem_2a = Conv(c2, c2 // 2, 1, 1)
            self.stem_2b = Conv(c2 // 2, c2, 3, 2)
            self.stem_2p = tnn.MaxPool2d(2, 2, ceil_mode=True)
            self.stem_3 = Conv(c2 * 2, c2, 1, 1)

        def forward(self, x):
            x = self.stem_1(x)
            return self.stem_3(torch.cat(
                [self.stem_2b(self.stem_2a(x)), self.stem_2p(x)], 1))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            no = 16
            layers = [
                Stem(3, ch(64)), C3(ch(64), ch(128), d(3)),
                Conv(ch(128), ch(256), 3, 2), C3(ch(256), ch(256), d(9)),
                Conv(ch(256), ch(512), 3, 2), C3(ch(512), ch(512), d(9)),
                Conv(ch(512), ch(1024), 3, 2), SPP(ch(1024), ch(1024)),
                C3(ch(1024), ch(1024), d(3), False),
                Conv(ch(1024), ch(512), 1),            # 9
                tnn.Upsample(scale_factor=2), tnn.Identity(),
                C3(ch(1024), ch(512), d(3), False),    # 12
                Conv(ch(512), ch(256), 1),             # 13
                tnn.Upsample(scale_factor=2), tnn.Identity(),
                C3(ch(512), ch(256), d(3), False),     # 16
                Conv(ch(256), ch(256), 3, 2),          # 17
                tnn.Identity(),
                C3(ch(512), ch(512), d(3), False),     # 19
                Conv(ch(512), ch(512), 3, 2),          # 20
                tnn.Identity(),
                C3(ch(1024), ch(1024), d(3), False),   # 22
            ]
            self.model = tnn.Sequential(*layers)
            det = tnn.Module()
            det.m = tnn.ModuleList([
                tnn.Conv2d(ch(256), 3 * no, 1),
                tnn.Conv2d(ch(512), 3 * no, 1),
                tnn.Conv2d(ch(1024), 3 * no, 1)])
            self.model.add_module("23", det)

    class NetF(Net):
        def forward(self, x):
            L = self.model
            x = L[1](L[0](x))
            x = L[2](x)
            p3 = L[3](x)
            x = L[4](p3)
            p4 = L[5](x)
            x = L[8](L[7](L[6](p4)))
            t5 = L[9](x)
            x = torch.cat([L[10](t5), p4], 1)
            x = L[12](x)
            t4 = L[13](x)
            x = torch.cat([L[14](t4), p3], 1)
            o3 = L[16](x)
            x = torch.cat([L[17](o3), t4], 1)
            o4 = L[19](x)
            x = torch.cat([L[20](o4), t5], 1)
            o5 = L[22](x)
            det = getattr(self.model, "23")
            outs = []
            for li, (feat, conv) in enumerate(zip((o3, o4, o5), det.m)):
                raw = conv(feat)
                b, _, ny, nx = raw.shape
                raw = raw.view(b, 3, 16, ny, nx).permute(0, 3, 4, 1, 2)
                stride = [8, 16, 32][li]
                anc = torch.tensor(_ANCHORS[li], dtype=torch.float32)
                gy, gx = torch.meshgrid(torch.arange(ny), torch.arange(nx),
                                        indexing="ij")
                grid = torch.stack([gx, gy], -1).float()[:, :, None]
                y = torch.zeros_like(raw)
                cls_rng = [0, 1, 2, 3, 4, 15]
                y[..., cls_rng] = raw[..., cls_rng].sigmoid()
                y[..., 5:15] = raw[..., 5:15]
                y[..., 0:2] = (y[..., 0:2] * 2 - 0.5 + grid) * stride
                y[..., 2:4] = (y[..., 2:4] * 2) ** 2 * anc
                lm = (y[..., 5:15].reshape(b, ny, nx, 3, 5, 2)
                      * anc[:, None, :] + (grid * stride)[..., None, :])
                y[..., 5:15] = lm.reshape(b, ny, nx, 3, 10)
                outs.append(y.reshape(b, ny * nx * 3, 16))
            return torch.cat(outs, 1)

    return NetF()


def test_yoloface_matches_torch_oracle():
    import torch

    cfg = YoloFaceConfig(width_multiple=0.25, depth_multiple=0.34)
    torch.manual_seed(0)
    net = _build_torch_net(cfg)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0, 0.05)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05)
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    x = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        ref = net(x).numpy()

    params = convert_yoloface(
        {k: v.numpy() for k, v in net.state_dict().items()})
    got = YoloFaceNet(cfg).apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-3, atol=3e-3)


def test_yoloface_detector_host_path():
    """End-to-end host wrapper: random weights, arbitrary-size image, output
    contract (x, y, w, h) + 5 landmarks + scores; conf filter honored."""
    cfg = YoloFaceConfig(width_multiple=0.25, depth_multiple=0.34)
    det = YoloFaceDetector(cfg=cfg, conf_thres=0.0, input_size=64)
    img = np.random.default_rng(0).integers(
        0, 255, (80, 70, 3)).astype(np.uint8)
    bboxes, kpss, scores = det.detect(img)
    assert bboxes.shape[1] == 4 and kpss.shape[1:] == (5, 2)
    assert len(bboxes) == len(kpss) == len(scores)
    best = det(img)
    assert best is None or len(best) == 4

    dets = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [40, 40, 50, 50]],
                    np.float32)
    assert nms_xyxy(dets, np.array([0.9, 0.8, 0.7]), 0.3).tolist() == [0, 2]
