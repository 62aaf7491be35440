"""SENet-50 (VGGFace2 face-ID embedder) vs a torch oracle."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from actalker_tpu.io.weights import convert_senet50  # noqa: E402
from actalker_tpu.models.senet import SENet50, preprocess_vggface2  # noqa: E402

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


class _SEModule(tnn.Module):
    def __init__(self, ch, reduction=16):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, ch // reduction, 1)
        self.fc2 = tnn.Conv2d(ch // reduction, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class _Bottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.se_module = _SEModule(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(self.se_module(h) + r)


class _SENet(tnn.Module):
    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin, planes = 64, 64
        for i, blocks in enumerate(layers):
            stage = []
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                stage.append(_Bottleneck(cin, planes, stride, downsample=(j == 0)))
                cin = planes * 4
            setattr(self, f"layer{i + 1}", tnn.Sequential(*stage))
            planes *= 2

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = tnn.functional.max_pool2d(h, 3, 2, ceil_mode=True)
        for i in range(4):
            h = getattr(self, f"layer{i + 1}")(h)
        return h.mean((2, 3))


def test_senet_matches_torch_oracle():
    torch.manual_seed(0)
    ref = _SENet().eval()
    # perturb BN stats so the affine isn't trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.4)
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params = convert_senet50(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        layers=(1, 1, 1, 1))
    model = SENet50(layers=(1, 1, 1, 1))
    got = np.asarray(model.apply(params, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_preprocess_subtracts_mean():
    img = np.full((1, 4, 4, 3), 128, np.uint8)
    out = preprocess_vggface2(img)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0, 0, 0], 128 - np.array(
        [131.0912, 103.8827, 91.4953], np.float32), rtol=1e-6)
