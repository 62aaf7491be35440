"""Evaluation harness tests (weight-free mechanics)."""
import numpy as np
import jax.numpy as jnp

from actalker_tpu.evaluation import metrics as M
import pytest


def test_psnr_ssim_l1():
    a = np.random.default_rng(0).uniform(0, 1, (16, 16, 3))
    assert M.psnr(a, a) == float("inf")
    assert M.l1(a, a) == 0.0
    assert abs(M.ssim(a, a) - 1.0) < 1e-9
    b = np.clip(a + 0.1, 0, 1)
    assert M.psnr(a, b) < 30
    assert M.ssim(a, b) < 1.0


def test_ssim_windowed_matches_direct():
    """The separable implementation equals a brute-force per-window SSIM
    (Wang et al. 11x11 gaussian, sigma 1.5)."""
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (18, 15))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)

    half = 5.0
    g1 = np.exp(-((np.arange(11) - half) ** 2) / (2 * 1.5**2))
    g1 /= g1.sum()
    w = np.outer(g1, g1)
    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for i in range(a.shape[0] - 10):
        for j in range(a.shape[1] - 10):
            x = a[i:i + 11, j:j + 11]
            y = b[i:i + 11, j:j + 11]
            mx, my = (w * x).sum(), (w * y).sum()
            vx = (w * x * x).sum() - mx**2
            vy = (w * y * y).sum() - my**2
            vxy = (w * x * y).sum() - mx * my
            vals.append(((2 * mx * my + c1) * (2 * vxy + c2))
                        / ((mx**2 + my**2 + c1) * (vx + vy + c2)))
    np.testing.assert_allclose(M.ssim(a, b), np.mean(vals), rtol=1e-10)


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2000, 8))
    mu, sig = M.activation_statistics(x)
    assert abs(M.frechet_distance(mu, sig, mu, sig)) < 1e-3
    # mean shift by d in every dim -> FID ~= d^2 * dims
    mu2 = mu + 0.5
    fd = M.frechet_distance(mu, sig, mu2, sig)
    np.testing.assert_allclose(fd, 0.25 * 8, rtol=0.05)


def test_fid_with_plugged_extractor():
    rng = np.random.default_rng(1)
    real = [rng.standard_normal((4, 4, 3)) for _ in range(64)]
    fake = [rng.standard_normal((4, 4, 3)) + 1.0 for _ in range(64)]

    def features(batch):
        return batch.reshape(batch.shape[0], -1)

    fid_same = M.fid(real, real, features)
    fid_diff = M.fid(real, fake, features)
    assert fid_same < 1.0 < fid_diff


def test_identity_cosine():
    rng = np.random.default_rng(2)
    ref = rng.standard_normal((8, 8, 3))

    def embed(batch):
        return batch.reshape(batch.shape[0], -1)

    same = M.identity_cosine(ref, np.stack([ref] * 3), embed)
    other = M.identity_cosine(ref, rng.standard_normal((3, 8, 8, 3)), embed)
    assert same > 0.99 > other


def test_sync_scores_recovers_offset():
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((50, 16))
    shift = 4
    audio = emb
    video = np.roll(emb, -shift, axis=0)  # video lags audio by `shift`
    offset, conf, dist = M.sync_scores(audio, video, vshift=10)
    assert abs(offset) == shift
    assert conf > 0.5
    assert dist < 1e-6


@pytest.mark.slow
def test_lpips_alex_matches_torch_oracle():
    """LPIPSAlex + convert_lpips vs an independent torch implementation of
    lpips.LPIPS(net='alex') (scaling layer -> AlexNet relu features ->
    channel-unit-norm -> squared diff -> 1x1 lin head -> spatial mean)."""
    import torch
    import torch.nn.functional as F

    from actalker_tpu.evaluation.lpips import convert_lpips, lpips_distance

    torch.manual_seed(0)
    specs = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
             (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    feat_idx = [0, 3, 6, 8, 10]
    sd = {}
    for i, (ci, co, k, s, p) in enumerate(specs):
        sd[f"features.{feat_idx[i]}.weight"] = torch.randn(co, ci, k, k) * 0.05
        sd[f"features.{feat_idx[i]}.bias"] = torch.randn(co) * 0.05
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, co, 1, 1)

    def torch_lpips(x, y):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(img):
            h = (img - shift) / scale
            out = []
            for i, (ci, co, k, s, p) in enumerate(specs):
                if i in (1, 2):
                    h = F.max_pool2d(h, 3, stride=2)
                h = F.conv2d(h, sd[f"features.{feat_idx[i]}.weight"],
                             sd[f"features.{feat_idx[i]}.bias"],
                             stride=s, padding=p)
                h = F.relu(h)
                out.append(h)
            return out

        total = 0.0
        for i, (a, b) in enumerate(zip(feats(x), feats(y))):
            a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
            b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
            d = (a - b) ** 2
            w = sd[f"lin{i}.model.1.weight"]
            total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
        return total

    x = torch.rand(2, 3, 64, 64) * 2 - 1
    y = torch.rand(2, 3, 64, 64) * 2 - 1
    ref = torch_lpips(x, y).numpy()

    params = convert_lpips(sd)
    got = np.asarray(lpips_distance(
        params,
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(y.permute(0, 2, 3, 1).numpy()),
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    assert (got > 0).all() and np.isfinite(got).all()
    # identity pairs score ~0
    same = np.asarray(lpips_distance(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert (np.abs(same) < 1e-6).all()


@pytest.mark.slow
def test_syncnet_matches_torch_oracle():
    """SyncNet + convert_syncnet vs the reference tower definition
    (eval/sync/SyncNetModel.py class S) built in torch with random weights."""
    import torch
    import torch.nn as nn

    from actalker_tpu.evaluation.syncnet import SyncNet, convert_syncnet

    torch.manual_seed(0)
    netcnnaud = nn.Sequential(
        nn.Conv2d(1, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(),
        nn.MaxPool2d((1, 1), (1, 1)),
        nn.Conv2d(64, 192, 3, 1, 1), nn.BatchNorm2d(192), nn.ReLU(),
        nn.MaxPool2d((3, 3), (1, 2)),
        nn.Conv2d(192, 384, 3, padding=1), nn.BatchNorm2d(384), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.BatchNorm2d(256), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.BatchNorm2d(256), nn.ReLU(),
        nn.MaxPool2d((3, 3), (2, 2)),
        nn.Conv2d(256, 512, (5, 4), padding=0), nn.BatchNorm2d(512),
        nn.ReLU(),
    )
    netfcaud = nn.Sequential(nn.Linear(512, 512), nn.BatchNorm1d(512),
                             nn.ReLU(), nn.Linear(512, 1024))
    netfclip = nn.Sequential(nn.Linear(512, 512), nn.BatchNorm1d(512),
                             nn.ReLU(), nn.Linear(512, 1024))
    netcnnlip = nn.Sequential(
        nn.Conv3d(3, 96, (5, 7, 7), (1, 2, 2), 0), nn.BatchNorm3d(96),
        nn.ReLU(), nn.MaxPool3d((1, 3, 3), (1, 2, 2)),
        nn.Conv3d(96, 256, (1, 5, 5), (1, 2, 2), (0, 1, 1)),
        nn.BatchNorm3d(256), nn.ReLU(),
        nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        nn.Conv3d(256, 256, (1, 3, 3), padding=(0, 1, 1)),
        nn.BatchNorm3d(256), nn.ReLU(),
        nn.Conv3d(256, 256, (1, 3, 3), padding=(0, 1, 1)),
        nn.BatchNorm3d(256), nn.ReLU(),
        nn.Conv3d(256, 256, (1, 3, 3), padding=(0, 1, 1)),
        nn.BatchNorm3d(256), nn.ReLU(), nn.MaxPool3d((1, 3, 3), (1, 2, 2)),
        nn.Conv3d(256, 512, (1, 6, 6), padding=0), nn.BatchNorm3d(512),
        nn.ReLU(),
    )
    # randomize BN running stats so the eval-mode normalize is non-trivial
    for mod in [*netcnnaud, *netcnnlip, *netfcaud, *netfclip]:
        if hasattr(mod, "running_mean"):
            mod.running_mean = torch.randn_like(mod.running_mean) * 0.05
            mod.running_var = 1 + torch.rand_like(mod.running_var) * 0.1
    for seq in (netcnnaud, netcnnlip, netfcaud, netfclip):
        seq.eval()

    aud = torch.randn(2, 1, 13, 20)
    lip = torch.randn(2, 3, 5, 224, 224)
    with torch.no_grad():
        mid = netcnnaud(aud)
        ref_a = netfcaud(mid.reshape(mid.shape[0], -1)).numpy()
        mid = netcnnlip(lip)
        ref_l = netfclip(mid.reshape(mid.shape[0], -1)).numpy()

    sd = {}
    for name, seq in (("netcnnaud", netcnnaud), ("netfcaud", netfcaud),
                      ("netcnnlip", netcnnlip), ("netfclip", netfclip)):
        for k, v in seq.state_dict().items():
            sd[f"{name}.{k}"] = v.numpy()
    params = convert_syncnet(sd)

    m = SyncNet()
    got_a, got_l = m.apply(
        params,
        jnp.asarray(aud.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(lip.permute(0, 2, 3, 4, 1).numpy()),
    )
    np.testing.assert_allclose(np.asarray(got_a), ref_a, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_l), ref_l, rtol=2e-4, atol=4e-4)


@pytest.mark.slow
def test_fid_inception_matches_torch_oracle():
    """Graph+converter parity against a torch re-implementation of the
    reference's FID InceptionV3 (eval/inception.py:16-161 incl. the TF
    avg-pool and Mixed_7c max-pool patches), random weights + BN stats."""
    import torch
    import torch.nn as torch_nn
    import torch.nn.functional as F

    from actalker_tpu.evaluation.inception import (
        FIDInceptionV3, convert_fid_inception)

    class BC(torch_nn.Module):  # BasicConv2d
        def __init__(self, i, o, **kw):
            super().__init__()
            self.conv = torch_nn.Conv2d(i, o, bias=False, **kw)
            self.bn = torch_nn.BatchNorm2d(o, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avg_tf(x):
        return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)

    class A(torch_nn.Module):
        def __init__(self, i, pf):
            super().__init__()
            self.branch1x1 = BC(i, 64, kernel_size=1)
            self.branch5x5_1 = BC(i, 48, kernel_size=1)
            self.branch5x5_2 = BC(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BC(i, 64, kernel_size=1)
            self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BC(i, pf, kernel_size=1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(avg_tf(x))], 1)

    class B(torch_nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3 = BC(i, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BC(i, 64, kernel_size=1)
            self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, 2)], 1)

    class C(torch_nn.Module):
        def __init__(self, i, c7):
            super().__init__()
            self.branch1x1 = BC(i, 192, kernel_size=1)
            self.branch7x7_1 = BC(i, c7, kernel_size=1)
            self.branch7x7_2 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BC(i, c7, kernel_size=1)
            self.branch7x7dbl_2 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BC(i, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_1(x)
            for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                      self.branch7x7dbl_4, self.branch7x7dbl_5):
                bd = m(bd)
            return torch.cat([self.branch1x1(x), b7, bd,
                              self.branch_pool(avg_tf(x))], 1)

    class D(torch_nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3_1 = BC(i, 192, kernel_size=1)
            self.branch3x3_2 = BC(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BC(i, 192, kernel_size=1)
            self.branch7x7x3_2 = BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BC(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b7 = x
            for m in (self.branch7x7x3_1, self.branch7x7x3_2,
                      self.branch7x7x3_3, self.branch7x7x3_4):
                b7 = m(b7)
            return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                              F.max_pool2d(x, 3, 2)], 1)

    class E(torch_nn.Module):
        def __init__(self, i, maxpool):
            super().__init__()
            self.maxpool = maxpool
            self.branch1x1 = BC(i, 320, kernel_size=1)
            self.branch3x3_1 = BC(i, 384, kernel_size=1)
            self.branch3x3_2a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BC(i, 448, kernel_size=1)
            self.branch3x3dbl_2 = BC(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BC(i, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = (F.max_pool2d(x, 3, 1, 1) if self.maxpool else avg_tf(x))
            return torch.cat([self.branch1x1(x), b3, bd,
                              self.branch_pool(bp)], 1)

    class Net(torch_nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BC(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BC(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BC(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BC(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BC(80, 192, kernel_size=3)
            self.Mixed_5b, self.Mixed_5c, self.Mixed_5d = A(192, 32), A(256, 64), A(288, 64)
            self.Mixed_6a = B(288)
            self.Mixed_6b, self.Mixed_6c = C(768, 128), C(768, 160)
            self.Mixed_6d, self.Mixed_6e = C(768, 160), C(768, 192)
            self.Mixed_7a = D(768)
            self.Mixed_7b, self.Mixed_7c = E(1280, False), E(2048, True)

        def forward(self, x):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = F.max_pool2d(x, 3, 2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = F.max_pool2d(x, 3, 2)
            for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c):
                x = m(x)
            return F.adaptive_avg_pool2d(x, 1).flatten(1)

    torch.manual_seed(0)
    net = Net()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch_nn.Conv2d):
                m.weight.normal_(0, 0.05)
            if isinstance(m, torch_nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    x = torch.rand(2, 3, 75, 75)
    with torch.no_grad():
        ref = net(x).numpy()

    params = convert_fid_inception(
        {k: v.numpy() for k, v in net.state_dict().items()})
    model = FIDInceptionV3(resize_input=False, normalize_input=False)
    got = model.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))[0]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_i3d_matches_torch_oracle():
    """InceptionI3D graph+converter parity against a torch re-implementation
    of the reference's I3D (utils/pytorch_i3d.py:48-338: Unit3D with dynamic
    TF-SAME padding == XLA SAME, BN eps 1e-3), random weights + BN stats."""
    import math

    import torch
    import torch.nn as torch_nn
    import torch.nn.functional as F

    from actalker_tpu.evaluation.i3d import InceptionI3D, convert_i3d, _MIXED

    def same_pad(x, k, s):
        # pytorch_i3d.py:82-113 dynamic SAME padding (t, h, w)
        pads = []
        for d in (2, 3, 4):
            size, kd, sd = x.shape[d], k[d - 2], s[d - 2]
            total = max(kd - sd, 0) if size % sd == 0 else max(kd - size % sd, 0)
            pads = [total // 2, total - total // 2] + pads
        return F.pad(x, pads)

    class Unit3D(torch_nn.Module):
        def __init__(self, i, o, k=(1, 1, 1), s=(1, 1, 1)):
            super().__init__()
            self.k, self.s = k, s
            self.conv3d = torch_nn.Conv3d(i, o, k, s, 0, bias=False)
            self.bn = torch_nn.BatchNorm3d(o, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv3d(same_pad(x, self.k, self.s))))

    def maxpool_same(x, k, s):
        return F.max_pool3d(same_pad(x, k, s), k, s)

    class Mixed(torch_nn.Module):
        def __init__(self, i, c):
            super().__init__()
            self.b0 = Unit3D(i, c[0])
            self.b1a, self.b1b = Unit3D(i, c[1]), Unit3D(c[1], c[2], (3, 3, 3))
            self.b2a, self.b2b = Unit3D(i, c[3]), Unit3D(c[3], c[4], (3, 3, 3))
            self.b3b = Unit3D(i, c[5])

        def forward(self, x):
            return torch.cat([
                self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
                self.b3b(maxpool_same(x, (3, 3, 3), (1, 1, 1)))], 1)

    class Net(torch_nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv3d_1a_7x7 = Unit3D(3, 64, (7, 7, 7), (2, 2, 2))
            self.Conv3d_2b_1x1 = Unit3D(64, 64)
            self.Conv3d_2c_3x3 = Unit3D(64, 192, (3, 3, 3))
            ins = [192, 256, 480, 512, 512, 512, 528, 832, 832]
            for i, ep in zip(ins, _MIXED):
                setattr(self, ep, Mixed(i, _MIXED[ep]))

        def forward(self, x):
            x = self.Conv3d_1a_7x7(x)
            x = maxpool_same(x, (1, 3, 3), (1, 2, 2))
            x = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x))
            x = maxpool_same(x, (1, 3, 3), (1, 2, 2))
            x = self.Mixed_3c(self.Mixed_3b(x))
            x = maxpool_same(x, (3, 3, 3), (2, 2, 2))
            for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                       "Mixed_4f"):
                x = getattr(self, ep)(x)
            x = maxpool_same(x, (2, 2, 2), (2, 2, 2))
            x = self.Mixed_5c(self.Mixed_5b(x))
            return F.avg_pool3d(x, (2, 7, 7), (1, 1, 1))

    torch.manual_seed(1)
    net = Net()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch_nn.Conv3d):
                m.weight.normal_(0, 0.05)
            if isinstance(m, torch_nn.BatchNorm3d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()

    x = torch.rand(1, 3, 9, 224, 224)
    with torch.no_grad():
        ref = net(x).numpy()  # (1, 1024, T', 1, 1)

    params = convert_i3d({k: v.numpy() for k, v in net.state_dict().items()})
    got = InceptionI3D().apply(
        params, jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy()))
    got_nchw = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got_nchw, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_s3fd_matches_torch_oracle():
    """S3FDNet backbone+heads parity against a torch re-implementation of
    the reference detector (eval/detectors/s3fd/nets.py:28-162), plus an
    end-to-end detect_faces smoke on the decode/NMS tail."""
    import torch
    import torch.nn as torch_nn
    import torch.nn.functional as F

    from actalker_tpu.evaluation.s3fd import (
        S3FD, S3FDNet, convert_s3fd, decode_boxes, nms, priors_for)

    class L2Norm(torch_nn.Module):
        def __init__(self, n, scale):
            super().__init__()
            self.weight = torch_nn.Parameter(torch.full((n,), float(scale)))

        def forward(self, x):
            norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
            return self.weight[None, :, None, None] * x / norm

    class Net(torch_nn.Module):
        def __init__(self):
            super().__init__()
            C = torch_nn.Conv2d
            self.vgg = torch_nn.ModuleList([
                C(3, 64, 3, 1, 1), torch_nn.ReLU(), C(64, 64, 3, 1, 1),
                torch_nn.ReLU(), torch_nn.MaxPool2d(2, 2),
                C(64, 128, 3, 1, 1), torch_nn.ReLU(), C(128, 128, 3, 1, 1),
                torch_nn.ReLU(), torch_nn.MaxPool2d(2, 2),
                C(128, 256, 3, 1, 1), torch_nn.ReLU(), C(256, 256, 3, 1, 1),
                torch_nn.ReLU(), C(256, 256, 3, 1, 1), torch_nn.ReLU(),
                torch_nn.MaxPool2d(2, 2, ceil_mode=True),
                C(256, 512, 3, 1, 1), torch_nn.ReLU(), C(512, 512, 3, 1, 1),
                torch_nn.ReLU(), C(512, 512, 3, 1, 1), torch_nn.ReLU(),
                torch_nn.MaxPool2d(2, 2),
                C(512, 512, 3, 1, 1), torch_nn.ReLU(), C(512, 512, 3, 1, 1),
                torch_nn.ReLU(), C(512, 512, 3, 1, 1), torch_nn.ReLU(),
                torch_nn.MaxPool2d(2, 2),
                C(512, 1024, 3, 1, padding=6, dilation=6), torch_nn.ReLU(),
                C(1024, 1024, 1, 1), torch_nn.ReLU(),
            ])
            self.L2Norm3_3 = L2Norm(256, 10)
            self.L2Norm4_3 = L2Norm(512, 8)
            self.L2Norm5_3 = L2Norm(512, 5)
            self.extras = torch_nn.ModuleList([
                C(1024, 256, 1, 1), C(256, 512, 3, 2, 1),
                C(512, 128, 1, 1), C(128, 256, 3, 2, 1)])
            self.loc = torch_nn.ModuleList(
                [C(c, 4, 3, 1, 1) for c in (256, 512, 512, 1024, 512, 256)])
            self.conf = torch_nn.ModuleList(
                [C(c, n, 3, 1, 1) for c, n in
                 ((256, 4), (512, 2), (512, 2), (1024, 2), (512, 2), (256, 2))])

        def forward(self, x):
            sources, loc, conf = [], [], []
            for k in range(16):
                x = self.vgg[k](x)
            sources.append(self.L2Norm3_3(x))
            for k in range(16, 23):
                x = self.vgg[k](x)
            sources.append(self.L2Norm4_3(x))
            for k in range(23, 30):
                x = self.vgg[k](x)
            sources.append(self.L2Norm5_3(x))
            for k in range(30, len(self.vgg)):
                x = self.vgg[k](x)
            sources.append(x)
            for k, v in enumerate(self.extras):
                x = F.relu(v(x))
                if k % 2 == 1:
                    sources.append(x)
            cx = self.conf[0](sources[0])
            bg = torch.max(cx[:, 0:3], dim=1, keepdim=True)[0]
            conf.append(F.softmax(
                torch.cat([bg, cx[:, 3:]], 1).permute(0, 2, 3, 1), -1))
            loc.append(self.loc[0](sources[0]).permute(0, 2, 3, 1))
            for i in range(1, 6):
                conf.append(F.softmax(
                    self.conf[i](sources[i]).permute(0, 2, 3, 1), -1))
                loc.append(self.loc[i](sources[i]).permute(0, 2, 3, 1))
            return loc, conf

    torch.manual_seed(0)
    net = Net()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch_nn.Conv2d):
                m.weight.normal_(0, 0.03)
                m.bias.normal_(0, 0.02)
    net.eval()

    x = torch.rand(1, 3, 128, 96) * 50
    with torch.no_grad():
        ref_loc, ref_conf = net(x)

    params = convert_s3fd({k: v.numpy() for k, v in net.state_dict().items()})
    got_loc, got_conf = S3FDNet().apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    for a, b in zip(got_loc, ref_loc):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=2e-3,
                                   atol=2e-3)
    for a, b in zip(got_conf, ref_conf):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=2e-3,
                                   atol=2e-3)

    # decode semantics: zero offsets return the priors as corner boxes
    pri = priors_for((128, 96), [tuple(l.shape[1:3]) for l in got_loc])
    dec = decode_boxes(np.zeros_like(pri), pri)
    np.testing.assert_allclose(dec[:, 2] - dec[:, 0], pri[:, 2], atol=1e-6)
    # greedy NMS keeps the higher-scoring of two overlapping boxes
    dets = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8],
                     [50, 50, 60, 60, 0.7]], np.float32)
    assert nms(dets, 0.3).tolist() == [0, 2]

    # end-to-end host path runs and returns (N, 5)
    det = S3FD(params)
    out = det.detect_faces(np.random.default_rng(0).integers(
        0, 255, (128, 96, 3)).astype(np.uint8), conf_th=0.0)
    assert out.ndim == 2 and out.shape[1] == 5
