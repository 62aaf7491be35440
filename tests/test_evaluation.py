"""Evaluation harness tests (weight-free mechanics)."""
import numpy as np
import jax.numpy as jnp

from actalker_tpu.evaluation import metrics as M


def test_psnr_ssim_l1():
    a = np.random.default_rng(0).uniform(0, 1, (16, 16, 3))
    assert M.psnr(a, a) == float("inf")
    assert M.l1(a, a) == 0.0
    assert abs(M.ssim(a, a) - 1.0) < 1e-9
    b = np.clip(a + 0.1, 0, 1)
    assert M.psnr(a, b) < 30
    assert M.ssim(a, b) < 1.0


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
