"""Evaluation harness tests (weight-free mechanics)."""
import numpy as np

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
