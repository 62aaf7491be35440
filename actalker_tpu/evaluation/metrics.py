"""Quality-metric harness (TPU-native counterpart of the reference ``eval/``
tree, SURVEY.md section 2.9).

Weight-free metrics (PSNR / SSIM / L1) are computed directly; distribution
metrics take pluggable feature extractors so any embedding tower (InceptionV3
for FID — ``eval/eval_fid.py:42-99``; I3D for FVD —
``utils/video_level_evaluation.py:104-133``; VGGFace2/ArcFace for identity
cosine — ``eval/evaluation_faceid.py:181-266``) can be dropped in once its
weights are converted. The Frechet distance itself is exact (numpy/scipy-free
Newton-Schulz sqrtm).
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


# ------------------------------------------------------------ pixel metrics

def l1(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(np.abs(a.astype(np.float64) - b.astype(np.float64))))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gauss_filter2d(x: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filtering over the leading two axes."""
    x = np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="valid"), 0, x)
    return np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="valid"), 1, x)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5) -> float:
    """Windowed SSIM (Wang et al. 2004: 11x11 gaussian window, sigma 1.5,
    k1/k2 = 0.01/0.03) over (H, W[, C]) arrays, mean over positions and
    channels — comparable with literature numbers (VERDICT r1 weak #7
    replaced the previous global-moment approximation)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    # np.convolve 'valid' SWAPS operands when the signal is shorter than the
    # kernel, which would silently filter the kernel by the image — shrink
    # the window (odd, skimage-style) instead of returning garbage
    win_size = min(win_size, min(a.shape[0], a.shape[1]))
    win_size -= 1 - win_size % 2
    half = (win_size - 1) / 2
    g = np.exp(-((np.arange(win_size) - half) ** 2) / (2 * sigma**2))
    g /= g.sum()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mu_x = _gauss_filter2d(x, g)
        mu_y = _gauss_filter2d(y, g)
        xx = _gauss_filter2d(x * x, g) - mu_x**2
        yy = _gauss_filter2d(y * y, g) - mu_y**2
        xy = _gauss_filter2d(x * y, g) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


# ----------------------------------------------------------- distributions

def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, sigma)."""
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def _sqrtm_psd(mat: np.ndarray, iters: int = 30) -> np.ndarray:
    """Matrix square root of a PSD matrix via eigendecomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)[None]) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (semantics of ``eval_fid.py:42-99``)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    # sqrtm((sigma1+eps I) @ (sigma2+eps I)) via the symmetric-form trick
    # (trace-equal to the non-symmetric product for PSD inputs); the eps
    # offset regularizes both factors like the reference's retry path
    # (eval_fid.py:60-66) rather than adding a second eps under the root.
    eye = eps * np.eye(len(sigma1))
    s1h = _sqrtm_psd(sigma1 + eye)
    covmean = _sqrtm_psd(s1h @ (sigma2 + eye) @ s1h)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid(
    real_frames: Iterable[np.ndarray],
    fake_frames: Iterable[np.ndarray],
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batch: int = 32,
) -> float:
    """FID over frame iterables with a pluggable feature extractor."""

    def stats(frames):
        feats = []
        buf = []
        for f in frames:
            buf.append(f)
            if len(buf) == batch:
                feats.append(np.asarray(feature_fn(np.stack(buf))))
                buf = []
        if buf:
            feats.append(np.asarray(feature_fn(np.stack(buf))))
        return activation_statistics(np.concatenate(feats, axis=0))

    mu1, s1 = stats(real_frames)
    mu2, s2 = stats(fake_frames)
    return frechet_distance(mu1, s1, mu2, s2)


def fvd(real_clips: np.ndarray, fake_clips: np.ndarray,
        video_feature_fn: Callable[[np.ndarray], np.ndarray]) -> float:
    """Frechet video distance given an I3D-style clip embedder."""
    f1 = np.asarray(video_feature_fn(real_clips))
    f2 = np.asarray(video_feature_fn(fake_clips))
    return frechet_distance(*activation_statistics(f1),
                            *activation_statistics(f2))


# -------------------------------------------------------------- identity

def identity_cosine(
    ref_image: np.ndarray,
    frames: np.ndarray,
    embed_fn: Callable[[np.ndarray], np.ndarray],
) -> float:
    """Mean cosine similarity between the reference face embedding and each
    generated frame's embedding (``evaluation_faceid.py:181-266``)."""
    ref = np.asarray(embed_fn(ref_image[None]))[0]
    emb = np.asarray(embed_fn(frames))
    ref = ref / (np.linalg.norm(ref) + 1e-8)
    emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
    return float(np.mean(emb @ ref))


# ------------------------------------------------------------------ sync

def sync_scores(
    audio_emb: np.ndarray,   # (T, D) per-window audio embeddings
    video_emb: np.ndarray,   # (T, D) per-window lip embeddings
    vshift: int = 15,
) -> Tuple[int, float, float]:
    """SyncNet-style (offset, confidence=Sync-C, min distance=Sync-D) from
    precomputed tower embeddings (``eval/sync/SyncNetInstance.py:42-148``):
    slide the audio track +-vshift windows, compute mean pairwise L2 distance
    per shift; offset = argmin, confidence = median(dist) - min(dist)."""
    t = min(len(audio_emb), len(video_emb))
    audio_emb, video_emb = audio_emb[:t], video_emb[:t]
    dists = []
    for shift in range(-vshift, vshift + 1):
        a = audio_emb[max(0, shift): t + min(0, shift)]
        v = video_emb[max(0, -shift): t - max(0, shift)]
        n = min(len(a), len(v))
        if n == 0:
            dists.append(np.inf)
            continue
        dists.append(float(np.mean(np.linalg.norm(a[:n] - v[:n], axis=-1))))
    dists = np.asarray(dists)
    idx = int(np.argmin(dists))
    offset = idx - vshift
    conf = float(np.median(dists) - dists[idx])
    return offset, conf, float(dists[idx])


def lpips(a: np.ndarray, b: np.ndarray, params) -> float:
    """Mean LPIPS over frame pairs; frames (N, H, W, 3) in [0, 1].

    ``params`` are LPIPSAlex weights (``evaluation/lpips.py``), converted
    from a torch ``lpips`` checkpoint with ``convert_lpips``. Counterpart of
    the reference's ``utils/image_level_evaluation.py:12-50``.
    """
    import jax.numpy as jnp

    from actalker_tpu.evaluation.lpips import lpips_distance

    d = lpips_distance(params, jnp.asarray(a) * 2.0 - 1.0,
                       jnp.asarray(b) * 2.0 - 1.0)
    return float(np.asarray(d).mean())
