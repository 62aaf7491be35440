"""Farneback dense optical flow + motion-bucket scoring, TPU-native.

The reference scores clip motion with ``cv2.calcOpticalFlowFarneback(prev,
next, None, 0.5, 3, 15, 3, 5, 1.2, 0)`` and maps the per-pair mean flow
magnitude (scaled by 0.1, maxed over pairs) onto a 0..255 motion bucket
(``src/utils/motion_estimation_service.py:33,61-128``). That bucket feeds
``motion_bucket_id`` at train and inference time.

This is Farnebäck's algorithm (two-frame polynomial-expansion flow) built
from XLA-friendly primitives — separable correlations for the quadratic
polynomial fit, bilinear gathers for warping, box filters for the
least-squares aggregation — so the whole estimator jits and runs on TPU (it
also runs fine on host CPU inside the data pipeline).

Algorithm (matching the OpenCV implementation's structure):
  1. per level of a ``pyr_scale`` image pyramid (Gaussian smooth + bilinear
     resize), fit f(x) ~ x^T A x + b^T x + c over a Gaussian window
     (``poly_n``/``poly_sigma``) via separable correlations;
  2. iterate: warp the second frame's polynomial coefficients by the current
     flow, form the local 2x2 normal equations A^T A d = A^T db, box-filter
     them over ``winsize``, and solve per pixel;
  3. upsample the flow (scaled by 1/pyr_scale) into the next level.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _poly_inverse_entries(n: int, sigma: float):
    """Entries of the inverse Gram matrix of the weighted quadratic basis
    {1, x, y, x^2, y^2, xy}; only the entries the update uses (the same four
    the OpenCV implementation keeps: ig11, ig03, ig33, ig55)."""
    k = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(k ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    x = k
    m2 = float((g * x ** 2).sum())
    m4 = float((g * x ** 4).sum())
    # 6x6 Gram matrix for the separable Gaussian weight
    G = np.zeros((6, 6))
    G[0, 0] = 1.0
    G[0, 3] = G[3, 0] = G[0, 4] = G[4, 0] = m2
    G[1, 1] = G[2, 2] = m2
    G[3, 3] = G[4, 4] = m4
    G[3, 4] = G[4, 3] = m2 * m2
    G[5, 5] = m2 * m2
    Gi = np.linalg.inv(G)
    return g.astype(np.float32), float(Gi[1, 1]), float(Gi[0, 3]), \
        float(Gi[3, 3]), float(Gi[5, 5])


def _sep_correlate(img: jax.Array, kx: np.ndarray, ky: np.ndarray):
    """Separable 2D correlation with replicate borders. img: (H, W)."""
    n = (len(kx) - 1) // 2
    p = jnp.pad(img, ((n, n), (n, n)), mode="edge")
    p = p.astype(jnp.float32)
    # rows (correlate along W), then columns
    out = jax.lax.conv_general_dilated(
        p[None, None, :, :], jnp.asarray(kx, jnp.float32)[None, None, None, :],
        (1, 1), "VALID")[0, 0]
    out = jax.lax.conv_general_dilated(
        out[None, None, :, :], jnp.asarray(ky, jnp.float32)[None, None, :, None],
        (1, 1), "VALID")[0, 0]
    return out


def _poly_exp(img: jax.Array, n: int, sigma: float) -> jax.Array:
    """Quadratic polynomial expansion -> (H, W, 5): [bx, by, axx, ayy, axy]."""
    g, ig11, ig03, ig33, ig55 = _poly_inverse_entries(n, sigma)
    k = np.arange(-n, n + 1, dtype=np.float32)
    xg, xxg = k * g, (k * k) * g
    s0 = _sep_correlate(img, g, g)
    sx = _sep_correlate(img, xg, g)
    sy = _sep_correlate(img, g, xg)
    sxx = _sep_correlate(img, xxg, g)
    syy = _sep_correlate(img, g, xxg)
    sxy = _sep_correlate(img, xg, xg)
    return jnp.stack([
        sx * ig11,                     # b_x
        sy * ig11,                     # b_y
        s0 * ig03 + sxx * ig33,        # a_xx
        s0 * ig03 + syy * ig33,        # a_yy
        sxy * ig55,                    # a_xy
    ], axis=-1)


def _bilinear_sample(grid: jax.Array, xs: jax.Array, ys: jax.Array):
    """Sample (H, W, C) at float coords with replicate borders."""
    h, w = grid.shape[:2]
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    v00 = grid[y0, x0]
    v01 = grid[y0, x0 + 1]
    v10 = grid[y0 + 1, x0]
    v11 = grid[y0 + 1, x0 + 1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _box_filter(m: jax.Array, winsize: int) -> jax.Array:
    """Normalized box filter over (H, W, C) with replicate borders."""
    k = np.ones(winsize, np.float32) / winsize
    return jnp.stack([_sep_correlate(m[..., c], k, k)
                      for c in range(m.shape[-1])], axis=-1)


def _flow_iteration(r0: jax.Array, r1: jax.Array, flow: jax.Array,
                    winsize: int) -> jax.Array:
    """One Farneback update: normal equations + box filter + 2x2 solve."""
    h, w = flow.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    r1w = _bilinear_sample(r1, xs + flow[..., 0], ys + flow[..., 1])

    a11 = (r0[..., 2] + r1w[..., 2]) * 0.5
    a22 = (r0[..., 3] + r1w[..., 3]) * 0.5
    a12 = (r0[..., 4] + r1w[..., 4]) * 0.25
    db_x = (r0[..., 0] - r1w[..., 0]) * 0.5 + a11 * flow[..., 0] + a12 * flow[..., 1]
    db_y = (r0[..., 1] - r1w[..., 1]) * 0.5 + a12 * flow[..., 0] + a22 * flow[..., 1]

    m = jnp.stack([
        a11 * a11 + a12 * a12,          # g11
        (a11 + a22) * a12,              # g12
        a22 * a22 + a12 * a12,          # g22
        a11 * db_x + a12 * db_y,        # h1
        a12 * db_x + a22 * db_y,        # h2
    ], axis=-1)
    m = _box_filter(m, winsize)
    g11, g12, g22, h1, h2 = [m[..., i] for i in range(5)]
    det = g11 * g22 - g12 * g12
    idet = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    return jnp.stack([(g22 * h1 - g12 * h2) * idet,
                      (g11 * h2 - g12 * h1) * idet], axis=-1)


def _smooth_resize(img: jax.Array, out_hw: Tuple[int, int], scale: float):
    """Gaussian pre-smooth (sigma from the scale step) + bilinear resize."""
    if scale < 1.0:
        sigma = (1.0 / scale - 1.0) * 0.5
        size = max(int(round(sigma * 5)) | 1, 3)
        k = np.arange(size, dtype=np.float64) - size // 2
        g = np.exp(-(k ** 2) / (2 * sigma ** 2))
        g = (g / g.sum()).astype(np.float32)
        img = _sep_correlate(img, g, g)
    return jax.image.resize(img, out_hw, "bilinear")


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def farneback_flow(prev_gray: jax.Array, next_gray: jax.Array,
                   pyr_scale: float = 0.5, levels: int = 3,
                   winsize: int = 15, iterations: int = 3,
                   poly_n: int = 5, poly_sigma: float = 1.2) -> jax.Array:
    """Dense flow (H, W, 2) [dx, dy] from prev to next; grayscale float
    inputs (0..255). Parameter semantics follow
    ``cv2.calcOpticalFlowFarneback`` (``motion_estimation_service.py:33``)."""
    h, w = prev_gray.shape
    n_levels = levels
    # keep levels where the image still supports the polynomial window
    while n_levels > 0 and min(h, w) * pyr_scale ** n_levels < 2 * poly_n + 3:
        n_levels -= 1

    flow = None
    for k in range(n_levels, -1, -1):
        scale = pyr_scale ** k
        lh, lw = max(int(round(h * scale)), 2 * poly_n + 3), \
            max(int(round(w * scale)), 2 * poly_n + 3)
        p = _smooth_resize(prev_gray.astype(jnp.float32), (lh, lw), scale)
        q = _smooth_resize(next_gray.astype(jnp.float32), (lh, lw), scale)
        r0 = _poly_exp(p, poly_n, poly_sigma)
        r1 = _poly_exp(q, poly_n, poly_sigma)
        if flow is None:
            flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            flow = jax.image.resize(flow, (lh, lw, 2), "bilinear") / pyr_scale
        for _ in range(iterations):
            flow = _flow_iteration(r0, r1, flow, winsize)
    return flow


def flow_magnitude_score(flow: np.ndarray) -> float:
    """Mean |flow| * 0.1 (``motion_estimation_service.py:61-73``)."""
    mag = np.sqrt(np.square(flow[..., 0]) + np.square(flow[..., 1]))
    return float(np.mean(mag) * 0.1)


def magnitude_to_bucket(magnitude: float) -> int:
    """``motion_estimation_service.py:75-80``."""
    return int(min(max(round(magnitude * 255), 0), 255))


def get_motion_score(frames: np.ndarray) -> int:
    """Motion bucket of a clip (T, H, W, C uint8/float, **RGB** as produced
    by ``frontend.video.read_frames``): Farneback flow per consecutive pair,
    mean magnitude per pair, max over pairs -> bucket
    (``motion_estimation_service.py:114-128``; the reference converts BGR
    decord frames with cv2.COLOR_BGR2GRAY — same luma weights, RGB order
    here)."""
    if len(frames) < 2:
        return 0
    f = np.asarray(frames, np.float32)
    gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2] \
        if f.ndim == 4 else f
    pair_scores = []
    for a, b in zip(gray[:-1], gray[1:]):
        flow = np.asarray(farneback_flow(jnp.asarray(a), jnp.asarray(b)))
        pair_scores.append(flow_magnitude_score(flow))
    return magnitude_to_bucket(max(pair_scores))
