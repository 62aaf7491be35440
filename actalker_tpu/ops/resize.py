"""Exact torch-semantics resamplers.

``jax.image.resize(method='cubic')`` uses the Keys kernel with a = -0.5;
torch's ``F.interpolate(mode='bicubic', align_corners=False)`` — what the
reference's ``IPAdapterMaskProcessor.downsample`` calls
(``diffusers.image_processor``; used at
``src/models/base/attention_processor.py:2892-2900`` and
``src/models/base/mamba_layer.py:1962,1975``) — uses a = -0.75 with no
antialiasing. The two differ by up to ~0.3 on binary region masks and flip
which tokens the v10 mamba branch selects, so parity needs the torch kernel
bit-for-bit.

Implementation: separable cubic convolution realized as two static weight
matrices (built in numpy at trace time — shapes are static under jit), so the
device op is two small matmuls.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch/OpenCV cubic convolution coefficient


def _cubic_weights(t: float):
    """4-tap cubic convolution weights at fractional offset t in [0, 1)."""
    def w_near(x):   # |x| <= 1
        return ((_A + 2) * x - (_A + 3)) * x * x + 1
    def w_far(x):    # 1 < |x| < 2
        return ((_A * x - 5 * _A) * x + 8 * _A) * x - 4 * _A
    return (w_far(t + 1), w_near(t), w_near(1 - t), w_far(2 - t))


@functools.lru_cache(maxsize=256)
def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) resampling matrix matching torch upsample_bicubic2d
    (align_corners=False, antialias=False): source coordinate
    (i + 0.5) * (n_in / n_out) - 0.5, edge-clamped taps."""
    scale = n_in / n_out
    w = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale - 0.5
        i0 = math.floor(center)
        for k, wk in enumerate(_cubic_weights(center - i0)):
            w[i, min(max(i0 - 1 + k, 0), n_in - 1)] += wk
    return w.astype(np.float32)


def torch_bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize the last two axes of ``x`` with torch-exact bicubic sampling.

    Accepts any leading batch/channel axes; computes in fp32.
    """
    h, wdim = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(_bicubic_matrix(h, out_h))
    ww = jnp.asarray(_bicubic_matrix(wdim, out_w))
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    return jnp.einsum("pw,...ow->...op", ww, y)


@functools.lru_cache(maxsize=256)
def _bicubic_matrix_ac(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix matching torch bicubic align_corners=True:
    source coordinate i * (n_in - 1) / (n_out - 1), edge-clamped taps."""
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    w = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = i * scale
        i0 = math.floor(center)
        for k, wk in enumerate(_cubic_weights(center - i0)):
            w[i, min(max(i0 - 1 + k, 0), n_in - 1)] += wk
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _gaussian_blur_matrix(n: int, ks: int, sigma: float) -> np.ndarray:
    """(n, n) matrix applying the reference's 1-D gaussian blur along an axis
    (kernel ``exp(-x^2 / 2 sigma^2)`` at integer offsets from ``ks // 2``,
    normalized; reflect padding), matching ``_gaussian`` + ``_filter2d`` in
    the reference pipeline (``pipeline_..._vasa_two_ip.py:831-883``)."""
    x = np.arange(ks, dtype=np.float64) - ks // 2
    if ks % 2 == 0:
        x = x + 0.5
    g = np.exp(-x**2 / (2.0 * sigma**2))
    g = g / g.sum()
    pad_front = (ks - 1) // 2
    w = np.zeros((n, n), np.float64)
    for i in range(n):
        for k in range(ks):
            # torch reflect pad: index -j maps to j, n-1+j maps to n-1-j
            j = i - pad_front + k
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            w[i, j] += g[k]
    return w.astype(np.float32)


def resize_with_antialiasing(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Gaussian-prefiltered bicubic resize of the last two axes.

    Parity with the reference pipeline's ``_resize_with_antialiasing``
    (``pipeline_svd_audio_adapter_motionexp_idembed_vasa_two_ip.py:779-805``):
    skimage-style sigma ``max((in/out - 1) / 2, 0.001)`` per axis, kernel size
    ``max(4 * sigma, 3)`` forced odd (height only gets the +1 when even, as in
    the reference), separable gaussian blur with reflect padding, then bicubic
    interpolation with ``align_corners=True``. Used by the SVD lineage for
    CLIP-size (224) resize of the reference image; the production two_ip
    pipeline replaces CLIP with the ArcFace id-embedding so this sits on the
    compat path. Computes in fp32; static shapes (matrices built in numpy).
    """
    h, wdim = x.shape[-2], x.shape[-1]
    sig_h = max((h / out_h - 1.0) / 2.0, 0.001)
    sig_w = max((wdim / out_w - 1.0) / 2.0, 0.001)
    ks_h = int(max(4.0 * sig_h, 3))
    ks_w = int(max(4.0 * sig_w, 3))
    # the reference's odd-forcing quirk: an even ks_h bumps only ks_h, an even
    # ks_w bumps only ks_w (two independent ifs on the tuple)
    if ks_h % 2 == 0:
        ks_h += 1
    if ks_w % 2 == 0:
        ks_w += 1
    bh = jnp.asarray(_gaussian_blur_matrix(h, ks_h, sig_h))
    bw = jnp.asarray(_gaussian_blur_matrix(wdim, ks_w, sig_w))
    y = x.astype(jnp.float32)
    # reference blurs x (width) first, then y (height); separable so order
    # only matters for rounding
    y = jnp.einsum("pw,...hw->...hp", bw, y)
    y = jnp.einsum("oh,...hp->...op", bh, y)
    wh = jnp.asarray(_bicubic_matrix_ac(h, out_h))
    ww = jnp.asarray(_bicubic_matrix_ac(wdim, out_w))
    y = jnp.einsum("oh,...hw->...ow", wh, y)
    return jnp.einsum("pw,...ow->...op", ww, y)
