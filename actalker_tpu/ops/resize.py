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
