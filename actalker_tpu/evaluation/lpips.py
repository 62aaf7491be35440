"""LPIPS perceptual distance (AlexNet variant), TPU-native.

The reference's eval harness computes LPIPS through the ``lpips`` pip
package (``utils/image_level_evaluation.py:12-50``). That package is a
torchvision AlexNet feature extractor + per-stage 1x1 "lin" heads; here the
same computation is a flax module (NHWC, fused into XLA with the rest of the
metric pass) plus a converter for the published torch weights — the standard
``lpips`` state dict (AlexNet features under ``net.sliceK.J.*``, heads under
``linK.model.1.weight``) loads directly.

Forward (matching lpips.LPIPS(net='alex'), inputs in [-1, 1]):
  scale    x' = (x - shift) / scale                    (ImageNet whitening)
  features 5 conv stages of AlexNet (relu outputs)
  norm     unit-normalize each stage over channels (eps 1e-10)
  diff     (f(x) - f(y))^2 -> 1x1 lin head -> spatial mean -> sum stages
"""
from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stages: (out_ch, kernel, stride, pad, maxpool_before)
_STAGES = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


class LPIPSAlex(nn.Module):
    """Returns per-pair LPIPS distances, shape (B,). Inputs (B, H, W, 3)
    in [-1, 1] (NHWC)."""

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        convs = [nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                         name=f"conv{i}")
                 for i, (ch, k, s, p, _) in enumerate(_STAGES)]

        def stages(img):
            h = (img - _SHIFT) / _SCALE
            feats = []
            for conv, (_, _, _, _, pool) in zip(convs, _STAGES):
                if pool:
                    h = nn.max_pool(h, (3, 3), strides=(2, 2))
                h = nn.relu(conv(h))
                feats.append(h)
            return feats

        fx = stages(x)
        fy = stages(y)  # shared conv modules -> shared params

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (d.shape[-1],), jnp.float32)
            # lpips lin head: 1x1 conv, no bias — a channel dot product
            total = total + jnp.mean(d @ w, axis=(1, 2))
        return total


def convert_lpips(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torch ``lpips.LPIPS(net='alex')`` state dict to LPIPSAlex params.

    Accepts either the full state dict (with ``net.sliceK.J.weight``) or the
    weights-only release file (``linK.model.1.weight`` heads) merged with an
    AlexNet features dict (``features.J.weight``).
    """
    import numpy as np

    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    # AlexNet torchvision feature indices for the 5 convs
    feat_idx = [0, 3, 6, 8, 10]
    # lpips slices: sliceK contains original indices; conv lives at the
    # original index inside the slice-Sequential
    slice_of = {0: (1, 0), 1: (2, 3), 2: (3, 6), 3: (4, 8), 4: (5, 10)}
    params: Dict[str, Any] = {}
    for i in range(5):
        sk, j = slice_of[i]
        for cand in (f"net.slice{sk}.{j}", f"features.{feat_idx[i]}"):
            if f"{cand}.weight" in state_dict:
                w = t(state_dict[f"{cand}.weight"])  # (O, I, kh, kw)
                params[f"conv{i}"] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),
                    "bias": t(state_dict[f"{cand}.bias"]),
                }
                break
        else:
            raise KeyError(f"missing AlexNet conv {i} in state dict")
        lin_key = f"lin{i}.model.1.weight"
        if lin_key not in state_dict:
            lin_key = f"lins.{i}.model.1.weight"
        params[f"lin{i}"] = t(state_dict[lin_key]).reshape(-1)
    return {"params": params}


def lpips_distance(params, x, y) -> jax.Array:
    """Functional entry: LPIPS over (B, H, W, 3) pairs in [-1, 1]."""
    return LPIPSAlex().apply(params, x, y)
