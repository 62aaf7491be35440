"""I3D (Inception-v1 3D) video feature extractor for FVD, TPU-native.

The reference computes FVD with a vendored Kinetics I3D
(``utils/pytorch_i3d.py:152-338``) whose ``Unit3D``/``MaxPool3dSamePadding``
re-implement TF SAME padding by hand (``pytorch_i3d.py:13-45,82-113``) — on
XLA that is literally ``padding="SAME"``, so the graph here is the natural
one. BatchNorms (eps 0.001) are folded into their convs at conversion time
(inference-only). ``extract_features`` = endpoint Mixed_5c -> avg-pool
(2,7,7)/1 (``pytorch_i3d.py:334-338``); the FVD driver feeds 224x224 RGB in
[0, 1] (``utils/video_level_evaluation.py:101-126``).

Layout here: clips are (B, T, H, W, 3) NTHWC.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# InceptionModule output channels per branch: (b0, b1a, b1b, b2a, b2b, b3b)
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


def _maxpool_same(x, window, strides):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


class _Unit3D(nn.Module):
    """Unit3D with the BN folded in: SAME conv(+bias) -> relu."""
    features: int
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, tuple(self.kernel), tuple(self.strides),
                    padding="SAME", name="conv3d")(x)
        return nn.relu(y)


class _InceptionModule(nn.Module):
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = _Unit3D(c[0], name="b0")(x)
        b1 = _Unit3D(c[2], (3, 3, 3), name="b1b")(_Unit3D(c[1], name="b1a")(x))
        b2 = _Unit3D(c[4], (3, 3, 3), name="b2b")(_Unit3D(c[3], name="b2a")(x))
        b3 = _Unit3D(c[5], name="b3b")(_maxpool_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    """``extract_features`` endpoint: (B, T, H, W, 3) in [0, 1] -> pooled
    1024-d feature maps (B, T', H', W', 1024)."""

    @nn.compact
    def __call__(self, x):
        x = _Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = _Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = _Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = _InceptionModule(_MIXED["Mixed_3b"], name="Mixed_3b")(x)
        x = _InceptionModule(_MIXED["Mixed_3c"], name="Mixed_3c")(x)
        x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
        for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = _InceptionModule(_MIXED[ep], name=ep)(x)
        x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
        x = _InceptionModule(_MIXED["Mixed_5b"], name="Mixed_5b")(x)
        x = _InceptionModule(_MIXED["Mixed_5c"], name="Mixed_5c")(x)
        # avg_pool kernel (2,7,7) stride 1, VALID (pytorch_i3d.py:293-294)
        return nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")


def convert_i3d(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the Kinetics/Charades I3D torch state dict (``rgb_charades.pt``
    layout: ``<endpoint>.conv3d.weight`` + ``<endpoint>.bn.*``) to folded
    flax params. The classifier head (``logits.*``) is not part of the
    feature extractor and is ignored."""
    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    params: Dict[str, Any] = {}
    for key in state_dict:
        if not key.endswith(".conv3d.weight") or key.startswith("logits"):
            continue
        pref = key[:-len(".conv3d.weight")]
        w = t(state_dict[key])                           # (O, I, kt, kh, kw)
        g = t(state_dict[f"{pref}.bn.weight"])
        b = t(state_dict[f"{pref}.bn.bias"])
        m = t(state_dict[f"{pref}.bn.running_mean"])
        v = t(state_dict[f"{pref}.bn.running_var"])
        s = g / np.sqrt(v + 1e-3)
        kernel = np.transpose(w * s[:, None, None, None, None],
                              (2, 3, 4, 1, 0))            # -> (kt,kh,kw,I,O)
        node: Dict[str, Any] = params
        for p in pref.split("."):
            node = node.setdefault(p, {})
        node["conv3d"] = {"kernel": kernel, "bias": b - m * s}
    return {"params": params}


def make_i3d_feature_fn(params):
    """A jitted ``(B, T, 224, 224, 3) float [0,1] -> (B, 1024)`` clip embedder
    for ``metrics.fvd`` (features averaged over the remaining time axis)."""
    model = InceptionI3D()

    @jax.jit
    def fn(clips):
        feats = model.apply(params, jnp.asarray(clips, jnp.float32))
        return jnp.mean(feats, axis=(1, 2, 3))

    return fn
