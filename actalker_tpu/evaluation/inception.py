"""FID InceptionV3 feature extractor, TPU-native.

The reference computes FID through a vendored pytorch-fid InceptionV3
(``eval/inception.py:16-161``): torchvision's inception_v3 graph with the
FID-specific patches (``fid_inception_v3``, ``eval/inception.py:195-217``):

  * InceptionA/C/E average-pool branches use TF semantics — the zero padding
    is excluded from the average (``count_include_pad=False``,
    ``eval/inception.py:238-240``);
  * the second InceptionE (Mixed_7c) uses a max-pool branch instead of
    average (``eval/inception.py:336-341``);
  * 1008-class head (unused for features).

Here the same graph is a flax module in NHWC with every BatchNorm *folded
into its conv* at conversion time (inference-only network, so the fold is
exact and saves one HBM round-trip per conv on TPU). The converter accepts
the published ``pt_inception-2015-12-05`` state dict.

Feature blocks mirror the reference indices (``eval/inception.py:24-29``):
0 = first maxpool (64ch), 1 = second maxpool (192ch), 2 = pre-aux (768ch),
3 = final average pool (2048ch, the FID default).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _pool(x, window, strides, padding, kind):
    """2D pool over NHWC. 'avg_tf' excludes padding from the denominator."""
    dims = (1, window, window, 1)
    strd = (1, strides, strides, 1)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strd, pad)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strd, pad)
    if kind == "avg_tf":  # count_include_pad=False
        ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
        cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strd, pad)
        return s / cnt
    return s / float(window * window)


class _Conv(nn.Module):
    """BasicConv2d with the BN folded in: conv(+bias) -> relu."""
    features: int
    kernel: Sequence[int]
    strides: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if isinstance(p, int):
            p = (p, p)
        pad = [(p[0], p[0]), (p[1], p[1])]
        y = nn.Conv(self.features, tuple(self.kernel), (self.strides,) * 2,
                    padding=pad, name="conv")(x)
        return nn.relu(y)


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _Conv(64, (1, 1), name="branch1x1")(x)
        b5 = _Conv(48, (1, 1), name="branch5x5_1")(x)
        b5 = _Conv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = _Conv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = _Conv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = _Conv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _pool(x, 3, 1, 1, "avg_tf")
        bp = _Conv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _Conv(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = _Conv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = _Conv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = _Conv(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = _pool(x, 3, 2, 0, "max")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = _Conv(192, (1, 1), name="branch1x1")(x)
        b7 = _Conv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = _Conv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = _Conv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = _Conv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = _Conv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _Conv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _Conv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _Conv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _pool(x, 3, 1, 1, "avg_tf")
        bp = _Conv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _Conv(192, (1, 1), name="branch3x3_1")(x)
        b3 = _Conv(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = _Conv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = _Conv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _Conv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _Conv(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = _pool(x, 3, 2, 0, "max")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class _InceptionE(nn.Module):
    pool_kind: str  # 'avg_tf' (Mixed_7b) or 'max' (Mixed_7c, FID patch)

    @nn.compact
    def __call__(self, x):
        b1 = _Conv(320, (1, 1), name="branch1x1")(x)
        b3 = _Conv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _Conv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            _Conv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _Conv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = _Conv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _Conv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            _Conv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _pool(x, 3, 1, 1, self.pool_kind)
        bp = _Conv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Inputs (B, H, W, 3) in [0, 1]; returns features of ``output_blocks``
    (global pooled for block 3, feature maps otherwise), list sorted by index
    — matching ``eval/inception.py:130-161``."""
    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        last = max(self.output_blocks)
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        out = []

        x = _Conv(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = _Conv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = _Conv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _pool(x, 3, 2, 0, "max")
        if 0 in self.output_blocks:
            out.append(x)
        if last == 0:
            return out

        x = _Conv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = _Conv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, 3, 2, 0, "max")
        if 1 in self.output_blocks:
            out.append(x)
        if last == 1:
            return out

        x = _InceptionA(32, name="Mixed_5b")(x)
        x = _InceptionA(64, name="Mixed_5c")(x)
        x = _InceptionA(64, name="Mixed_5d")(x)
        x = _InceptionB(name="Mixed_6a")(x)
        x = _InceptionC(128, name="Mixed_6b")(x)
        x = _InceptionC(160, name="Mixed_6c")(x)
        x = _InceptionC(160, name="Mixed_6d")(x)
        x = _InceptionC(192, name="Mixed_6e")(x)
        if 2 in self.output_blocks:
            out.append(x)
        if last == 2:
            return out

        x = _InceptionD(name="Mixed_7a")(x)
        x = _InceptionE("avg_tf", name="Mixed_7b")(x)
        x = _InceptionE("max", name="Mixed_7c")(x)
        out.append(jnp.mean(x, axis=(1, 2)))  # adaptive avg pool to 1x1
        return out


def convert_fid_inception(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Fold each ``<prefix>.conv`` + ``<prefix>.bn`` pair of the pytorch-fid
    state dict into one flax conv: W' = W * g/sqrt(v+eps), b' = b - m*g/sqrt.
    (BN eps 0.001, torchvision BasicConv2d.)"""
    def t(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    prefixes = sorted({k[:-len(".conv.weight")] for k in state_dict
                       if k.endswith(".conv.weight")})
    params: Dict[str, Any] = {}
    for pref in prefixes:
        w = t(state_dict[f"{pref}.conv.weight"])        # (O, I, kh, kw)
        g = t(state_dict[f"{pref}.bn.weight"])
        b = t(state_dict[f"{pref}.bn.bias"])
        m = t(state_dict[f"{pref}.bn.running_mean"])
        v = t(state_dict[f"{pref}.bn.running_var"])
        s = g / np.sqrt(v + 1e-3)
        kernel = np.transpose(w * s[:, None, None, None], (2, 3, 1, 0))
        bias = b - m * s
        node: Dict[str, Any] = params
        parts = pref.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"conv": {"kernel": kernel, "bias": bias}}
    return {"params": params}


def make_inception_feature_fn(params, output_block: int = 3):
    """A jitted ``(B, H, W, 3) float [0,1] -> (B, D)`` extractor for
    ``metrics.fid`` (pooled; spatial maps are average-pooled like
    ``eval_fid.py`` does for non-final blocks)."""
    model = FIDInceptionV3(output_blocks=(output_block,))

    @jax.jit
    def fn(frames):
        feats = model.apply(params, jnp.asarray(frames, jnp.float32))[0]
        if feats.ndim == 4:
            feats = jnp.mean(feats, axis=(1, 2))
        return feats

    return fn
