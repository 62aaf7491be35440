"""SyncNet audio/lip towers for Sync-C / Sync-D evaluation.

Parity target: ``eval/sync/SyncNetModel.py`` (class ``S``) — the classic
SyncNet: a 2D conv stack over 13x20 MFCC windows (``netcnnaud`` +
``netfcaud``) and a 3D conv stack over 5-frame 224x224 lip crops
(``netcnnlip`` + ``netfclip``), each ending in a 1024-d embedding. The
scoring (shift sweep -> offset / confidence) lives in
``evaluation/metrics.py::sync_scores`` (reference
``SyncNetInstance.py:124-148``).

Eval-mode BatchNorm (running stats as parameters); NHWC / NDHWC layouts.
``convert_syncnet`` maps the published torch state dict (flat Sequential
indices) onto this module — verified against a torch oracle in tests.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (feat, kernel, stride, pad, pool(kernel, stride, pad)) per conv stage
_AUD_SPEC = (
    (64, (3, 3), (1, 1), 1, None),
    (192, (3, 3), (1, 1), 1, ((3, 3), (1, 2), 0)),
    (384, (3, 3), (1, 1), 1, None),
    (256, (3, 3), (1, 1), 1, None),
    (256, (3, 3), (1, 1), 1, ((3, 3), (2, 2), 0)),
    (512, (5, 4), (1, 1), 0, None),
)
_LIP_SPEC = (
    (96, (5, 7, 7), (1, 2, 2), 0, ((1, 3, 3), (1, 2, 2), 0)),
    (256, (1, 5, 5), (1, 2, 2), (0, 1, 1),
     ((1, 3, 3), (1, 2, 2), (0, 1, 1))),
    (256, (1, 3, 3), (1, 1, 1), (0, 1, 1), None),
    (256, (1, 3, 3), (1, 1, 1), (0, 1, 1), None),
    (256, (1, 3, 3), (1, 1, 1), (0, 1, 1), ((1, 3, 3), (1, 2, 2), 0)),
    (512, (1, 6, 6), (1, 1, 1), 0, None),
)


class _BN(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


def _pad(p, nd):
    if isinstance(p, int):
        return [(p, p)] * nd
    return [(q, q) for q in p]


class SyncNet(nn.Module):
    """``embed_audio``: (N, 13, 20, 1) MFCC -> (N, fc_dim);
    ``embed_lip``: (N, 5, 224, 224, 3) frame stacks -> (N, fc_dim).
    Invoke via ``apply(params, x, method=SyncNet.embed_audio)`` etc."""

    fc_dim: int = 1024

    def setup(self):
        for tower, spec in (("aud", _AUD_SPEC), ("lip", _LIP_SPEC)):
            for i, (f, k, s, p, _) in enumerate(spec):
                nd = len(k)
                setattr(self, f"{tower}_conv{i}",
                        nn.Conv(f, k, strides=s, padding=_pad(p, nd)))
                setattr(self, f"{tower}_bn{i}", _BN(f))
            setattr(self, f"{tower}_fc0", nn.Dense(512))
            setattr(self, f"{tower}_bn_fc", _BN(512))
            setattr(self, f"{tower}_fc1", nn.Dense(self.fc_dim))

    def _tower(self, x, tower, spec):
        for i, (_, _, _, _, pool) in enumerate(spec):
            x = getattr(self, f"{tower}_conv{i}")(x)
            x = nn.relu(getattr(self, f"{tower}_bn{i}")(x))
            if pool:
                pk, ps, pp = pool
                x = nn.max_pool(x, pk, strides=ps, padding=_pad(pp, len(pk)))
        # torch flattens channel-major: (N, C, *spatial) order
        x = jnp.moveaxis(x, -1, 1).reshape(x.shape[0], -1)
        x = getattr(self, f"{tower}_fc0")(x)
        x = nn.relu(getattr(self, f"{tower}_bn_fc")(x))
        return getattr(self, f"{tower}_fc1")(x)

    def embed_audio(self, x):
        return self._tower(x, "aud", _AUD_SPEC)

    def embed_lip(self, x):
        return self._tower(x, "lip", _LIP_SPEC)

    def __call__(self, audio, lips) -> Tuple[jax.Array, jax.Array]:
        return self.embed_audio(audio), self.embed_lip(lips)


def convert_syncnet(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Published SyncNet state dict (``netcnnaud.K.*`` / ``netfcaud.K.*`` /
    ``netcnnlip.K.*`` / ``netfclip.K.*``) -> SyncNet params.

    torch Sequential indices of the conv/bn pairs: (0,1), (4,5), (8,9),
    (11,12), (14,15), (18,19) in both towers; fc stacks are
    Linear(0)/BN1d(1)/Linear(3).
    """
    idxs = [(0, 1), (4, 5), (8, 9), (11, 12), (14, 15), (18, 19)]
    dst: Dict[str, Any] = {}

    def t(v):
        return np.asarray(v, np.float32)

    def bn(prefix, src):
        dst[prefix] = {
            "scale": t(sd[f"{src}.weight"]), "bias": t(sd[f"{src}.bias"]),
            "mean": t(sd[f"{src}.running_mean"]),
            "var": t(sd[f"{src}.running_var"]),
        }

    for tower, nd in (("aud", 4), ("lip", 5)):
        seq = f"netcnn{tower}"
        for i, (ci, bi) in enumerate(idxs):
            w = t(sd[f"{seq}.{ci}.weight"])
            perm = (2, 3, 1, 0) if nd == 4 else (2, 3, 4, 1, 0)
            dst[f"{tower}_conv{i}"] = {
                "kernel": np.transpose(w, perm),
                "bias": t(sd[f"{seq}.{ci}.bias"]),
            }
            bn(f"{tower}_bn{i}", f"{seq}.{bi}")
        fc = f"netfc{tower}"
        dst[f"{tower}_fc0"] = {"kernel": np.transpose(t(sd[f"{fc}.0.weight"])),
                               "bias": t(sd[f"{fc}.0.bias"])}
        bn(f"{tower}_bn_fc", f"{fc}.1")
        dst[f"{tower}_fc1"] = {"kernel": np.transpose(t(sd[f"{fc}.3.weight"])),
                               "bias": t(sd[f"{fc}.3.bias"])}
    return {"params": dst}
