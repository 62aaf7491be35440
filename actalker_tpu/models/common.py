"""Shared building blocks for the model layer.

Conventions (TPU-native):
  * images/features are NHWC: (batch, height, width, channels);
  * video features are (batch, frames, H, W, C) — flattened to (B*F, H, W, C)
    for spatial ops and (B*HW, F, C) for temporal ops;
  * ``dtype`` is the computation dtype (bf16 on TPU), ``param_dtype`` the
    storage dtype; normalization statistics are always computed in fp32.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Normalization statistics lowering: "reduce" = jnp.mean (VPU reduce),
# "matmul" = ones-vector einsum with f32 accumulation, which XLA routes to
# the MXU. A/B on the v5e bench step (2026-08-18, outputs/perf_r02.log):
# steady-state reduce = 1.069 s/step vs matmul = 1.112 s/step, so "reduce"
# stays the default. (A first-run-after-tunnel-flap reading of 7.2 s for
# reduce did not reproduce — treat wild bench readings as transient and
# re-measure.) Flip with set_norm_stats_impl() or the ACTALKER_NORM_STATS
# env var; traces pick the value up at trace time.
import os as _os

_NORM_STATS_IMPL = _os.environ.get("ACTALKER_NORM_STATS", "reduce")
assert _NORM_STATS_IMPL in ("reduce", "matmul"), _NORM_STATS_IMPL

# Norm lowering: "xla" (default) keeps the plain stats+affine lowering
# below; "fused" routes LayerNorm/GroupNorm through the Pallas kernels in
# ops/norms.py. Measured on the v5e bench step (2026-08-18): fused LOSES
# ~75 ms/step (1.145 vs 1.069 s at bhsd attention, 1.119 vs 1.046 at
# tokens) — the custom-call boundary breaks XLA's fusion of the norm affine
# with neighboring residual/activation work and adds its own operand
# copies, costing more than the stats-tuple layout entanglement it removes.
# Kept as an opt-in experiment switch (ACTALKER_NORM / set_norm_impl).
_NORM_IMPL = _os.environ.get("ACTALKER_NORM", "xla")
assert _NORM_IMPL in ("fused", "xla"), _NORM_IMPL

# GroupNorm stats/producer fission: "1" puts an optimization_barrier on the
# GroupNorm input so XLA cannot fuse the fp32 stats reductions into the
# producing conv's output fusion (profiled r4: GN-stats-fused convs run at
# ~50% MFU vs ~90% for plain convs — the stats reduction wrecks the conv's
# tiling). Costs one extra HBM read of x for the affine pass; A/B knob.
_GN_BARRIER = _os.environ.get("ACTALKER_GN_BARRIER", "0") == "1"


def set_norm_impl(impl: str) -> None:
    global _NORM_IMPL
    assert impl in ("fused", "xla"), impl
    _NORM_IMPL = impl


def set_norm_stats_impl(impl: str) -> None:
    global _NORM_STATS_IMPL
    assert impl in ("reduce", "matmul"), impl
    _NORM_STATS_IMPL = impl


def _moments_lastaxis(x, impl):
    """fp32 (mean, mean-of-squares) over the channel (last) axis."""
    if impl == "matmul":
        c = x.shape[-1]
        ones = jnp.ones((c,), x.dtype)
        s1 = jnp.einsum("...c,c->...", x, ones,
                        preferred_element_type=jnp.float32)[..., None] / c
        s2 = jnp.einsum("...c,...c,c->...", x, x, ones,
                        preferred_element_type=jnp.float32)[..., None] / c
        return s1, s2
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
    return mean, mean2


class GroupNorm32(nn.Module):
    """GroupNorm over the channel-last axis with fp32 statistics regardless of
    compute dtype. Params are flat ('scale'/'bias') for converter simplicity."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        groups = self.num_groups if c >= self.num_groups else c
        assert c % groups == 0, (c, groups)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if _NORM_IMPL == "fused":
            from actalker_tpu.ops.norms import group_norm

            return group_norm(x, scale, bias, groups, self.epsilon)
        if _GN_BARRIER:
            x = jax.lax.optimization_barrier(x)
        shape = x.shape
        n = shape[0]
        red_axes = tuple(range(1, x.ndim - 1))
        # Stats in the native (..., C) layout (a grouped reshape would put
        # C//groups — e.g. 10 — on the lane dim: pathological tiling). Two
        # channel-wise fp32 reductions, then a tiny per-group average, then
        # one fused per-channel affine. No fp32 copy of x ever hits HBM.
        if _NORM_STATS_IMPL == "matmul":
            xf = x.reshape(n, -1, c)
            ones = jnp.ones((xf.shape[1],), x.dtype)
            s1 = jnp.einsum("nsc,s->nc", xf, ones,
                            preferred_element_type=jnp.float32) / xf.shape[1]
            s2 = jnp.einsum("nsc,nsc,s->nc", xf, xf, ones,
                            preferred_element_type=jnp.float32) / xf.shape[1]
        else:
            s1 = jnp.mean(x, axis=red_axes, dtype=jnp.float32)        # (N, C)
            s2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red_axes)
        mean_g = s1.reshape(n, groups, c // groups).mean(axis=2)      # (N, G)
        mean2_g = s2.reshape(n, groups, c // groups).mean(axis=2)
        var_g = jnp.maximum(mean2_g - jnp.square(mean_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)
        inv_c = jnp.repeat(inv_g, c // groups, axis=1)                # (N, C)
        mean_c = jnp.repeat(mean_g, c // groups, axis=1)
        a = inv_c * scale[None]
        b = bias[None] - mean_c * a
        bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
        # Affine in the activation dtype: an f32 `a` would promote the whole
        # map to f32 (profiled: 294 MB f32 broadcasts per temporal-GN call).
        # Stats above stay fp32; the bf16 rounding of a/b is within bf16
        # activation noise.
        a = a.astype(orig_dtype)
        b = b.astype(orig_dtype)
        y = x * a.reshape(bshape) + b.reshape(bshape)
        return y.astype(orig_dtype)


class LayerNormF32(nn.Module):
    """``impl``: None follows the global ACTALKER_NORM switch; "fused"/"xla"
    pin this call site (profiling showed entanglement is per-site: fusing
    EVERY norm loses ~75 ms/step, but specific seams may win)."""

    epsilon: float = 1e-5
    impl: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if (self.impl or _NORM_IMPL) == "fused":
            from actalker_tpu.ops.norms import layer_norm

            return layer_norm(x, scale, bias, self.epsilon)
        mean, mean2 = _moments_lastaxis(x, _NORM_STATS_IMPL)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        a = jax.lax.rsqrt(var + self.epsilon) * scale
        b = bias - mean * a
        # Apply in the activation dtype (see GroupNorm32: an f32 affine
        # promotes the whole tensor to f32 on the way through).
        y = x * a.astype(orig_dtype) + b.astype(orig_dtype)
        return y.astype(orig_dtype)


def dense(features: int, use_bias: bool = True, dtype=None, name: Optional[str] = None):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def conv2d(features: int, kernel=(3, 3), stride=(1, 1), padding=1, use_bias=True,
           dtype=None, name: Optional[str] = None):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, kernel_size=kernel, strides=stride, padding=padding,
                   use_bias=use_bias, dtype=dtype, name=name)
