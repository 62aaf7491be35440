"""RIFE (IFNet-HDv3) frame interpolation in Flax.

Parity target: ``src/utils/RIFE/IFNet_HDv3.py`` + ``RIFE_HDv3.py`` — three
coarse-to-fine IFBlocks (c=90) run symmetrically on (img0, img1) and
(img1, img0), averaging the forward/backward flow estimates; images are
backward-warped by the accumulated flow and blended with a sigmoid mask.
``warp`` (``warplayer.py:7-22``, torch grid_sample bilinear/border) becomes a
gather-based bilinear sampler. Layout NHWC; doubling fps is done by the
pipeline calling ``interpolate`` pairwise (``Inference.py:344-355``).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PReLU(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def bilinear_resize(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear")


def warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward warp (NHWC, flow (N,H,W,2) in pixels, border padding)."""
    n, h, w, c = img.shape
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    sx = grid_x[None] + flow[..., 0]
    sy = grid_y[None] + flow[..., 1]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = sx - x0
    wy = sy - y0

    def gather(yy, xx):
        idx = (yy * w + xx).astype(jnp.int32)
        flat = img.reshape(n, h * w, c)
        return jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1).reshape(
            n, h, w, c
        )

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


class ConvPReLU(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv")(x)
        return PReLU(self.features, name="prelu")(x)


class IFBlock(nn.Module):
    c: int = 90

    @nn.compact
    def __call__(self, x, flow, scale=1.0):
        n, h, w, _ = x.shape
        sh, sw = int(h / scale), int(w / scale)
        x = bilinear_resize(x, (sh, sw))
        flow = bilinear_resize(flow, (sh, sw)) / scale
        feat = ConvPReLU(self.c // 2, 2, name="conv0_0")(
            jnp.concatenate([x, flow], axis=-1))
        feat = ConvPReLU(self.c, 2, name="conv0_1")(feat)
        for i in range(4):
            r = ConvPReLU(self.c, name=f"convblock{i}_0")(feat)
            r = ConvPReLU(self.c, name=f"convblock{i}_1")(r)
            feat = feat + r
        up = nn.ConvTranspose(self.c // 2, (4, 4), strides=(2, 2),
                              padding="SAME", name="conv1_0")(feat)
        up = PReLU(self.c // 2, name="conv1_prelu")(up)
        flow_out = nn.ConvTranspose(4, (4, 4), strides=(2, 2),
                                    padding="SAME", name="conv1_1")(up)
        up2 = nn.ConvTranspose(self.c // 2, (4, 4), strides=(2, 2),
                               padding="SAME", name="conv2_0")(feat)
        up2 = PReLU(self.c // 2, name="conv2_prelu")(up2)
        mask_out = nn.ConvTranspose(1, (4, 4), strides=(2, 2),
                                    padding="SAME", name="conv2_1")(up2)
        flow_out = bilinear_resize(flow_out, (h, w)) * scale
        mask_out = bilinear_resize(mask_out, (h, w))
        return flow_out, mask_out


class IFNet(nn.Module):
    c: int = 90

    @nn.compact
    def __call__(self, img0, img1, scale_list: Sequence[float] = (4.0, 2.0, 1.0)):
        n, h, w, _ = img0.shape
        flow = jnp.zeros((n, h, w, 4), img0.dtype)
        mask = jnp.zeros((n, h, w, 1), img0.dtype)
        warped0, warped1 = img0, img1
        for i, scale in enumerate(scale_list):
            blk = IFBlock(self.c, name=f"block{i}")
            f0, m0 = blk(jnp.concatenate([warped0, warped1, mask], -1), flow,
                         scale)
            rev_flow = jnp.concatenate([flow[..., 2:4], flow[..., :2]], -1)
            f1, m1 = blk(jnp.concatenate([warped1, warped0, -mask], -1),
                         rev_flow, scale)
            f1_rev = jnp.concatenate([f1[..., 2:4], f1[..., :2]], -1)
            flow = flow + (f0 + f1_rev) / 2
            mask = mask + (m0 - m1) / 2
            warped0 = warp(img0, flow[..., :2])
            warped1 = warp(img1, flow[..., 2:4])
        m = nn.sigmoid(mask)
        return warped0 * m + warped1 * (1 - m)


def interpolate_pairs(apply_fn, params, frames: jax.Array) -> jax.Array:
    """(F, H, W, 3) -> (2F-1, H, W, 3): insert a midpoint between every pair
    (the reference's fps doubling, ``Inference.py:344-355``)."""
    mids = apply_fn(params, frames[:-1], frames[1:])
    out = jnp.zeros((frames.shape[0] * 2 - 1,) + frames.shape[1:],
                    frames.dtype)
    out = out.at[0::2].set(frames)
    out = out.at[1::2].set(jnp.clip(mids, 0, 1))
    return out
