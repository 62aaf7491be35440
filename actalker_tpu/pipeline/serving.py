"""Batched multi-identity serving (BASELINE config 5: several reference
identities x shared audio, sharded over the device mesh).

The per-clip sampler (``sampler.sample_video``) is already one jitted
program; serving vmaps it over an identity axis and shards that axis over the
mesh's ``dp`` dimension — window-steps of different identities then run on
different chips with zero cross-talk (the only collective is the final
gather). Params stay replicated (or tp-sharded via parallel/mesh rules).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from actalker_tpu.pipeline.sampler import (
    CondBuffers,
    SamplerConfig,
    SamplerPlan,
    sample_video,
)


def sample_video_batch(
    unet_apply: Callable[..., jax.Array],
    unet_params: Any,
    cfg: SamplerConfig,
    plan: SamplerPlan,
    buffers: CondBuffers,          # leading identity axis on every array field
    ref_latents: jax.Array,        # (I, h, w, 4)
    noise_keys: jax.Array,         # (I, 2) PRNG keys
    mesh: Optional[Mesh] = None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Generate I clips in parallel; returns (I, buffer_len, h, w, 4)."""

    # params enter as a jit ARGUMENT (in_axes=None broadcasts them across
    # the identity axis): capturing them in the closure would bake all
    # ~3.3 GiB into the jaxpr as constants — a host round-trip at lowering
    # plus a second device copy (measured: 3.46 GB captured-constants
    # warning + HBM pressure, outputs/perf_r05.log C4).
    def one(params, bufs, ref, key):
        return sample_video(unet_apply, params, cfg, plan, bufs, ref,
                            key, dtype=dtype)

    batched = jax.vmap(one, in_axes=(None, 0, 0, 0))
    fn = jax.jit(batched)
    if mesh is not None:
        ident = NamedSharding(mesh, P("dp"))

        def shard(x):
            if hasattr(x, "ndim") and x.ndim >= 1 \
                    and x.shape[0] % mesh.shape["dp"] == 0:
                return jax.device_put(
                    x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
                )
            return x

        buffers = jax.tree.map(shard, buffers)
        ref_latents = jax.device_put(ref_latents, ident)
        noise_keys = jax.device_put(noise_keys, ident)
    return fn(unet_params, buffers, ref_latents, noise_keys)
