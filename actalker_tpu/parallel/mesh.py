"""Device mesh + sharding rules.

TPU-native replacement for the reference's distributed story (accelerate +
DeepSpeed ZeRO-2 over NCCL, ``ds_zero2_8gpu.yaml``; FSDP named in
``config/train.yaml:34``): one ``jax.sharding.Mesh`` with axes

    dp — data parallel (batch / window / CFG-branch axis; gradient psum)
    tp — tensor parallel (attention heads / MLP hidden / conv channels)

Parameters are sharded by path-based rules (GSPMD propagates activation
shardings and inserts ICI collectives). Optimizer state goes through
``shard_opt_state`` — the ZeRO-2 equivalent of the reference's
``ds_zero2_8gpu.yaml:3-12``: every large moment/accumulator leaf is
partitioned over dp along its largest free axis, so Adam state holds
1/dp of its bytes per chip while params stay dp-replicated (ZeRO-2 shards
optimizer state + grads, not params). A 1-device mesh is the degenerate
case used on the single bench chip.
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: Optional[int] = None, tp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# Path-regex -> PartitionSpec for the weight matrices worth sharding over tp.
# Flax Dense kernels are (in, out); Conv kernels (kh, kw, in, out).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention input projections: shard heads (output dim)
    (r"(to_q|to_k|to_v|to_k_ip_\d|to_v_ip_\d|q_proj|k_proj|v_proj)/kernel$",
     P(None, "tp")),
    # attention output projection: shard input dim (row-parallel)
    (r"(to_out|out_proj)/kernel$", P("tp", None)),
    # GEGLU / MLP: column-parallel in, row-parallel out
    (r"(ff|ff_in)/proj_in/kernel$", P(None, "tp")),
    (r"(ff|ff_in)/proj_out/kernel$", P("tp", None)),
    (r"(fc1|proj1|proj2)/kernel$", P(None, "tp")),
    (r"(fc2|proj3)/kernel$", P("tp", None)),
    # SSM unit projections: shard d_inner
    (r"(in_proj\d|audio_proj|exp_proj|id_proj)/kernel$", P(None, "tp")),
    (r"x_proj_weight$", P(None, None, "tp")),
    (r"dt_projs_weight$", P(None, "tp", None)),
    # big convolutions: shard output channels
    (r"conv\d?/kernel$", P(None, None, None, "tp")),
)


def param_pspec(path: str, shape: Tuple[int, ...], min_size: int = 2**14) -> P:
    """PartitionSpec for one parameter by its flattened path."""
    if int(np.prod(shape)) < min_size:
        return P()
    for pat, spec in _TP_RULES:
        if re.search(pat, path):
            if len(spec) <= len(shape):
                # verify divisibility is left to the caller's mesh shape; GSPMD
                # requires even shards, so fall back to replicated if not.
                return spec
    return P()


def tree_path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def shard_params(params: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """Apply tp sharding rules to a params pytree (replicates the rest)."""

    def assign(path, x):
        spec = param_pspec(tree_path_str(path), x.shape, min_size)
        # drop specs that don't divide evenly
        ok = []
        for axis, name in enumerate(spec):
            if name is None:
                ok.append(None)
            else:
                size = mesh.shape[name]
                ok.append(name if x.shape[axis] % size == 0 else None)
        spec = P(*ok) if any(a is not None for a in ok) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(assign, params)


def opt_state_pspec(path: str, shape: Tuple[int, ...], mesh: Mesh,
                    min_size: int = 2**14) -> P:
    """ZeRO-2 PartitionSpec for one optimizer-state leaf.

    Start from the param's tp spec (moment paths embed the param path), then
    partition the largest still-unsharded, dp-divisible axis over dp. Small
    leaves (and scalars like step counts) stay replicated.
    """
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    base = param_pspec(path, shape, min_size)
    names = list(base) + [None] * (len(shape) - len(base))
    names = [n if n is not None and shape[i] % mesh.shape[n] == 0 else None
             for i, n in enumerate(names)]
    dp = mesh.shape["dp"]
    if dp > 1:
        free = [i for i, n in enumerate(names)
                if n is None and shape[i] % dp == 0 and shape[i] >= dp]
        if free:
            names[max(free, key=lambda i: shape[i])] = "dp"
    return P(*names) if any(n is not None for n in names) else P()


def opt_state_shardings(opt_state: Any, mesh: Mesh,
                        min_size: int = 2**14) -> Any:
    """NamedSharding tree for ``shard_opt_state`` (works on ShapeDtypeStructs
    from ``jax.eval_shape(tx.init, params)`` too — used for memory math)."""

    def spec(path, x):
        return NamedSharding(mesh, opt_state_pspec(
            tree_path_str(path), tuple(getattr(x, "shape", ())), mesh,
            min_size))

    return jax.tree_util.tree_map_with_path(spec, opt_state)


def shard_opt_state(opt_state: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """Apply ZeRO-2-equivalent dp sharding to an optax state pytree.

    Covers Adam mu/nu, the fp32 grad-accumulation buffers of
    ``optax.MultiSteps`` (all param-shaped, reached through their embedded
    param paths), and leaves counters replicated. Keep the returned
    shardings as the train step's ``out_shardings`` so jit preserves them.
    """
    return jax.tree.map(jax.device_put, opt_state,
                        opt_state_shardings(opt_state, mesh, min_size))


def per_device_bytes(tree: Any, shardings: Any) -> int:
    """Bytes one device holds for ``tree`` (arrays or ShapeDtypeStructs)
    under ``shardings`` — the ZeRO memory-fit check without materializing."""
    total = 0
    for x, s in zip(jax.tree.leaves(tree), jax.tree.leaves(
            shardings, is_leaf=lambda l: isinstance(l, NamedSharding))):
        shard = 1
        for name in s.spec:
            if name is not None:
                shard *= s.mesh.shape[name]
        total += int(np.prod(x.shape)) * x.dtype.itemsize // shard
    return total


# Batch fields replicated regardless of shape. Region masks are per-sample
# (B, 1, H, W) since round 3 and shard over dp like any other batched leaf.
REPLICATED_BATCH_FIELDS = ()


def shard_batch(tree: Any, mesh: Mesh,
                global_batch: Optional[int] = None,
                replicated: Sequence[str] = REPLICATED_BATCH_FIELDS) -> Any:
    """Shard leading axis of every array over dp (replicate scalars).

    Single-process (``global_batch=None``): plain ``device_put`` onto the
    mesh; a leaf is batched iff its leading axis divides dp.

    Multi-host (pod) runs pass the GLOBAL batch size: every leaf is this
    host's LOCAL slice of the global batch (the loader's ``start``/
    ``stride`` contract — local rows = global_batch / process_count) and
    the global array is assembled with
    ``jax.make_array_from_process_local_data``, so no sample ever crosses
    DCN through a host. A leaf is batched iff its local leading axis is
    exactly the local batch; everything else (masks, scalars) is
    replicated and must hold the same value on every host.

    ``replicated`` names fields that are replicated REGARDLESS of shape
    (none by default; pass field names for (1, ...) leaves that the
    local-batch-size heuristic would misread as batched when
    local_batch == 1).
    """
    nproc = jax.process_count()
    if global_batch is not None and nproc > 1 \
            and global_batch % mesh.shape["dp"] != 0:
        # replicating per-host-differing sample data would be silent
        # corruption — refuse instead
        raise ValueError(
            f"global_batch({global_batch}) must divide the dp axis "
            f"({mesh.shape['dp']}) in multi-host runs")

    def leaf_name(path) -> str:
        for p in reversed(path):
            for attr in ("name", "key"):
                if hasattr(p, attr):
                    return str(getattr(p, attr))
        return ""

    def assign(path, x):
        forced_repl = leaf_name(path) in replicated
        if global_batch is not None and nproc > 1:
            local = global_batch // nproc
            batched = (not forced_repl and hasattr(x, "ndim")
                       and x.ndim >= 1 and x.shape[0] == local)
            spec = (P("dp", *([None] * (x.ndim - 1)))
                    if batched else P())
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(x)
            )
        if (not forced_repl and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % mesh.shape["dp"] == 0):
            return jax.device_put(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(assign, tree)
