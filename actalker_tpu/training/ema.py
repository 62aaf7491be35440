"""Exponential moving average of parameters (the reference exposes
``use_ema`` in ``config/train.yaml:41``; default off).

Interaction with gradient accumulation: ``optax.MultiSteps`` commits params
only every ``grad_accum_steps`` micro-steps; decaying the EMA on every
micro-step would make the effective decay ``decay**k`` per real update while
averaging unchanged params. ``ema_step`` therefore reads the MultiSteps
mini-step counter from the optimizer state and applies the EMA update ONLY
on commit micro-steps (``jnp.where`` inside jit — no host sync).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    return jax.tree.map(lambda x: x.astype(jnp.float32), params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.9999,
               commit: Optional[jax.Array] = None) -> Any:
    """One EMA step; ``commit`` (scalar bool) gates the update: where False
    the EMA is returned unchanged (used under gradient accumulation)."""

    def upd(e, p):
        new = e * decay + p.astype(jnp.float32) * (1.0 - decay)
        return new if commit is None else jnp.where(commit, new, e)

    return jax.tree.map(upd, ema_params, params)


def commit_flag(opt_state: Any) -> Optional[jax.Array]:
    """Scalar bool: did the optimizer just COMMIT (apply accumulated grads)?

    ``opt_state`` is the state AFTER the update. optax.MultiSteps wraps the
    counter as ``mini_step`` (0..k-1, reset to 0 on commit), so post-update
    ``mini_step == 0`` iff the update committed. Returns None when no
    MultiSteps state is present (every step commits).
    """
    import optax

    for s in jax.tree.leaves(
            opt_state,
            is_leaf=lambda s: isinstance(s, optax.MultiStepsState)):
        if isinstance(s, optax.MultiStepsState):
            return s.mini_step == 0
    return None


def ema_step(ema_params: Any, params: Any, opt_state: Any,
             decay: float = 0.9999) -> Any:
    """EMA update gated on the optimizer's commit flag (jit-friendly)."""
    return ema_update(ema_params, params, decay=decay,
                      commit=commit_flag(opt_state))
