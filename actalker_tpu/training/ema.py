"""Exponential moving average of parameters (the reference exposes
``use_ema`` in ``config/train.yaml:41``; default off)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    return jax.tree.map(lambda x: x.astype(jnp.float32), params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.9999) -> Any:
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(jnp.float32) * (1.0 - decay),
        ema_params, params,
    )
