"""Selective scan (Mamba S6 recurrence) for TPU.

TPU-native replacement for the CUDA ``selective_scan_fn`` used by the reference
system (invoked at ``src/models/base/mamba_layer.py:1532-1538``). Semantics match
``mamba_ssm.ops.selective_scan_interface.selective_scan_fn``:

    delta = softplus(delta + delta_bias)        (if delta_softplus)
    hbar_t = exp(delta_t * A) * hbar_{t-1} + (delta_t * B_t) * u_t
    y_t    = <C_t, hbar_t> + D * u_t

with per-channel state size N (typically 16), and B/C shared per channel *group*
(the reference uses one group per scan direction, G = K).

The recurrence is a first-order linear recurrence ``h_t = a_t h_{t-1} + b_t``
which we parallelize over the token axis:

* ``impl="assoc"``   — ``jax.lax.associative_scan`` (Blelchko-style log-depth scan;
                       XLA fuses the elementwise combine well).
* ``impl="blocked"`` — three-phase blocked scan: tokens are split into chunks of
                       ``chunk`` steps; phase 1 runs the sequential recurrence
                       *inside* each chunk with all chunks vectorized across VPU
                       lanes; phase 2 is a tiny sequential scan over per-chunk
                       summaries; phase 3 corrects the in-chunk prefixes. Work is
                       ~2x the sequential scan but depth is ``chunk + L/chunk``.
* ``impl="seq"``     — plain ``lax.scan`` over tokens (oracle / small L).

All accumulation is float32 regardless of input dtype (the recurrence is
precision-sensitive; the reference forces fp32 the same way, see
``mamba_layer.py:319-325`` and ``Inference.py:430-433``).

Layouts are TPU-native (length axis second-to-minor, channels minor):
    u:     (B, L, D)
    delta: (B, L, D)
    A:     (D, N)
    B, C:  (B, L, G, N)   with D % G == 0 (channel c uses group c // (D // G))
    D:     (D,)           optional skip weight
    delta_bias: (D,)      optional
Returns y: (B, L, D) in float32.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _prep(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """Common input prep: upcast, apply softplus, broadcast groups, discretize.

    Returns dA (B,L,D,N), dBu (B,L,D,N), C (B,L,D,N), skip (B,L,D) (D*u or 0).
    """
    b, l, d = u.shape
    n = A.shape[-1]
    g = B.shape[2]
    assert d % g == 0, f"D={d} not divisible by groups G={g}"
    dpg = d // g

    u32 = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    A32 = A.astype(jnp.float32)
    # (B, L, G, N) -> (B, L, D, N) by repeating each group over its channels.
    B32 = jnp.repeat(B.astype(jnp.float32), dpg, axis=2)
    C32 = jnp.repeat(C.astype(jnp.float32), dpg, axis=2)

    dA = jnp.exp(delta[..., None] * A32[None, None])            # (B,L,D,N)
    dBu = (delta * u32)[..., None] * B32                         # (B,L,D,N)
    if D is not None:
        skip = u32 * D.astype(jnp.float32)[None, None, :]
    else:
        skip = jnp.zeros_like(u32)
    return dA, dBu, C32, skip


def _scan_seq(dA, dBu):
    """Plain sequential scan over L. dA/dBu: (B, L, D, N) -> h: (B, L, D, N)."""
    def body(h, x):
        a, bu = x
        h = a * h + bu
        return h, h

    a_l = jnp.moveaxis(dA, 1, 0)
    b_l = jnp.moveaxis(dBu, 1, 0)
    h0 = jnp.zeros_like(dA[:, 0])
    _, hs = lax.scan(body, h0, (a_l, b_l))
    return jnp.moveaxis(hs, 0, 1)


def _scan_assoc(dA, dBu):
    """log-depth associative scan over L."""
    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    a, b = lax.associative_scan(combine, (dA, dBu), axis=1)
    del a
    return b


def _scan_blocked(dA, dBu, chunk: int = 64):
    """Three-phase blocked scan (see module docstring)."""
    b, l, d, n = dA.shape
    pad = (-l) % chunk
    if pad:
        # Padding with a=1, bu=0 is the identity element of the recurrence.
        dA = jnp.pad(dA, ((0, 0), (0, pad), (0, 0), (0, 0)), constant_values=1.0)
        dBu = jnp.pad(dBu, ((0, 0), (0, pad), (0, 0), (0, 0)))
    lp = l + pad
    nc = lp // chunk
    a_c = dA.reshape(b, nc, chunk, d, n)
    b_c = dBu.reshape(b, nc, chunk, d, n)

    # Phase 1: in-chunk sequential scan, vectorized over (b, nc, d, n).
    def body1(carry, x):
        h, ap = carry
        a_t, bu_t = x
        h = a_t * h + bu_t
        ap = ap * a_t
        return (h, ap), (h, ap)

    a_t_first = jnp.moveaxis(a_c, 2, 0)   # (chunk, b, nc, d, n)
    b_t_first = jnp.moveaxis(b_c, 2, 0)
    h0 = jnp.zeros((b, nc, d, n), jnp.float32)
    ap0 = jnp.ones((b, nc, d, n), jnp.float32)
    (h_end, ap_end), (h_in, ap_in) = lax.scan(body1, (h0, ap0), (a_t_first, b_t_first))

    # Phase 2: exclusive sequential scan over per-chunk summaries (nc steps).
    def body2(h_prev, x):
        h_e, ap_e = x
        h_out = h_e + ap_e * h_prev
        return h_out, h_prev

    hc0 = jnp.zeros((b, d, n), jnp.float32)
    _, h_entry = lax.scan(
        body2, hc0, (jnp.moveaxis(h_end, 1, 0), jnp.moveaxis(ap_end, 1, 0))
    )  # (nc, b, d, n): state entering each chunk

    # Phase 3: correct in-chunk prefixes.
    # h_in/ap_in: (chunk, b, nc, d, n); h_entry: (nc, b, d, n) -> (1, b, nc, d, n)
    h = h_in + ap_in * jnp.moveaxis(h_entry, 0, 1)[None]
    h = jnp.moveaxis(h, 0, 2).reshape(b, lp, d, n)
    return h[:, :l]


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = True,
    impl: str = "blocked",
    chunk: int = 64,
) -> jax.Array:
    """Selective scan; see module docstring for shapes. Returns (B, L, D) fp32."""
    dA, dBu, C32, skip = _prep(u, delta, A, B, C, D, delta_bias, delta_softplus)
    if impl == "seq":
        h = _scan_seq(dA, dBu)
    elif impl == "assoc":
        h = _scan_assoc(dA, dBu)
    elif impl == "blocked":
        h = _scan_blocked(dA, dBu, chunk=chunk)
    elif impl == "pallas":
        from actalker_tpu.ops.selective_scan_pallas import scan_pallas
        h = scan_pallas(dA, dBu)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    y = jnp.sum(h * C32, axis=-1) + skip
    return y


def selective_scan_ref(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=True):
    """Numpy-ish oracle: naive python-free sequential recurrence (fp64 on CPU when
    x64 enabled, fp32 otherwise). For unit tests only."""
    return selective_scan(u, delta, A, B, C, D, delta_bias, delta_softplus, impl="seq")
