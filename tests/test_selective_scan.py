"""Unit tests for the TPU-native selective scan against an independent numpy oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from actalker_tpu.ops.selective_scan import selective_scan


def numpy_oracle(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=True):
    """Independent fp64 reference implementing the S6 recurrence definition."""
    u = u.astype(np.float64)
    delta = delta.astype(np.float64)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(np.float64)[None, None, :]
    if delta_softplus:
        delta = np.logaddexp(delta, 0.0)
    b, l, d = u.shape
    n = A.shape[-1]
    g = B.shape[2]
    dpg = d // g
    Bf = np.repeat(B.astype(np.float64), dpg, axis=2)
    Cf = np.repeat(C.astype(np.float64), dpg, axis=2)
    A = A.astype(np.float64)
    y = np.zeros((b, l, d))
    h = np.zeros((b, d, n))
    for t in range(l):
        dA = np.exp(delta[:, t, :, None] * A[None])
        dBu = (delta[:, t] * u[:, t])[..., None] * Bf[:, t]
        h = dA * h + dBu
        y[:, t] = np.einsum("bdn,bdn->bd", h, Cf[:, t])
    if D is not None:
        y = y + u * D.astype(np.float64)[None, None, :]
    return y


def make_inputs(rng, b=2, l=37, d=12, n=4, g=2, dtype=np.float32):
    u = rng.standard_normal((b, l, d)).astype(dtype)
    delta = (rng.standard_normal((b, l, d)) * 0.5).astype(dtype)
    A = (-np.exp(rng.standard_normal((d, n)) * 0.3)).astype(dtype)
    B = rng.standard_normal((b, l, g, n)).astype(dtype)
    C = rng.standard_normal((b, l, g, n)).astype(dtype)
    D = rng.standard_normal((d,)).astype(dtype)
    bias = (rng.standard_normal((d,)) * 0.2).astype(dtype)
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("impl", ["seq", "assoc", "blocked"])
def test_matches_oracle(impl):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, bias = make_inputs(rng)
    want = numpy_oracle(u, delta, A, B, C, D, bias)
    got = selective_scan(u, delta, A, B, C, D, bias, impl=impl, chunk=8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["assoc", "blocked"])
@pytest.mark.slow
def test_impls_agree_long(impl):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, bias = make_inputs(rng, b=1, l=300, d=8, n=16, g=1)
    ref = selective_scan(u, delta, A, B, C, D, bias, impl="seq")
    got = selective_scan(u, delta, A, B, C, D, bias, impl=impl, chunk=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_no_skip_no_bias():
    rng = np.random.default_rng(2)
    u, delta, A, B, C, _, _ = make_inputs(rng, l=16)
    want = numpy_oracle(u, delta, A, B, C, None, None, delta_softplus=False)
    got = selective_scan(u, delta, A, B, C, None, None, delta_softplus=False, impl="blocked", chunk=8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_padding_transparency():
    """delta == 0 tokens must be identity elements: inserting them between real
    tokens must not change the state seen by later tokens (the masked-dense
    equivalence the SS2D_cond mask-select block relies on)."""
    rng = np.random.default_rng(3)
    b, l, d, n, g = 1, 10, 6, 4, 1
    u, delta, A, B, C, D, bias = make_inputs(rng, b=b, l=l, d=d, n=n, g=g)
    # Interleave transparent tokens: delta + bias = -inf -> softplus = 0.
    lp = 2 * l
    u2 = np.zeros((b, lp, d), np.float32)
    delta2 = np.full((b, lp, d), -1e9, np.float32)
    B2 = np.zeros((b, lp, g, n), np.float32)
    C2 = np.zeros((b, lp, g, n), np.float32)
    u2[:, ::2] = u
    delta2[:, ::2] = delta
    B2[:, ::2] = B
    C2[:, ::2] = C
    y_sparse = selective_scan(u, delta, A, B, C, D, bias, impl="blocked", chunk=4)
    y_dense = selective_scan(u2, delta2, A, B2, C2, D, bias, impl="blocked", chunk=4)
    np.testing.assert_allclose(
        np.asarray(y_dense[:, ::2]), np.asarray(y_sparse), rtol=1e-5, atol=1e-5
    )


def test_grad_flows():
    rng = np.random.default_rng(4)
    u, delta, A, B, C, D, bias = make_inputs(rng, b=1, l=12, d=4, n=2, g=1)

    def loss(u_, delta_, A_):
        return jnp.sum(selective_scan(u_, delta_, A_, B, C, D, bias, impl="blocked", chunk=4) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(u, delta, A)

    def loss_seq(u_, delta_, A_):
        return jnp.sum(selective_scan(u_, delta_, A_, B, C, D, bias, impl="seq") ** 2)

    g2 = jax.grad(loss_seq, argnums=(0, 1, 2))(u, delta, A)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


class TestPallas:
    def _inputs(self, b=2, l=50, d=12, n=4, seed=7):
        rng = np.random.default_rng(seed)
        u = rng.standard_normal((b, l, d)).astype(np.float32)
        delta = (rng.standard_normal((b, l, d)) * 0.5).astype(np.float32)
        A = (-np.exp(rng.standard_normal((d, n)) * 0.3)).astype(np.float32)
        B = rng.standard_normal((b, l, n)).astype(np.float32)
        C = rng.standard_normal((b, l, n)).astype(np.float32)
        D = rng.standard_normal((d,)).astype(np.float32)
        bias = (rng.standard_normal((d,)) * 0.2).astype(np.float32)
        return u, delta, A, B, C, D, bias

    def test_forward_matches_seq(self):
        from actalker_tpu.ops.selective_scan_pallas import ssm_scan

        u, delta, A, B, C, D, bias = self._inputs()
        want = selective_scan(u, delta, A, B[:, :, None], C[:, :, None], D, bias, impl="seq")
        got = ssm_scan(u, delta, A, B, C, D, bias, lc=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_reverse_matches_flipped_seq(self):
        from actalker_tpu.ops.selective_scan_pallas import ssm_scan

        u, delta, A, B, C, D, bias = self._inputs(l=37)
        flip = lambda x: np.ascontiguousarray(x[:, ::-1])
        want = selective_scan(
            flip(u), flip(delta), A, flip(B)[:, :, None], flip(C)[:, :, None], D, bias, impl="seq"
        )
        want = np.asarray(want)[:, ::-1]
        got = ssm_scan(u, delta, A, B, C, D, bias, reverse=True, lc=16)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
class TestGrouped:
    """ssm_scan_grouped == four separate arranged scans (2 branches x 2 dirs)."""

    def _build(self, lp=128, bp=8, dp=128, n=8, rank=8, seed=3):
        from actalker_tpu.ops.selective_scan_pallas import MASK_LANE

        rng = np.random.default_rng(seed)
        g = 4
        u_g = (rng.standard_normal((lp, bp, 2 * dp)) * 0.3).astype(np.float32)
        dts = (rng.standard_normal((g, lp, bp, rank)) * 0.5).astype(np.float32)
        B = (rng.standard_normal((g, lp, bp, n)) * 0.5).astype(np.float32)
        C = (rng.standard_normal((g, lp, bp, n)) * 0.5).astype(np.float32)
        tm = rng.random((2, lp, bp)) > 0.25
        slab = np.zeros((lp, bp, g * 128), np.float32)
        for gi in range(g):
            slab[:, :, gi * 128:gi * 128 + rank] = dts[gi]
            slab[:, :, gi * 128 + rank:gi * 128 + rank + n] = B[gi]
            slab[:, :, gi * 128 + rank + n:gi * 128 + rank + 2 * n] = C[gi]
            slab[:, :, gi * 128 + MASK_LANE] = 1.0 - tm[gi // 2]
        dtw = np.zeros((g, 128, dp), np.float32)
        dtw[:, :rank] = rng.standard_normal((g, rank, dp)) * 0.3
        dtw[:, MASK_LANE] = -1e9
        A = (-np.exp(rng.standard_normal((g, dp, n)) * 0.3)).astype(np.float32)
        D = rng.standard_normal((g, dp)).astype(np.float32)
        bias = (rng.standard_normal((g, dp)) * 0.2).astype(np.float32)
        return u_g, slab, dtw, tm, A, D, bias, dts, B, C, rank, dp, n

    def test_matches_separate_arranged(self):
        from actalker_tpu.ops.selective_scan_pallas import (
            ssm_scan_arranged, ssm_scan_grouped,
        )

        (u_g, slab, dtw, tm, A, D, bias, dts, B, C,
         rank, dp, n) = self._build()
        got = np.asarray(ssm_scan_grouped(
            jnp.asarray(u_g), jnp.asarray(slab), jnp.asarray(dtw),
            jnp.asarray(A), jnp.asarray(D), jnp.asarray(bias),
            rank=rank, lc=32,
        ))
        for gi in range(4):
            branch = gi // 2
            u_b = u_g[:, :, branch * dp:(branch + 1) * dp]
            dt_b = np.einsum("lbr,rd->lbd", dts[gi], dtw[gi][:rank])
            dt_b = np.where(tm[branch][:, :, None], dt_b, -1e9)
            bc = np.concatenate([B[gi], C[gi]], axis=-1)
            bc = np.pad(bc, ((0, 0), (0, 0), (0, 128 - 2 * n)))
            want = np.asarray(ssm_scan_arranged(
                jnp.asarray(u_b), jnp.asarray(dt_b), jnp.asarray(bc),
                jnp.asarray(A[gi]), jnp.asarray(D[gi]), jnp.asarray(bias[gi]),
                reverse=bool(gi % 2), lc=32,
            ))
            np.testing.assert_allclose(
                got[:, :, gi * dp:(gi + 1) * dp], want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
class TestPallasGrad:
    """custom_vjp: Pallas forward, XLA-twin backward."""

    def test_ssm_scan_grad_matches_blocked(self):
        from actalker_tpu.ops.selective_scan_pallas import ssm_scan

        rng = np.random.default_rng(5)
        b, l, d, n = 2, 24, 8, 4
        u = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
        delta = jnp.asarray(rng.standard_normal((b, l, d)) * 0.4, jnp.float32)
        A = jnp.asarray(-np.exp(rng.standard_normal((d, n)) * 0.3), jnp.float32)
        B = jnp.asarray(rng.standard_normal((b, l, n)) * 0.5, jnp.float32)
        C = jnp.asarray(rng.standard_normal((b, l, n)) * 0.5, jnp.float32)
        D = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((d,)) * 0.2, jnp.float32)

        def loss_p(u_, delta_, A_, B_, C_):
            return jnp.sum(ssm_scan(u_, delta_, A_, B_, C_, D, bias, lc=8) ** 2)

        def loss_x(u_, delta_, A_, B_, C_):
            y = selective_scan(u_, delta_, A_, B_[:, :, None], C_[:, :, None],
                               D, bias, impl="blocked")
            return jnp.sum(y.astype(jnp.float32) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
        gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)

    def test_grouped_grad_flows_and_matches_xla(self):
        from actalker_tpu.ops.selective_scan_pallas import (
            _grouped_xla, ssm_scan_grouped,
        )

        t = TestGrouped()
        (u_g, slab, dtw, tm, A, D, bias, dts, B, C,
         rank, dp, n) = t._build(lp=64, bp=8, dp=128, n=8, rank=8)
        args = tuple(jnp.asarray(a) for a in (u_g, slab, dtw, A, D, bias))

        def loss_p(u_, slab_, dtw_, A_, D_, bias_):
            y = ssm_scan_grouped(u_, slab_, dtw_, A_, D_, bias_,
                                 rank=rank, lc=32)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def loss_x(u_, slab_, dtw_, A_, D_, bias_):
            y = _grouped_xla(u_, slab_, dtw_, A_, D_, bias_, rank=rank)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        gp = jax.grad(loss_p, argnums=tuple(range(6)))(*args)
        gx = jax.grad(loss_x, argnums=tuple(range(6)))(*args)
        for a, b_ in zip(gp, gx):
            assert np.all(np.isfinite(np.asarray(a)))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_arranged_grad_kernels_match_twin_interpret():
    """The boundary+adjoint kernel pair (used for backward on TPU) against
    the XLA twin's autodiff, in interpret mode, both scan directions."""
    from actalker_tpu.ops import selective_scan_pallas as SP

    rng = np.random.default_rng(0)
    lp0, bp, dp, d, n = 72, 8, 128, 100, 4
    u = jnp.asarray(rng.standard_normal((lp0, bp, dp)) * 0.3, jnp.float32)
    dt = jnp.asarray(rng.standard_normal((lp0, bp, dp)) * 0.4, jnp.float32)
    bc = jnp.asarray(np.pad(rng.standard_normal((lp0, bp, 2 * n)) * 0.5,
                            ((0, 0), (0, 0), (0, 128 - 2 * n))), jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((d, n)) * 0.3), jnp.float32)
    D = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((d,)) * 0.2, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((lp0, bp, dp)) * 0.1, jnp.float32)
    for reverse in (False, True):
        got = SP._arranged_grad_tpu(u, dt, bc, A, D, bias, dy,
                                    reverse=reverse)
        _, vjp = jax.vjp(
            lambda *p: SP._arranged_xla(*p, reverse=reverse),
            u, dt, bc, A, D, bias)
        want = vjp(dy)
        for a, b_ in zip(got, want):
            a = np.asarray(a)[..., :d] if a.ndim == 3 else np.asarray(a)
            b_ = np.asarray(b_)[..., :d] if np.asarray(b_).ndim == 3 \
                else np.asarray(b_)
            np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-3)


def test_grouped_v2_state_major_matches_v1_interpret():
    """The state-major v2 grouped kernel (batched transcendentals, mul-add
    serial core — ACTALKER_SCAN=v2) must match v1 exactly in interpret
    mode, masks and both directions included."""
    from actalker_tpu.ops import selective_scan_pallas as SP

    case = TestGrouped()
    u_g, slab, dtw, tm, A, D, bias, dts, B, C, rank, dp, n = case._build()
    args = (jnp.asarray(u_g), jnp.asarray(slab), jnp.asarray(dtw),
            jnp.asarray(A), jnp.asarray(D), jnp.asarray(bias))
    try:
        SP.set_scan_impl("v1")
        v1 = np.asarray(SP.ssm_scan_grouped(*args, rank=rank, lc=32))
        SP.set_scan_impl("v2")
        v2 = np.asarray(SP.ssm_scan_grouped(*args, rank=rank, lc=32))
    finally:
        SP.set_scan_impl("v1")
    np.testing.assert_allclose(v2, v1, rtol=2e-5, atol=2e-5)
