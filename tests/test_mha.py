"""Token-layout attention kernels (ops/mha.py).

Covers: interpret-mode Pallas vs XLA-fallback parity for both kernels,
gradients through the custom_vjp, frame-attention semantics vs an explicit
(B*S, F, C) permute-and-attend reference (the reference's
``TemporalBasicTransformerBlock`` layout, ``src/models/base/attention.py:
347-473``), and parameter-tree compatibility between the "tokens" and
"bhsd" layouts of ``models.attention_blocks.Attention``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actalker_tpu.ops.mha import (
    _frame_pallas,
    _frame_xla,
    _mha_pallas,
    _mha_xla,
    frame_attention_tokens,
    mha_tokens,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_mha_pallas_interpret_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    b, s, c, h = 1, 128, 32, 2
    q, k, v = (_rand(ks[0], (b, s, c)), _rand(ks[1], (b, s, c)),
               _rand(ks[2], (b, s, c)))
    sc = (c // h) ** -0.5
    out = _mha_pallas(q, k, v, h, sc, interpret=True)
    ref = _mha_xla(q, k, v, h, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


def test_mha_pallas_interpret_multiblock_online_softmax(monkeypatch):
    # force more than one k block so the online-softmax rescale path runs
    # (the r5 default picks bk=s -> the single-pass kernel at this size)
    monkeypatch.setenv("ACTALKER_MHA_BLOCKS", "256,256")
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    b, s, c, h = 1, 512, 32, 2
    q, k, v = (_rand(ks[0], (b, s, c)), _rand(ks[1], (b, s, c)),
               _rand(ks[2], (b, s, c)))
    sc = (c // h) ** -0.5
    out = _mha_pallas(q, k, v, h, sc, interpret=True)
    ref = _mha_xla(q, k, v, h, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


def test_mha_pallas_interpret_single_pass_kernel():
    # nk=1 routes to _mha_kernel_1pass (exp2 softmax, no online rescale)
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    b, s, c, h = 2, 256, 64, 4
    q, k, v = (_rand(ks[0], (b, s, c)), _rand(ks[1], (b, s, c)),
               _rand(ks[2], (b, s, c)))
    from actalker_tpu.ops.mha import _pick_blocks

    assert _pick_blocks(s, c)[1] == s      # whole-sequence key block
    sc = (c // h) ** -0.5
    out = _mha_pallas(q, k, v, h, sc, interpret=True)
    ref = _mha_xla(q, k, v, h, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


def test_frame_pallas_interpret_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    b, f, s, c, h = 1, 3, 128, 32, 2
    q, k, v = (_rand(ks[0], (b, f, s, c)), _rand(ks[1], (b, f, s, c)),
               _rand(ks[2], (b, f, s, c)))
    sc = (c // h) ** -0.5
    out = _frame_pallas(q, k, v, h, sc, interpret=True)
    ref = _frame_xla(q, k, v, h, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


def test_frame_attention_matches_permuted_self_attention():
    # attention over the frame axis per spatial token == permuting to
    # (B*S, F, C) and running ordinary self-attention there
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    b, f, s, c, h = 2, 4, 8, 32, 2
    q, k, v = (_rand(ks[0], (b * f, s, c)), _rand(ks[1], (b * f, s, c)),
               _rand(ks[2], (b * f, s, c)))
    out = frame_attention_tokens(q, k, v, f, h)

    def permute(x):  # (B*F, S, C) -> (B*S, F, C)
        return jnp.moveaxis(x.reshape(b, f, s, c), 1, 2).reshape(b * s, f, c)

    ref = _mha_xla(permute(q), permute(k), permute(v), h, (c // h) ** -0.5)
    ref = jnp.moveaxis(ref.reshape(b, s, f, c), 1, 2).reshape(b * f, s, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


def test_mha_tokens_gradients_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    b, s, c, h = 1, 32, 16, 2
    q, k, v = (_rand(ks[0], (b, s, c)), _rand(ks[1], (b, s, c)),
               _rand(ks[2], (b, s, c)))

    g1 = jax.grad(lambda *a: jnp.sum(jnp.tanh(mha_tokens(*a, h))),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.tanh(_mha_xla(*a, h, (c // h) ** -0.5))),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=1e-2)


def test_frame_attention_gradients_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    b, f, s, c, h = 1, 3, 8, 16, 2
    q, k, v = (_rand(ks[0], (b * f, s, c)), _rand(ks[1], (b * f, s, c)),
               _rand(ks[2], (b * f, s, c)))

    def ref_fn(q, k, v):
        return _frame_xla(q.reshape(b, f, s, c), k.reshape(b, f, s, c),
                          v.reshape(b, f, s, c), h,
                          (c // h) ** -0.5).reshape(b * f, s, c)

    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.tanh(frame_attention_tokens(*a, f, h))),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.tanh(ref_fn(*a))),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=1e-2)


@pytest.mark.parametrize("block", ["spatial", "temporal"])
def test_attn_impl_layouts_share_params_and_agree(block):
    # the "tokens" and "bhsd" code paths must consume identical parameter
    # trees (checkpoint compatibility) and agree numerically
    from actalker_tpu.models import attention_blocks as ab

    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    if block == "spatial":
        model = ab.Attention(heads=2, head_dim=8)
        x = _rand(ks[0], (2, 16, 16))
        args = (x,)
    else:
        model = ab._FrameSelfAttention(heads=2, head_dim=8)
        x = _rand(ks[0], (2 * 3, 16, 16))
        args = (x, 3)

    prev = ab._ATTN_IMPL
    try:
        ab.set_attn_impl("tokens")
        params = model.init(ks[1], *args)
        y_tok = model.apply(params, *args)
        ab.set_attn_impl("bhsd")
        y_bhsd = model.apply(params, *args)  # same params, other layout
    finally:
        ab.set_attn_impl(prev)
    np.testing.assert_allclose(np.asarray(y_tok), np.asarray(y_bhsd),
                               atol=5e-3, rtol=1e-2)


def test_mha_pallas_padded_kv_mask_matches_unpadded():
    """The masked-key padding path (S not a multiple of 256 — the 576-px
    production shape has S = 5184): padded keys must be invisible to the
    softmax, so running the kernel on zero-padded q/k/v with kv_len = S and
    slicing must equal attention over the original sequence."""
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    b, s, c, h = 1, 324, 32, 2            # 324 tokens (res-18 at 576px/4)
    sp = 512                              # padded to the 256-grid
    q, k, v = (_rand(ks[0], (b, s, c)), _rand(ks[1], (b, s, c)),
               _rand(ks[2], (b, s, c)))
    pad = ((0, 0), (0, sp - s), (0, 0))
    out = _mha_pallas(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                      h, (c // h) ** -0.5, interpret=True, kv_len=s)[:, :s]
    ref = _mha_xla(q, k, v, h, (c // h) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)
    assert np.isfinite(np.asarray(out)).all()


def test_frame_pallas_v2_interpret_matches_xla():
    """The d-on-sublanes frame-attention kernel (ACTALKER_FRAME_KERNEL=v2)
    must match the XLA lowering."""
    from actalker_tpu.ops.mha import _frame_pallas_v2

    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    b, f, s, c, h = 2, 5, 128, 64, 2
    q, k, v = (_rand(ks[0], (b, f, s, c)), _rand(ks[1], (b, f, s, c)),
               _rand(ks[2], (b, f, s, c)))
    sc = (c // h) ** -0.5
    out = _frame_pallas_v2(q, k, v, h, sc, interpret=True)
    ref = _frame_xla(q, k, v, h, sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)
