"""Scheduler unit tests: hand-derived golden values + invariants."""
import numpy as np
import jax
import jax.numpy as jnp

from actalker_tpu.diffusion import scheduler as sch
from actalker_tpu.diffusion.noise import video_fusion_noise, random_noise


CFG = sch.EulerDiscreteConfig()  # SVD-XT defaults


def test_karras_sigma_table_golden():
    sigmas, timesteps = sch.set_timesteps(CFG, 25)
    assert sigmas.shape == (26,) and timesteps.shape == (25,)
    # Karras endpoints: sigma_max first, sigma_min last (before terminal 0).
    np.testing.assert_allclose(sigmas[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(sigmas[24], 0.002, rtol=1e-4)
    assert sigmas[25] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    # Hand-computed rho-7 ramp midpoint (i = 12 of 0..24):
    inv = 1 / 7.0
    want = (700.0**inv + (12 / 24) * (0.002**inv - 700.0**inv)) ** 7.0
    np.testing.assert_allclose(sigmas[12], want, rtol=1e-6)
    # Continuous (EDM) timesteps: 0.25 * ln(sigma)
    np.testing.assert_allclose(timesteps, 0.25 * np.log(sigmas[:25]), rtol=1e-5)


def test_init_noise_sigma_leading():
    sigmas, _ = sch.set_timesteps(CFG, 25)
    got = sch.init_noise_sigma(CFG, sigmas)
    np.testing.assert_allclose(got, (700.0**2 + 1) ** 0.5, rtol=1e-6)


def test_training_sigmas_monotonic():
    sig = sch.training_sigmas(CFG)
    assert sig.shape == (1000,)
    assert np.all(np.diff(sig) > 0)
    # sigma_0 = sqrt((1-a0)/a0) with a0 = 1 - beta_0
    beta0 = 0.00085
    np.testing.assert_allclose(sig[0], np.sqrt(beta0 / (1 - beta0)), rtol=1e-6)


def test_euler_step_epsilon_exact():
    # epsilon parameterization: x' = x + (sigma_next - sigma) * eps_hat
    x = jnp.ones((2, 3)) * 5.0
    eps = jnp.ones((2, 3)) * 0.5
    out = sch.step(x, eps, sigma=2.0, sigma_next=1.0, prediction_type="epsilon")
    # pred_x0 = x - 2*0.5 = 4 ; d = (x - x0)/2 = 0.5 ; dt = -1 -> x' = 4.5
    np.testing.assert_allclose(np.asarray(out), 4.5)


def test_euler_step_v_prediction_exact():
    x = jnp.full((1,), 3.0)
    v = jnp.full((1,), 0.7)
    sigma, sigma_next = 2.0, 0.5
    pred_x0 = 0.7 * (-sigma / np.sqrt(sigma**2 + 1)) + 3.0 / (sigma**2 + 1)
    d = (3.0 - pred_x0) / sigma
    want = 3.0 + d * (sigma_next - sigma)
    out = sch.step(x, v, sigma, sigma_next, "v_prediction")
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_full_denoise_converges_on_known_target():
    """Sanity: with a perfect epsilon oracle, Euler sampling recovers x0."""
    cfg = sch.EulerDiscreteConfig(prediction_type="epsilon")
    sigmas, _ = sch.set_timesteps(cfg, 50)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    x = sch.add_noise(x0, noise, sigmas[0])
    for i in range(50):
        eps_hat = (x - x0) / sigmas[i]  # oracle
        x = sch.step(x, eps_hat, sigmas[i], sigmas[i + 1], "epsilon")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_i2i_truncate():
    sigmas, timesteps = sch.set_timesteps(CFG, 25)
    s2, t2, n2 = sch.i2i_truncate(sigmas, timesteps, 25, strength=0.4)
    assert n2 == 10
    assert len(t2) == 10 and len(s2) == 11
    np.testing.assert_allclose(t2, timesteps[15:])


def test_video_fusion_noise_stats():
    key = jax.random.PRNGKey(0)
    n = video_fusion_noise(key, (2, 8, 4, 16, 16), w_ind_noise=0.5)
    assert n.shape == (2, 8, 4, 16, 16)
    # unit variance preserved by the sqrt mixing
    assert abs(float(jnp.var(n)) - 1.0) < 0.05
    # frames share the common component: cross-frame correlation ~ 1 - s
    f = n.reshape(2, 8, -1)
    c = jnp.mean(f[:, 0] * f[:, 1])
    assert 0.3 < float(c) < 0.7


def test_video_fusion_noise_vs_reference():
    """Formula oracle vs the reference's OWN ``video_fusion_noise``
    (``src/utils/noise_util.py:31-83``) with identical injected common /
    per-frame tensors on both sides (the draws themselves are RNG-backend
    specific; the hooks mirror the reference's ``initial_common_noise``).
    The flagship pipeline never draws this noise in its loop (step call
    ``:737`` passes no churn args) — this covers the scheduler-level
    ``noise_type='video_fusion'`` surface our SamplerConfig exposes."""
    import torch

    from tests.torch_shim import pipeline_shim, shim

    pipeline_shim.install()        # provides diffusers randn_tensor
    nu = shim.load_reference_module("src.utils.noise_util")

    rng = np.random.default_rng(3)
    b, t, c, h, w = 2, 5, 4, 8, 8
    common = rng.standard_normal((b, c, 1, h, w)).astype(np.float32)
    ind = rng.standard_normal((b, c, t, h, w)).astype(np.float32)

    calls = []

    def fake_randn(shape, generator=None, device=None, dtype=None):
        calls.append(tuple(shape))
        return torch.from_numpy(ind)      # only the ind draw goes via randn

    orig = nu.randn_tensor
    try:
        nu.randn_tensor = fake_randn
        want = nu.video_fusion_noise(
            shape=(b, c, t, h, w), dtype=torch.float32, device="cpu",
            w_ind_noise=0.3,
            initial_common_noise=torch.from_numpy(common)).numpy()
    finally:
        nu.randn_tensor = orig
    assert calls == [(b, c, t, h, w)]

    # ours is (B, T, C, H, W) frame-major — transpose the shared tensors
    got = video_fusion_noise(
        jax.random.PRNGKey(0), (b, t, c, h, w), w_ind_noise=0.3,
        initial_common_noise=jnp.asarray(common.transpose(0, 2, 1, 3, 4)),
        initial_ind_noise=jnp.asarray(ind.transpose(0, 2, 1, 3, 4)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3, 4), want, atol=1e-6)


def test_random_noise_offset_shape():
    n = random_noise(jax.random.PRNGKey(0), (2, 4, 3, 8, 8), noise_offset=0.1)
    assert n.shape == (2, 4, 3, 8, 8)


def test_churn_step_golden():
    """One churn (gamma > 0) Euler step vs the reference formula
    (scheduling_euler_discrete.py:147-197) computed independently in numpy."""
    r = np.random.default_rng(3)
    sample = r.standard_normal((2, 4, 4)).astype(np.float32)
    model_out = r.standard_normal((2, 4, 4)).astype(np.float32)
    noise = r.standard_normal((2, 4, 4)).astype(np.float32)
    sigma, sigma_next, gamma, s_noise = 1.7, 1.1, 0.25, 0.9

    for pred_type in ("epsilon", "v_prediction"):
        sigma_hat = sigma * (gamma + 1)
        churned = sample + noise * s_noise * np.sqrt(sigma_hat**2 - sigma**2)
        if pred_type == "epsilon":
            x0 = churned - sigma_hat * model_out
        else:  # v_prediction uses sigma (not sigma_hat) — reference quirk
            x0 = model_out * (-sigma / (sigma**2 + 1) ** 0.5) + (
                churned / (sigma**2 + 1))
        want = churned + (churned - x0) / sigma_hat * (sigma_next - sigma_hat)

        got = np.asarray(sch.step(
            jnp.asarray(sample), jnp.asarray(model_out), sigma, sigma_next,
            pred_type, gamma=gamma, noise=jnp.asarray(noise), s_noise=s_noise,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gamma passed as a traced scalar with zero value must equal the
    # deterministic step exactly (the sampler feeds a per-step gamma table)
    det = np.asarray(sch.step(jnp.asarray(sample), jnp.asarray(model_out),
                              sigma, sigma_next, "v_prediction"))
    via_table = np.asarray(jax.jit(
        lambda g: sch.step(jnp.asarray(sample), jnp.asarray(model_out), sigma,
                           sigma_next, "v_prediction", gamma=g,
                           noise=jnp.asarray(noise))
    )(jnp.float32(0.0)))
    # jit fusion may reassociate by 1 ulp; semantically the churn term is 0
    np.testing.assert_allclose(via_table, det, rtol=1e-6, atol=1e-6)
