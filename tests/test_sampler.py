"""Sliding-window sampler tests: the jitted lax.scan loop must reproduce an
independent numpy re-implementation of the reference's python window loop."""
import numpy as np
import jax
import jax.numpy as jnp

from actalker_tpu.diffusion import scheduler as sch
from actalker_tpu.pipeline import sampler as S


def fake_unet_factory(h, w):
    """A deterministic, conditioning-sensitive stand-in for the UNet.

    pred = 0.1 * sample[..., :4] + mean(id_tokens) + 0.01 * mean(audio) -
           0.02 * mean(vasa) + 0.001 * t
    (v-prediction-shaped output; enough structure to catch CFG/window bugs.)
    """

    def apply(params, sample, t, cond, added_time_ids, pose):
        b, f = sample.shape[:2]
        idm = cond.id_tokens.reshape(b, f, -1).mean(-1)[..., None, None, None]
        aum = cond.audio_tokens.reshape(b, f, -1).mean(-1)[..., None, None, None]
        vam = cond.vasa_tokens.reshape(b, f, -1).mean(-1)[..., None, None, None]
        return (
            0.1 * sample[..., :4] + idm + 0.01 * aum - 0.02 * vam
            + 0.001 * t + 0.005 * sample[..., 4:]
        )

    return apply


def reference_loop(cfg, plan, buffers, ref_latent, noise, unet_apply):
    """Numpy re-implementation of the reference pipeline's denoise loop
    (pipeline_svd_...two_ip.py:664-756) using the same fake UNet."""
    buf = plan.buffer_len
    fpb = cfg.frames_per_batch
    h, w, _ = ref_latent.shape
    latents_all = ref_latent[None] + noise * plan.sigmas[0]
    latents_all = np.broadcast_to(latents_all, (buf, h, w, 4)).copy()
    stride = fpb - cfg.overlap
    shift = 0
    for i, t in enumerate(plan.timesteps):
        sigma, sigma_next = plan.sigmas[i], plan.sigmas[i + 1]
        pred = np.zeros_like(latents_all)
        counter = np.zeros((buf, 1, 1, 1))
        for start in range(0, buf, stride):
            idx = (np.arange(fpb) + start - shift) % buf
            lat = latents_all[idx]
            cond = S._cfg_conditioning(buffers, jnp.asarray(idx), cfg, jnp.float32)
            lat4 = np.stack([lat] * 4)
            scaled = lat4 / np.sqrt(sigma**2 + 1)
            img = np.asarray(buffers.image_latents)[idx]
            img4 = np.stack([np.zeros_like(img), img, img, img])
            inp = np.concatenate([scaled, img4], axis=-1)
            out = np.asarray(unet_apply(
                None, jnp.asarray(inp), jnp.asarray(t), cond,
                None, None,
            ))
            u, a, b, c = out
            g1, g2, g3 = plan.guidance1[i], plan.guidance2[i], plan.guidance3[i]
            np_pred = u + g1 * (a - u) + g2 * (b - a) + g3 * (c - b)
            stepped = np.asarray(sch.step(
                jnp.asarray(lat), jnp.asarray(np_pred), sigma, sigma_next,
                cfg.scheduler.prediction_type,
            ))
            for j in range(fpb):
                pred[idx[j]] += stepped[j]
                counter[idx[j]] += 1
        shift = (shift + cfg.shift_offset) % fpb
        latents_all = pred / counter
    return latents_all


def build_buffers(buf, h, w, d=16, seed=0):
    r = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32))
    return S.CondBuffers(
        id_tokens=f32(buf, 1, d),
        audio_tokens=f32(buf, 4, d),
        audio_tokens_u=f32(buf, 4, d),
        vasa_tokens=f32(buf, 1, d),
        vasa_tokens_u=f32(buf, 1, d),
        image_latents=f32(buf, h, w, 4),
        pose_fea=f32(buf, h, w, 2),
        audio_mask=jnp.ones((1, 1, 8, 8)),
        exp_mask=jnp.ones((1, 1, 8, 8)),
    )


def test_scan_matches_reference_loop():
    cfg = S.SamplerConfig(
        num_inference_steps=3, frames_per_batch=4, overlap=0, shift_offset=3,
    )
    num_frames, h, w = 6, 4, 4
    plan = S.make_plan(cfg, num_frames)
    buffers = build_buffers(plan.buffer_len, h, w)
    key = jax.random.PRNGKey(0)
    ref_latent = jax.random.normal(key, (h, w, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (plan.buffer_len, h, w, 4))
    unet = fake_unet_factory(h, w)

    got = S.sample_video(
        unet, None, cfg, plan, buffers, ref_latent, jax.random.PRNGKey(1),
        dtype=jnp.float32,
    )
    want = reference_loop(
        cfg, plan, buffers, np.asarray(ref_latent), np.asarray(noise), unet
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_windows_cover_all_frames():
    cfg = S.SamplerConfig(num_inference_steps=5, frames_per_batch=5, overlap=1,
                          shift_offset=2)
    plan = S.make_plan(cfg, 12)
    for i in range(len(plan.timesteps)):
        covered = np.unique(plan.window_idx[i])
        assert len(covered) == plan.buffer_len


def test_i2i_strength_truncates_plan():
    cfg = S.SamplerConfig(num_inference_steps=10, i2i_noise_strength=0.5)
    plan = S.make_plan(cfg, 4)
    assert len(plan.timesteps) == 5
    assert plan.window_idx.shape[0] == 5


def test_windows_per_call_chunking_equal():
    cfg_all = S.SamplerConfig(num_inference_steps=2, frames_per_batch=4,
                              shift_offset=1)
    cfg_chunk = S.SamplerConfig(num_inference_steps=2, frames_per_batch=4,
                                shift_offset=1, windows_per_call=1)
    plan = S.make_plan(cfg_all, 6)
    buffers = build_buffers(plan.buffer_len, 4, 4, seed=3)
    unet = fake_unet_factory(4, 4)
    ref = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4))
    a = S.sample_video(unet, None, cfg_all, plan, buffers, ref,
                       jax.random.PRNGKey(3), dtype=jnp.float32)
    b = S.sample_video(unet, None, cfg_chunk, plan, buffers, ref,
                       jax.random.PRNGKey(3), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_batched_serving_matches_per_clip():
    """vmapped multi-identity serving == per-identity sample_video, and runs
    dp-sharded over the 8-device mesh."""
    import jax
    from actalker_tpu.parallel.mesh import make_mesh
    from actalker_tpu.pipeline.serving import sample_video_batch

    cfg = S.SamplerConfig(num_inference_steps=2, frames_per_batch=4,
                          shift_offset=1)
    num_frames, h, w = 4, 4, 4
    plan = S.make_plan(cfg, num_frames)
    unet = fake_unet_factory(h, w)
    n_ident = 4
    all_buffers = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[build_buffers(plan.buffer_len, h, w, seed=i) for i in range(n_ident)],
    )
    refs = jax.random.normal(jax.random.PRNGKey(9), (n_ident, h, w, 4))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n_ident))

    mesh = make_mesh(dp=4, tp=2)
    out = sample_video_batch(unet, None, cfg, plan, all_buffers, refs, keys,
                             mesh=mesh, dtype=jnp.float32)
    assert out.shape == (n_ident, plan.buffer_len, h, w, 4)
    # identity 2 must equal the unbatched pipeline
    single = S.sample_video(
        unet, None, cfg, plan, build_buffers(plan.buffer_len, h, w, seed=2),
        refs[2], keys[2], dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single),
                               rtol=1e-2, atol=5e-4)


def test_window_sharding_matches_unsharded():
    """Single-clip multi-chip: sharding the window axis over an 8-device
    mesh must reproduce the unsharded loop (windows within one step are
    independent; only the overlap-average all-reduces)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = S.SamplerConfig(
        num_inference_steps=3, frames_per_batch=4, overlap=0, shift_offset=3,
    )
    num_frames, h, w = 28, 4, 4   # buffer 32 -> 8 windows
    plan = S.make_plan(cfg, num_frames)
    assert plan.window_idx.shape[1] % 8 == 0
    buffers = build_buffers(plan.buffer_len, h, w)
    ref_latent = jax.random.normal(jax.random.PRNGKey(0), (h, w, 4))
    unet = fake_unet_factory(h, w)

    base = S.sample_video(unet, None, cfg, plan, buffers, ref_latent,
                          jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("dp",))
    with jax.set_mesh(mesh):
        sharded = S.sample_video(
            unet, None, cfg, plan, buffers, ref_latent, jax.random.PRNGKey(1),
            dtype=jnp.float32,
            window_sharding=NamedSharding(mesh, P("dp")),
        )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_churn_sampler_runs_and_gammas():
    """s_churn > 0 wires per-step correlated noise through the jitted loop:
    the plan's gamma table matches the reference formula and churned output
    differs from the deterministic run (but stays finite)."""
    det = S.SamplerConfig(num_inference_steps=3, frames_per_batch=4,
                          shift_offset=3)
    churn = S.SamplerConfig(num_inference_steps=3, frames_per_batch=4,
                            shift_offset=3, s_churn=1.0,
                            noise_type="video_fusion", w_ind_noise=0.3)
    num_frames, h, w = 6, 4, 4
    plan_d = S.make_plan(det, num_frames)
    plan_c = S.make_plan(churn, num_frames)
    assert np.all(plan_d.gammas == 0)
    want_gamma = min(1.0 / (len(plan_c.sigmas) - 1), 2**0.5 - 1)
    np.testing.assert_allclose(plan_c.gammas, want_gamma, rtol=1e-6)

    buffers = build_buffers(plan_d.buffer_len, h, w)
    ref_latent = jax.random.normal(jax.random.PRNGKey(0), (h, w, 4))
    unet = fake_unet_factory(h, w)
    out_d = np.asarray(S.sample_video(
        unet, None, det, plan_d, buffers, ref_latent, jax.random.PRNGKey(1),
        dtype=jnp.float32))
    out_c = np.asarray(S.sample_video(
        unet, None, churn, plan_c, buffers, ref_latent, jax.random.PRNGKey(1),
        dtype=jnp.float32))
    assert np.isfinite(out_c).all()
    assert np.abs(out_c - out_d).max() > 1e-4
