"""End-to-end pipeline smoke test on tiny configs (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from actalker_tpu.models.unet import UNetConfig
from actalker_tpu.models.vae import VAEConfig
from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules
from actalker_tpu.pipeline.sampler import SamplerConfig
from actalker_tpu.io.init import init_pipeline_params
import pytest

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


def test_generate_tiny_clip():
    h = w = 64  # image size; latents 8x8
    modules = PipelineModules.create(
        unet_config=UNetConfig(scan_impl="blocked").tiny(),
        vae_config=VAEConfig().tiny(),
        dtype=jnp.float32,
    )
    params = init_pipeline_params(
        modules, jax.random.PRNGKey(0), image_size=(h, w), latent_size=(8, 8),
        use_eval_shape=True,
    )
    pipe = ACTalkerPipeline(modules, params, dtype=jnp.float32)

    num_frames = 3
    cfg = SamplerConfig(
        num_inference_steps=2, frames_per_batch=2, overlap=0, shift_offset=1,
        gate=(1, 1),
    )
    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    idv = rng.standard_normal(512).astype(np.float32)
    audio = jnp.asarray(rng.standard_normal((num_frames, 32, 1024)).astype(np.float32))
    audio_u = jnp.zeros_like(audio)
    vasa = jnp.asarray(rng.standard_normal((num_frames, 1, 1024)).astype(np.float32))
    vasa_u = jnp.zeros_like(vasa)
    pose = rng.uniform(0, 1, (num_frames, h, w, 3)).astype(np.float32)

    latents = pipe.generate_latents(
        ref, idv, audio, audio_u, vasa, vasa_u, pose, cfg, seed=1
    )
    assert latents.shape == (num_frames, 8, 8, 4)
    assert np.isfinite(np.asarray(latents)).all()

    frames = pipe.decode_latents(latents, decode_chunk_size=2)
    assert frames.shape == (num_frames, h, w, 3)
    assert np.isfinite(frames).all()


def test_audio_token_windows():
    modules = PipelineModules.create(
        unet_config=UNetConfig(scan_impl="blocked").tiny(),
        vae_config=VAEConfig().tiny(), dtype=jnp.float32,
    )
    params = init_pipeline_params(
        modules, jax.random.PRNGKey(0), use_eval_shape=True
    )
    pipe = ACTalkerPipeline(modules, params, dtype=jnp.float32)
    feats = np.random.default_rng(1).standard_normal((30, 5, 384)).astype(np.float32)
    cond, uncond = pipe.audio_tokens_per_frame(feats, num_frames=5, step=2)
    assert cond.shape == (5, 32, 1024)
    assert uncond.shape == (5, 32, 1024)
    # uncond is frame-independent
    np.testing.assert_allclose(np.asarray(uncond[0]), np.asarray(uncond[4]))


def test_vasa_tokens_mode0():
    modules = PipelineModules.create(
        unet_config=UNetConfig(scan_impl="blocked").tiny(),
        vae_config=VAEConfig().tiny(), dtype=jnp.float32,
    )
    params = init_pipeline_params(modules, jax.random.PRNGKey(0),
                                  use_eval_shape=True)
    pipe = ACTalkerPipeline(modules, params, dtype=jnp.float32)
    tok, unc = pipe.vasa_tokens(None, None, num_frames=4)
    assert tok.shape == (4, 1, 1024)
    np.testing.assert_allclose(np.asarray(tok), 0.0)
