"""BatchBuilder: raw dataset samples must actually reach the conditioning
encoders (ArcFace -> id_proj, mel -> whisper -> audio_proj, VASA towers ->
vasa_proj) — regression for the gap where the builder read pre-encoded keys
the dataset never emits and trained with zero conditioning."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actalker_tpu.io.init import init_pipeline_params
from actalker_tpu.models.unet import UNetConfig
from actalker_tpu.models.vae import VAEConfig
from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules
from actalker_tpu.training.batch_builder import BatchBuilder

pytestmark = pytest.mark.slow  # compiles VAE/whisper/VASA towers


class _TinyArcFace(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, 112, 112, 3) -> (B, 512)
        return nn.Dense(512)(x.mean(axis=(1, 2)))


def _make_pipe():
    modules = PipelineModules.create(
        unet_config=UNetConfig(scan_impl="blocked").tiny(),
        vae_config=VAEConfig().tiny(), dtype=jnp.float32)
    params = init_pipeline_params(
        modules, jax.random.PRNGKey(0), image_size=(64, 64),
        latent_size=(8, 8), use_eval_shape=True)
    return ACTalkerPipeline(modules, params, dtype=jnp.float32)


def _raw_sample(rng, f=2, hw=64, with_audio=True, with_vasa=True):
    s = {
        "frames": rng.uniform(-1, 1, (f, hw, hw, 3)).astype(np.float32),
        "ref_frame": rng.uniform(-1, 1, (hw, hw, 3)).astype(np.float32),
        "pose_mask": rng.uniform(0, 1, (hw, hw)).astype(np.float32),
        "mouth_mask": np.ones((hw, hw), np.float32),
        "exp_mask": np.ones((hw, hw), np.float32),
        "head_crop": rng.uniform(-1, 1, (112, 112, 3)).astype(np.float32),
        "motion_bucket": 12.0, "motion_bucket_exp": 7.0,
        "fps": 11.0,
    }
    if with_audio:
        s["audio_features"] = rng.standard_normal((80, 120)).astype(np.float32)
        s["audio_offset"] = 3
        s["audio_step"] = 2
    if with_vasa:
        s["vasa_face"] = rng.uniform(0, 1, (f, 256, 256, 3)).astype(np.float32)
        s["vasa_pose"] = rng.uniform(0, 1, (f, 256, 256, 3)).astype(np.float32)
    return s


def test_raw_sample_keys_reach_the_encoders():
    rng = np.random.default_rng(0)
    pipe = _make_pipe()
    arc = _TinyArcFace()
    aparams = arc.init(jax.random.PRNGKey(1), jnp.zeros((1, 112, 112, 3)))
    builder = BatchBuilder(pipe, arcface=(arc, aparams))

    f = 2
    s = _raw_sample(rng, f=f)
    batch = builder([s])

    # identity: arcface(head_crop) -> id_proj, NOT zeros
    id_embed = np.asarray(arc.apply(aparams, jnp.asarray(s["head_crop"])[None]))
    want_id = np.asarray(pipe.m.id_proj.apply(
        pipe.params["id_proj"], jnp.asarray(id_embed)))[:, None, :]
    np.testing.assert_allclose(np.asarray(batch.id_tokens), want_id,
                               rtol=1e-5, atol=1e-5)
    assert float(np.abs(want_id).max()) > 0

    # audio: mel (padded to the 3000-frame window) -> whisper -> pad 4/6 ->
    # offset slice -> audio_proj
    mel = s["audio_features"]
    mel = np.pad(mel, ((0, 0), (0, 3000 - mel.shape[-1])))
    feats = np.asarray(pipe.encode_audio_windows(jnp.asarray(mel[None])))[0]
    feats = np.concatenate(
        [np.zeros_like(feats[:4]), feats, np.zeros_like(feats[:6])], axis=0)
    want_audio, _ = pipe.audio_tokens_per_frame(
        feats[2 * s["audio_offset"]:], f, step=s["audio_step"])
    np.testing.assert_allclose(np.asarray(batch.audio_tokens)[0],
                               np.asarray(want_audio), rtol=1e-5, atol=1e-5)
    assert float(np.abs(np.asarray(batch.audio_tokens)).max()) > 0

    # vasa: towers -> proj tokens, NOT zeros
    expr, rot = pipe.encode_vasa_video(s["vasa_face"], s["vasa_pose"])
    want_vasa, _ = pipe.vasa_tokens(expr, rot, f)
    np.testing.assert_allclose(np.asarray(batch.vasa_tokens)[0],
                               np.asarray(want_vasa), rtol=1e-5, atol=1e-5)
    assert float(np.abs(np.asarray(batch.vasa_tokens)).max()) > 0

    # clip fps flows into added-time conditioning
    np.testing.assert_allclose(np.asarray(batch.fps), [11.0])


def test_missing_modalities_degrade_to_zeros():
    rng = np.random.default_rng(1)
    pipe = _make_pipe()
    builder = BatchBuilder(pipe)  # no arcface module
    s = _raw_sample(rng, with_audio=False, with_vasa=False)
    del s["head_crop"]
    batch = builder([s])
    assert float(np.abs(np.asarray(batch.audio_tokens)).max()) == 0
    assert float(np.abs(np.asarray(batch.vasa_tokens)).max()) == 0
    # id tokens are id_proj(0), constant across zero embeds — finite
    assert np.isfinite(np.asarray(batch.id_tokens)).all()
