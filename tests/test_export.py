"""Checkpoint export round trips: flax params -> reference-keyed torch state
dicts -> flax params must be exact, per trainable artifact of the reference
checkpoint contract (``/root/reference/Inference.py:80-142``:
{unet, pose_guider, audio_linear, adapter_module, id_proj_model,
vasa_linear}-<step>.pth)."""
import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from actalker_tpu.io import weights as W
from actalker_tpu.io.init import random_like
from actalker_tpu.models.conditioning import Conditioning
from actalker_tpu.models.pose_guider import PoseGuider
from actalker_tpu.models.projections import (
    AudioProjModel,
    IDProjModel,
    VasaProjModel,
)
from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition

KEY = jax.random.PRNGKey(0)
MICRO_KW = dict(down_block_types=("cross", "plain"),
                up_block_types=("plain", "cross"), layers_per_block=1)


def micro_unet_params():
    cfg = UNetConfig(scan_impl="blocked").micro()
    unet = UNetSpatioTemporalCondition(cfg)
    hw, f = 8, 2
    cond = Conditioning(
        id_tokens=jnp.zeros((f, 1, 1024)),
        audio_tokens=jnp.zeros((f, 32, 1024)),
        vasa_tokens=jnp.zeros((f, 1, 1024)),
        audio_mask=jnp.ones((1, 1, hw, hw)),
        exp_mask=jnp.ones((1, 1, hw, hw)),
    )
    shapes = jax.eval_shape(
        unet.init, KEY, jnp.zeros((1, f, hw, hw, 8)), 0.5, cond,
        jnp.zeros((1, 3)),
    )
    return random_like(shapes)


def assert_tree_roundtrip(params, back, allow_extra_qk=False):
    fa = W._flatten_params(params["params"])
    fb = W._flatten_params(back["params"])
    missing = set(fa) - set(fb)
    assert not missing, sorted(missing)[:5]
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
    extra = set(fb) - set(fa)
    if allow_extra_qk:
        # synthesized zero q/k rows for singleton-context attention — the
        # torch contract has them, the flax tree legitimately does not
        assert all("to_q" in k or "to_k" in k for k in extra), sorted(extra)[:5]
    else:
        assert not extra, sorted(extra)[:5]


def test_unet_export_roundtrip():
    params = micro_unet_params()
    sd = W.export_unet(params, **MICRO_KW)
    back = W.convert_unet(sd, **MICRO_KW)
    assert_tree_roundtrip(params, back, allow_extra_qk=True)
    # every exported leaf is a torch-layout numpy array
    assert all(isinstance(v, np.ndarray) for v in sd.values())


def test_adapter_module_export_roundtrip():
    params = micro_unet_params()
    sd = W.export_unet(params, **MICRO_KW)
    back = W.convert_unet(sd, **MICRO_KW)
    ad = W.export_adapter_modules(params, **MICRO_KW)
    # adapter sd is ModuleList-indexed like the reference's
    # load_adapter_states contract
    assert any(k.startswith("0.to_k_ip.0") for k in ad)
    back2 = copy.deepcopy(back)
    W.load_adapter_modules(back2, ad, **MICRO_KW)
    assert_tree_roundtrip(params, back2, allow_extra_qk=True)


@pytest.mark.parametrize("name", ["audio", "id", "vasa", "pose"])
def test_head_export_roundtrips(name):
    if name == "audio":
        p = AudioProjModel().init(KEY, jnp.zeros((1, 1, 10, 5, 384)))
        exp, conv = W.export_audio_proj, W.convert_audio_proj
    elif name == "id":
        p = IDProjModel().init(KEY, jnp.zeros((1, 512)))
        exp, conv = W.export_id_proj, W.convert_id_proj
    elif name == "vasa":
        p = VasaProjModel(output_dim=1018).init(KEY, jnp.zeros((1, 512)))
        exp, conv = W.export_vasa_proj, W.convert_vasa_proj
    else:
        p = PoseGuider(embedding_channels=32).init(
            KEY, jnp.zeros((1, 2, 64, 64, 3)))
        exp, conv = W.export_pose_guider, W.convert_pose_guider
    assert_tree_roundtrip(p, conv(exp(p)))


def test_export_strict_coverage_error():
    """A param leaf outside the converter spec must fail loudly."""
    p = IDProjModel().init(KEY, jnp.zeros((1, 512)))
    p = {"params": dict(p["params"], rogue=np.zeros((3,)))}
    with pytest.raises(ValueError, match="export spec missed"):
        W.export_id_proj(p)
