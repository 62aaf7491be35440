"""Numerical parity of the flagship flax UNet + ``convert_unet`` against the
reference graph ON DISK.

The oracle is the reference's own
``src/models/base/unet_spatio_temporal_condition_mambaID_v10_two_ip.py``
(+ ``unet_3d_blocks.py``, ``TransformerSTmodel.py``, ``attention.py``,
``attention_processor.py``, ``mamba_layer.py``) executed on CPU through
``tests/torch_shim/shim.py``, with random-but-structured weights, IP adapters
added exactly as ``Inference.py:70`` does, and the production v10 mask-gated
mamba path active. This proves the `convert_unet` key mapping AND the flax
forward numerics in one shot (VERDICT round-1 item #1).
"""
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

from tests.torch_shim import shim  # noqa: E402


def _randomize(model: torch.nn.Module, seed: int = 0) -> None:
    """Give every parameter a distinct, well-conditioned random value so any
    converter mis-mapping (swap/transpose/missing key) changes the output."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("A_logs"):
                p.copy_(torch.log(0.5 + 3.5 * torch.rand(p.shape, generator=gen)))
            elif name.endswith("Ds"):
                p.copy_(1.0 + 0.3 * torch.randn(p.shape, generator=gen))
            elif name.endswith("dt_projs_bias"):
                p.copy_(-1.0 + 0.5 * torch.randn(p.shape, generator=gen))
            elif name.endswith("mix_factor"):
                p.copy_(0.5 * torch.randn(p.shape, generator=gen))
            elif p.ndim == 1:
                base = 1.0 if name.endswith("weight") else 0.0
                p.copy_(base + 0.1 * torch.randn(p.shape, generator=gen))
            else:
                fan_in = p.shape[-1] if p.ndim == 2 else int(
                    np.prod(p.shape[1:]))
                p.copy_(torch.randn(p.shape, generator=gen) * fan_in ** -0.5)


def _box_mask(h, w, y0, y1, x0, x1):
    m = torch.zeros(1, 1, h, w)
    m[:, :, y0:y1, x0:x1] = 1.0
    return m


@pytest.fixture(scope="module")
def reference_unet():
    mod = shim.load_reference_module(
        "src.models.base.unet_spatio_temporal_condition_mambaID_v10_two_ip")
    base = shim.load_reference_module(
        "src.models.base.unet_spatio_temporal_condition")
    torch.manual_seed(0)
    unet = mod.UNetSpatioTemporalConditionModel()
    # Inference.py:70 — two IP adapters (audio 32 tokens, vasa 1*32? -> [32,32]
    # num_tokens only gates the deprecated non-tuple path; tuple path ignores it)
    base.add_ip_adapters(unet, [32, 32], [1.25, 1.25])
    _randomize(unet)
    unet.eval()
    return unet


def test_flagship_unet_parity(reference_unet):
    import jax.numpy as jnp
    from actalker_tpu.io.weights import convert_unet
    from actalker_tpu.models.conditioning import Conditioning
    from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition

    unet = reference_unet
    B, F_, H, W = 1, 3, 16, 16
    gen = torch.Generator().manual_seed(123)

    sample = torch.randn(B, F_, 8, H, W, generator=gen)
    timestep = torch.tensor(500.0)
    id_tokens = torch.randn(B * F_, 1, 1024, generator=gen)
    audio_tokens = torch.randn(B * F_, 32, 1024, generator=gen)
    vasa_tokens = torch.randn(B * F_, 1, 1024, generator=gen)
    added_time_ids = torch.tensor([[6.0, 127.0, 30.0]])
    spatial_condition = torch.randn(B, F_, 320, H, W, generator=gen) * 0.2
    mouth_mask = _box_mask(64, 64, 32, 52, 16, 48)
    exp_mask = _box_mask(64, 64, 8, 52, 12, 52) - mouth_mask

    with torch.no_grad():
        want = unet(
            sample,
            timestep,
            encoder_hidden_states=(id_tokens, [audio_tokens, vasa_tokens]),
            added_time_ids=added_time_ids,
            spatial_condition=spatial_condition,
            cross_attention_kwargs={
                "ip_adapter_masks": [mouth_mask, exp_mask]},
            return_dict=False,
        )[0].numpy()

    sd = {k: v.detach().numpy() for k, v in unet.state_dict().items()}
    params = convert_unet(sd)

    model = UNetSpatioTemporalCondition(
        UNetConfig(scan_impl="assoc"), dtype=jnp.float32)
    cond = Conditioning(
        id_tokens=jnp.asarray(id_tokens.numpy()),
        audio_tokens=jnp.asarray(audio_tokens.numpy()),
        vasa_tokens=jnp.asarray(vasa_tokens.numpy()),
        audio_mask=jnp.asarray(mouth_mask.numpy()),
        exp_mask=jnp.asarray(exp_mask.numpy()),
        ip_scales=(1.25, 1.25),
    )
    got = model.apply(
        params,
        jnp.asarray(sample.numpy().transpose(0, 1, 3, 4, 2)),
        jnp.float32(500.0),
        cond,
        jnp.asarray(added_time_ids.numpy()),
        jnp.asarray(spatial_condition.numpy().transpose(0, 1, 3, 4, 2)),
    )
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)

    scale = np.abs(want).max()
    err = np.abs(got - want).max()
    assert err <= 2e-4 * scale, (err, scale, err / scale)
