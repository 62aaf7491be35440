"""Numerical parity of the flax AutoencoderKLTemporalDecoder + ``convert_vae``
against a torch oracle of the diffusers graph (VERDICT round-1 item #1, VAE
half). The oracle (``tests/torch_shim/vae_oracle.py``) is an independent NCHW
torch implementation with diffusers-exact state-dict keys."""
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

from tests.test_unet_parity import _randomize  # noqa: E402
from tests.torch_shim import vae_oracle  # noqa: E402


@pytest.fixture(scope="module")
def torch_vae():
    torch.manual_seed(0)
    vae = vae_oracle.AutoencoderKLTemporalDecoder()
    _randomize(vae, seed=5)
    vae.eval()
    return vae


def test_vae_parity(torch_vae):
    import jax.numpy as jnp

    from actalker_tpu.io.weights import convert_vae
    from actalker_tpu.models.vae import AutoencoderKLTemporalDecoder, VAEConfig

    B, F_, H, W = 1, 3, 64, 64
    gen = torch.Generator().manual_seed(11)
    x = torch.randn(B * F_, 3, H, W, generator=gen)

    with torch.no_grad():
        moments = torch_vae.encode_moments(x)
        mean = moments.chunk(2, dim=1)[0]
        decoded = torch_vae.decode(mean, num_frames=F_)

    sd = {k: v.detach().numpy() for k, v in torch_vae.state_dict().items()}
    params = convert_vae(sd)
    model = AutoencoderKLTemporalDecoder(VAEConfig(), dtype=jnp.float32)

    got_mean, got_logvar = model.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        method=AutoencoderKLTemporalDecoder.encode_moments)
    want_mean, want_logvar = moments.chunk(2, dim=1)
    want_logvar = torch.clamp(want_logvar, -30.0, 20.0)
    scale = float(want_mean.abs().max())
    err = np.abs(np.asarray(got_mean).transpose(0, 3, 1, 2)
                 - want_mean.numpy()).max()
    assert err <= 2e-4 * scale, (err, scale)
    err_lv = np.abs(np.asarray(got_logvar).transpose(0, 3, 1, 2)
                    - want_logvar.numpy()).max()
    assert err_lv <= 2e-4 * float(want_logvar.abs().max() + 1)

    got_dec = model.apply(
        params,
        jnp.asarray(mean.numpy().transpose(0, 2, 3, 1)).reshape(
            B, F_, H // 8, W // 8, 4),
        method=AutoencoderKLTemporalDecoder.decode)
    got_dec = np.asarray(got_dec).reshape(B * F_, H, W, 3).transpose(
        0, 3, 1, 2)
    dscale = float(decoded.abs().max())
    derr = np.abs(got_dec - decoded.numpy()).max()
    assert derr <= 2e-4 * dscale, (derr, dscale)
