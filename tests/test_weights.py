"""Weight-converter parity tests using randomly initialized torch models."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from actalker_tpu.io import weights as W

pytestmark = pytest.mark.slow  # compile/oracle-heavy: excluded from the fast tier


def test_whisper_encoder_parity_with_hf():
    """Full-module parity: random HF whisper-tiny encoder == our flax encoder
    after weight conversion."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig, WhisperModel

    cfg = HFConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=128, num_mel_bins=80, max_source_positions=50,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64,
    )
    torch.manual_seed(0)
    hf = WhisperModel(cfg).eval()
    mel = np.random.default_rng(0).standard_normal((1, 80, 100)).astype(np.float32)
    with torch.no_grad():
        out = hf.encoder(torch.tensor(mel), output_hidden_states=True)
    want = torch.stack(out.hidden_states, dim=2).numpy()  # (1, 50, 3, 64)

    from actalker_tpu.models.whisper import WhisperConfig, WhisperEncoder

    enc = WhisperEncoder(WhisperConfig(
        d_model=64, layers=2, heads=2, ffn_dim=128, max_positions=50,
    ))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = W.convert_whisper_encoder(sd, layers=2)
    got = enc.apply(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_linear_conv_transpose_roundtrip():
    torch = pytest.importorskip("torch")
    # Linear
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(2, 6)
    want = lin(x).detach().numpy()
    k = W.t_linear(lin.weight.detach().numpy())
    got = x.numpy() @ k + lin.bias.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Conv2d 3x3 via flax
    import flax.linen as nn

    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    xi = torch.randn(1, 3, 8, 8)
    want = conv(xi).detach().numpy().transpose(0, 2, 3, 1)
    fl = nn.Conv(5, kernel_size=(3, 3), padding=((1, 1), (1, 1)))
    params = {"params": {
        "kernel": jnp.asarray(W.t_conv2d(conv.weight.detach().numpy())),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }}
    got = fl.apply(params, jnp.asarray(xi.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_ip_adapter_path_order():
    paths = W.ip_adapter_attn2_paths()
    # 3 cross down blocks x 2 transformers x 2 (spatial+temporal) = 12
    # + mid 2 + 3 cross up blocks x 3 x 2 = 18 -> total 32
    assert len(paths) == 32
    assert paths[0] == "down_blocks_0/attention_0/block_0/attn2"
    assert paths[1] == "down_blocks_0/attention_0/temporal_block_0/attn2"
    assert paths[12] == "mid_block/attention_0/block_0/attn2"
    assert paths[-1] == "up_blocks_3/attention_2/temporal_block_0/attn2"


def test_unet_converter_covers_flax_tree():
    """Converted synthetic torch state dict must exactly cover the micro
    UNet's parameter tree (names + shapes)."""
    torch = pytest.importorskip("torch")
    from actalker_tpu.models.unet import UNetConfig, UNetSpatioTemporalCondition
    from actalker_tpu.models.conditioning import Conditioning

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
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, f, hw, hw, 8)), 0.5,
        cond, jnp.zeros((1, 3)),
    )["params"]

    # Name coverage via the converter's first-class capture mode: the
    # assignment spec must contain every flax param path.
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    cap = W._CaptureSD()
    W.convert_unet(
        cap,
        down_block_types=("cross", "plain"),
        up_block_types=("plain", "cross"),
        layers_per_block=1,
    )
    conv_paths = {path for path, _key, _kind in cap.spec}
    missing = []
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if p not in conv_paths:
            missing.append(p)
    assert not missing, f"converter missing {len(missing)} params: {missing[:8]}"
