"""Independent end-to-end parity: the reference's OWN pipeline class vs
``ACTalkerPipeline.generate_latents`` (VERDICT r3 item #4; r4 task #4 widened
this into a config MATRIX).

The oracle is ``Pose2VideoLongSVDPipeline.__call__``
(``/root/reference/src/pipelines/pipeline_svd_audio_adapter_motionexp_idembed_
vasa_two_ip.py:352-774``) executed on CPU through
``tests/torch_shim/pipeline_shim.py`` with the reference's on-disk v10_two_ip
UNet graph, the diffusers VAE oracle, the reference PoseGuider/IDProjModel,
and a faithful diffusers-0.29 EulerDiscreteScheduler — so the 4-way CFG
assembly, i2i latent init, sliding-window rotation with shift_offset, Euler
stepping, and overlap averaging are all compared against the reference's own
loop, not a re-implementation.

Matrix (r4 VERDICT task #4): base gate=(1,1); mode 0 ``gate=[1,0]`` and
mode 1 ``gate=[0,1]`` with real box masks (reference gating:
``Inference.py:469-546`` + pipeline ``:684-756``); the static-capacity
gather lowering (same masks, ``mask_capacity`` set — config, not params);
``overlap>0`` window averaging; and ``i2i_noise_strength<1`` schedule
truncation (pipeline ``get_timesteps`` + ``prepare_latents:312-316``).

Both sides share: converted weights, the exact initial noise tensor
(``latents=`` / ``init_noise=``), box region masks, and matched sampler
hyperparameters. Compared on output latents (``output_type='latent'``).

``video_fusion`` noise is oracle-tested at the formula level in
``test_scheduler.py`` (the flagship pipeline's own loop never draws it:
its ``scheduler.step`` call passes no churn args, reference ``:737``, and
the ``prepare_latents`` video_fusion line is commented out, ``:304``).
"""
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

from tests.test_unet_parity import _randomize, _box_mask  # noqa: E402
from tests.torch_shim import pipeline_shim, shim, vae_oracle  # noqa: E402


H = W = 128                 # image; latents 16x16 (parity-test scale)
NUM_FRAMES = 2
FPB = 2
BUF = NUM_FRAMES + FPB


@pytest.fixture(scope="module")
def torch_stack():
    mod = pipeline_shim.load_reference_pipeline()
    umod = shim.load_reference_module(
        "src.models.base.unet_spatio_temporal_condition_mambaID_v10_two_ip")
    base = shim.load_reference_module(
        "src.models.base.unet_spatio_temporal_condition")
    pg_mod = shim.load_reference_module(
        "src.models.audio_adapter.pose_guider")
    ap_mod = shim.load_reference_module(
        "src.models.audio_adapter.audio_proj")

    torch.manual_seed(0)
    unet = umod.UNetSpatioTemporalConditionModel()
    base.add_ip_adapters(unet, [32, 32], [1.25, 1.25])
    _randomize(unet)
    unet.eval()

    vae_core = vae_oracle.AutoencoderKLTemporalDecoder()
    _randomize(vae_core, seed=5)
    vae_core.eval()
    vae = pipeline_shim.VaeAdapter(vae_core)

    pose_guider = pg_mod.PoseGuider(
        conditioning_embedding_channels=320,
        block_out_channels=(16, 32, 96, 256))
    _randomize(pose_guider, seed=7)
    pose_guider.eval()

    id_proj = ap_mod.IDProjModel(input_dim=512, output_dim=1024,
                                 intermediate_dim=1024)
    _randomize(id_proj, seed=9)
    id_proj.eval()

    sched = pipeline_shim.EulerDiscreteScheduler()
    pipe = mod.Pose2VideoLongSVDPipeline(
        vae=vae, id_proj_model=id_proj, unet=unet, pose_guider=pose_guider,
        scheduler=sched, feature_extractor=None)
    return pipe, unet, vae_core, pose_guider, id_proj


@pytest.fixture(scope="module")
def flax_params(torch_stack):
    from actalker_tpu.io.weights import (
        convert_id_proj, convert_pose_guider, convert_unet, convert_vae)

    _, unet, vae_core, pose_guider, id_proj = torch_stack
    return {
        "unet": convert_unet(
            {k: v.detach().numpy() for k, v in unet.state_dict().items()}),
        "vae": convert_vae(
            {k: v.detach().numpy() for k, v in vae_core.state_dict().items()}),
        "pose_guider": convert_pose_guider(
            {k: v.detach().numpy()
             for k, v in pose_guider.state_dict().items()}),
        "id_proj": convert_id_proj(
            {k: v.detach().numpy() for k, v in id_proj.state_dict().items()}),
    }


# (name, gate, overlap, shift_offset, steps, i2i_strength, mask_capacity)
CONFIGS = [
    ("base_gate11", (1, 1), 0, 1, 2, 1.0, None),
    ("mode0_audio", (1, 0), 0, 1, 2, 1.0, None),
    ("mode1_vasa", (0, 1), 0, 1, 2, 1.0, None),
    # same mode-0 masks lowered through the static-capacity gather — config
    # only, identical params (reference masked-select: mamba_layer.py:1962-81)
    ("mode0_capacity_gather", (1, 0), 0, 1, 2, 1.0, (0.5, 0.5)),
    ("overlap1", (1, 1), 1, 1, 2, 1.0, None),
    ("i2i_half", (1, 1), 0, 1, 4, 0.5, None),
]


@pytest.mark.parametrize("name,gate,overlap,shift,steps,i2i,caps",
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_reference_pipeline_latent_parity(torch_stack, flax_params, name,
                                          gate, overlap, shift, steps, i2i,
                                          caps):
    import jax
    import jax.numpy as jnp

    from actalker_tpu.models.unet import UNetConfig
    from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules
    from actalker_tpu.pipeline.sampler import SamplerConfig

    pipe, unet, vae_core, pose_guider, id_proj = torch_stack
    gen = torch.Generator().manual_seed(42)

    ref_image = torch.randn(1, 3, H, W, generator=gen).clamp(-1, 1) * 0.8
    idv = torch.randn(1, 1, 512, generator=gen)
    if gate == (1, 1):
        pose = torch.rand(BUF, 3, H, W, generator=gen)
    else:
        # modes 0/1 gate the active branch by the FACE mask, which the
        # reference derives from the first pose image's first channel
        # (``pose_cond_tensor[0, :1, :1]``, pipeline :622 + :703-711) — the
        # production pose input IS the white face box. A box (25% area)
        # also keeps the capacity-gather config exact (active fraction
        # under mask_capacity at every SS2D scale).
        pose = torch.zeros(BUF, 3, H, W)
        pose[:, :, 16:80, 32:96] = 1.0
    audio = torch.randn(NUM_FRAMES, 32, 1024, generator=gen)
    audio_u = torch.randn(NUM_FRAMES, 32, 1024, generator=gen) * 0.1
    vasa = torch.randn(NUM_FRAMES, 1024, generator=gen)
    vasa_u = torch.randn(NUM_FRAMES, 1024, generator=gen) * 0.1
    mouth_mask = _box_mask(H, W, 64, 104, 32, 96)[0]     # (1, H, W)
    exp_mask = (_box_mask(H, W, 16, 104, 24, 104) - _box_mask(
        H, W, 64, 104, 32, 96))[0]
    noise = torch.randn(1, BUF, 4, H // 8, W // 8, generator=gen)

    with torch.no_grad():
        want = pipe(
            ref_image=ref_image,
            clip_image=idv,
            # the flax pipeline tiles pose images over the ring buffer
            # (pose_idx = arange(buf) % num_frames) — feed the torch side
            # the identical tiling
            pose_images=[pose[i % NUM_FRAMES] for i in range(BUF)],
            exp_mask_images=[exp_mask],
            mouth_mask_images=[mouth_mask],
            audio_prompts=[audio[i] for i in range(NUM_FRAMES)],
            uncond_audio_prompts=[audio_u[i] for i in range(NUM_FRAMES)],
            vasa_prompts=[vasa[i] for i in range(NUM_FRAMES)],
            uncond_vasa_prompts=[vasa_u[i] for i in range(NUM_FRAMES)],
            height=H, width=W,
            num_frames=NUM_FRAMES,
            num_inference_steps=steps,
            min_guidance_scale1=2.0, max_guidance_scale1=2.0,
            min_guidance_scale2=7.5, max_guidance_scale2=7.5,
            min_guidance_scale3=3.0, max_guidance_scale3=3.0,
            fps=12.5, motion_bucket_id=12.0, motion_bucket_id_exp=20.0,
            noise_aug_strength=0.0,
            latents=noise,
            output_type="latent",
            overlap=overlap, shift_offset=shift,
            frames_per_batch=FPB, i2i_noise_strength=i2i,
            gate=list(gate),
            generator=torch.Generator().manual_seed(0),
        ).frames
    want = want[0, :NUM_FRAMES].numpy()                   # (F, 4, 16, 16)

    # ---- flax side with converted weights and the same noise ----
    modules = PipelineModules.create(
        unet_config=UNetConfig(scan_impl="assoc", mask_capacity=caps),
        dtype=jnp.float32)
    jpipe = ACTalkerPipeline(modules, flax_params, dtype=jnp.float32)
    scfg = SamplerConfig(
        num_inference_steps=steps, frames_per_batch=FPB, overlap=overlap,
        shift_offset=shift, gate=gate, noise_aug_strength=0.0,
        i2i_noise_strength=i2i,
    )
    if gate == (1, 1):
        am, em = mouth_mask[None].numpy(), exp_mask[None].numpy()
    else:
        # both modes feed the face mask on the ACTIVE branch; the inactive
        # branch's mask is zeroed inside _cfg_conditioning (reference
        # mask_list semantics, pipeline :703-711)
        face = pose[0, :1][None].numpy()
        am, em = face, face
    got = jpipe.generate_latents(
        ref_image[0].permute(1, 2, 0).numpy(),
        idv[0, 0].numpy(),
        jnp.asarray(audio.numpy()), jnp.asarray(audio_u.numpy()),
        jnp.asarray(vasa.numpy()[:, None, :]),
        jnp.asarray(vasa_u.numpy()[:, None, :]),
        pose[:NUM_FRAMES].permute(0, 2, 3, 1).numpy(),
        scfg, seed=0,
        audio_mask=am, exp_mask=em,
        init_noise=noise[0].permute(0, 2, 3, 1).numpy(),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)           # (F, 4, 16, 16)

    scale = np.abs(want).max()
    err = np.abs(got - want).max()
    assert err <= 1e-3 * scale, (name, err, scale, err / scale)
