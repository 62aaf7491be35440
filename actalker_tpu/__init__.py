"""actalker_tpu — a TPU-native (JAX/XLA/Pallas) audio-visual talking-head video
diffusion framework.

Re-designed from scratch for TPU with the capabilities of the ACTalker reference
system (audio-visual controlled SVD video diffusion with masked selective-state-space
control branches): SVD-XT spatio-temporal UNet, parallel Mamba (selective scan)
control blocks with region mask gating, IP-adapter cross-attention conditioning
(audio / VASA expression / ArcFace identity), Euler-discrete sampling over sliding
temporal windows, temporal-decoder VAE, and a training + serving stack built on
``jax.sharding`` meshes.

Layout:
    ops/        Pallas + XLA kernels (selective scan, attention, upfirdn2d, ...)
    models/     Flax model layer (UNet, VAE, SSM blocks, conditioning encoders)
    diffusion/  schedulers + noise utilities (pure functions)
    pipeline/   jit-compiled samplers (sliding-window long-video engine)
    parallel/   mesh / sharding rules (dp, tp/sp over ICI)
    io/         weight conversion + checkpointing (orbax)
    frontend/   host-side preprocessing (faces, masks, audio mel, video IO)
    training/   trainer (cond-dropout, grad-accum, sharded optimizer)
"""

__version__ = "0.1.0"
