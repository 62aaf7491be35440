"""Phase-split timing of the full clip pipeline on the real TPU.

Answers: where do the ~32 s of non-UNet-step time in the 59 s clip bench go?
(25 steps x 1.08 s/step accounts for only ~27 s.) Phases:

  1. cond     — VAE ref encode x2 + PoseGuider + projection heads
  2. sample   — the 25-step whole-generation `lax.scan` (4-way CFG)
  3. decode   — chunked fp32 temporal-decoder VAE decode

Usage: timeout 1800 python -u tools/clip_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from actalker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from actalker_tpu.io.init import cast_params_bf16, init_pipeline_params
    from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules
    from actalker_tpu.pipeline.sampler import SamplerConfig

    f, px = 14, 512
    modules = PipelineModules.create(dtype=jnp.bfloat16)
    params = cast_params_bf16(init_pipeline_params(
        modules, jax.random.PRNGKey(0), image_size=(px, px),
        latent_size=(px // 8, px // 8), use_eval_shape=True,
    ))
    pipe = ACTalkerPipeline(modules, params, dtype=jnp.bfloat16)
    scfg = SamplerConfig(num_inference_steps=25, frames_per_batch=f)

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((px, px, 3)).astype(np.float32) * 0.2
    id_embed = rng.standard_normal(512).astype(np.float32)
    audio = rng.standard_normal((f, 32, 1024)).astype(np.float32)
    vasa = rng.standard_normal((f, 1, 1024)).astype(np.float32)
    pose = rng.random((f, px, px, 3)).astype(np.float32)

    def run():
        latents = pipe.generate_latents(
            ref, id_embed, jnp.asarray(audio), jnp.zeros_like(audio),
            jnp.asarray(vasa), jnp.zeros_like(vasa), pose, scfg, seed=0,
        )
        _ = float(jnp.sum(latents))  # sync the sampler before decode timing
        t_mid = time.time()
        frames = pipe.decode_latents(latents, decode_chunk_size=10)
        _ = float(jnp.sum(jnp.asarray(frames[0])))
        return t_mid, frames

    # warm (compiles everything)
    t0 = time.time()
    run()
    print(f"warm total {time.time() - t0:.1f}s", flush=True)

    iters = 3
    gen_t, dec_t = 0.0, 0.0
    for _ in range(iters):
        t0 = time.time()
        t_mid, frames = run()
        t1 = time.time()
        gen_t += t_mid - t0
        dec_t += t1 - t_mid
    print(f"generate_latents (cond + 25-step sample): {gen_t / iters:.2f}s")
    print(f"decode_latents (fp32 temporal VAE):       {dec_t / iters:.2f}s")
    print(f"total:                                     {(gen_t + dec_t) / iters:.2f}s")
    # split generate further: time sample alone by re-running with the
    # conditioning precomputed is invasive; instead time 1-step config.
    scfg1 = SamplerConfig(num_inference_steps=1, frames_per_batch=f)

    def gen(cfg):
        lat = pipe.generate_latents(
            ref, id_embed, jnp.asarray(audio), jnp.zeros_like(audio),
            jnp.asarray(vasa), jnp.zeros_like(vasa), pose, cfg, seed=0,
        )
        _ = float(jnp.sum(lat))

    gen(scfg1)  # warm 1-step variant
    t0 = time.time()
    for _ in range(iters):
        gen(scfg1)
    one = (time.time() - t0) / iters
    print(f"generate_latents @1 step (= cond overhead + 1 step): {one:.2f}s")


if __name__ == "__main__":
    main()
