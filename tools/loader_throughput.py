"""Input-pipeline throughput vs the train step (VERDICT r4 weak #7).

Measures sustained samples/s of the REAL training input path — native libav
video decode -> PortraitAudioDataset policy (crop/resize/masks/color aug) ->
BatchBuilder device encoders (VAE latents, whisper audio tokens, pose) —
through the thread-pool loader (``training/loader.py``), on a synthetic
512 px corpus, with the flagship encoders on the default device.

Comparison target: a v5e-8 data-parallel training run consumes one global
batch of 8 samples every step (the reference trains bs 1/GPU x 8 GPUs,
``/root/reference/config/train.yaml:7-17`` + ``ds_zero2_8gpu.yaml``), so the
loader must sustain  8 / sec_per_step  samples/s to avoid starving the mesh.

Usage: timeout 2400 python -u tools/loader_throughput.py [--frames 8]
Writes one JSON line; pairs with the measured step time from BENCH_r05.
"""
import json
import os
import sys
import tempfile
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from actalker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def write_corpus(root, n_clips=6, n=40, hw=512):
    from actalker_tpu.frontend import video as video_io

    rng = np.random.default_rng(0)
    clips = []
    s = hw // 64                       # scale of the 64px toy face layout
    for c in range(n_clips):
        frames = np.full((n, hw, hw, 3), 30 + 10 * c, np.uint8)
        for i in range(n):
            x = (14 + (i + c) % 4) * s
            frames[i, 10 * s:54 * s, x:x + 36 * s] = 170 + c * 10
            frames[i, 20 * s:28 * s, x + 6 * s:x + 14 * s] = 60
            frames[i, 20 * s:28 * s, x + 22 * s:x + 30 * s] = 60
            frames[i, 38 * s:46 * s, x + 10 * s:x + 26 * s] = 90
        # mild noise so the encoder sees non-degenerate inputs and the mp4
        # is realistically sized
        frames = np.clip(frames.astype(np.int16) + rng.integers(
            -12, 12, frames.shape, np.int16), 0, 255).astype(np.uint8)
        vid = os.path.join(root, f"clip{c}.mp4")
        video_io.write_video(vid, frames.astype(np.float32) / 255.0, fps=8.0)
        wav_path = os.path.join(root, f"clip{c}.wav")
        t = np.arange(16000 * (n // 8 + 1)) / 16000.0
        pcm = (0.1 * np.sin(2 * np.pi * (200 + 50 * c) * t)
               + 0.01 * rng.standard_normal(t.shape))
        with wave.open(wav_path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((pcm * 32767).astype(np.int16).tobytes())
        box = [14.0 * s, 10.0 * s, 50.0 * s, 54.0 * s]
        lm5 = [[24.0 * s, 24.0 * s], [40.0 * s, 24.0 * s],
               [32.0 * s, 34.0 * s], [26.0 * s, 42.0 * s],
               [38.0 * s, 42.0 * s]]
        clips.append({
            "video_path": vid, "audio_path": wav_path, "frames": n,
            "fps": 8.0, "bboxes": [box] * n, "landmarks": [lm5] * n,
        })
    meta = os.path.join(root, "meta.json")
    with open(meta, "w") as f:
        json.dump(clips, f)
    return meta


def main():
    import jax.numpy as jnp

    from actalker_tpu.io.init import cast_params_bf16, init_pipeline_params
    from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules
    from actalker_tpu.training.train import real_batches

    frames = 8
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    workers = 4
    if "--workers" in sys.argv:
        workers = int(sys.argv[sys.argv.index("--workers") + 1])
    bs, hw = 8, 512                    # one v5e-8 GLOBAL batch per yield

    import jax

    with tempfile.TemporaryDirectory() as root:
        meta = write_corpus(root, hw=hw)
        modules = PipelineModules.create(dtype=jnp.bfloat16,
                                         vae_dtype=jnp.bfloat16)
        params = cast_params_bf16(init_pipeline_params(
            modules, jax.random.PRNGKey(0), image_size=(hw, hw),
            latent_size=(hw // 8, hw // 8), use_eval_shape=True))
        pipe = ACTalkerPipeline(modules, params, dtype=jnp.bfloat16)

        it = real_batches(pipe, [meta], bs, frames, hw, num_workers=workers)
        t_first0 = time.time()
        batch = next(it)               # encoder compiles + first decode
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, batch)
        first_s = time.time() - t_first0

        n_batches = 10
        t0 = time.time()
        for _ in range(n_batches):
            batch = next(it)
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, batch)
        dt = (time.time() - t0) / n_batches
        sps = bs / dt

    print(json.dumps({
        "metric": f"loader_samples_per_s_512px_{frames}f_bs{bs}_w{workers}",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": None,
        "sec_per_global_batch": round(dt, 3),
        "first_batch_incl_compile_s": round(first_s, 1),
        "note": "decode->policy->device encoders via prefetch loader; a "
                "v5e-8 dp run needs 8/step_s samples/s",
    }))


if __name__ == "__main__":
    main()
