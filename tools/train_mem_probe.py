"""AOT memory analysis of the single-chip flagship train step.

Compiles bench.py --train's exact program (no execution) and prints XLA's
memory_analysis plus live HBM after each host stage — pinpointing why the
8/14/25-frame variants RESOURCE_EXHAUST a 16 GB v5e.

Usage: timeout 4200 python -u tools/train_mem_probe.py [frames=8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def hbm(tag):
    import jax

    try:
        s = jax.devices()[0].memory_stats()
        print(f"[{tag}] bytes_in_use={s['bytes_in_use']/2**30:.2f} GiB "
              f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}")


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    from actalker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import ml_dtypes
    from actalker_tpu.models.unet import UNetConfig
    from actalker_tpu.pipeline.pipeline import PipelineModules
    from actalker_tpu.training import trainer as T
    from actalker_tpu.training.train import TRAINABLE, synthetic_batches
    from actalker_tpu.io.init import init_pipeline_params

    ucfg = UNetConfig(gradient_checkpointing=True)
    modules = PipelineModules.create(unet_config=ucfg, dtype=jnp.bfloat16)
    b, f, hw = 1, frames, 64
    applies = {"unet": modules.unet.apply,
               "pose_guider": modules.pose_guider.apply,
               "audio_proj": modules.audio_proj.apply,
               "id_proj": modules.id_proj.apply,
               "vasa_proj": modules.vasa_proj.apply}
    full = init_pipeline_params(
        modules, jax.random.PRNGKey(0), image_size=(hw * 8, hw * 8),
        latent_size=(hw, hw), use_eval_shape=True)
    host_params = jax.tree.map(
        lambda x: np.asarray(x).astype(ml_dtypes.bfloat16)
        if np.asarray(x).ndim >= 2 else np.asarray(x),
        {k: full[k] for k in TRAINABLE})
    del full
    pbytes = sum(x.nbytes for x in jax.tree.leaves(host_params))
    print(f"param bytes: {pbytes/2**30:.2f} GiB")
    hbm("start")

    params = jax.device_put(host_params)
    jax.block_until_ready(params)
    hbm("params uploaded")

    tcfg = T.TrainConfig(grad_accum_steps=1)
    tx = T.make_optimizer(tcfg)
    opt_shapes = jax.eval_shape(tx.init, params)
    obytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                 for s in jax.tree.leaves(opt_shapes))
    print(f"opt bytes (eval_shape): {obytes/2**30:.2f} GiB")

    step = T.make_train_step(applies, tx, tcfg, dtype=jnp.bfloat16)
    batch = next(synthetic_batches(b, f, hw, 320))
    key = jax.random.PRNGKey(0)

    lowered = jax.jit(step, donate_argnums=(0, 1)).lower(
        params, opt_shapes, batch, key)
    print("lowered; compiling...")
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        for attr in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "generated_code_size_in_bytes",
                     "alias_size_in_bytes"):
            v = getattr(ma, attr, None)
            if v is not None:
                print(f"SUMMARY {attr}: {v/2**30:.2f} GiB", flush=True)
    except Exception as e:
        print(f"memory_analysis failed: {type(e).__name__} {e}")
    hbm("after compile")


if __name__ == "__main__":
    main()
