"""Training driver CLI.

The reference ships only configs (ZeRO-2 fp16 over 8 GPUs, grad-accum 4,
cond-dropout 0.10, 250k steps — ``config/train.yaml``, ``ds_zero2_8gpu.yaml``)
and the dataset; the actual train.py is absent (SURVEY.md section 2.8). This
driver completes the capability: dataset -> (VAE-encoded) TrainBatch ->
sharded train step over a (dp, tp) mesh -> step-keyed orbax checkpoints with
rotation -> JSONL metrics.

    python -m actalker_tpu.training.train --config configs/train.yaml \
        --metadata clips.json [--synthetic N] [--steps K]

``--synthetic N`` trains on generated data (smoke/perf runs without a corpus).
"""
from __future__ import annotations

import argparse
import time
from typing import Iterator

import numpy as np


# The reference's six trainable artifacts (checkpoint contract
# ``Inference.py:80-142``; adapter to_k_ip/to_v_ip live inside the unet tree
# and export separately via export_adapter_modules).
TRAINABLE = ("unet", "pose_guider", "audio_proj", "id_proj", "vasa_proj")


def synthetic_batches(batch_size: int, frames: int, latent_hw: int,
                      c0: int, seed: int = 0, raw_heads: bool = True,
                      pixel_hw: int = None) -> Iterator:
    import jax.numpy as jnp

    from actalker_tpu.training.trainer import TrainBatch

    rng = np.random.default_rng(seed)
    hw = latent_hw
    px = pixel_hw or hw * 8
    while True:
        g = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        if raw_heads:
            fields = dict(
                audio_feats=g(batch_size, frames, 10, 5, 384),
                id_embed=g(batch_size, 512),
                vasa_expr=g(batch_size, frames, 512),
                vasa_rot=g(batch_size, frames, 3),
                pose_pixels=g(batch_size, px, px, 3),
            )
        else:
            fields = dict(
                id_tokens=g(batch_size, 1, 1024),
                audio_tokens=g(batch_size, frames, 32, 1024),
                vasa_tokens=g(batch_size, frames, 1, 1024),
                pose_fea=g(batch_size, frames, hw, hw, c0),
            )
        yield TrainBatch(
            latents=g(batch_size, frames, hw, hw, 4),
            ref_latents=g(batch_size, hw, hw, 4),
            audio_mask=jnp.ones((batch_size, 1, px, px)),
            exp_mask=jnp.ones((batch_size, 1, px, px)),
            motion_buckets=jnp.full((batch_size, 2), 12.0),
            fps=jnp.full((batch_size,), 12.5),
            **fields,
        )


def real_batches(pipe, metadata_paths, batch_size, frames, image_size,
                 num_workers: int = 4, start: int = 0,
                 stride=None, arcface_ckpt=None,
                 raw_heads: bool = True) -> Iterator:
    """Metadata-driven training batches: dataset -> encoders -> TrainBatch.

    ``pipe`` holds the training run's OWN params (converted checkpoints when
    configured, random otherwise), so the frozen encoders (VAE, whisper,
    VASA towers) the builder runs are the same weights the train step
    optimizes against.
    """
    from actalker_tpu.frontend import video as V
    from actalker_tpu.training.batch_builder import BatchBuilder
    from actalker_tpu.training.data import DataConfig, PortraitAudioDataset, load_metadata

    arcface = None
    if arcface_ckpt:
        import os

        if os.path.exists(arcface_ckpt):
            from actalker_tpu.io import weights as W
            from actalker_tpu.models.arcface import iresnet50

            arcface = (iresnet50(), W.convert_arcface(
                W.load_torch_state_dict(arcface_ckpt)))
    builder = BatchBuilder(pipe, arcface=arcface, raw_heads=raw_heads)

    def frame_reader(path, idxs):
        fr = V.read_frames(path, limit=max(idxs) + 1)
        return fr[list(idxs)]

    def audio_reader(path, start_frame):
        # the reference's get_audio_file: pick the 30 s raw-audio window
        # containing the clip start (silence padding in the SAMPLE domain),
        # then one (80, 3000) mel — one whisper window per sample instead of
        # encoding the entire clip
        from actalker_tpu.frontend import audio as A
        from actalker_tpu.training.data import slice_audio_window

        window, offset = slice_audio_window(A.load_audio(path), start_frame)
        return A.log_mel_spectrogram(window)[:, :3000], offset

    ds = PortraitAudioDataset(
        load_metadata(metadata_paths),
        # deterministic shapes whenever samples are stacked across a GLOBAL
        # batch — keyed on stride (the global batch size in multi-host runs,
        # where hosts with local bs 1 still assemble one global array), not
        # the local slice. (The reference trains bs=1/GPU with the
        # random-size augmentation; single-process bs=1 keeps that.)
        DataConfig(n_sample_frames=frames, image_size=image_size,
                   deterministic_shape=(stride or batch_size) > 1),
        frame_reader,
        audio_feature_reader=audio_reader,
    )
    from actalker_tpu.training.loader import prefetch_batches

    # per-sample decode runs on loader threads (native libav/cv2 release the
    # GIL); the builder's device-side encoders run on the consumer thread so
    # device dispatch order stays serialized with the train step
    yield from prefetch_batches(ds, batch_size, builder,
                                num_workers=num_workers, start=start,
                                stride=stride)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/train.yaml")
    parser.add_argument("--metadata", type=str, nargs="*", default=[])
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic batches (smoke run)")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--output", type=str, default="train_output")
    parser.add_argument("--micro-model", action="store_true",
                        help="use the micro UNet (CI / smoke)")
    parser.add_argument("--dp", type=int, default=None)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--export-reference", type=str, default=None,
                        help="after training, export the six reference-"
                             "contract .pth artifacts to this directory")
    args = parser.parse_args(argv)

    # multi-host (pod) wiring must precede any backend use; a no-op on a
    # single host. Each host then loads only its slice of the global batch
    # and shard_batch assembles the global array from process-local data.
    from actalker_tpu.parallel.distributed import init_distributed

    multihost = init_distributed()

    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    solver = cfg.get("solver", {})
    data_cfg = cfg.get("data", {})
    mesh_cfg = cfg.get("mesh", {})

    import jax
    import jax.numpy as jnp

    from actalker_tpu.io.checkpoint import (
        checkpoint_keys, latest_checkpoint, restore_checkpoint, save_checkpoint)
    from actalker_tpu.io.init import convert_checkpoint_params, init_pipeline_params
    from actalker_tpu.models.unet import UNetConfig
    from actalker_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_opt_state, shard_params)
    from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules
    from actalker_tpu.training import trainer as T
    from actalker_tpu.utils.observability import MetricsEmitter, get_logger

    log = get_logger("train")
    tcfg = T.TrainConfig(
        learning_rate=float(solver.get("learning_rate", 1e-5)),
        weight_decay=float(solver.get("adam_weight_decay", 1e-2)),
        max_grad_norm=float(solver.get("max_grad_norm", 1.0)),
        grad_accum_steps=int(solver.get("gradient_accumulation_steps", 1)),
        cond_dropout_prob=float(cfg.get("conditioning_dropout_prob", 0.1)),
        noise_offset=float(cfg.get("noise_offset", 0.05)),
    )
    frames = int(data_cfg.get("n_sample_frames", 25))
    # train_bs is the GLOBAL batch size (reference semantics: bs/GPU x 8
    # GPUs); each host materializes only its local slice.
    batch_size = int(data_cfg.get("train_bs", 1))
    nproc = jax.process_count()
    if multihost and batch_size % nproc:
        raise SystemExit(f"train_bs({batch_size}) must divide evenly over "
                         f"{nproc} hosts")
    local_bs = batch_size // nproc
    image_size = int(data_cfg.get("image_size", 512))

    n_dev = jax.device_count()
    tp = args.tp or int(mesh_cfg.get("tp", 1))
    dp = args.dp or (n_dev // tp)
    mesh = make_mesh(devices=jax.devices()[: dp * tp], dp=dp, tp=tp)
    log.info("mesh dp=%d tp=%d devices=%d", dp, tp, n_dev)

    ucfg = UNetConfig(scan_impl="pallas" if jax.default_backend() == "tpu"
                      else "blocked",
                      ablate=tuple(cfg.get("ablate", ()) or ()),
                      gradient_checkpointing=bool(
                          solver.get("gradient_checkpointing", False)))
    if args.micro_model:
        ucfg = ucfg.micro()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    if args.micro_model:
        image_size = 64
        frames = min(frames, 2)
        batch_size = max(batch_size, dp)
        local_bs = batch_size // nproc
    latent_hw = image_size // 8
    c0 = ucfg.block_out_channels[0]

    # full module bundle: the trainable artifacts plus the frozen encoders
    # (VAE / whisper / VASA towers) the data builder runs.
    modules = PipelineModules.create(unet_config=ucfg, dtype=dtype)
    from types import SimpleNamespace

    ckpt_cfg = SimpleNamespace(
        pretrained_model_name_or_path="", unet_checkpoint_path="",
        pose_guider_checkpoint_path="", audio_linear_checkpoint_path="",
        adapter_module_checkpoint_path="", id_proj_checkpoint_path="",
        vasa_linear_checkpoint_path="", vasa_checkpoint_path="",
        whisper_model="")
    for k, v in (cfg.get("checkpoints", {}) or {}).items():
        setattr(ckpt_cfg, k, v)
    from actalker_tpu.io.weights import unet_block_kwargs

    converted = convert_checkpoint_params(
        ckpt_cfg, unet_kwargs=unet_block_kwargs(ucfg))
    full_params = init_pipeline_params(
        modules, jax.random.PRNGKey(0),
        image_size=(image_size, image_size),
        latent_size=(latent_hw, latent_hw), use_eval_shape=True)
    if converted is None:
        log.info("no converted checkpoints configured; random init "
                 "(fine-tuning the reference model needs cfg['checkpoints'])")
    else:
        full_params.update(converted)
        log.info("initialized from converted reference checkpoints: %s",
                 sorted(converted))
    pipe = ACTalkerPipeline(modules, full_params, dtype=dtype)
    # the reference's full_ft artifact set (train.yaml:48); the adapter
    # to_k_ip/to_v_ip branches train as part of the unet tree
    params = {k: full_params[k] for k in TRAINABLE if k in full_params}
    applies = {"unet": modules.unet.apply,
               "pose_guider": modules.pose_guider.apply,
               "audio_proj": modules.audio_proj.apply,
               "id_proj": modules.id_proj.apply,
               "vasa_proj": modules.vasa_proj.apply}

    tx = T.make_optimizer(tcfg)
    step_fn = T.make_train_step(applies, tx, tcfg, dtype=dtype)

    import os

    out_dir = args.output
    os.makedirs(out_dir, exist_ok=True)
    # one metrics stream per run (shared filesystems): host 0 only
    emitter = MetricsEmitter(f"{out_dir}/metrics.jsonl"
                             if jax.process_index() == 0 else os.devnull)

    start_step = 0
    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        # ZeRO-2 equivalent (reference ds_zero2_8gpu.yaml:3-12): Adam
        # moments + grad-accum buffers sharded 1/dp per chip
        opt_state = shard_opt_state(tx.init(params), mesh)
        use_ema = bool(cfg.get("use_ema", False))
        ema_restored = None
        last = latest_checkpoint(out_dir)
        if last is not None:
            log.info("resuming from checkpoint-%d", last)
            target = {"params": params}
            if "ema" in checkpoint_keys(out_dir, last):
                target["ema"] = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, jnp.float32,
                                                   sharding=x.sharding),
                    params)
            restored = restore_checkpoint(out_dir, last, target=target)
            params = restored["params"]
            ema_restored = restored.get("ema")
            start_step = last

        # pin param/opt-state shardings across the jitted step so the
        # ZeRO partitioning survives GSPMD propagation; donate the old
        # buffers (in-place update, halves peak optimizer HBM)
        jstep = jax.jit(
            step_fn,
            out_shardings=(jax.tree.map(lambda x: x.sharding, params),
                           jax.tree.map(lambda x: x.sharding, opt_state),
                           None),
            donate_argnums=(0, 1))
        max_steps = args.steps or int(solver.get("max_train_steps", 250000))
        ckpt_every = int(cfg.get("checkpointing_steps", 2000))
        total_limit = int(cfg.get("total_limit", 3))

        if args.synthetic:
            batches = synthetic_batches(local_bs, frames, latent_hw, c0,
                                        seed=jax.process_index())
        elif args.metadata:
            batches = real_batches(
                pipe, args.metadata, local_bs, frames, image_size,
                num_workers=int(data_cfg.get("num_workers", 4)),
                start=jax.process_index() * local_bs,
                stride=batch_size,
                arcface_ckpt=cfg.get("arcface_checkpoint_path"))
        else:
            raise SystemExit(
                "provide --metadata clip JSONs (real data) or --synthetic N "
                "(smoke runs)"
            )

        ema_params = None
        if use_ema:
            from actalker_tpu.training.ema import ema_init, ema_step

            if ema_restored is not None:
                ema_params = ema_restored
            else:
                if start_step:
                    log.warning("checkpoint-%d has no EMA state; "
                                "seeding EMA from params", start_step)
                ema_params = ema_init(params)
            # commit-gated: under grad accumulation the EMA only moves on
            # micro-steps where MultiSteps actually applied the gradients
            jema = jax.jit(ema_step)

        def ckpt_tree():
            t = {"params": params}
            if use_ema:
                t["ema"] = ema_params
            return t

        key = jax.random.PRNGKey(0)
        final_step = start_step            # updated per executed step
        t0 = time.time()
        for step in range(start_step, min(start_step + args.synthetic or 10**9,
                                          max_steps)):
            batch = next(batches)
            batch = shard_batch(batch, mesh,
                                global_batch=batch_size if multihost else None)
            key, k = jax.random.split(key)
            params, opt_state, metrics = jstep(params, opt_state, batch, k)
            final_step = step + 1          # actual last executed step
            if use_ema:
                ema_params = jema(ema_params, params, opt_state)
            if step % 10 == 0 or step == start_step:
                loss = float(metrics["loss"])
                emitter.emit(step=step, loss=loss,
                             sec_per_step=(time.time() - t0) / max(step - start_step, 1))
                log.info("step %d loss %.4f", step, loss)
            if ckpt_every and (step + 1) % ckpt_every == 0:
                save_checkpoint(out_dir, step + 1, ckpt_tree(),
                                total_limit=total_limit)
        save_checkpoint(out_dir, final_step, ckpt_tree(),
                        total_limit=total_limit)
    if args.export_reference:
        # Gather on EVERY process (tp>1 multi-host leaves shards
        # non-addressable from process 0; process_allgather is collective),
        # then write artifacts from process 0 only.
        host = gather_params_host(params)
        if jax.process_index() == 0:
            export_reference_checkpoint(host, args.export_reference,
                                        final_step, ucfg=ucfg)
            log.info("exported reference-contract artifacts to %s",
                     args.export_reference)
    log.info("done")


def gather_params_host(params):
    """Device params -> host fp32 numpy, safe under multi-host sharding."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        params = multihost_utils.process_allgather(params, tiled=True)
    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def export_reference_checkpoint(params, out_dir: str, step: int,
                                ucfg=None) -> None:
    """Write the six reference checkpoint artifacts
    ({unet,pose_guider,audio_linear,adapter_module,id_proj_model,
    vasa_linear}-<step>.pth — ``Inference.py:80-142``) from a trained
    param-tree dict (host numpy or addressable arrays; multi-host callers
    pre-gather via ``gather_params_host``), so a model fine-tuned here
    round-trips into the reference stack."""
    import os

    import jax
    import torch

    from actalker_tpu.io import weights as W

    os.makedirs(out_dir, exist_ok=True)
    bk = W.unet_block_kwargs(ucfg) if ucfg is not None else {}
    host = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    arts = {
        "unet": W.export_unet(host["unet"], **bk),
        "adapter_module": W.export_adapter_modules(host["unet"], **bk),
        "pose_guider": W.export_pose_guider(host["pose_guider"]),
        "audio_linear": W.export_audio_proj(host["audio_proj"]),
        "id_proj_model": W.export_id_proj(host["id_proj"]),
        "vasa_linear": W.export_vasa_proj(host["vasa_proj"]),
    }
    for name, sd in arts.items():
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   os.path.join(out_dir, f"{name}-{step}.pth"))


if __name__ == "__main__":
    main()
