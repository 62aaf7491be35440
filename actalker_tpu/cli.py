"""Inference CLI preserving the reference's public surface
(``Inference.py:597-613``):

    python -m actalker_tpu.cli --config config/inference.yaml \
        --ref face.jpg --audio speech.mp3 [--video drive.mp4] --mode 0|1|2

mode 0 = audio only, 1 = expression (VASA) only, 2 = audio + expression.

Checkpoints: if the configured paths exist they are converted and loaded; if
absent (this environment ships no weights) the CLI can still exercise the
whole stack with --random-weights.
"""
from __future__ import annotations

import argparse
import os
import time


def build_pipeline(cfg, mode: int, random_weights: bool, latent_hw, image_hw):
    import jax
    import jax.numpy as jnp

    from actalker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from actalker_tpu.io.init import convert_checkpoint_params, init_pipeline_params
    from actalker_tpu.models.unet import UNetConfig
    from actalker_tpu.pipeline.pipeline import ACTalkerPipeline, PipelineModules

    dtype = {"fp16": jnp.bfloat16, "bf16": jnp.bfloat16,
             "fp32": jnp.float32}[cfg.weight_dtype]
    ucfg = UNetConfig(ablate=tuple(cfg.ablate))
    if cfg.extras.get("micro_model"):
        # smoke/CI runs over artifacts exported from `--micro-model`
        # training (training/train.py) — same keys, scaled-down widths
        ucfg = ucfg.micro()
    modules = PipelineModules.create(
        unet_config=ucfg, dtype=dtype,
        vasa_expression_dim=cfg.vasa_expression_dim,
        vae_dtype=jnp.bfloat16 if getattr(cfg, "vae_dtype", "fp32") == "bf16"
        else jnp.float32)

    from actalker_tpu.io.weights import unet_block_kwargs

    converted = None if random_weights else convert_checkpoint_params(
        cfg, unet_kwargs=unet_block_kwargs(ucfg))
    if converted is None:
        print("[actalker_tpu] using random weights "
              "(no checkpoints found or --random-weights)")
    expected = {"unet", "pose_guider", "audio_proj", "id_proj", "vasa_proj",
                "vae", "whisper"}
    if converted is not None and expected <= set(converted):
        params = converted
    else:
        params = init_pipeline_params(
            modules, jax.random.PRNGKey(0), image_size=image_hw,
            latent_size=latent_hw, use_eval_shape=True,
        )
        if converted is not None:
            # A trained UNet over RANDOM frozen encoders silently corrupts
            # generation (a random VAE decodes noise; random whisper feeds
            # garbage tokens) — fail loudly instead of merging (Advice r3).
            hard = {"vae", "whisper"} & (expected - set(converted))
            if hard and not cfg.extras.get("allow_random_encoders"):
                raise SystemExit(
                    "[actalker_tpu] unet checkpoint loaded but required "
                    f"frozen encoders are missing: {sorted(hard)} — supply "
                    "them (download_models.py), use --random-weights, or "
                    "set extras.allow_random_encoders for smoke runs")
            print("[actalker_tpu] missing checkpoints "
                  f"{sorted(expected - set(converted))}: those stay random")
            params.update(converted)
            # Random VASA towers must not masquerade as loaded ones: drop
            # them so modes 1/2 degrade to the loud zero-expression-token
            # fallback (``'vasa_expression' in pipe.params`` gate below)
            # instead of silently encoding the video with random weights.
            for k in ("vasa_expression", "vasa_pose"):
                if k in params and k not in converted:
                    del params[k]
    if dtype == jnp.bfloat16:
        from actalker_tpu.io.init import cast_params_bf16

        params = cast_params_bf16(params)
    return ACTalkerPipeline(modules, params, dtype=dtype)


def postprocess_frames(cfg, frames01, face_box, landmarks=None):
    """Optional post-processes on decoded frames (reference config flags
    use_bfr / use_teeth_enhance / use_interframe). Each runs only when its
    checkpoint is configured; frames are (N, H, W, 3) in [0, 1].
    ``landmarks`` (5, 2) tightens the BFR alignment warp (the reference
    aligns on the 5-pt detector output, ``test_preprocess.py:286-304``)."""
    import numpy as np

    def have(p):
        return p and os.path.exists(p)

    if cfg.use_teeth_enhance and have(cfg.teeth_checkpoint_path):
        import jax

        from actalker_tpu.frontend.enhance import enhance_teeth
        from actalker_tpu.io import weights as W
        from actalker_tpu.models.teeth import TeethEnhancer

        params = W.convert_teeth(
            W.load_torch_state_dict(cfg.teeth_checkpoint_path))
        import functools
        fn = functools.partial(
            jax.jit(lambda p, x: TeethEnhancer().apply(p, x)), params)
        x1, y1, x2, y2 = face_box
        mouth = (x1, y1 + (y2 - y1) / 2, x2, y2)
        out = []
        for fr in frames01:
            u8 = (fr * 255).round().astype(np.uint8)
            out.append(enhance_teeth(u8, mouth, fn).astype(np.float32) / 255)
        frames01 = np.stack(out)
    # Frame-level BFR is an EXTENSION (the reference only enhances the ref
    # image during preprocessing, ``test_preprocess.py:286-304`` — that
    # path runs in ``_run_single``); opt in via extras.use_bfr_frames.
    if (cfg.extras.get("use_bfr_frames") and have(cfg.bfr_checkpoint_path)):
        import jax

        from actalker_tpu.frontend.enhance import enhance_face
        from actalker_tpu.io import weights as W
        from actalker_tpu.models.stylegan2 import GPENGenerator

        params = W.convert_bfr(
            W.load_torch_state_dict(cfg.bfr_checkpoint_path))
        gen = GPENGenerator()
        import functools
        fn = functools.partial(
            jax.jit(lambda p, x: gen.apply(p, x)), params)
        out = []
        for fr in frames01:
            u8 = (fr * 255).round().astype(np.uint8)
            out.append(enhance_face(u8, face_box, fn, landmarks=landmarks)
                       .astype(np.float32) / 255)
        frames01 = np.stack(out)
    if cfg.use_interframe and have(cfg.rife_checkpoint_path):
        import jax
        import jax.numpy as jnp

        from actalker_tpu.io import weights as W
        from actalker_tpu.models.rife import IFNet, interpolate_pairs

        params = W.convert_rife(
            W.load_torch_state_dict(cfg.rife_checkpoint_path))
        net = IFNet()
        frames01 = np.asarray(interpolate_pairs(
            jax.jit(net.apply), params, jnp.asarray(frames01)))
    return frames01


def load_config(path: str):
    """YAML or importable ``.py`` config (the reference accepts both —
    ``Inference.py:607-612``: a ``.py`` config exposes ``cfg``)."""
    from actalker_tpu.config import InferenceConfig, import_filename

    if path.endswith(".py"):
        raw = import_filename(path).cfg
        if not isinstance(raw, dict):
            raw = dict(raw)
        return InferenceConfig.from_dict(raw)
    return InferenceConfig.from_yaml(path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="YAML or .py config (reference surface)")
    parser.add_argument("--ref", type=str, required=True,
                        help="reference image; with --batch, a comma-"
                             "separated list")
    parser.add_argument("--audio", type=str, required=True,
                        help="driving audio; with --batch, one file or a "
                             "comma-separated list matching --ref")
    parser.add_argument("--video", type=str, default=None)
    parser.add_argument("--mode", type=int, default=0,
                        help="0: audio, 1: vasa, 2: both")
    parser.add_argument("--batch", action="store_true",
                        help="process multiple refs, reusing loaded models "
                             "(the reference declares this flag but never "
                             "implements it)")
    parser.add_argument("--random-weights", action="store_true")
    parser.add_argument("--frame-limit", type=int, default=None)
    args = parser.parse_args(argv)

    import numpy as np
    import jax.numpy as jnp

    from actalker_tpu.config import MODE_GATES
    from actalker_tpu.frontend import audio as A
    from actalker_tpu.frontend import preprocess as P
    from actalker_tpu.frontend import video as V

    cfg = load_config(args.config)
    gate = MODE_GATES[args.mode]
    t0 = time.time()

    from PIL import Image

    from actalker_tpu.frontend.face import detect_face

    if args.batch:
        refs = [r for r in args.ref.split(",") if r]
        audios = [a for a in args.audio.split(",") if a]
        if len(audios) == 1:
            audios = audios * len(refs)
        assert len(audios) == len(refs), "--batch: len(audio) != len(ref)"
        pipes = {}
        for i, (ref_path, audio_path) in enumerate(zip(refs, audios)):
            astem = os.path.splitext(os.path.basename(audio_path))[0]
            run_args = argparse.Namespace(**{**vars(args), "ref": ref_path,
                                             "audio": audio_path,
                                             "batch": False,
                                             "out_tag": f"{astem}.{i}"})
            _run_single(cfg, run_args, gate, pipes, interactive=False)
        return

    _run_single(cfg, args, gate, {}, interactive=True, t0=t0)


def _run_single(cfg, args, gate, pipe_cache, interactive, t0=None):
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from actalker_tpu.frontend import audio as A
    from actalker_tpu.frontend import preprocess as P
    from actalker_tpu.frontend import video as V
    from actalker_tpu.frontend.face import detect_face, resolve_face_detector

    t0 = t0 or time.time()
    detector = None
    try:
        detector = resolve_face_detector(cfg.det_checkpoint_path,
                                         cfg.scrfd_checkpoint_path)
    except Exception as e:
        print(f"[actalker_tpu] face detector unavailable ({e}); "
              "full-image bbox")
    ref_rgb = np.asarray(Image.open(args.ref).convert("RGB"))
    bbox = detect_face(ref_rgb, detector)
    if bbox is None:
        print("[actalker_tpu] no face detected; using full-image bbox")
    pre = P.preprocess_reference_image(
        ref_rgb, bbox, image_size=cfg.image_size, area=cfg.area,
        crop=cfg.crop, expand_ratio=cfg.expand_ratio,
        aspect_type=cfg.aspect_type,
    )
    h, w = pre.ref_img.shape[:2]
    print(f"ref {h}x{w}")

    # BFR enhancement of the processed reference image, BEFORE the ArcFace
    # crop — reference semantics (``test_preprocess.py:286-304``: enhance
    # the cropped+resized imSrc with landmarks re-detected on it, 50/50
    # blend with the input).
    if cfg.use_bfr and os.path.exists(cfg.bfr_checkpoint_path):
        import jax

        from actalker_tpu.frontend.enhance import enhance_face
        from actalker_tpu.frontend.landmarks import resolve_landmark_estimator
        from actalker_tpu.io import weights as W
        from actalker_tpu.models.stylegan2 import GPENGenerator

        bparams = W.convert_bfr(
            W.load_torch_state_dict(cfg.bfr_checkpoint_path))
        import functools
        bfr_fn = functools.partial(
            jax.jit(lambda p, x: GPENGenerator().apply(p, x)), bparams)
        u8 = ((pre.ref_img * 0.5 + 0.5) * 255).round().astype(np.uint8)
        lm5 = None
        rbox = pre.bbox_ref
        if detector is not None and hasattr(detector, "detect"):
            try:
                rbox = detect_face(u8, detector) or rbox
                # dense RTMPose face head when configured (preferred p1/p2
                # substitute), else the detector's 5-pt keypoints
                lm5 = resolve_landmark_estimator(
                    cfg.det_checkpoint_path, cfg.scrfd_checkpoint_path,
                    cfg.face_landmark_checkpoint_path)(u8, rbox)
            except Exception:
                lm5 = None
        enhanced = enhance_face(u8, rbox, bfr_fn, landmarks=lm5)
        pre.ref_img = enhanced.astype(np.float32) / 127.5 - 1.0
        # refresh the ArcFace head crop from the enhanced image
        bx1, by1, bx2, by2 = [int(max(v, 0)) for v in pre.bbox_ref]
        head = enhanced[by1:max(by2, by1 + 1), bx1:max(bx2, bx1 + 1)]
        if head.size:
            pre.head_crop = (P.resize_image(head, (112, 112))
                             .astype(np.float32) / 127.5 - 1.0)

    # ArcFace ID embedding of the aligned head crop
    # (``test_preprocess.py:437-453``); zero-embed fallback matches
    # running the reference without the encoder.
    id_embed = np.zeros(512, np.float32)
    if os.path.exists(cfg.arcface_checkpoint_path):
        import jax

        from actalker_tpu.io import weights as W
        from actalker_tpu.models.arcface import iresnet50

        aparams = W.convert_arcface(
            W.load_torch_state_dict(cfg.arcface_checkpoint_path))
        id_embed = np.asarray(jax.jit(iresnet50().apply)(
            aparams, jnp.asarray(pre.head_crop)[None]))[0]
    else:
        print("[actalker_tpu] WARNING: arcface weights not found at "
              f"{cfg.arcface_checkpoint_path}; identity conditioning is a "
              "zero embedding")

    mel, audio_len = A.whisper_features(args.audio)
    limit = args.frame_limit or cfg.frame_num
    num_frames = min(limit, audio_len) // cfg.step

    key = (args.mode, h, w)
    pipe = pipe_cache.get(key)
    if pipe is None:
        pipe = build_pipeline(cfg, args.mode, args.random_weights,
                              latent_hw=(h // 8, w // 8), image_hw=(h, w))
        pipe_cache[key] = pipe

    # whisper windows -> per-frame tokens
    feats = []
    for i in range(0, mel.shape[-1], 3000):
        feats.append(np.asarray(
            pipe.encode_audio_windows(jnp.asarray(mel[None, :, i:i + 3000]))
        )[0])
    feats = np.concatenate(feats, axis=0)[: audio_len * 2]
    feats = np.concatenate(
        [np.zeros_like(feats[:4]), feats, np.zeros_like(feats[:6])], axis=0
    )
    audio_tok, audio_unc = pipe.audio_tokens_per_frame(
        feats, num_frames, step=cfg.step
    )

    # VASA tokens from the driving video (modes 1/2): per-frame face crop ->
    # expression tower; square bbox crop -> pose tower (reference
    # ``Inference.py:478-505``, ``test_preprocess.py:314-421``).
    if args.mode != 0 and args.video and "vasa_expression" in pipe.params:
        frames = V.read_frames(args.video, limit=num_frames * cfg.step)
        fh, fw = frames.shape[1:3]
        vbox = detect_face(frames[0], detector) or (0, 0, fw, fh)
        sq = P.process_bbox(list(vbox), 1.0, fh, fw)
        x1, y1, x2, y2 = [int(max(v, 0)) for v in sq]
        x2, y2 = min(x2, fw), min(y2, fh)

        def crop256(f):
            return P.resize_image(f[y1:y2, x1:x2], (256, 256)).astype(
                np.float32) / 255.0

        sel = frames[:: cfg.step][:num_frames]
        crops = np.stack([crop256(f) for f in sel])
        expr, rot = pipe.encode_vasa_video(crops, crops)
        vasa_tok, vasa_unc = pipe.vasa_tokens(expr, rot, num_frames,
                                              cfg.vasa_expression_dim)
    else:
        if args.mode != 0:
            print("[actalker_tpu] VASA weights unavailable; zero expression "
                  "tokens")
        vasa_tok, vasa_unc = pipe.vasa_tokens(None, None, num_frames,
                                              cfg.vasa_expression_dim)

    pose_imgs = np.repeat(pre.pose_img[None], num_frames, axis=0)
    scfg = cfg.sampler_config(gate)
    # Region masks per mode (reference pipeline ``:702-711``): mode 2 runs
    # mouth/exp masks, which Inference.py:545-546 overrides to all-ones;
    # modes 0/1 gate the single active branch by the FACE box mask
    # (``face_mask = pose_cond_tensor[0, :1, :1]``). The face-box mask also
    # activates the SSM static-capacity gather path (the scan covers only
    # the box fraction, like the reference's masked gather).
    face_mask = None
    if gate != (1, 1):
        face_mask = pre.pose_img[None, None, :, :, 0].astype(np.float32)
    latents = pipe.generate_latents(
        pre.ref_img, id_embed, audio_tok, audio_unc,
        vasa_tok, vasa_unc, pose_imgs, scfg, seed=cfg.seed or 0,
        audio_mask=face_mask if gate == (1, 0) else None,
        exp_mask=face_mask if gate == (0, 1) else None,
    )
    frames = pipe.decode_latents(latents, cfg.decode_chunk_size)
    frames01 = np.clip(frames * 0.5 + 0.5, 0, 1)
    # frame-space box/landmarks for the optional frame-level passes
    flm5 = None
    if ((cfg.use_teeth_enhance or cfg.extras.get("use_bfr_frames"))
            and detector is not None and hasattr(detector, "detect")):
        from actalker_tpu.frontend.landmarks import resolve_landmark_estimator

        try:
            f0 = (frames01[0] * 255).round().astype(np.uint8)
            flm5 = resolve_landmark_estimator(
                cfg.det_checkpoint_path, cfg.scrfd_checkpoint_path,
                cfg.face_landmark_checkpoint_path)(f0, pre.bbox_ref)
        except Exception:
            flm5 = None  # box-prior fallback inside enhance_face
    frames01 = postprocess_frames(cfg, frames01, pre.bbox_ref,
                                  landmarks=flm5)

    out_dir = os.path.join(cfg.output_dir, cfg.exp_name)
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.basename(args.ref)
    if getattr(args, "out_tag", None):       # batch mode: unique per item
        base = f"{base}.{args.out_tag}"
    out = os.path.join(out_dir, f"{base}.mp4")
    V.write_video(out, frames01, fps=cfg.fps)
    out_audio = os.path.join(out_dir, f"{base}_audio.mp4")
    V.write_video(out_audio, frames01, fps=cfg.fps, audio_path=args.audio)
    print(f"wrote {out_audio} ({num_frames} frames) in "
          f"{time.time() - t0:.1f}s")

    if not interactive:
        return

    # Interactive re-run loop: read a new YAML and regenerate without
    # reloading the heavy models (reference ``Inference.py:379-400``).
    while True:
        try:
            new_cfg_path = input(
                "\nInference completed. Enter a new YAML config to run again "
                "(or press Enter to exit): "
            ).strip()
        except (EOFError, OSError):
            # OSError: stdin unavailable (pytest capture, daemonized runs) —
            # same meaning as EOF for the interactive loop
            break
        if not new_cfg_path:
            break
        if not os.path.exists(new_cfg_path):
            print(f"config {new_cfg_path} not found")
            continue
        new_cfg = load_config(new_cfg_path)
        scfg = new_cfg.sampler_config(gate)
        t0 = time.time()
        latents = pipe.generate_latents(
            pre.ref_img, id_embed, audio_tok, audio_unc,
            vasa_tok, vasa_unc, pose_imgs, scfg, seed=new_cfg.seed or 0,
            audio_mask=face_mask if gate == (1, 0) else None,
            exp_mask=face_mask if gate == (0, 1) else None,
        )
        frames01 = np.clip(
            pipe.decode_latents(latents, new_cfg.decode_chunk_size) * 0.5 + 0.5,
            0, 1,
        )
        out2 = os.path.join(out_dir, f"{base}_rerun.mp4")
        V.write_video(out2, frames01, fps=new_cfg.fps, audio_path=args.audio)
        print(f"wrote {out2} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
