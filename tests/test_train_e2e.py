"""End-to-end train-on-real-data smoke (VERDICT r3 item #9): synthesize a
3-clip mp4+wav corpus with metadata, run the REAL training entry point
(``training/train.py main()``) through the ``real_batches`` path
(decode -> dataset policy -> BatchBuilder encoders -> sharded train step ->
checkpoint), export the six reference-contract artifacts, and reload them
into the inference CLI for a short generation — the full loop, not its
pieces."""
import json
import os
import wave

import numpy as np
import pytest

from actalker_tpu.frontend import media_native, video as video_io

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(media_native.lib() is None,
                       reason="native media runtime unavailable"),
]


def _write_corpus(root):
    """3 tiny clips: moving-box 'face' frames + quiet sine audio."""
    rng = np.random.default_rng(0)
    clips = []
    for c in range(3):
        n, h, w = 20, 64, 64
        frames = np.full((n, h, w, 3), 30 + 10 * c, np.uint8)
        for i in range(n):
            x = 14 + (i + c) % 4      # slight motion, below the flow gate
            frames[i, 10:54, x:x + 36] = 170 + c * 10
            frames[i, 20:28, x + 6:x + 14] = 60       # "eyes"
            frames[i, 20:28, x + 22:x + 30] = 60
            frames[i, 38:46, x + 10:x + 26] = 90      # "mouth"
        vid = os.path.join(root, f"clip{c}.mp4")
        video_io.write_video(vid, frames.astype(np.float32) / 255.0, fps=8.0)

        wav_path = os.path.join(root, f"clip{c}.wav")
        t = np.arange(16000 * 3) / 16000.0
        pcm = (0.1 * np.sin(2 * np.pi * (200 + 50 * c) * t)
               + 0.01 * rng.standard_normal(t.shape))
        with wave.open(wav_path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((pcm * 32767).astype(np.int16).tobytes())

        box = [14.0, 10.0, 50.0, 54.0]
        lm5 = [[24.0, 24.0], [40.0, 24.0], [32.0, 34.0],
               [26.0, 42.0], [38.0, 42.0]]
        clips.append({
            "video_path": vid, "audio_path": wav_path, "frames": n,
            "fps": 8.0, "bboxes": [box] * n, "landmarks": [lm5] * n,
        })
    meta = os.path.join(root, "meta.json")
    with open(meta, "w") as f:
        json.dump(clips, f)
    return meta


def test_train_export_reload_generate(tmp_path):
    from PIL import Image

    from actalker_tpu import cli
    from actalker_tpu.training.train import main as train_main

    root = str(tmp_path)
    meta = _write_corpus(root)

    cfg_yaml = os.path.join(root, "train.yaml")
    with open(cfg_yaml, "w") as f:
        f.write(
            "solver:\n"
            "  learning_rate: 1.0e-4\n"
            "  gradient_accumulation_steps: 1\n"
            "  max_train_steps: 3\n"
            "data:\n"
            "  train_bs: 2\n"
            "  n_sample_frames: 2\n"
            "  image_size: 64\n"
            "  num_workers: 2\n"
            "checkpointing_steps: 1000\n"
            "total_limit: 1\n"
            "conditioning_dropout_prob: 0.0\n")

    out_dir = os.path.join(root, "run")
    export_dir = os.path.join(root, "export")
    train_main(["--config", cfg_yaml, "--metadata", meta,
                "--steps", "3", "--micro-model", "--dp", "1",
                "--output", out_dir, "--export-reference", export_dir])

    # six reference-contract artifacts labeled with the executed step
    for name in ("unet", "adapter_module", "pose_guider", "audio_linear",
                 "id_proj_model", "vasa_linear"):
        assert os.path.exists(os.path.join(export_dir, f"{name}-3.pth")), name
    # metrics stream recorded real steps
    lines = [json.loads(l) for l in
             open(os.path.join(out_dir, "metrics.jsonl"))]
    assert any(np.isfinite(l["loss"]) for l in lines)

    # ---- reload the exported artifacts through the CLI and generate ----
    ref_png = os.path.join(root, "ref.png")
    img = np.full((64, 64, 3), 140, np.uint8)
    img[10:54, 14:50] = 180
    Image.fromarray(img).save(ref_png)

    infer_yaml = os.path.join(root, "infer.yaml")
    with open(infer_yaml, "w") as f:
        f.write(
            "num_inference_steps: 2\n"
            "frame_num: 4\n"
            "image_size: 64\n"
            "weight_dtype: fp32\n"
            "micro_model: true\n"
            "allow_random_encoders: true\n"
            f"output_dir: {root}/cli_out\n"
            "exp_name: smoke\n"
            f"unet_checkpoint_path: {export_dir}/unet-3.pth\n"
            f"adapter_module_checkpoint_path: {export_dir}/adapter_module-3.pth\n"
            f"pose_guider_checkpoint_path: {export_dir}/pose_guider-3.pth\n"
            f"audio_linear_checkpoint_path: {export_dir}/audio_linear-3.pth\n"
            f"id_proj_checkpoint_path: {export_dir}/id_proj_model-3.pth\n"
            f"vasa_linear_checkpoint_path: {export_dir}/vasa_linear-3.pth\n")

    cli.main(["--config", infer_yaml, "--ref", ref_png,
              "--audio", os.path.join(root, "clip0.wav"), "--mode", "0"])

    outs = os.listdir(os.path.join(root, "cli_out", "smoke"))
    assert any(o.endswith(".mp4") for o in outs), outs
    # the written clip decodes back with frames
    vid = os.path.join(root, "cli_out", "smoke",
                       sorted(o for o in outs if o.endswith("_audio.mp4"))[0])
    frames = video_io.read_frames(vid, limit=4)
    assert frames.shape[0] >= 1 and np.isfinite(
        frames.astype(np.float32)).all()
