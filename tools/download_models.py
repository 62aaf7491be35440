#!/usr/bin/env python3
"""Pretrained-model downloader / checkpoint-tree checker.

Parity with the reference's ``download_models.py`` (HF snapshot download of
SVD-XT 1.1 with license-gate prompts + ``pretrained_models/`` tree setup,
``download_models.py:27-140``), extended to enumerate every weight artifact
this framework's converters accept. In zero-egress environments it degrades
to a manifest check: it reports which artifacts are present/missing and
which converter in ``actalker_tpu`` ingests each file.

Usage:
    python tools/download_models.py [--root pretrained_models] [--check]
"""
from __future__ import annotations

import argparse
import os
import sys

# artifact -> (relative path, converter entry point, notes)
MANIFEST = {
    "svd-xt-1.1 (diffusers)": (
        "stable-video-diffusion-img2vid-xt-1-1",
        "actalker_tpu.io.weights.convert_unet / convert_vae",
        "HF stabilityai/stable-video-diffusion-img2vid-xt-1-1 "
        "(license-gated)"),
    "actalker unet": (
        "checkpoints/unet-30000.pth",
        "actalker_tpu.io.weights.convert_unet", "six-part ACTalker ckpt"),
    "actalker pose_guider": (
        "checkpoints/pose_guider-30000.pth",
        "actalker_tpu.io.weights.convert_pose_guider", ""),
    "actalker audio_linear": (
        "checkpoints/audio_linear-30000.pth",
        "actalker_tpu.io.weights.convert_audio_proj", ""),
    "actalker adapter_module": (
        "checkpoints/adapter_module-30000.pth",
        "actalker_tpu.io.weights.load_adapter_modules", ""),
    "actalker id_proj_model": (
        "checkpoints/id_proj_model-30000.pth",
        "actalker_tpu.io.weights.convert_id_proj", ""),
    "actalker vasa_linear": (
        "checkpoints/vasa_linear-30000.pth",
        "actalker_tpu.io.weights.convert_vasa_proj", ""),
    "whisper-tiny": (
        "whisper-tiny",
        "actalker_tpu.io.weights.convert_whisper_encoder",
        "HF openai/whisper-tiny"),
    "vasa MX31c_32k": (
        "checkpoints/MX31c_32k.ckpt",
        "actalker_tpu.io.weights.convert_vasa_expression / convert_vasa_pose",
        ""),
    "arcface r50": (
        "checkpoints/arcface_r50.pth",
        "actalker_tpu.io.weights.convert_arcface", ""),
    "yolov5m-face": (
        "checkpoints/yolov5m-face.pth",
        "actalker_tpu.models.yoloface.convert_yoloface",
        "state dict export of the TorchScript blob"),
    "scrfd-10g-bnkps": (
        "checkpoints/scrfd_10g_bnkps.pth",
        "actalker_tpu.models.scrfd.convert_scrfd",
        "state dict export of the insightface release (alt face detector, "
        "reference scrfd.py:14)"),
    "rife hdv3": (
        "checkpoints/flownet.pkl",
        "actalker_tpu.io.weights.convert_rife", ""),
    "bfr/gpen": (
        "checkpoints/bfr_gpen.pth",
        "actalker_tpu.io.weights.convert_bfr", ""),
    "teeth enhancer": (
        "checkpoints/teeth.pth",
        "actalker_tpu.io.weights.convert_teeth", ""),
    "syncnet (eval)": (
        "eval/syncnet_v2.model",
        "actalker_tpu.evaluation.syncnet.convert_syncnet", ""),
    "lpips alex (eval)": (
        "eval/lpips_alex.pth",
        "actalker_tpu.evaluation.lpips.convert_lpips", ""),
    "fid inception (eval)": (
        "eval/pt_inception-2015-12-05.pth",
        "actalker_tpu.evaluation.inception.convert_fid_inception", ""),
    "i3d rgb_charades (eval)": (
        "eval/rgb_charades.pt",
        "actalker_tpu.evaluation.i3d.convert_i3d", ""),
    "s3fd (eval)": (
        "eval/sfd_face.pth",
        "actalker_tpu.evaluation.s3fd.convert_s3fd", ""),
    "dwpose yolox-l (data)": (
        "checkpoints/yolox_l.pth",
        "actalker_tpu.models.yolox.convert_yolox", ""),
    "dwpose rtmpose (data)": (
        "checkpoints/dw-ll_ucoco_384.pth",
        "actalker_tpu.models.rtmpose.convert_rtmpose", ""),
}

SVD_REPO = "stabilityai/stable-video-diffusion-img2vid-xt-1-1"


def setup_dirs(root: str) -> None:
    for d in (root, f"{root}/checkpoints", f"{root}/eval", "outputs"):
        os.makedirs(d, exist_ok=True)
        print(f"dir ok: {d}")


def check(root: str) -> int:
    missing = 0
    for name, (rel, converter, note) in MANIFEST.items():
        path = os.path.join(root, rel)
        ok = os.path.exists(path)
        missing += not ok
        mark = "present" if ok else "MISSING"
        print(f"[{mark:7s}] {name:26s} {rel}")
        if not ok and note:
            print(f"          -> {note}")
        print(f"          loader: {converter}")
    return missing


def download_svd(root: str, assume_yes: bool = False) -> bool:
    """HF snapshot download with the reference's license-gate flow
    (``download_models.py:27-74``)."""
    local = os.path.join(root, MANIFEST["svd-xt-1.1 (diffusers)"][0])
    try:
        from huggingface_hub import HfApi, snapshot_download
    except ImportError:
        print("huggingface_hub unavailable (zero-egress image); place the "
              f"diffusers tree at {local} manually.")
        return False
    try:
        HfApi().whoami()
    except Exception:
        print("not logged in to Hugging Face: run `huggingface-cli login` "
              "and accept the SVD license at "
              f"https://huggingface.co/{SVD_REPO}")
        return False
    if not assume_yes:
        resp = input("accepted the SVD license and ready to download? "
                     "(y/N): ")
        if resp.strip().lower() != "y":
            return False
    try:
        path = snapshot_download(repo_id=SVD_REPO, local_dir=local)
    except Exception as exc:  # network/gate failure -> manifest guidance
        print(f"download failed: {exc}")
        return False
    print(f"downloaded to {path}")
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="pretrained_models")
    ap.add_argument("--check", action="store_true",
                    help="only report present/missing artifacts")
    ap.add_argument("--yes", action="store_true",
                    help="skip the interactive license prompt")
    args = ap.parse_args(argv)

    setup_dirs(args.root)
    if not args.check:
        download_svd(args.root, assume_yes=args.yes)
    n = check(args.root)
    print(f"\n{len(MANIFEST) - n}/{len(MANIFEST)} artifacts present")
    return 0


if __name__ == "__main__":
    sys.exit(main())
