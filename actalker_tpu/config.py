"""YAML config system preserving the reference's public config surface.

The reference drives inference from an OmegaConf YAML
(``config/inference.yaml``; loaded at ``Inference.py:607-610``) whose keys
double as ablation switches. This loader accepts the same YAML and maps it
onto the framework's typed configs; unknown keys are preserved in ``extras``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from actalker_tpu.pipeline.sampler import SamplerConfig


@dataclasses.dataclass
class InferenceConfig:
    # sampling
    num_inference_steps: int = 25
    fps: float = 12.5
    decode_chunk_size: int = 10
    motion_bucket_id: float = 12
    motion_bucket_id_exp: float = 20
    image_size: int = 576
    area: float = 1.2
    frame_num: int = 500
    step: int = 2
    overlap: int = 0
    shift_offset: int = 7
    n_sample_frames: int = 25
    min_appearance_guidance_scale: float = 2.0
    max_appearance_guidance_scale: float = 2.0
    audio_guidance_scale: float = 7.5
    vasa_guidance_scale: float = 3.0
    i2i_noise_strength: float = 1.0
    noise_aug_strength: float = 0.0
    ip_audio_scale: float = 1.25
    vasa_expression_dim: int = 1018
    crop: bool = False
    expand_ratio: float = 0.9
    aspect_type: str = "9:16"
    use_bfr: bool = False
    use_interframe: bool = False
    use_teeth_enhance: bool = False
    seed: Optional[int] = 72589
    weight_dtype: str = "bf16"
    # VAE compute dtype. Default "bf16" since r4: halves decode time/HBM on
    # TPU at >40 dB PSNR vs fp32 (tests/test_vae_parity.py gate). "fp32"
    # mirrors the reference's VAE upcast (pipeline 512-515) — that upcast
    # guards an fp16 numeric artifact TPU bf16 doesn't share.
    vae_dtype: str = "bf16"
    # UNet windows evaluated per lax.map chunk inside one denoise step
    # (sampler.SamplerConfig.windows_per_call). 0 = all windows in one
    # batch; long-form clips (frame_num >> n_sample_frames) set a small
    # value to bound single-chip activation memory while the ring buffer
    # spans many windows.
    windows_per_call: int = 0
    # model-variant selection: the reference picks _wo_* ablation UNets via
    # the config's unet class key; here any subset of
    # {"audio", "vasa", "id", "ssd", "cross_attn"}
    ablate: Tuple[str, ...] = ()
    # paths
    pretrained_model_name_or_path: str = ""
    unet_checkpoint_path: str = ""
    pose_guider_checkpoint_path: str = ""
    audio_linear_checkpoint_path: str = ""
    adapter_module_checkpoint_path: str = ""
    id_proj_checkpoint_path: str = ""
    vasa_linear_checkpoint_path: str = ""
    vasa_checkpoint_path: str = ""
    whisper_model: str = ""
    # face-alignment stack (reference AlignImage det_path / scrfd alt,
    # ``src/utils/face_align/align.py:270-274``)
    det_checkpoint_path: str = "checkpoints/yolov5m-face.pth"
    # dense RTMPose/SimCC face landmark head (preferred substitute for the
    # reference's p1/p2 TorchScript 94-pt regressors, align.py:23-48)
    face_landmark_checkpoint_path: str = ""
    scrfd_checkpoint_path: str = "checkpoints/scrfd_10g_bnkps.pth"
    arcface_checkpoint_path: str = "checkpoints/arcface_r50.pth"
    bfr_checkpoint_path: str = ""
    teeth_checkpoint_path: str = ""
    rife_checkpoint_path: str = ""
    output_dir: str = "exp_output"
    exp_name: str = "actalker_tpu"
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "InferenceConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "InferenceConfig":
        raw = dict(raw)
        # nested reference keys
        data = raw.pop("data", {}) or {}
        if "n_sample_frames" in data:
            raw["n_sample_frames"] = data["n_sample_frames"]
        model_paths = raw.pop("model_paths", {}) or {}
        if "whisper_model" in model_paths:
            raw["whisper_model"] = model_paths["whisper_model"]
        if "ablate" in raw:
            raw["ablate"] = tuple(raw["ablate"] or ())
        elif "unet_cls" in raw:
            # the reference selects ablation UNet *files* by dotted path
            # (``config/inference.yaml:62``, imported at ``Inference.py:54``);
            # here the _wo_* lineage is config, so map the path to ablate.
            raw["ablate"] = unet_cls_to_ablate(str(raw["unet_cls"]))
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in fields}
        extras = {k: v for k, v in raw.items() if k not in fields}
        cfg = cls(**kwargs)
        cfg.extras = extras
        return cfg

    def sampler_config(self, gate: Tuple[int, int]) -> SamplerConfig:
        return SamplerConfig(
            num_inference_steps=self.num_inference_steps,
            frames_per_batch=self.n_sample_frames,
            overlap=self.overlap,
            shift_offset=self.shift_offset,
            fps=self.fps,
            motion_bucket_id=self.motion_bucket_id,
            motion_bucket_id_exp=self.motion_bucket_id_exp,
            noise_aug_strength=self.noise_aug_strength,
            min_guidance1=self.min_appearance_guidance_scale,
            max_guidance1=self.max_appearance_guidance_scale,
            guidance2=self.audio_guidance_scale,
            guidance3=self.vasa_guidance_scale,
            i2i_noise_strength=self.i2i_noise_strength,
            gate=gate,
            windows_per_call=self.windows_per_call,
        )


MODE_GATES = {0: (1, 0), 1: (0, 1), 2: (1, 1), 3: (1, 1)}


def unet_cls_to_ablate(unet_cls: str) -> Tuple[str, ...]:
    """Map the reference's dotted UNet-variant path to our ablate tuple.

    The reference ships one UNet *file* per ablation
    (``src/models/base/unet_spatio_temporal_condition*_wo_*.py``, selected by
    ``unet_cls`` at ``Inference.py:54-55``); this framework expresses the
    lineage as config switches, so accepting the reference's paths keeps its
    YAMLs loadable verbatim."""
    ablate = []
    for key in ("audio", "id", "ssd", "cross_attn", "vasa"):
        if f"_wo_{key}" in unet_cls:
            ablate.append(key)
    return tuple(ablate)


def import_filename(path: str):
    """Import a python file as a module (the reference accepts importable
    ``.py`` configs next to YAML — ``src/utils/util.py:27-32``, used at
    ``Inference.py:607-612``)."""
    import importlib.util
    import os
    import sys

    stem = os.path.splitext(os.path.basename(path))[0]
    # unique module name: a config named yaml.py/json.py must not clobber
    # the real module in sys.modules
    name = f"_actalker_cfg_{stem}_{abs(hash(os.path.abspath(path))) & 0xffffff:x}"
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def get_obj_from_str(target: str):
    """Resolve a dotted ``module.Class`` path (``utils/pkg.py:5-8``)."""
    import importlib

    module, cls = target.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def instantiate_from_config(spec: Dict[str, Any]):
    """``{"target": "module.Class", "params": {...}} -> instance``
    (``utils/pkg.py:10-17``)."""
    if "target" not in spec:
        raise KeyError("Expected key `target` to instantiate.")
    return get_obj_from_str(spec["target"])(**spec.get("params", {}))
