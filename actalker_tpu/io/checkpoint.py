"""Checkpoint save/load with rotation (orbax-backed).

Reference behavior being covered (``Inference.py:80-113``, ``config/
train.yaml:39-45``, ``src/utils/util.py:35-48``): step-keyed checkpoints,
auto-discovery of the latest step on resume, and a ``total_limit`` rotation
that deletes the oldest checkpoints.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(directory: str, step: int, state: Dict[str, Any],
                    total_limit: Optional[int] = None) -> str:
    """Save a pytree state under ``directory/checkpoint-<step>``."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(directory), f"checkpoint-{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if total_limit:
        rotate_checkpoints(directory, total_limit)
    return path


def list_checkpoints(directory: str):
    if not os.path.isdir(directory):
        return []
    steps = []
    for d in os.listdir(directory):
        m = re.fullmatch(r"checkpoint-(\d+)", d)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(directory: str) -> Optional[int]:
    steps = list_checkpoints(directory)
    return steps[-1] if steps else None


def rotate_checkpoints(directory: str, total_limit: int) -> None:
    steps = list_checkpoints(directory)
    for s in steps[:-total_limit] if total_limit > 0 else []:
        shutil.rmtree(os.path.join(directory, f"checkpoint-{s}"),
                      ignore_errors=True)


def checkpoint_keys(directory: str, step: int):
    """Top-level keys of a saved checkpoint (e.g. to detect optional EMA
    state before building a restore target — orbax requires the target tree
    to match the on-disk structure exactly)."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(directory), f"checkpoint-{step}")
    meta = ocp.StandardCheckpointer().metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    return list(tree.keys())


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       target: Optional[Any] = None) -> Any:
    """Restore; ``step=None`` picks the latest (reference auto-discovery)."""
    ocp = _ocp()
    if step is None:
        step = latest_checkpoint(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(os.path.abspath(directory), f"checkpoint-{step}")
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)
