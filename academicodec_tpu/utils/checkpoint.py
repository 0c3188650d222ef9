"""Checkpoint save/load with keep-last-N rotation and latest-scan.

Combines the reference's two styles (SURVEY §5): orbax-backed pytree
checkpoints written as ``<prefix>_<step:08d>`` directories with keep-last-5
rotation (HiFi-GAN style, reference utils.py:205-220) plus a ``latest``
convenience pointer (Encodec style, main_launch.py:430-451). Rank-0 gating
for multi-host runs is on ``jax.process_index() == 0``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        # rank-0-only saves: restrict orbax's internal barrier to process 0,
        # otherwise its sync_global_processes deadlocks waiting for the
        # non-zero ranks that (correctly) never enter save_checkpoint
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            ),
        )
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    directory: str,
    prefix: str,
    step: int,
    state: Any,
    num_ckpt_keep: int = 5,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Save ``state`` under ``directory/<prefix>_<step:08d>`` and rotate.

    ``meta`` (JSON-serializable) is written to ``<path>.meta.json`` — train
    CLIs persist the epoch counter there so resume does not have to derive
    it from step arithmetic (wrong when dataset/batch size changed between
    runs; reference main_launch.py:250-260 has the same flaw).
    """
    if jax.process_index() != 0:
        return ""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{prefix}_{step:08d}")
    state = jax.device_get(state)
    _checkpointer().save(os.path.abspath(path), state, force=True)
    if meta is not None:
        with open(path + ".meta.json", "w") as fh:
            json.dump(meta, fh)
    # keep-last-N rotation (reference utils.py:205-211)
    ckpts = sorted(glob.glob(os.path.join(directory, f"{prefix}_" + "?" * 8)))
    for old in ckpts[:-num_ckpt_keep]:
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(old + ".meta.json"):
            os.remove(old + ".meta.json")
    return path


def scan_checkpoint(directory: str, prefix: str) -> Optional[str]:
    """Latest ``<prefix>_<step>`` checkpoint path, or None
    (reference utils.py:215-220)."""
    ckpts = sorted(glob.glob(os.path.join(directory, f"{prefix}_" + "?" * 8)))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; with ``template``, restores with that
    exact structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if template is not None:
        return _checkpointer().restore(path, item=jax.device_get(template))
    return _checkpointer().restore(path)


def load_checkpoint_meta(path: str) -> Dict[str, Any]:
    """Sidecar metadata written by ``save_checkpoint(meta=...)``; ``{}`` for
    checkpoints predating it."""
    try:
        with open(path + ".meta.json") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def checkpoint_step(path: str) -> int:
    m = re.search(r"_(\d{8})$", path)
    return int(m.group(1)) if m else -1
