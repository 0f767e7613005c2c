"""Checkpoint save/resume for training (SURVEY.md section 5.4 — the
reference is load-only; this adds the save/resume side with Orbax, plus a
portable npz fallback used when Orbax is unavailable)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from mellow_tpu.train.step import TrainState


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save(ckpt_dir: str, state: TrainState) -> str:
    """Save a TrainState. Returns the path written."""
    step = int(state.step)
    ocp = _orbax()
    if ocp is not None:
        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, jax.device_get(state), force=True)
        checkpointer.wait_until_finished()
        return path
    # npz fallback: params + flat opt state arrays.
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}.npz")
    flat, treedef = jax.tree.flatten(jax.device_get(state))
    np.savez(path, __treedef__=np.frombuffer(str(treedef).encode(), np.uint8),
             **{f"leaf_{i}": x for i, x in enumerate(flat)})
    return path


def restore(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by ``save`` (template supplies the
    structure/shapes)."""
    ocp = _orbax()
    if ocp is not None and os.path.isdir(path):
        checkpointer = ocp.StandardCheckpointer()
        # Abstract template: only shapes/dtypes are needed, and template
        # arrays may already have been donated away by a train step.
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        restored = checkpointer.restore(os.path.abspath(path), abstract)
        return jax.tree.map(jax.numpy.asarray, restored)
    with np.load(path, allow_pickle=False) as z:
        flat = [z[f"leaf_{i}"] for i in range(sum(1 for k in z.files if k.startswith("leaf_")))]
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, flat)


def latest(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                step = int(name.split("_")[1].split(".")[0])
            except ValueError:
                continue
            entries.append((step, os.path.join(ckpt_dir, name)))
    return max(entries)[1] if entries else None
