"""Checkpointing (reference utils/io.py save_checkpoint/save_best_model).

Format: a single .npz holding every pytree leaf under its key-path string,
plus a JSON metadata blob (step, epoch, r, date, config copy) — the same
information set the reference's torch.save dict carries (SURVEY.md SS5
"Checkpoint / resume"), portable and dependency-free.

`restore_partial` reproduces the reference's partial-load tolerance: leaves
whose name or shape no longer match are skipped with a warning (e.g. resuming
across an r change in old checkpoints).
"""

from __future__ import annotations

import datetime
import json
import os
import warnings
from typing import Any

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: dict[str, np.ndarray], strict: bool = True):
    paths_leaves = jax.tree_util.tree_leaves_with_path(template)
    leaves = []
    skipped = []
    for path, leaf in paths_leaves:
        key = jax.tree_util.keystr(path)
        if key in flat and flat[key].shape == np.asarray(leaf).shape:
            leaves.append(flat[key].astype(np.asarray(leaf).dtype))
        elif strict:
            raise KeyError(f"checkpoint missing or mismatched leaf {key}")
        else:
            skipped.append(key)
            leaves.append(np.asarray(leaf))
    if skipped:
        warnings.warn(f"checkpoint partial restore: kept init values for {skipped}",
                      stacklevel=2)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, *, params, model_state, opt_state, step: int,
                    epoch: int, r: int, extra: dict[str, Any] | None = None) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blobs = {}
    for name, tree in (("params", params), ("model_state", model_state),
                       ("opt_state", opt_state)):
        for k, v in _flatten(tree).items():
            blobs[f"{name}::{k}"] = v
    meta = {"step": int(step), "epoch": int(epoch), "r": int(r),
            "date": datetime.datetime.now().isoformat(), **(extra or {})}
    blobs["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **blobs)
    return path


def read_meta(path: str) -> dict:
    """Read just the metadata record of a checkpoint (cheap: no tree
    reconstruction) — lets callers size the model before loading."""
    with np.load(path, allow_pickle=False) as z:
        return json.loads(bytes(z["__meta__"]).decode())


def load_checkpoint(path: str, *, params, model_state, opt_state=None,
                    strict: bool = True):
    """Restore into the given templates. Returns (params, model_state,
    opt_state_or_None, meta)."""
    with np.load(path, allow_pickle=False) as z:
        blobs = {k: z[k] for k in z.files}
    meta = json.loads(bytes(blobs.pop("__meta__")).decode())

    def section(name):
        prefix = f"{name}::"
        return {k[len(prefix):]: v for k, v in blobs.items() if k.startswith(prefix)}

    new_params = _unflatten_like(params, section("params"), strict)
    new_state = _unflatten_like(model_state, section("model_state"), strict)
    new_opt = None
    if opt_state is not None:
        new_opt = _unflatten_like(opt_state, section("opt_state"), strict)
    return new_params, new_state, new_opt, meta


def restore_partial(path: str, *, params, model_state):
    """Lenient restore (reference's mismatched-key tolerance)."""
    p, s, _, meta = load_checkpoint(path, params=params, model_state=model_state,
                                    opt_state=None, strict=False)
    return p, s, meta


def save_best_model(current_loss: float, best_loss: float, out_path: str,
                    **ckpt_kwargs) -> float:
    """Reference save_best_model: overwrite best_model.npz when eval improves."""
    if current_loss < best_loss:
        save_checkpoint(os.path.join(out_path, "best_model.npz"), **ckpt_kwargs)
        return current_loss
    return best_loss
