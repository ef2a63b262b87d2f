"""Checkpointing: params + batch_stats + optimizer state + step.

Orbax-based (with a plain-npz fallback) re-design of the reference's Lightning
ModelCheckpoint / final_checkpoint_model.ckpt flow
(/root/reference/scripts/train.py:90-143, model_module.py:258-266). The
normalizer constants travel with the model config, so a checkpoint + config
fully reproduces inference like the reference's ``save_hyperparameters()``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        flat[prefix + key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str, state, name: str = "checkpoint", extra: Optional[Dict] = None) -> str:
    """Save a TrainState (or any pytree) under ``directory/name``."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.npz")
    flat = {}
    flat.update(_flatten(state.params, "params/"))
    flat.update(_flatten(state.batch_stats, "batch_stats/"))
    flat.update(_flatten(state.opt_state, "opt_state/"))
    flat["step"] = np.asarray(state.step)
    np.savez(path, **flat)
    if extra:
        with open(os.path.join(directory, f"{name}_meta.json"), "w") as fh:
            json.dump(extra, fh, indent=2, default=str)
    return path


def save_checkpoint_orbax(directory: str, state, name: str = "checkpoint") -> str:
    """Orbax backend: async-capable, multi-host-safe checkpointing (preferred
    for pod-scale runs; the npz backend stays the dependency-free default)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name))
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(
        path,
        {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
        force=True,
    )
    return path


def load_checkpoint_orbax(path: str, state):
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    restored = checkpointer.restore(
        os.path.abspath(path),
        item={
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
    )
    return state.replace(**restored)


def load_checkpoint(path: str, state):
    """Load into the structure of an existing TrainState (shape template).

    Remote paths (gs://...) load through the storage seam, mirroring the
    reference's fsspec-opened weight loading (model_module.py:258-266)."""
    from starcop_tpu.utils import storage

    with storage.open_file(path, "rb") as fh:
        with np.load(fh) as data:
            flat = {k: data[k] for k in data.files}

    def restore(tree, prefix):
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for p, leaf in paths:
            key = prefix + "/".join(
                str(getattr(q, "key", getattr(q, "idx", getattr(q, "name", q)))) for q in p
            )
            if key not in flat:
                raise KeyError(f"Missing checkpoint entry: {key}")
            arr = flat[key]
            if arr.shape != np.shape(leaf):
                raise ValueError(f"Shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
            leaves.append(arr.astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return state.replace(
        step=jax.numpy.asarray(flat["step"]),
        params=restore(state.params, "params/"),
        batch_stats=restore(state.batch_stats, "batch_stats/"),
        opt_state=restore(state.opt_state, "opt_state/"),
    )
