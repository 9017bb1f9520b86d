"""Checkpointing — flat .npz pytree snapshots keyed like the reference's
state_dict (param names _xyz / _cholesky / _features_dc / quantizer state),
preserving the two-stage warm-start contract (representation checkpoint ->
QAT init, reference train.py:127-133 / train_quantize.py:52-59: load filters
to matching keys, then quantizer ranges are initialized from weights)."""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        elif hasattr(v, "_asdict"):  # NamedTuple states
            out.update(_flatten(v._asdict(), key + "/"))
        elif v is None:
            continue
        else:
            out[key] = np.asarray(v)
    return out


def save_checkpoint(path, params: Dict[str, Any],
                    extra: Dict[str, Any] | None = None) -> None:
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    flat = _flatten({"params": params, "extra": extra or {}})
    np.savez(str(path), **flat)


def load_checkpoint(path) -> Dict[str, Dict[str, np.ndarray]]:
    """Returns {"params": {...}, "extra": {...}} with '/'-joined flat keys
    re-nested one level under params/extra."""
    data = np.load(str(path), allow_pickle=False)
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "extra": {}}
    for k in data.files:
        top, rest = k.split("/", 1)
        out[top][rest] = data[k]
    return out


def save_train_state(path, state, iteration: int,
                     aux_arrays: Dict[str, np.ndarray] | None = None) -> None:
    """Mid-fit resume snapshot: the FULL TrainState pytree (params +
    optimizer moments + extra), saved leaf-indexed in jax.tree order so any
    optax state round-trips, plus the iteration counter and optional host
    arrays (loss/psnr history, PRNG key). Written atomically (tmp + rename)
    so a crash mid-save never corrupts the previous snapshot. SURVEY §5
    failure-detection row; the reference has no mid-fit checkpointing."""
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    leaves = jax.tree.leaves(state)
    flat = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    flat["__iteration"] = np.asarray(iteration, np.int64)
    for k, v in (aux_arrays or {}).items():
        flat[f"aux_{k}"] = np.asarray(v)
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, str(path))


def load_train_state(path, template_state):
    """Inverse of save_train_state. ``template_state`` supplies the pytree
    structure (build it with the same model/optimizer config). Returns
    (state, iteration, aux dict)."""
    data = np.load(str(path), allow_pickle=False)
    treedef = jax.tree.structure(template_state)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"])
              for i in range(treedef.num_leaves)]
    aux = {k[4:]: data[k] for k in data.files if k.startswith("aux_")}
    return (jax.tree.unflatten(treedef, leaves), int(data["__iteration"]),
            aux)


def merge_matching(params: Dict[str, Any], loaded: Dict[str, np.ndarray]
                   ) -> Dict[str, Any]:
    """Partial load: overwrite leaves whose key AND shape match (the
    reference's filtered state_dict update, train.py:130-133)."""
    merged = dict(params)
    for k, v in loaded.items():
        if k in merged and tuple(np.shape(merged[k])) == tuple(v.shape):
            merged[k] = jax.numpy.asarray(v)
    return merged
