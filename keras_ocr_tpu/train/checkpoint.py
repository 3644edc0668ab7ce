"""Checkpoint save/restore (orbax with a NumPy fallback).

Replaces the reference's ``.h5`` ``ModelCheckpoint``/``load_weights``
resume flow (/root/reference/scripts/train_recognizer_synthtext90_multigpu.py:138-147,
208-216; note the reference has a latent bug where it timestamps a new
path and then tries to resume from that nonexistent path — here
``latest``/``restore`` read what actually exists).
"""

from __future__ import annotations

import os
import typing

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = tree
        for key in keys[:-1]:
            node = node.setdefault(key, {})
        node[keys[-1]] = value
    return tree


def save(path: str, variables) -> str:
    """Save a variable tree. Uses orbax if importable, else .npz."""
    variables = jax.tree.map(np.asarray, variables)
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, variables, force=True)
        checkpointer.wait_until_finished()
        return path
    except Exception:  # noqa: BLE001 - orbax missing or failed: fall back to npz
        if not path.endswith(".npz"):
            path = path + ".npz"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **_flatten(variables))
        return path


def save_npz(path: str, variables, cast: typing.Optional[type] = None) -> str:
    """Save a variable tree as ONE compressed .npz file (no orbax).

    For artifacts that must be a single committable file — e.g. the
    offline golden checkpoints under tests/fixtures/golden_offline/.
    ``cast=np.float16`` halves the file; float params round-trip through
    f16 with ~1e-3 relative error, verified acceptable at artifact
    creation time by re-running the golden selection from the saved file
    (scripts/make_golden_artifact.py).
    """
    flat = _flatten(jax.tree.map(np.asarray, variables))
    if cast is not None:
        flat = {
            key: value.astype(cast)
            if np.issubdtype(value.dtype, np.floating)
            else value
            for key, value in flat.items()
        }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def restore_npz(path: str, cast: typing.Optional[type] = np.float32) -> dict:
    """Restore a tree saved by :func:`save_npz`, upcasting floats."""
    with np.load(path) as data:
        flat = {key: data[key] for key in data.files}
    if cast is not None:
        flat = {
            key: value.astype(cast)
            if np.issubdtype(value.dtype, np.floating)
            else value
            for key, value in flat.items()
        }
    return _unflatten(flat)


def restore(path: str) -> dict:
    """Restore a variable tree saved by :func:`save`."""
    if path.endswith(".npz") or os.path.isfile(path + ".npz"):
        if not path.endswith(".npz"):
            path = path + ".npz"
        with np.load(path) as data:
            return _unflatten({k: data[k] for k in data.files})
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(path))


def latest(directory: str, prefix: str = "") -> typing.Optional[str]:
    """Most recently modified checkpoint path under a directory, or None."""
    if not os.path.isdir(directory):
        return None
    candidates = [
        os.path.join(directory, name)
        for name in os.listdir(directory)
        if name.startswith(prefix)
    ]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)
