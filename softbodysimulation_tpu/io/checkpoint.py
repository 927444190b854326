"""Checkpoint / resume.

The reference's only 'checkpointing' is an in-memory snapshot restored on a
hotkey (``SoftBodyGPU.cs:126-127``, ``RestartSimulation`` ``:188-212``).
Because ``SimState`` is a pytree, ours is real durable checkpointing for
free: save/load via npz (no extra deps) with an orbax path when available.
Resume = construct state, not replay.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState

_FIELDS = [f.name for f in dataclasses.fields(SimState)]


def save(path: str, state: SimState, metadata: Optional[dict] = None) -> None:
    # optional fields (lambda_tet is None for tet-free states) are simply
    # omitted from the archive and restored as None on load
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS
              if getattr(state, name) is not None}
    if metadata:
        for k, v in metadata.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load(path: str) -> SimState:
    with np.load(path) as data:
        kwargs = {name: jnp.asarray(data[name]) for name in _FIELDS
                  if name in data.files}
    return SimState(**kwargs)


def load_metadata(path: str) -> dict:
    out = {}
    with np.load(path) as data:
        for k in data.files:
            if k.startswith("meta_"):
                out[k[len("meta_"):]] = data[k]
    return out


def _pad_empty(x):
    # orbax refuses zero-size arrays (e.g. lambda_bend with no hinges)
    return jnp.zeros((1,), x.dtype) if x.size == 0 else x


def save_orbax(path: str, state: SimState) -> None:
    """Orbax-backed checkpoint (optional dependency path)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), jax.tree.map(_pad_empty, state))
    ckpt.wait_until_finished()


def load_orbax(path: str, like: SimState) -> SimState:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(_pad_empty(x).shape, x.dtype), like)
    restored = ckpt.restore(os.path.abspath(path), template)
    for name in _FIELDS:
        got = getattr(restored, name)
        want = getattr(like, name)
        if want is None:           # optional field absent in this scene
            continue
        if want.size > 0 and tuple(got.shape) != tuple(want.shape):
            raise ValueError(
                f"checkpoint field {name!r} has shape {tuple(got.shape)}, "
                f"but the template expects {tuple(want.shape)} — wrong "
                f"scene/topology for this checkpoint")
    return jax.tree.map(
        lambda r, orig: jnp.zeros(orig.shape, orig.dtype)
        if orig.size == 0 else r,
        restored, like)
