"""Checkpoint/resume for solver and MPC state.

The reference has no fault-tolerance story; its closest artifacts are the
warm-start overload (resume = reuse previous ``us``, ref ilqr_core.cpp:65-76)
and the final CSV (ref :414-431). Here any solver pytree — a
:class:`~ilqr_tpu.types.Solution`, a batch of them, or a whole MPC fleet's
:class:`~ilqr_tpu.mpc.MPCState` — snapshots to one .npz and restores
bit-exactly, making long batched runs resumable (SURVEY §5).

Orbax is used when available (async, multi-host aware); the .npz path is the
dependency-free default and is what the tests pin down.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz, atomic rename)."""
    flat, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`. ``like`` provides the
    structure (and device placement is left to jax on first use)."""
    flat, treedef = _flatten_with_paths(like)
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    import jax.numpy as jnp

    leaves = [jnp.asarray(l) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_orbax(path: str, tree: Any) -> None:
    """Orbax-backed save (multi-host safe); falls back to :func:`save`."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
    except Exception:
        save(path if path.endswith(".npz") else path + ".npz", tree)
