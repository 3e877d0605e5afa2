"""Checkpoint/resume for long simulations and MPC runs.

The reference has NO restart capability (SURVEY.md §5 — output is
write-only visualization). This is new first-class machinery: any pytree of
arrays (solver state, control sequences, optimizer state) round-trips
through a single .npz file with structure metadata; works for host and
device arrays.

Restores are VALIDATED: the stored treedef string, leaf count, and every
leaf's shape/dtype must match the template — a mismatched template raises
instead of silently mis-assigning leaves.
"""
from __future__ import annotations

import json

import jax
import numpy as np


def save_checkpoint(path: str, state, step: int = 0, t: float = 0.0, meta: dict | None = None) -> None:
    leaves, treedef = jax.tree.flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "treedef": str(treedef),
                "n_leaves": len(leaves),
                "shapes": [list(np.shape(l)) for l in leaves],
                "dtypes": [str(np.asarray(l).dtype) for l in leaves],
                "step": step,
                "t": t,
                "extra": meta or {},
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **payload)


def restore_checkpoint(path: str, like, strict_dtype: bool = True):
    """Restore into the structure of ``like`` (a template pytree with the
    same layout). Returns (state, step, t, extra).

    Validates structure before assigning: treedef string, leaf count, and
    per-leaf shape (and dtype unless ``strict_dtype=False``) must match the
    template; raises ValueError with the first mismatch otherwise.
    """
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    leaves_like, treedef = jax.tree.flatten(like)

    n_stored = meta.get("n_leaves", len(leaves_like))
    if n_stored != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n_stored} leaves, template has "
            f"{len(leaves_like)}")
    if meta.get("treedef") is not None and meta["treedef"] != str(treedef):
        raise ValueError(
            "checkpoint treedef does not match template:\n"
            f"  stored:   {meta['treedef']}\n"
            f"  template: {treedef}")

    leaves = [data[f"leaf_{i}"] for i in range(n_stored)]
    for i, (got, want) in enumerate(zip(leaves, leaves_like)):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"leaf {i}: stored shape {tuple(got.shape)} != template "
                f"shape {tuple(np.shape(want))}")
        if strict_dtype and hasattr(want, "dtype") \
                and got.dtype != np.asarray(want).dtype:
            raise ValueError(
                f"leaf {i}: stored dtype {got.dtype} != template dtype "
                f"{np.asarray(want).dtype}")
    state = jax.tree.unflatten(treedef, leaves)
    return state, meta["step"], meta["t"], meta["extra"]
