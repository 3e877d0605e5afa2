"""Checkpoint/resume for long simulations and MPC runs.

The reference has NO restart capability (SURVEY.md §5 — output is
write-only visualization). This is new first-class machinery: any pytree of
arrays (solver state, control sequences, optimizer state) round-trips
through a single .npz file with structure metadata; works for host and
device arrays.
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
            {"treedef": str(treedef), "step": step, "t": t, "extra": meta or {}}
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **payload)


def restore_checkpoint(path: str, like):
    """Restore into the structure of ``like`` (a template pytree with the
    same layout). Returns (state, step, t, extra)."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    state = jax.tree.unflatten(treedef, leaves)
    return state, meta["step"], meta["t"], meta["extra"]
