"""Observability and robustness utilities.

The reference has no tracing/profiling and only throw-on-NaN guards
(SURVEY.md §5). First-class here:
 - `trace` / `annotate`: jax.profiler wrappers (TensorBoard-compatible);
 - `StepTimer`: wall-clock per-chunk timing with device sync;
 - `instability_guard`: the reference's max>1e8-or-NaN check
   (src/advec1d/main.cpp:104-107) as a jit-friendly predicate;
 - `checked_update`: freeze-on-blowup state update so long scans survive
   transient spikes without host round trips.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines (decorator/context)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timing of jitted chunks (blocks on the device)."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))

    def summary(self) -> str:
        if not self.times:
            return "no samples"
        return (
            f"n={len(self.times)} mean={self.mean * 1e3:.3f}ms "
            f"min={min(self.times) * 1e3:.3f}ms max={max(self.times) * 1e3:.3f}ms"
        )


def instability_guard(*fields, threshold: float = 1e8) -> jnp.ndarray:
    """True when any field is non-finite or exceeds the blow-up threshold
    (reference guard semantics, advec1d/main.cpp:104-107)."""
    bad = jnp.asarray(False)
    for f in fields:
        m = jnp.max(jnp.abs(f))
        bad = bad | ~jnp.isfinite(m) | (m > threshold)
    return bad


def checked_update(new_state, old_state, threshold: float = 1e8):
    """Return new_state unless it blew up, else keep old_state (and a flag).
    Keeps scans total — the host can inspect the flag after the rollout."""
    leaves = jax.tree.leaves(new_state)
    bad = instability_guard(*leaves, threshold=threshold)
    out = jax.tree.map(lambda n, o: jnp.where(bad, o, n), new_state, old_state)
    return out, bad


def build_sponge_coefficient(
    ctx, open_boundary_mask, width: float, strength: float = 1.0
) -> jnp.ndarray:
    """Sponge-layer relaxation coefficient: quadratic ramp within ``width``
    of the open-boundary nodes (reference buildSpongeCoeff analog,
    src/sw2d/main.cpp:517-553 — O(Np*K*|open|) brute force there; vectorized
    distance-to-node-set here).

    open_boundary_mask: boolean (K, Nfaces*Nfp) marking open face nodes.
    Returns (K, Np) coefficient in [0, strength].
    """
    import numpy as np

    x = np.asarray(ctx.x)
    y = np.asarray(ctx.y)
    vm = np.asarray(ctx.vmapM).reshape(-1)
    mask = np.asarray(open_boundary_mask).reshape(-1)
    if not mask.any():
        return jnp.zeros_like(ctx.x)
    ob = vm[mask]
    xo = x.reshape(-1)[ob]
    yo = y.reshape(-1)[ob]
    d = np.sqrt(
        (x.reshape(-1)[:, None] - xo[None, :]) ** 2
        + (y.reshape(-1)[:, None] - yo[None, :]) ** 2
    ).min(axis=1)
    ramp = np.clip(1.0 - d / width, 0.0, 1.0) ** 2
    return jnp.asarray(strength * ramp.reshape(x.shape), dtype=ctx.x.dtype)
