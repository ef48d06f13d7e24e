"""Checkpoint / resume of batched simulation state (SURVEY.md §5.4 — new
scope vs the reference, which has none).

Long Monte-Carlo sweeps (1k-scenario DPCBF, 4k-agent fleets) checkpoint
their full pytree state (tracker states, obstacle arrays, RNG keys,
accumulated metrics) with orbax so a preempted run resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _mgr(path: str):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer(), ocp


def save(path: str, state: Any, step: int) -> str:
    """Save a pytree under ``path/step_<N>``; returns the directory used."""
    ckptr, _ = _mgr(path)
    target = os.path.join(os.path.abspath(path), f"step_{step}")
    ckptr.save(target, state, force=True)
    ckptr.wait_until_finished()
    return target


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore(path: str, like: Any, step: Optional[int] = None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest), shaped like
    ``like`` (an abstract or concrete example pytree)."""
    ckptr, _ = _mgr(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    target = os.path.join(os.path.abspath(path), f"step_{step}")
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        like,
    )
    return ckptr.restore(target, abstract)
