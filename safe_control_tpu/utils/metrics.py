"""Structured metrics, status tracking, and CSV logging.

The reference's observability is ad-hoc stdout + status dicts
(gatekeeper.py:746-754, backup_cbf_qp.py:809-818, replan counters at
gatekeeper_attitude.py:489-502, CSV state logging at tracking.py:717-738).
Here metrics are a typed pytree accumulated *on device* inside the scan
(so Monte-Carlo sweeps log for thousands of robots at once) and rendered
host-side.
"""

from __future__ import annotations

import csv
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class StepMetrics(NamedTuple):
    """Per-step metrics accumulated on device (all jnp scalars / arrays)."""

    h_min: jnp.ndarray  # min barrier value seen
    infeasible_steps: jnp.ndarray  # int32 count
    backup_steps: jnp.ndarray  # int32 count (shielding engaged)
    nominal_steps: jnp.ndarray  # int32 count
    replans_accepted: jnp.ndarray  # int32 (gatekeeper commits)
    replans_rejected: jnp.ndarray  # int32


def init_metrics(dtype=jnp.float32) -> StepMetrics:
    z = jnp.asarray(0, jnp.int32)
    return StepMetrics(
        h_min=jnp.asarray(jnp.inf, dtype),
        infeasible_steps=z,
        backup_steps=z,
        nominal_steps=z,
        replans_accepted=z,
        replans_rejected=z,
    )


def update_metrics(
    m: StepMetrics,
    h=None,
    infeasible=None,
    using_backup=None,
    replanned=None,
    event=None,
) -> StepMetrics:
    """Branch-free accumulation; every argument optional."""
    h_min = m.h_min if h is None else jnp.minimum(m.h_min, h)
    inf_c = m.infeasible_steps if infeasible is None else (
        m.infeasible_steps + infeasible.astype(jnp.int32)
    )
    if using_backup is not None:
        b = m.backup_steps + using_backup.astype(jnp.int32)
        n = m.nominal_steps + (~using_backup).astype(jnp.int32)
    else:
        b, n = m.backup_steps, m.nominal_steps
    if replanned is not None and event is not None:
        acc = m.replans_accepted + (event & replanned).astype(jnp.int32)
        rej = m.replans_rejected + (event & ~replanned).astype(jnp.int32)
    else:
        acc, rej = m.replans_accepted, m.replans_rejected
    return StepMetrics(h_min, inf_c, b, n, acc, rej)


def summarize(m: StepMetrics) -> dict:
    """Host-side dict (gatekeeper.get_status / backup_cbf.get_status analog)."""
    out = {}
    for k, v in m._asdict().items():
        arr = np.asarray(v)
        out[k] = arr.item() if arr.ndim == 0 else arr
    return out


class CSVLogger:
    """State/control CSV logging matching tracking.py:717-738's format."""

    def __init__(self, path: str, header=("states", "control_inputs", "alpha1", "alpha2")):
        self.path = path
        self._fh = open(path, "w", newline="")
        self._writer = csv.writer(self._fh)
        self._writer.writerow(list(header))

    def log(self, state, control, extras=()):
        row = np.concatenate(
            [np.asarray(state).ravel(), np.asarray(control).ravel(), np.asarray(extras).ravel()]
        )
        self._writer.writerow(row)

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
