"""Drift-car shielding: the ``--backup stop`` and BackupCBF axes.

Second half of the drift scenario suite (see test_drift_scenario.py /
drift_scenario_common.py — split purely for xdist file-level load balance;
each compiled simulator here costs ~90 s on XLA-CPU and shares nothing
with the other file's configs).
"""

import numpy as np
import pytest

from drift_scenario_common import _run


@pytest.mark.slow
def test_high_friction_backupcbf_runs():
    """BackupCBF on the high-friction case (runnable-not-guaranteed axis,
    test_drift.py:739-741): assert completion and sane dynamics."""
    r = _run("backupcbf", "lane_change")
    assert np.isfinite(r["x_final"]).all()
    assert r["x_final"][0] > 30.0  # drove a meaningful distance
    assert r["nominal_steps"] + r["backup_steps"] > 0


@pytest.mark.slow
def test_stop_backup_no_collision():
    """'--backup stop' axis: the stopping backup must brake before the ego-
    lane obstacle (expected_collision=False, test_drift.py:733-737)."""
    # 9 s: braking completes by ~7 s (obstacle at x=60, backup
    # engages ~x=40); the trailing seconds added nothing
    r = _run("gatekeeper", "stop", moving=False, tf=9.0)
    assert not r["collision"], f"collision at {r['x_final'][:2]}"
    # the car must actually have slowed (the backup engaged at some point)
    assert r["backup_steps"] > 0 or r["x_final"][5] < 10.0
