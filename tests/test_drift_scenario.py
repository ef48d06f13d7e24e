"""Drift-car shielding scenario suite (examples/drift_car/test_drift.py analog).

Drives the reusable DriftingCarSimulator (sim/drift_sim.py — the reference's
DriftingCarSimulator, drifting_car.py:654-752) across the reference's axes:
``--algo gatekeeper|mps|backupcbf`` and ``--backup lane_change|stop``
(test_drift.py:699-714).  Expected-outcome matrix (test_drift.py:729-742):
every case is collision-free except puddle_surprise, the deliberate negative
test whose puddle breaks the planner's friction model.

The ``--backup stop`` and BackupCBF axes live in
test_drift_scenario_backup.py (xdist file-level load balance — see
drift_scenario_common.py).
"""

import numpy as np
import pytest

from drift_scenario_common import _run


@pytest.mark.slow
def test_high_friction_gatekeeper_no_collision():
    """'high_friction' case: expected_collision=False with the default
    gatekeeper shielding (test_drift.py:735-742)."""
    r = _run("gatekeeper", "lane_change")
    assert not r["collision"], f"collision at {r['x_final'][:2]}"
    assert r["x_final"][0] > 40.0  # made real progress down the track


@pytest.mark.slow
def test_high_friction_mps_runs():
    """MPS on the same case.  The reference explicitly documents these as
    'intended to be runnable, not guaranteed collision-free for every
    shielding method' (test_drift.py:739-741): assert completion and sane
    dynamics, record the outcome."""
    r = _run("mps", "lane_change")
    assert np.isfinite(r["x_final"]).all()
    assert r["x_final"][0] > 30.0  # drove a meaningful distance
    assert r["nominal_steps"] + r["backup_steps"] > 0


@pytest.mark.slow
def test_puddle_surprise_negative_case():
    """'puddle_surprise': an ego-lane ice puddle breaks the planner's
    friction model — the deliberate negative test (expected_collision=True,
    test_drift.py:684-689).  The harsher mu=0.05 core is kept because this
    stack survives the reference's mu=0.25 (documented delta)."""
    # 6 s: the puddle collision lands ~3 s in (x=28 at 10 m/s)
    r = _run("gatekeeper", "lane_change", puddles=[(28.0, None, 10.0, 0.05)],
             tf=6.0)
    assert r["collision"], (
        f"puddle_surprise unexpectedly survived: {r['x_final'][:2]}"
    )
