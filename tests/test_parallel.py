"""Multi-device tests on the virtual 8-device CPU mesh: scenario sharding,
psum reductions, checkpoint/resume, metrics (SURVEY.md §2.5, §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_tpu.core.spec import KINEMATIC_BICYCLE_2D_DPCBF, make_spec
from safe_control_tpu.parallel import monte_carlo as mc
from safe_control_tpu.parallel.mesh import scenario_mesh
from safe_control_tpu.sim import tracking
from safe_control_tpu.utils import checkpoint as ckpt
from safe_control_tpu.utils import metrics as metrics_mod

WAYPOINTS = jnp.asarray([[1.0, 7.5], [20.0, 7.5]], dtype=jnp.float32)
SPEC = make_spec(KINEMATIC_BICYCLE_2D_DPCBF, a_max=5.0, radius=0.3)
CFG = tracking.TrackerConfig(
    model_name=KINEMATIC_BICYCLE_2D_DPCBF, pos_controller="cbf_qp", dt=0.05,
    num_obs=8, qp_iters=400,
)


def test_mesh_has_8_devices():
    mesh = scenario_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_sweep_matches_single_device():
    """The same 16-scenario sweep must give identical return codes whether
    run on 1 device or sharded over 8 (determinism across sharding)."""
    key = jax.random.PRNGKey(3)
    state0 = mc.dpcbf_sweep_init(CFG, SPEC, key, batch=16, waypoints=WAYPOINTS)

    # single device
    st1 = mc.run_sweep_chunk(CFG, SPEC, state0, WAYPOINTS, jnp.asarray(2), 100)
    s1, c1 = mc.sweep_stats(st1)

    # 8-device mesh
    mesh = scenario_mesh()
    st8, res8 = mc.run_sharded_sweep(
        mesh, CFG, SPEC, state0, WAYPOINTS, jnp.asarray(2), n_steps=100, chunk=50
    )
    np.testing.assert_allclose(float(res8.success_rate), float(s1), atol=1e-6)
    np.testing.assert_allclose(float(res8.collision_rate), float(c1), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(st8.tracker.ret), np.asarray(st1.tracker.ret)
    )


@pytest.mark.slow
def test_dpcbf_mini_monte_carlo_safety():
    """32-scenario DPCBF sweep (anchor config 4, scaled down).

    With 8 random obstacles converging on a robot that CANNOT stop (the
    KB model clamps v >= v_min = 0.2, kinematic_bicycle2D.py:112-123),
    encirclement can be genuinely unavoidable — so the criterion is
    relative: the DPCBF filter must beat the unfiltered baseline (the
    same sweep with the CBF rows effectively disabled) by a wide margin.
    """
    key = jax.random.PRNGKey(0)
    mesh = scenario_mesh()

    state = mc.dpcbf_sweep_init(CFG, SPEC, key, batch=32, waypoints=WAYPOINTS)
    _, res = mc.run_sharded_sweep(
        mesh, CFG, SPEC, state, WAYPOINTS, jnp.asarray(2), n_steps=300, chunk=100
    )

    # Baseline: alpha so large the CBF rows are never binding.
    spec_off = SPEC.replace(cbf_alpha=1e6)
    state_b = mc.dpcbf_sweep_init(CFG, spec_off, key, batch=32, waypoints=WAYPOINTS)
    _, res_b = mc.run_sharded_sweep(
        mesh, CFG, spec_off, state_b, WAYPOINTS, jnp.asarray(2), n_steps=300, chunk=100
    )

    filt, base = float(res.collision_rate), float(res_b.collision_rate)
    assert filt < 0.3
    assert filt < 0.5 * base + 1e-9, f"filtered {filt} vs baseline {base}"


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path):
    """Saving mid-sweep and resuming must reproduce the uninterrupted run."""
    key = jax.random.PRNGKey(7)
    s0 = mc.dpcbf_sweep_init(CFG, SPEC, key, batch=4, waypoints=WAYPOINTS)

    # uninterrupted: 80 steps
    full = mc.run_sweep_chunk(CFG, SPEC, s0, WAYPOINTS, jnp.asarray(2), 80)

    # interrupted at 40, checkpointed, restored, resumed
    half = mc.run_sweep_chunk(CFG, SPEC, s0, WAYPOINTS, jnp.asarray(2), 40)
    path = str(tmp_path / "sweep")
    ckpt.save(path, half, step=40)
    restored = ckpt.restore(path, half)
    assert ckpt.latest_step(path) == 40
    resumed = mc.run_sweep_chunk(CFG, SPEC, restored, WAYPOINTS, jnp.asarray(2), 40)

    np.testing.assert_allclose(
        np.asarray(resumed.tracker.x), np.asarray(full.tracker.x), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.tracker.ret), np.asarray(full.tracker.ret)
    )


def test_metrics_accumulation():
    m = metrics_mod.init_metrics()
    m = metrics_mod.update_metrics(
        m, h=jnp.asarray(0.5), infeasible=jnp.asarray(False),
        using_backup=jnp.asarray(True), replanned=jnp.asarray(True),
        event=jnp.asarray(True),
    )
    m = metrics_mod.update_metrics(
        m, h=jnp.asarray(-0.1), infeasible=jnp.asarray(True),
        using_backup=jnp.asarray(False), replanned=jnp.asarray(False),
        event=jnp.asarray(True),
    )
    s = metrics_mod.summarize(m)
    assert s["h_min"] == np.float32(-0.1)
    assert s["infeasible_steps"] == 1
    assert s["backup_steps"] == 1 and s["nominal_steps"] == 1
    assert s["replans_accepted"] == 1 and s["replans_rejected"] == 1
