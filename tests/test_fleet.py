"""Heterogeneous fleet tests (BASELINE anchor config 5, scaled down)."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import (
    DOUBLE_INTEGRATOR_2D,
    DYNAMIC_UNICYCLE_2D,
    KINEMATIC_BICYCLE_2D_DPCBF,
    make_spec,
)
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.parallel import fleet as fleet_mod
from safe_control_tpu.sim import tracking


def _mk():
    groups = [
        fleet_mod.FleetGroup(
            cfg=tracking.TrackerConfig(
                model_name=DOUBLE_INTEGRATOR_2D, pos_controller="cbf_qp",
                dt=0.05, num_obs=8, qp_iters=400,
            ),
            count=8, robot_radius=0.25,
        ),
        fleet_mod.FleetGroup(
            cfg=tracking.TrackerConfig(
                model_name=DYNAMIC_UNICYCLE_2D, pos_controller="cbf_qp",
                dt=0.05, num_obs=8, qp_iters=400,
            ),
            count=8, robot_radius=0.25,
        ),
        fleet_mod.FleetGroup(
            cfg=tracking.TrackerConfig(
                model_name=KINEMATIC_BICYCLE_2D_DPCBF, pos_controller="cbf_qp",
                dt=0.05, num_obs=8, qp_iters=400,
            ),
            count=8, robot_radius=0.3,
        ),
    ]
    specs = [
        make_spec(DOUBLE_INTEGRATOR_2D, v_max=0.7, a_max=1.5, radius=0.25),
        make_spec(DYNAMIC_UNICYCLE_2D, a_max=1.0, w_max=0.8, v_max=0.7, radius=0.25),
        make_spec(KINEMATIC_BICYCLE_2D_DPCBF, a_max=5.0, v_max=1.0, radius=0.3),
    ]
    rng = np.random.default_rng(0)

    def ring(n, cx, cy, r, dim):
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        x = np.zeros((n, dim), dtype=np.float32)
        # jitter breaks the perfectly symmetric head-on geometry that makes
        # reciprocal avoidance with static-obstacle models mirror-deadlock
        x[:, 0] = cx + r * np.cos(ang) + rng.uniform(-0.3, 0.3, n)
        x[:, 1] = cy + r * np.sin(ang) + rng.uniform(-0.3, 0.3, n)
        if dim == 4 and dim >= 4:
            x[:, 3] = 0.3  # initial speed for heading models
        return jnp.asarray(x)

    # Three corridors around the central obstacle.  All-through-one-point
    # crossings are out of scope for static-model decentralized CBF (they
    # need reciprocal velocity-aware barriers); the reference has no
    # robot-robot coupling at all, so corridor traffic already exceeds it.
    def line(n, x0, y0, dx, dy, dim):
        x = np.zeros((n, dim), dtype=np.float32)
        x[:, 0] = x0 + dx * np.arange(n) + rng.uniform(-0.1, 0.1, n)
        x[:, 1] = y0 + dy * np.arange(n) + rng.uniform(-0.1, 0.1, n)
        if dim >= 4:
            x[:, 3] = 0.3
        return jnp.asarray(x)

    x0s = [
        line(8, 1.0, 2.0, 1.2, 0.0, 4),   # bottom corridor, heading right
        line(8, 1.0, 12.0, 1.2, 0.0, 4),  # top corridor, heading right
        line(8, 2.0, 4.5, 1.2, 0.0, 4),   # middle-low corridor
    ]
    # Per-robot goals (each robot advances ~3 m down its corridor) so the
    # fleet never piles onto a single point.
    def goals(x0, dx=3.0):
        g = np.asarray(x0)[:, :2].copy()
        g[:, 0] += dx
        return jnp.asarray(g[:, None, :], dtype=jnp.float32)  # (count, 1, 2)

    wps = None  # filled below from x0s
    wps = [goals(x) for x in x0s]
    n_wps = [jnp.asarray(1)] * 3
    known = pad_obstacles(jnp.asarray([[7.0, 7.0, 1.0, 0, 0, 0, 0]]), 4)
    return groups, specs, x0s, wps, n_wps, known


def test_heterogeneous_fleet_runs_and_avoids():
    groups, specs, x0s, wps, n_wps, known = _mk()
    state = fleet_mod.init_fleet(groups, specs, x0s, [w[:, 0] for w in wps])

    # Inter-robot obstacle views refresh once per chunk; with three streams
    # crossing at one point the views must refresh EVERY step (chunking is a
    # perf knob for sparse fleets).
    step = jax.jit(
        lambda s: fleet_mod.step_fleet(
            groups, specs, s, wps, n_wps, known, inter_robot=True, n_steps=1,
            coupling_margin=0.5,
        )
    )
    for _ in range(200):  # 200 steps = 10 s
        state = step(state)
    stats = fleet_mod.fleet_stats(groups, state)
    assert stats["total"] == 24
    assert stats["infeasible_or_collision"] == 0, [
        np.asarray(t.ret) for t in state.trackers
    ]
    # Robots from different groups must never overlap (inter-robot coupling).
    pos = np.asarray(fleet_mod.fleet_positions(groups, state))
    d = np.linalg.norm(pos[None, :, :2] - pos[:, None, :2], axis=-1)
    np.fill_diagonal(d, np.inf)
    min_pair = d.min()
    assert min_pair > 0.45, f"closest robots {min_pair}"


def test_fleet_positions_shape():
    groups, specs, x0s, wps, n_wps, known = _mk()
    state = fleet_mod.init_fleet(groups, specs, x0s, [w[:, 0] for w in wps])
    pos = fleet_mod.fleet_positions(groups, state)
    assert pos.shape == (24, 3)
    assert np.allclose(np.asarray(pos[:8, 2]), 0.25)
    assert np.allclose(np.asarray(pos[16:, 2]), 0.3)
