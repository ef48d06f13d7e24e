"""Heterogeneous fleets: multiple model families in one compiled program.

BASELINE.json anchor config 5: a heterogeneous multi-robot fleet
(unicycle + bicycle + quad + ...) with shielding, thousands of agents
batched across a pod slice.  Model dispatch is static (jit specializes per
model), so a heterogeneous fleet is a *struct of homogeneous groups*: one
vmapped scan per model family, all inside one jit — XLA schedules the
groups' programs back-to-back on the chip, and a shared obstacle set
couples them.

Fleet-shared obstacles: each group can treat the OTHER robots' positions as
dynamic obstacles (fleet coupling); positions are gathered across groups
between chunks (and across devices via the scenario mesh when sharded).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.types import dummy_obstacle
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.sim import tracking


@dataclasses.dataclass(frozen=True)
class FleetGroup:
    """Static description of one homogeneous sub-fleet."""

    cfg: tracking.TrackerConfig
    count: int
    robot_radius: float = 0.25  # radius other groups see as an obstacle


class FleetState(NamedTuple):
    trackers: Tuple[tracking.TrackerState, ...]  # one batched state per group


def init_fleet(
    groups: List[FleetGroup], specs, x0s: List[jnp.ndarray], waypoints_list
) -> FleetState:
    """``x0s[i]``: (count_i, n_i) initial states per group."""
    states = []
    for g, spec, x0, wps in zip(groups, specs, x0s, waypoints_list):
        st = jax.vmap(
            lambda x: tracking.init_state(g.cfg, spec, x, 0.0, first_goal=wps[0])
        )(x0)
        states.append(st)
    return FleetState(trackers=tuple(states))


def fleet_positions(groups: List[FleetGroup], state: FleetState) -> jnp.ndarray:
    """(total, 3) rows [x, y, radius] of every robot in the fleet."""
    rows = []
    for g, st in zip(groups, state.trackers):
        model = get_model(g.cfg.model_name)
        pos = jax.vmap(model.barrier_pos)(st.x)
        rows.append(
            jnp.concatenate(
                [pos, jnp.full((g.count, 1), g.robot_radius)], axis=1
            )
        )
    return jnp.concatenate(rows, axis=0)


def step_fleet(
    groups: List[FleetGroup],
    specs,
    state: FleetState,
    waypoints_list,
    n_waypoints_list,
    known_obs,
    inter_robot: bool = True,
    n_steps: int = 1,
    coupling_margin: float = 0.3,
):
    """Advance every group ``n_steps``; optionally feed other robots'
    positions (held fixed within the chunk) as obstacles.

    NOTE: the reference's multi-robot example has NO robot-robot coupling
    at all (examples/test_multi_robot.py:77-84 — robots pass through each
    other); this coupling is additional capability.  Because the circle
    HOCBF models other robots as static, ``coupling_margin`` inflates their
    published radii to absorb mutual motion within a control period."""
    offs = np.cumsum([0] + [g.count for g in groups])
    if inter_robot:
        allpos = fleet_positions(groups, state)  # (total, 3)
        # Margin goes into the CONSTRAINT rows only; the collision oracle in
        # tracking.step would otherwise flag margin contact as collision.
        # (Callers can alternatively raise spec.cbf_beta.)

    new_states = []
    for gi, (g, spec, st) in enumerate(zip(groups, specs, state.trackers)):
        if inter_robot:
            others = jnp.concatenate(
                [allpos[: offs[gi]], allpos[offs[gi] + g.count :]], axis=0
            )
            # Keep the nearest few as 7-vector obstacles, per robot.
            def obs_for(x_row):
                model = get_model(g.cfg.model_name)
                p = model.barrier_pos(x_row)
                d = jnp.linalg.norm(others[:, :2] - p[None, :], axis=1)
                k = min(4, others.shape[0])
                _, idx = jax.lax.top_k(-d, k)
                sel = others[idx]
                rows = jnp.concatenate(
                    [sel[:, :2], sel[:, 2:3] + coupling_margin, jnp.zeros((k, 4))],
                    axis=1,
                )
                return jnp.concatenate([known_obs, rows], axis=0)

            obs_batch = jax.vmap(obs_for)(st.x)
        else:
            obs_batch = jnp.tile(known_obs[None], (g.count, 1, 1))

        wps = waypoints_list[gi]
        n_wps = n_waypoints_list[gi]

        def one(tr, obs, wps_r):
            def body(t, _):
                out = tracking.step(g.cfg, spec, t, wps_r, n_wps, obs)
                return out.state, None

            tr, _ = jax.lax.scan(body, tr, None, length=n_steps)
            return tr

        if wps.ndim == 3:  # per-robot waypoints (count, W, 2)
            new_states.append(jax.vmap(one)(st, obs_batch, wps))
        else:
            new_states.append(
                jax.vmap(one, in_axes=(0, 0, None))(st, obs_batch, wps)
            )
    return FleetState(trackers=tuple(new_states))


def fleet_stats(groups: List[FleetGroup], state: FleetState) -> Dict[str, float]:
    done = bad = total = 0
    for g, st in zip(groups, state.trackers):
        ret = np.asarray(st.ret)
        done += int((ret == tracking.RET_DONE).sum())
        bad += int((ret == tracking.RET_INFEASIBLE).sum())
        total += g.count
    return dict(total=total, reached=done, infeasible_or_collision=bad)
