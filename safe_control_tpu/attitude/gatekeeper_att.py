"""Gatekeeper applied to the yaw channel (exploration-safety shielding).

TPU-native re-implementation of
/root/reference/attitude_control/gatekeeper_attitude.py: the positional MPC
prediction is shielded in the *yaw* channel so the camera keeps the part of
the path that matters visible.

Per event (:504-609):
1. critical point = first predicted position that exits the known map
   (:295-353; here: first path cell outside the occupancy footprint — grid
   resolution instead of shapely bisection, documented delta),
2. candidate yaw trajectories = visibility-nominal prefix + velocity-
   tracking backup suffix, rolled over the predicted positions (:243-293),
3. validity (:387-479): (a) the critical point must enter the FoV cone
   (with range) before the braking-distance deadline; (b) at every step the
   braking lookahead tube along the path must be covered by that step's
   instantaneous FoV sector (sampled points, cone membership with slack),
4. commit the longest valid nominal prefix; keep the previous commitment if
   none is valid; reactive fallback to backup yaw when the critical point
   is in camera range but outside the current FoV (:533-546).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from safe_control_tpu.core.types import angle_normalize
from safe_control_tpu.perception import grid as grid_mod


@dataclasses.dataclass(frozen=True)
class GatekeeperAttConfig:
    dt: float = 0.05
    horizon: int = 30  # yaw steps considered (matches the MPC prediction)
    discount_steps: int = 5
    event_offset_steps: int = 1
    kp_vis: float = 1.5  # nominal (visibility) yaw gain
    kp_backup: float = 1.5  # backup (velocity tracking) yaw gain
    max_decel: float = 1.0
    validation_slack: float = 0.2
    tube_margin: float = 0.1
    n_tube_samples: int = 8

    @property
    def num_candidates(self) -> int:
        return self.horizon // self.discount_steps + 2


class GatekeeperAttState(NamedTuple):
    committed_yaw_rates: jnp.ndarray  # (horizon,)
    time_idx: jnp.ndarray
    next_event_idx: jnp.ndarray
    initialized: jnp.ndarray


def init_state(cfg: GatekeeperAttConfig) -> GatekeeperAttState:
    return GatekeeperAttState(
        committed_yaw_rates=jnp.zeros((cfg.horizon,), jnp.float32),
        time_idx=jnp.asarray(0, jnp.int32),
        next_event_idx=jnp.asarray(0, jnp.int32),
        initialized=jnp.asarray(False),
    )


def _in_fov(pos, yaw, point, spec, slack=0.0, check_range=True):
    to_p = point - pos
    ang = jnp.abs(angle_normalize(jnp.arctan2(to_p[1], to_p[0]) - yaw))
    ok = ang <= spec.fov_angle / 2.0 + slack
    if check_range:
        ok = ok & (jnp.linalg.norm(to_p) <= spec.cam_range + slack)
    return ok


def step(
    cfg: GatekeeperAttConfig,
    spec,
    state: GatekeeperAttState,
    footprint,
    gs: grid_mod.GridSpec,
    pos_traj,  # (horizon+1, 2) predicted positions from the pos controller
    vel_traj,  # (horizon+1, 2) predicted velocities (for backup yaw)
    yaw,
    speed,
):
    N = cfg.horizon
    dt = cfg.dt

    # ---- critical point: first predicted cell outside the footprint -----
    def cell_known(p):
        ix = jnp.clip((p[0] / gs.resolution).astype(jnp.int32), 0, gs.nx - 1)
        iy = jnp.clip((p[1] / gs.resolution).astype(jnp.int32), 0, gs.ny - 1)
        return footprint[ix, iy]

    known = jax.vmap(cell_known)(pos_traj)
    has_crossing = jnp.any(~known)
    crossing_step = jnp.argmax(~known)
    critical_point = pos_traj[crossing_step]

    brake_dist = speed**2 / (2.0 * cfg.max_decel)

    # ---- candidate yaw rollouts -----------------------------------------
    def backup_rate(k, yw):
        v = vel_traj[k]
        des = jnp.arctan2(v[1], v[0])
        moving = jnp.linalg.norm(v) > 1e-2
        return jnp.where(
            moving,
            jnp.clip(cfg.kp_backup * angle_normalize(des - yw), -spec.w_max, spec.w_max),
            0.0,
        )

    def nominal_rate(k, yw):
        # visibility nominal: face the critical point if one exists, else
        # the velocity direction (cheap surrogate of the visibility scorer
        # evaluated along a *predicted* path, :243-270).
        tgt_pt = jnp.where(has_crossing, critical_point, pos_traj[k] + vel_traj[k])
        des = jnp.arctan2(tgt_pt[1] - pos_traj[k][1], tgt_pt[0] - pos_traj[k][0])
        return jnp.clip(cfg.kp_vis * angle_normalize(des - yw), -spec.w_max, spec.w_max)

    def roll_candidate(nom_len):
        def body(yw, k):
            rate = jnp.where(k < nom_len, nominal_rate(k, yw), backup_rate(k, yw))
            return angle_normalize(yw + rate * dt), (yw, rate)

        _, (yaws_k, rates) = jax.lax.scan(body, yaw, jnp.arange(N))
        return yaws_k, rates

    cand_lens = jnp.maximum(
        N - jnp.arange(cfg.num_candidates, dtype=jnp.int32) * cfg.discount_steps, 0
    )
    cand_yaws, cand_rates = jax.vmap(roll_candidate)(cand_lens)

    # ---- validity (:387-479) ---------------------------------------------
    d_to_cp = jnp.linalg.norm(pos_traj[:N] - critical_point[None, :], axis=1)
    within_brake = d_to_cp <= brake_dist + cfg.validation_slack
    deadline = jnp.minimum(
        crossing_step, jnp.where(jnp.any(within_brake), jnp.argmax(within_brake), N)
    )

    ts_tube = jnp.linspace(0.0, 1.0, cfg.n_tube_samples)

    def candidate_valid(yaws_k):
        # (a) critical point seen before the deadline
        sees = jax.vmap(
            lambda k: _in_fov(pos_traj[k], yaws_k[k], critical_point, spec,
                              cfg.validation_slack)
        )(jnp.arange(N))
        seen_cum = jnp.cumsum(sees.astype(jnp.int32)) > 0
        global_ok = seen_cum[jnp.clip(deadline, 0, N - 1)]

        # (b) stepwise braking tube inside the instantaneous FoV
        def tube_ok(k):
            cp_k = pos_traj[jnp.clip(k + (brake_dist / jnp.maximum(speed, 1e-3) / dt).astype(jnp.int32), 0, N)]
            pts = pos_traj[k][None, :] + ts_tube[:, None] * (cp_k - pos_traj[k])[None, :]
            ok = jax.vmap(
                lambda p: _in_fov(pos_traj[k], yaws_k[k], p, spec,
                                  cfg.validation_slack + cfg.tube_margin)
            )(pts)
            return jnp.all(ok)

        tubes = jax.vmap(tube_ok)(jnp.arange(N))
        return jnp.where(has_crossing, global_ok & jnp.all(tubes), True)

    cand_valid = jax.vmap(candidate_valid)(cand_yaws)
    found = jnp.any(cand_valid)
    best = jnp.argmax(cand_valid)

    event = state.time_idx >= state.next_event_idx
    commit = (event & found) | ~state.initialized
    rates = jnp.where(commit, cand_rates[best], state.committed_yaw_rates)
    time_idx = jnp.where(commit, 0, state.time_idx)
    next_event = jnp.where(
        commit, cfg.event_offset_steps, state.next_event_idx
    ).astype(jnp.int32)
    next_event = jnp.where(
        event & ~commit, state.time_idx + cfg.event_offset_steps, next_event
    ).astype(jnp.int32)

    u_idx = jnp.clip(time_idx, 0, N - 1)
    u_att = rates[u_idx]

    # Reactive fallback (:533-546): critical point in camera range but not in
    # the current FoV cone -> track it with the backup gain immediately.
    cp_in_range = jnp.linalg.norm(critical_point - pos_traj[0]) <= spec.cam_range
    cp_in_fov = _in_fov(pos_traj[0], yaw, critical_point, spec, 0.0)
    des = jnp.arctan2(
        critical_point[1] - pos_traj[0][1], critical_point[0] - pos_traj[0][0]
    )
    u_react = jnp.clip(
        cfg.kp_backup * angle_normalize(des - yaw), -spec.w_max, spec.w_max
    )
    u_att = jnp.where(has_crossing & cp_in_range & ~cp_in_fov, u_react, u_att)

    new_state = GatekeeperAttState(
        committed_yaw_rates=rates,
        time_idx=(time_idx + 1).astype(jnp.int32),
        next_event_idx=next_event,
        initialized=jnp.asarray(True),
    )
    return u_att, new_state, dict(
        event=event, found=found, nominal_len=cand_lens[best], crossing=has_crossing
    )
