"""Attitude-channel parity anchors (round-5 verdict item 3).

The last uncertified controller family: numeric anchors for the yaw
controllers, against INDEPENDENT f64 NumPy re-derivations of the
reference's semantics (not this repo's jax code):

- ``visibility_area_yaw`` / ``visibility_targets``: argmax-yaw agreement
  vs brute-force NumPy scoring of unexplored-cells-in-sector on a fixed
  footprint grid (/root/reference/attitude_control/visibility_area.py:
  106-167 — ``sector.difference(footprints).area`` argmax over 36 yaws).
- ``visibility_raycast_yaw``: selected-yaw agreement vs a NumPy
  re-implementation of the 0.3/0.5/0.2-weighted ray scoring with the 0.3
  angular-distance penalty (visibility_raycast.py:46-296).
- ``gatekeeper_att.step``: decision-sequence parity (critical-point index,
  reactive-fallback triggers, commit events, committed nominal lengths,
  emitted yaw rates) vs a sequential f64 NumPy model of the reference's
  event loop (/root/reference/attitude_control/gatekeeper_attitude.py:
  504-609: critical point :314-353, reactive fallback :520-546, backward
  search :556-598, braking-deadline + FoV-tube validity :387-479, emit
  :600-606) on a scripted corridor.

All scorers share the same grid discretization (the documented shapely ->
occupancy-grid delta), so agreement is exact in the decisions and f32-
rounding-bounded in the emitted rates.
"""

import numpy as np
import jax
import jax.numpy as jnp

from safe_control_tpu.attitude import gatekeeper_att as gk
from safe_control_tpu.attitude.visibility import (
    visibility_area_yaw,
    visibility_raycast_yaw,
)
from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.perception.grid import GridSpec

DT = 0.05


def _ang_norm(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _cell_centers(gs):
    xs = (np.arange(gs.nx) + 0.5) * gs.resolution
    ys = (np.arange(gs.ny) + 0.5) * gs.resolution
    return np.meshgrid(xs, ys, indexing="ij")


def _sector_np(gs, pos, yaw, fov_angle, cam_range):
    """f64 sector membership on cell centers (visibility_area.py:32-46
    build_fov_sector, discretized like the repo's documented grid delta)."""
    cx, cy = _cell_centers(gs)
    dx, dy = cx - pos[0], cy - pos[1]
    in_cone = np.abs(_ang_norm(np.arctan2(dy, dx) - yaw)) <= fov_angle / 2.0
    return (dx**2 + dy**2 <= cam_range**2) & in_cone


def _corridor_footprint(gs):
    """Known region: a corridor strip plus a start disk (used by the
    visibility scorers, where sideways unexplored area matters)."""
    cx, cy = _cell_centers(gs)
    strip = (cx <= 8.0) & (cy >= 3.5) & (cy <= 6.5)
    disk = (cx - 1.0) ** 2 + (cy - 5.0) ** 2 <= 1.5**2
    return strip | disk


def _frontier_footprint(gs):
    """Known region: everything up to x=8 (the gatekeeper corridor: the
    unexplored frontier is AHEAD, so nominal visibility yaws face forward
    and commitment lengths track the shrinking crossing index)."""
    cx, _cy = _cell_centers(gs)
    return cx <= 8.0


def test_visibility_area_argmax_parity():
    """The repo's 36-yaw unexplored-area argmax must agree with brute-force
    f64 NumPy scoring at every anchor pose (and the returned rate must be
    the P-control of that argmax)."""
    gs = GridSpec(width=20.0, height=20.0, resolution=0.1)
    spec = make_spec(DOUBLE_INTEGRATOR_2D, cam_range=2.97)
    fov, cam = float(spec.fov_angle), float(spec.cam_range)
    fp_np = _corridor_footprint(gs)
    fp = jnp.asarray(fp_np)
    yaws = np.linspace(-np.pi, np.pi, 36, endpoint=False)

    poses = [  # off-lattice positions: no cell center sits exactly on a
        # range/angle boundary, so f32/f64 membership agrees cell-for-cell
        (np.array([2.03, 5.01]), 0.3),
        (np.array([5.02, 4.04]), -1.2),
        (np.array([7.53, 5.51]), 2.0),
        (np.array([6.01, 6.23]), 0.0),
    ]
    for pos, cur_yaw in poses:
        scores_np = np.array(
            [
                int(np.sum(_sector_np(gs, pos, yw, fov, cam) & ~fp_np))
                for yw in yaws
            ]
        )
        gold_idx = int(np.argmax(scores_np))

        targets = gk.visibility_targets(
            fp, gs, jnp.asarray(pos, jnp.float32)[None, :], spec, 36
        )
        repo_target = float(targets[0])
        repo_idx = int(np.argmin(np.abs(_ang_norm(yaws - repo_target))))
        # exact argmax agreement, or an f32-boundary-cell tie (score gap of
        # at most 2 cells at 0.1 m resolution)
        assert (
            repo_idx == gold_idx
            or scores_np[gold_idx] - scores_np[repo_idx] <= 2
        ), (pos, cur_yaw, gold_idx, repo_idx, scores_np[gold_idx], scores_np[repo_idx])

        w = visibility_area_yaw(
            fp, gs, jnp.asarray(pos, jnp.float32), jnp.asarray(cur_yaw, jnp.float32),
            spec,
        )
        w_gold = np.clip(
            1.5 * _ang_norm(yaws[repo_idx] - cur_yaw), -float(spec.w_max), float(spec.w_max)
        )
        np.testing.assert_allclose(float(w), w_gold, atol=1e-5)


def test_visibility_raycast_argmax_parity():
    """Selected-yaw agreement for the raycast scorer: independent f64 NumPy
    scoring of boundary-distance 0.3 / potential-area 0.5 / ray-escape 0.2
    with the 0.3 angular penalty (visibility_raycast.py:46-296)."""
    gs = GridSpec(width=20.0, height=20.0, resolution=0.1)
    spec = make_spec(DOUBLE_INTEGRATOR_2D, cam_range=2.97)
    fov, cam = float(spec.fov_angle), float(spec.cam_range)
    fp_np = _corridor_footprint(gs)
    fp = jnp.asarray(fp_np)
    yaws = np.linspace(-np.pi, np.pi, 36, endpoint=False)
    ts = np.linspace(0.05, 1.0, 32)
    max_ray = 10.0

    def in_fp(p):
        ix = min(max(int(p[0] / gs.resolution), 0), gs.nx - 1)
        iy = min(max(int(p[1] / gs.resolution), 0), gs.ny - 1)
        return bool(fp_np[ix, iy])

    def score_np(pos, yw):
        d = np.array([np.cos(yw), np.sin(yw)])
        inside = np.array([in_fp(pos + t * max_ray * d) for t in ts])
        any_out = bool(np.any(~inside))
        bdist = ts[int(np.argmax(~inside))] * max_ray if any_out else max_ray
        frac_in = float(np.mean(inside))
        ray_score = 1.0 if frac_in <= 0.0 else (0.8 if frac_in < 0.8 else 0.2)
        sector = _sector_np(gs, pos, yw, fov, cam)
        potential = float(np.sum(sector & ~fp_np)) / max(int(np.sum(sector)), 1)
        return 0.3 / (bdist + 0.1) + 0.5 * potential + 0.2 * ray_score

    for pos, cur_yaw in [
        (np.array([3.02, 5.01]), 0.0),
        (np.array([6.51, 4.52]), 1.0),
        (np.array([7.52, 5.03]), -0.5),
    ]:
        combined = np.array(
            [
                score_np(pos, yw) * (1.0 - 0.3 * abs(_ang_norm(yw - cur_yaw)) / np.pi)
                for yw in yaws
            ]
        )
        gold_idx = int(np.argmax(combined))
        w = visibility_raycast_yaw(
            fp, gs, jnp.asarray(pos, jnp.float32), jnp.asarray(cur_yaw, jnp.float32),
            spec,
        )
        # invert the P-control to recover the selected yaw
        err = float(w) / 1.5
        sel = _ang_norm(cur_yaw + err)
        sel_idx = int(np.argmin(np.abs(_ang_norm(yaws - sel))))
        clipped = abs(float(w)) >= float(spec.w_max) - 1e-6
        if clipped:
            # rate saturated: the selected yaw is only sign-identified
            assert np.sign(_ang_norm(yaws[gold_idx] - cur_yaw)) == np.sign(float(w))
        else:
            assert (
                sel_idx == gold_idx
                or combined[gold_idx] - combined[sel_idx] <= 0.02
            ), (pos, cur_yaw, gold_idx, sel_idx, combined[gold_idx], combined[sel_idx])


class _NumPyYawGatekeeper:
    """Sequential f64 model of the reference's yaw-gatekeeper event loop
    (gatekeeper_attitude.py:504-609), re-derived with explicit Python loops
    — candidates tried longest-first one at a time, validity checked
    step-by-step — against which the repo's batched/vmapped implementation
    is certified."""

    def __init__(self, cfg, spec, model_name, gs, fp_np):
        self.cfg = cfg
        self.spec = spec
        self.model_name = model_name
        self.gs = gs
        self.fp = fp_np
        self.fov = float(spec.fov_angle)
        self.cam = float(spec.cam_range)
        self.w_max = float(spec.w_max)
        self.committed = np.zeros(cfg.total_steps)
        self.committed_len = 0
        self.time_idx = 0
        self.next_event = 0
        self.initialized = False

    # --- geometry helpers ---------------------------------------------
    def _known(self, p):
        ix = min(max(int(p[0] / self.gs.resolution), 0), self.gs.nx - 1)
        iy = min(max(int(p[1] / self.gs.resolution), 0), self.gs.ny - 1)
        return bool(self.fp[ix, iy])

    def _in_fov(self, pos, yaw, point, slack=0.0):
        to_p = point - pos
        ang = abs(_ang_norm(np.arctan2(to_p[1], to_p[0]) - yaw))
        return (ang <= self.fov / 2.0 + slack) and (
            np.linalg.norm(to_p) <= self.cam + slack
        )

    def _brake_dist(self):
        c = self.cfg
        if self.model_name == "DoubleIntegrator2D":
            base = float(self.spec.v_max) ** 2 / (2.0 * max(float(self.spec.a_max), 1e-6))
        elif self.model_name == "SingleIntegrator2D":
            base = float(self.spec.v_max) * c.dt
        else:
            base = self.cam * 0.25
        return c.braking_distance_scale * base + c.braking_distance_margin

    def _vis_target(self, p):
        yaws = np.linspace(-np.pi, np.pi, self.cfg.n_yaw_samples, endpoint=False)
        best, best_s = yaws[0], -1
        for yw in yaws:  # first-max tie-break, like argmax
            s = int(np.sum(_sector_np(self.gs, p, yw, self.fov, self.cam) & ~self.fp))
            if s > best_s:
                best, best_s = yw, s
        return best

    def _backup_rate(self, vel, yw):
        if np.linalg.norm(vel) <= 1e-2:
            return 0.0
        des = np.arctan2(vel[1], vel[0])
        return float(np.clip(self.cfg.kp_backup * _ang_norm(des - yw), -self.w_max, self.w_max))

    def step(self, pos_traj, vel_traj, yaw):
        c = self.cfg
        T = c.total_steps
        path = pos_traj[:T]

        # critical point (:314-353)
        known = [self._known(p) for p in pos_traj]
        has_crossing = not all(known)
        crossing_step = known.index(False) if has_crossing else 0
        critical_point = pos_traj[crossing_step]
        brake = self._brake_dist()

        live_backup = self._backup_rate(vel_traj[0], yaw)

        # reactive fallback (:520-546)
        cp_dist = np.linalg.norm(critical_point - pos_traj[0])
        reactive = (
            has_crossing
            and cp_dist <= self.cam + c.validation_slack
            and not self._in_fov(pos_traj[0], yaw, critical_point, 0.0)
        )

        event = (self.time_idx >= self.next_event) or not self.initialized

        latest_nominal = max(crossing_step - c.backup_steps, 0)
        max_nominal = (
            min(c.nominal_steps, latest_nominal) if has_crossing else c.nominal_steps
        )

        # visibility targets along the path, once per event (:243-270)
        vis_targets = [self._vis_target(p) for p in path]

        # deadline: first step within braking distance of the critical point,
        # capped by the crossing step (:387-453)
        d_to_cp = [np.linalg.norm(p - critical_point) for p in path]
        within = [d <= brake + c.validation_slack for d in d_to_cp]
        deadline = min(
            crossing_step, within.index(True) if any(within) else T - 1
        )
        deadline = min(max(deadline, 0), T - 1)

        # arc-length braking-lookahead tube points (:455-479)
        seg = [np.linalg.norm(path[i + 1] - path[i]) for i in range(T - 1)]
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        tube = []
        for i in range(T):
            target = cum[i] + brake
            past = cum >= target - 1e-9
            if past.any():
                j = int(np.argmax(past))
                j = max(j, i)
                j0 = max(j - 1, 0)
                seg_len = max(cum[j] - cum[j0], 1e-9)
                alpha = min(max((target - cum[j0]) / seg_len, 0.0), 1.0)
                cp_i = path[j0] + alpha * (path[j] - path[j0])
            else:
                cp_i = path[T - 1]
            ts = np.linspace(0.0, 1.0, c.n_tube_samples)
            tube.append([path[i] + t * (cp_i - path[i]) for t in ts])

        def roll(nom_len):
            yw, yaws_k, rates = yaw, [], []
            for k in range(T):
                if k < nom_len:
                    rate = float(
                        np.clip(c.kp_vis * _ang_norm(vis_targets[k] - yw), -self.w_max, self.w_max)
                    )
                else:
                    rate = self._backup_rate(vel_traj[k], yw)
                yaws_k.append(yw)
                rates.append(rate)
                yw = _ang_norm(yw + rate * c.dt)
            return yaws_k, rates

        def valid(yaws_k, n_states):
            if not has_crossing:
                return True
            seen = False
            for k in range(min(deadline, n_states - 1) + 1):
                if k < n_states and self._in_fov(
                    path[k], yaws_k[k], critical_point, c.validation_slack
                ):
                    seen = True
                    break
            if not seen:
                return False
            for k in range(n_states):
                for p in tube[k]:
                    if not self._in_fov(
                        path[k], yaws_k[k], p, c.validation_slack + c.tube_margin
                    ):
                        return False
            return True

        commit = False
        committed_nominal = 0
        if event:
            # backward search, longest nominal first (:576-598)
            for i in range(c.num_candidates):
                nom_len = max(max_nominal - i * c.discount_steps, 0)
                yaws_k, rates = roll(nom_len)
                n_states = min(nom_len + c.backup_steps, T)
                if valid(yaws_k, n_states):
                    commit = True
                    committed_nominal = nom_len
                    self.committed = np.array(rates)
                    self.committed_len = n_states
                    self.time_idx = 0
                    self.next_event = c.event_offset_steps
                    break
            if not commit:
                self.next_event = self.time_idx + c.event_offset_steps

        if self.time_idx < self.committed_len:
            u_att = self.committed[min(self.time_idx, T - 1)]
        else:
            u_att = live_backup

        if reactive:
            u_att = live_backup
            self.committed_len = 0
            self.time_idx = 0
            self.next_event = 0

        u_att = float(np.clip(u_att, -self.w_max, self.w_max))
        self.time_idx += 1
        self.initialized = True
        return u_att, dict(
            event=event,
            reactive=reactive,
            commit=commit and not reactive,
            # a commitment made and immediately dropped by the reactive
            # override reports zero nominal steps (the repo's stats
            # convention, gatekeeper_att.py nominal_committed)
            nominal_len=committed_nominal if (commit and not reactive) else 0,
            crossing=has_crossing,
            crossing_step=crossing_step,
        )


def test_gatekeeper_att_decision_parity():
    """Scripted corridor drive: the repo's batched yaw gatekeeper and the
    sequential f64 NumPy model must produce IDENTICAL decision sequences
    (reactive triggers, commit events, committed nominal lengths, crossing
    indices) and f32-close emitted yaw rates.  The scenario starts facing
    away from the critical point (exercising the reactive fallback), then
    advances toward the unknown end of the corridor (shrinking the nominal
    cap until rejection)."""
    gs = GridSpec(width=20.0, height=20.0, resolution=0.1)
    spec = make_spec(DOUBLE_INTEGRATOR_2D, cam_range=2.97, w_max=2.0)
    cfg = gk.GatekeeperAttConfig(
        dt=DT,
        nominal_horizon=1.0,
        backup_horizon=0.5,
        event_offset=0.25,
        horizon_discount=0.25,
        braking_distance_margin=0.35,
    )
    fp_np = _frontier_footprint(gs)
    fp = jnp.asarray(fp_np)
    T = cfg.total_steps

    model_np = _NumPyYawGatekeeper(cfg, spec, DOUBLE_INTEGRATOR_2D, gs, fp_np)
    st = gk.init_state(cfg)
    step_jit = jax.jit(
        lambda st, ptraj, vtraj, yw: gk.step(
            cfg, spec, DOUBLE_INTEGRATOR_2D, st, fp, gs, ptraj, vtraj, yw
        )
    )

    pos = np.array([6.31, 5.013])
    vel = np.array([1.0, 0.0])
    yaw = 2.0  # facing away: the critical point starts in range but unseen
    dec_repo, dec_np, rate_dev = [], [], []
    for k in range(48):
        ptraj = pos[None, :] + np.arange(T + 1)[:, None] * DT * vel[None, :]
        vtraj = np.tile(vel, (T + 1, 1))
        u_np, info_np = model_np.step(ptraj, vtraj, yaw)
        u_j, st, info_j = step_jit(
            st,
            jnp.asarray(ptraj, jnp.float32),
            jnp.asarray(vtraj, jnp.float32),
            jnp.asarray(yaw, jnp.float32),
        )
        u_j = float(u_j)
        commit_j = bool(info_j["event"]) and bool(info_j["found"]) and not bool(
            info_j["reactive"]
        )
        dec_repo.append(
            (
                bool(info_j["event"]),
                bool(info_j["reactive"]),
                commit_j,
                int(info_j["nominal_len"]) if commit_j else 0,
                bool(info_j["crossing"]),
                int(info_j["crossing_step"]),
            )
        )
        dec_np.append(
            (
                info_np["event"],
                info_np["reactive"],
                info_np["commit"],
                info_np["nominal_len"],
                info_np["crossing"],
                info_np["crossing_step"],
            )
        )
        rate_dev.append(abs(u_j - u_np))
        # drive the shared world with the repo's output
        yaw = float(_ang_norm(yaw + u_j * DT))
        pos = pos + vel * DT

    assert dec_repo == dec_np, (
        "decision sequences diverged:\n"
        + "\n".join(
            f"k={k}: repo={a} np={b}"
            for k, (a, b) in enumerate(zip(dec_repo, dec_np))
            if a != b
        )
    )
    # the scenario must actually exercise the machinery
    assert any(d[1] for d in dec_repo), "reactive fallback never triggered"
    assert any(d[2] for d in dec_repo), "no commitment ever accepted"
    lens = {d[3] for d in dec_repo if d[2]}
    assert len(lens) >= 2, f"committed nominal lengths never varied: {lens}"
    assert max(rate_dev) < 1e-3, f"yaw-rate deviation {max(rate_dev):.2e}"
