"""Commitment-sequence parity: gatekeeper/MPS vs an independent NumPy model.

Round-3 verdict item 4: the gatekeeper's solver behavior (commit decisions,
nominal-prefix lengths, backup usage, applied controls) was scenario-tested
but never numerically anchored.  This file re-implements the REFERENCE's
sequential semantics (/root/reference/shielding/gatekeeper.py:553-665 and
shielding/mps.py:59-166) in plain float64 NumPy — sequential backward search
over nominal lengths, first-valid commit, keep-previous-on-failure, control
emission by time index with raw-backup fallback — and drives both it and
``safe_control_tpu.shielding.gatekeeper`` through the same scripted scenario
(DoubleIntegrator2D heading to a goal, one constant-velocity obstacle
crossing its lane, so predictions are exact and the reference's soundness
assumptions hold).  The DECISION SEQUENCES must agree exactly; states and
controls to f32 tolerance.

The NumPy model is written from the reference's semantics, not from this
repo's vectorized implementation (candidate search there is a vmapped
argmax; here it is the reference's literal first-valid loop).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.dynamics import get_model
from safe_control_tpu.shielding import gatekeeper as gk_mod

DT = 0.1
SPEC = make_spec(DOUBLE_INTEGRATOR_2D, v_max=1.0, a_max=1.0)
MODEL = get_model(DOUBLE_INTEGRATOR_2D)
GOAL = np.array([8.0, 0.0])
ROBOT_R = 0.3
OBS_R = 0.4
MARGIN = 0.1
# obstacle crosses the robot's lane: starts right of the path, moving -y
OBS0 = np.array([4.0, 2.5])
OBS_V = np.array([0.0, -0.6])
N_STEPS = 120


# ---- f64 NumPy re-implementations of the model pieces ---------------------
def nominal_np(x, k_v=1.0, k_a=1.0, d_min=0.05):
    """DoubleIntegrator2D PD law (double_integrator2D.py:113-140)."""
    pos_err = GOAL - x[:2]
    pos_err = np.sign(pos_err) * np.maximum(np.abs(pos_err) - d_min, 0.0)
    v_des = k_v * pos_err
    vm = np.linalg.norm(v_des)
    if vm > 1.0:
        v_des *= 1.0 / vm
    a = k_a * (v_des - x[2:4])
    am = np.linalg.norm(a)
    if am > 1.0:
        a *= 1.0 / am
    return a


def backup_np(x):
    """Deadbeat brake, same law as the jnp policy below."""
    a = -x[2:4] / DT
    mag = np.linalg.norm(a)
    if mag > 1.0:
        a *= 1.0 / max(mag, 1e-9)
    return a


def step_np(x, u):
    """DI Euler + velocity clamp (double_integrator2D.py:79-107)."""
    x = x + np.array([x[2], x[3], u[0], u[1]]) * DT
    vm = np.linalg.norm(x[2:4])
    if vm > 1.0:
        x = x.copy()
        x[2:4] *= 1.0 / vm
    return x


def collide_np(x, t_idx):
    """Time-synchronized moving-obstacle check (gatekeeper.py:380-527)."""
    obs_t = OBS0 + OBS_V * (t_idx * DT)
    return np.linalg.norm(x[:2] - obs_t) < OBS_R + ROBOT_R + MARGIN


class RefGatekeeper:
    """The reference's sequential gatekeeper semantics, f64 NumPy."""

    def __init__(self, nn, nb, event_offset, discount, mps=False):
        self.nn, self.nb = nn, nb
        self.event_offset, self.discount = event_offset, discount
        self.mps = mps
        self.L = nn + nb + 1
        self.committed_u = None  # list of (2,) controls
        self.committed_valid = 0  # number of valid u rows
        self.time_idx = 0
        self.next_event_idx = 0
        self.nominal_committed = 0
        self.initialized = False

    def _rollout(self, x0, policy, n):
        xs, us = [np.asarray(x0, float)], []
        for _ in range(n):
            u = policy(xs[-1])
            us.append(u)
            xs.append(step_np(xs[-1], u))
        return xs, us

    def step(self, x, t_abs):
        # t_abs unused: collision times are offsets from 'now', as in the
        # repo implementation (the scenario shifts OBS0 outside).
        if not self.initialized:
            bx, bu = self._rollout(x, backup_np, self.nb)
            self.committed_u = bu + [np.zeros(2)] * (self.L - 1 - self.nb)
            self.committed_valid = self.nb
            self.time_idx = 0
            self.next_event_idx = 0
            self.nominal_committed = 0
            self.initialized = True

        event = self.time_idx >= self.next_event_idx
        found = False
        if event:
            nom_x, nom_u = self._rollout(x, nominal_np, self.nn)
            if self.mps:
                cand_lens = [min(1, self.nn)]
            else:
                n_cand = self.nn // self.discount + 2
                cand_lens = [max(self.nn - i * self.discount, 0)
                             for i in range(n_cand)]
            for length in cand_lens:  # sequential backward search (:589)
                # nominal prefix safe through step `length`
                if any(collide_np(nom_x[k], k) for k in range(length + 1)):
                    continue
                bx, bu = self._rollout(nom_x[length], backup_np, self.nb)
                if any(collide_np(bx[j], length + j)
                       for j in range(self.nb + 1)):
                    continue
                found = True
                new_u = nom_u[:length] + bu
                new_u = new_u + [np.zeros(2)] * (self.L - 1 - len(new_u))
                self.committed_u = new_u
                self.committed_valid = length + self.nb
                self.time_idx = 0
                self.next_event_idx = self.event_offset
                self.nominal_committed = length
                break
            if not found:  # keep previous commitment (:649-652)
                self.next_event_idx = self.time_idx + self.event_offset

        # emit (:654-665)
        if self.time_idx < self.L - 1 and self.time_idx < self.committed_valid:
            u = self.committed_u[self.time_idx]
        else:
            u = backup_np(x)
        using_backup = self.time_idx >= self.nominal_committed
        rec = dict(
            event=bool(event), found=bool(found),
            nominal_committed=int(self.nominal_committed),
            using_backup=bool(using_backup), u=np.asarray(u, float),
        )
        self.time_idx += 1
        return rec


def _run_repo(cfg):
    spec = SPEC
    obs0 = jnp.asarray(OBS0, jnp.float32)
    obs_v = jnp.asarray(OBS_V, jnp.float32)

    def backup_policy(x):
        a = -x[2:4] / DT
        mag = jnp.linalg.norm(a)
        return a * jnp.where(mag > 1.0, 1.0 / jnp.maximum(mag, 1e-9), 1.0)

    def nominal_policy(x):
        return MODEL.nominal_input(x, jnp.asarray(GOAL, jnp.float32), spec)

    @jax.jit
    def step_all(gst, x, t0):
        def collision_fn(xx, t_idx):
            t = (t0 + t_idx).astype(jnp.float32) * DT
            obs_t = obs0 + obs_v * t
            return jnp.linalg.norm(xx[:2] - obs_t) < OBS_R + ROBOT_R + MARGIN

        out = gk_mod.step(cfg, spec, gst, x, backup_policy, collision_fn,
                          nominal_policy=nominal_policy)
        x1 = MODEL.step(x, out.u, spec, DT)
        return out, x1

    gst = gk_mod.init_state(cfg)
    x = jnp.asarray([0.0, 0.0, 0.0, 0.0], jnp.float32)
    recs, xs = [], [np.asarray(x, float)]
    for k in range(N_STEPS):
        out, x1 = step_all(gst, x, jnp.asarray(k, jnp.int32))
        recs.append(dict(
            event=bool(out.event_fired), found=bool(out.candidate_found),
            nominal_committed=int(out.state.nominal_steps_committed),
            using_backup=bool(out.using_backup),
            u=np.asarray(out.u, float),
        ))
        gst, x = out.state, x1
        xs.append(np.asarray(x, float))
    return recs, np.stack(xs)


def _run_ref(nn, nb, eo, disc, mps=False):
    ref = RefGatekeeper(nn, nb, eo, disc, mps=mps)
    x = np.array([0.0, 0.0, 0.0, 0.0])
    recs, xs = [], [x.copy()]
    global OBS0
    obs_orig = OBS0.copy()
    try:
        for k in range(N_STEPS):
            OBS0 = obs_orig + np.asarray(OBS_V) * (k * DT)  # world advances
            rec = ref.step(x, k)
            recs.append(rec)
            x = step_np(x, rec["u"])
            xs.append(x.copy())
    finally:
        OBS0 = obs_orig
    return recs, np.stack(xs)


@pytest.mark.parametrize(
    "mps", [False, True], ids=["gatekeeper", "mps"]
)
def test_commitment_sequence_parity(mps):
    nn, nb, disc = 12, 12, 4
    eo = 1 if mps else 3
    cfg = gk_mod.GatekeeperConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=DT, nominal_steps=nn,
        backup_steps=nb, event_offset_steps=eo, discount_steps=disc,
        mps_mode=mps,
    )
    recs_repo, xs_repo = _run_repo(cfg)
    recs_ref, xs_ref = _run_ref(nn, nb, eo, disc, mps=mps)

    # commitment DECISIONS must agree exactly, step by step
    n_commits = 0
    for k, (a, b) in enumerate(zip(recs_repo, recs_ref)):
        assert a["event"] == b["event"], (k, a, b)
        assert a["found"] == b["found"], (k, a, b)
        assert a["nominal_committed"] == b["nominal_committed"], (k, a, b)
        assert a["using_backup"] == b["using_backup"], (k, a, b)
        np.testing.assert_allclose(a["u"], b["u"], atol=2e-4,
                                   err_msg=f"step {k}")
        n_commits += int(a["found"])

    # trajectories agree to f32 closed-loop tolerance
    assert np.max(np.abs(xs_repo - xs_ref)) < 2e-3

    # the scenario is non-trivial: the obstacle forces at least one
    # shortened commitment (backward search actually engaged)
    lens = [r["nominal_committed"] for r in recs_ref if r["found"]]
    assert n_commits > 3
    assert min(lens) < nn, lens

    # and safe throughout
    for k, xrow in enumerate(xs_ref[:-1]):
        assert not collide_np_world(xrow, k), k


def collide_np_world(x, k):
    obs_t = OBS0 + OBS_V * (k * DT)
    return np.linalg.norm(x[:2] - obs_t) < OBS_R + ROBOT_R


# ===================================================================
# Round-5 verdict item 4: reference-grade scenario parity.
# (a) the DRIFT pipeline — external MPCC prediction slicing as the nominal
#     candidate (gatekeeper.py:309-367; the MPCC->gatekeeper handoff of
#     test_drift.py:433-460) with a friction change mid-run;
# (b) the EVADE bullet with respawn wrap (evade_env.py:360-384).
# Both compare the repo's vmapped gatekeeper against sequential f64 NumPy
# models of the reference's semantics, sharing the same world trajectory
# (the repo's applied controls drive the plant; both models see identical
# inputs each step), so decision sequences must agree EXACTLY.
# ===================================================================


class RefGatekeeperExt:
    """The reference's sequential gatekeeper with an EXTERNAL nominal
    trajectory (slice semantics, gatekeeper.py:309-367) or a nominal
    policy, parameterized over dynamics/backup/collision callables."""

    def __init__(self, nn, nb, event_offset, discount, step_fn, backup_fn,
                 collide_fn):
        self.nn, self.nb = nn, nb
        self.event_offset, self.discount = event_offset, discount
        self.step_fn, self.backup_fn, self.collide_fn = (
            step_fn, backup_fn, collide_fn)
        self.L = nn + nb + 1
        self.committed_u = None
        self.committed_valid = 0
        self.time_idx = 0
        self.next_event_idx = 0
        self.nominal_committed = 0
        self.initialized = False

    def _backup_rollout(self, x0, n):
        xs, us = [np.asarray(x0, float)], []
        for _ in range(n):
            u = self.backup_fn(xs[-1])
            us.append(u)
            xs.append(self.step_fn(xs[-1], u))
        return xs, us

    def step(self, x, nom_x, nom_u):
        """One event-loop step.  ``nom_x`` (nn+1, n) / ``nom_u`` (nn, m) is
        the external MPC prediction to slice (:327-340)."""
        if not self.initialized:
            _, bu = self._backup_rollout(x, self.nb)
            self.committed_u = bu + [np.zeros_like(bu[0])] * (
                self.L - 1 - self.nb)
            self.committed_valid = self.nb
            self.time_idx = 0
            self.next_event_idx = 0
            self.nominal_committed = 0
            self.initialized = True

        event = self.time_idx >= self.next_event_idx
        found = False
        if event:
            n_cand = self.nn // self.discount + 2
            cand_lens = [max(self.nn - i * self.discount, 0)
                         for i in range(n_cand)]
            for length in cand_lens:  # longest-first (:589-652)
                if any(self.collide_fn(nom_x[k], k)
                       for k in range(length + 1)):
                    continue
                bx, bu = self._backup_rollout(nom_x[length], self.nb)
                if any(self.collide_fn(bx[j], length + j)
                       for j in range(self.nb + 1)):
                    continue
                found = True
                new_u = [np.asarray(r, float) for r in nom_u[:length]] + bu
                new_u += [np.zeros_like(new_u[0])] * (self.L - 1 - len(new_u))
                self.committed_u = new_u
                self.committed_valid = length + self.nb
                self.time_idx = 0
                self.next_event_idx = self.event_offset
                self.nominal_committed = length
                break
            if not found:
                self.next_event_idx = self.time_idx + self.event_offset

        if self.time_idx < self.L - 1 and self.time_idx < self.committed_valid:
            u = self.committed_u[self.time_idx]
        else:
            u = self.backup_fn(x)
        rec = dict(
            event=bool(event), found=bool(found),
            nominal_committed=int(self.nominal_committed),
            using_backup=bool(self.time_idx >= self.nominal_committed),
            u=np.asarray(u, float),
        )
        self.time_idx += 1
        return rec


# ---------------- f64 NumPy DriftingCar + lane-change backup ---------------
_G = 9.81


def _drift_consts(spec):
    return dict(
        a=float(spec.a_cg), b=float(spec.b_cg), m=float(spec.mass),
        izz=float(spec.izz), ccf=float(spec.cc_f), ccr=float(spec.cc_r),
        gam=float(spec.gamma_stab), rw=float(spec.r_w),
        r_max=float(spec.r_max), beta_max=float(spec.beta_max),
        v_min=float(spec.v_min), v_max=float(spec.v_max),
        delta_max=float(spec.delta_max), tau_max=float(spec.tau_max),
        delta_dot_max=float(spec.delta_dot_max),
        tau_dot_max=float(spec.tau_dot_max),
    )


def _drift_step_np(x, u, mu, P, dt):
    """f64 DriftingCar step (drifting_car.py:474-530 semantics: dynamics
    first, position integrated with NEXT r/beta/V and CURRENT theta)."""
    r, beta, V, delta, tau = x[3], x[4], x[5], x[6], x[7]
    V_safe = max(V, 0.1)
    Fz_f = P["m"] * _G * P["b"] / (P["a"] + P["b"])
    Fz_r = P["m"] * _G * P["a"] / (P["a"] + P["b"])
    alpha_f = np.arctan2(V * np.sin(beta) + P["a"] * r, V_safe * np.cos(beta)) - delta
    alpha_r = np.arctan2(V * np.sin(beta) - P["b"] * r, V_safe * np.cos(beta))
    Fx_f = 0.0
    F_lim = mu * Fz_r
    Fx_r = F_lim * np.tanh(tau / (P["rw"] * max(F_lim, 1.0)))

    def fy(alpha, Cc, Fz, Fx):
        Fy_max = np.sqrt(max((mu * Fz) ** 2 - P["gam"] * Fx**2, 1.0))
        alpha_sl = np.arctan(3.0 * Fy_max / Cc)
        ta = np.tan(alpha)
        lin = -Cc * ta + (Cc**2 / (3 * Fy_max)) * abs(ta) * ta - (
            Cc**3 / (27 * Fy_max**2)) * ta**3
        return lin if abs(alpha) < alpha_sl else -Fy_max * np.sign(alpha)

    Fy_f = fy(alpha_f, P["ccf"], Fz_f, Fx_f)
    Fy_r = fy(alpha_r, P["ccr"], Fz_r, Fx_r)
    r_dot = (P["a"] * (Fx_f * np.sin(delta) + Fy_f * np.cos(delta))
             - P["b"] * Fy_r) / P["izz"]
    beta_dot = (Fx_f * np.sin(delta - beta) + Fy_f * np.cos(delta - beta)
                - Fx_r * np.sin(beta) + Fy_r * np.cos(beta)) / (
        P["m"] * V_safe) - r
    V_dot = (Fx_f * np.cos(delta - beta) - Fy_f * np.sin(delta - beta)
             + Fx_r * np.cos(beta) + Fy_r * np.sin(beta)) / P["m"]
    dyn = np.array([r, beta, V, delta, tau]) + np.array(
        [r_dot, beta_dot, V_dot, u[0], u[1]]) * dt
    dyn = np.array([
        np.clip(dyn[0], -P["r_max"], P["r_max"]),
        np.clip(dyn[1], -P["beta_max"], P["beta_max"]),
        np.clip(dyn[2], P["v_min"], P["v_max"]),
        np.clip(dyn[3], -P["delta_max"], P["delta_max"]),
        np.clip(dyn[4], -P["tau_max"], P["tau_max"]),
    ])
    theta = x[2]
    r1, b1, V1 = dyn[0], dyn[1], dyn[2]
    xg = x[0] + V1 * np.cos(theta + b1) * dt
    yg = x[1] + V1 * np.sin(theta + b1) * dt
    th = (theta + r1 * dt + np.pi) % (2 * np.pi) - np.pi
    return np.concatenate([[xg, yg, th], dyn])


def _lane_change_np(x, target_y, gains):
    """f64 cascaded PD lane change (backup_controller.py:129-194)."""
    y, theta, r, beta, V, delta, tau = x[1], x[2], x[3], x[4], x[5], x[6], x[7]
    V = max(V, 0.1)
    ang = (theta + beta + np.pi) % (2 * np.pi) - np.pi
    vy = V * np.sin(ang)
    theta_des = np.arctan(gains["kp_y"] * (target_y - y) - gains["kd_y"] * vy)
    theta_des = np.clip(theta_des, -gains["theta_des_max"], gains["theta_des_max"])
    theta_err = (theta_des - ang + np.pi) % (2 * np.pi) - np.pi
    delta_des = np.clip(gains["kp_theta"] * theta_err - gains["kd_theta"] * r,
                        -gains["delta_max"], gains["delta_max"])
    delta_dot = np.clip(gains["kp_delta"] * (delta_des - delta),
                        -gains["delta_dot_max"], gains["delta_dot_max"])
    tau_des = np.clip(gains["kp_v"] * (gains["target_velocity"] - V),
                      -gains["tau_max"], gains["tau_max"])
    tau_dot = np.clip(gains["kp_tau_dot"] * (tau_des - tau),
                      -gains["tau_dot_max"], gains["tau_dot_max"])
    return np.array([delta_dot, tau_dot])


@pytest.mark.slow
def test_drift_pipeline_parity():
    """MPCC->gatekeeper handoff parity with a friction change mid-run.

    The repo's full drift pipeline runs closed loop (MPCC solve -> external
    nominal slice -> gatekeeper -> plant).  At every step the gatekeeper's
    INPUTS (state, sliced MPCC prediction, plant friction) are recorded and
    replayed through the sequential f64 NumPy reference model: slicing
    semantics per gatekeeper.py:309-367, f64 Fiala-tire backup rollouts at
    the PLANT friction (the test_drift.py:438-441 fault-injection wiring).
    Decision sequences must agree exactly; emitted controls to f32."""
    import math as _math

    from safe_control_tpu.core.spec import DRIFTING_CAR
    from safe_control_tpu.envs.drifting_env import DriftingEnv
    from safe_control_tpu.shielding import backup as bk
    from safe_control_tpu.solvers import mpcc

    dt = 0.05
    spec = make_spec(
        DRIFTING_CAR,
        a_cg=1.4, b_cg=1.4, wheel_base=2.8, body_length=4.5, body_width=2.0,
        radius=1.2, mass=2500.0, izz=5000.0, cc_f=80000.0, cc_r=100000.0,
        mu=1.0, r_w=0.35, gamma_stab=0.95,
        delta_max=_math.radians(20), delta_dot_max=_math.radians(25),
        tau_max=4000.0, tau_dot_max=8000.0,
        v_max=20.0, v_min=0.0, r_max=2.0, beta_max=_math.radians(45),
    )
    model = get_model(DRIFTING_CAR)
    env = DriftingEnv("straight", track_width=20.0, track_length=300.0,
                      num_lanes=5)
    ego_y = env.get_lane_center(1)
    backup_y = env.get_lane_center(3)
    env.add_dynamic_obstacle_car(45.0, ego_y, 0.0, 2.0, 0.0, radius=1.0)
    # mild puddle in the ego lane: the PLANT friction drops mid-run, so the
    # gatekeeper's backup rollouts change model while the MPCC keeps mu=1
    env.add_puddle(22.0, ego_y, 6.0, 0.6)

    sx = np.linspace(0.0, 300.0, 601)
    path = mpcc.make_path(sx, np.full_like(sx, ego_y))
    mcfg = mpcc.MPCCConfig(horizon=20, v_ref=10.0)
    nn, nb, eo, disc = 20, 40, 5, 5
    gcfg = gk_mod.GatekeeperConfig(
        model_name=DRIFTING_CAR, dt=dt, nominal_steps=nn, backup_steps=nb,
        event_offset_steps=eo, discount_steps=disc,
    )
    radius, margin = float(spec.radius), 0.25
    gains = bk.LaneChangeGains(
        target_velocity=10.0,
        delta_max=float(spec.delta_max), delta_dot_max=float(spec.delta_dot_max),
        tau_max=float(spec.tau_max), tau_dot_max=float(spec.tau_dot_max),
    )

    @jax.jit
    def pipeline_step(mstate, gstate, x, u_prev, mu_plant, t_idx):
        plant = spec.replace(mu=mu_plant)
        mres = mpcc.solve(spec, x, path, mstate, u_prev, dt, mcfg)

        def coll(xx, k):
            t = (t_idx + k) * dt
            return env.check_collision(xx[:2], radius) | \
                env.check_obstacle_collision(xx[:2], radius + margin, t)

        out = gk_mod.step(
            gcfg, plant, gstate, x,
            lambda xx: bk.lane_change(xx, backup_y, plant, gains),
            coll,
            nominal_traj=(mres.xs[: nn + 1, :8], mres.us[:nn, :2]),
        )
        x1 = model.step(x, out.u, plant, dt)
        return mres.state, out, x1, (mres.xs[: nn + 1, :8], mres.us[:nn, :2])

    # f64 reference model pieces
    P = _drift_consts(spec)
    gnp = dict(
        kp_y=0.25, kd_y=0.3, kp_theta=1.2, kd_theta=1.0, kp_delta=2.5,
        kp_v=500.0, kp_tau_dot=2.0, target_velocity=10.0,
        theta_des_max=_math.radians(20.0),
        delta_max=float(spec.delta_max), delta_dot_max=float(spec.delta_dot_max),
        tau_max=float(spec.tau_max), tau_dot_max=float(spec.tau_dot_max),
    )
    centerline = np.asarray(env.centerline, float)
    cars0 = np.asarray(env.obstacle_cars, float)
    puddles = np.asarray(env.puddles, float)

    def collide_np(xx, t):
        pos = np.asarray(xx[:2], float)
        d = np.min(np.hypot(centerline[:, 0] - pos[0], centerline[:, 1] - pos[1]))
        if d + radius > env.track_width / 2.0:
            return True
        cx = cars0[:, 0] + cars0[:, 3] * t
        cy = cars0[:, 1] + cars0[:, 4] * t
        dc = np.hypot(pos[0] - cx, pos[1] - cy)
        return bool(np.any((dc < radius + margin + cars0[:, 5]) & (cars0[:, 5] > 0)))

    def friction_np(pos):
        d = np.hypot(pos[0] - puddles[:, 0], pos[1] - puddles[:, 1])
        inside = (d <= puddles[:, 2]) & (puddles[:, 2] > 0)
        return float(puddles[inside][0, 3]) if inside.any() else 1.0

    x = jnp.asarray([1.0, ego_y, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0], jnp.float32)
    mstate = mpcc.init_state(mcfg)
    gstate = gk_mod.init_state(gcfg)
    u_prev = jnp.zeros(2, jnp.float32)
    ref = None  # created on first step (needs mu-closure rebuilt per step)
    recs_repo, recs_ref, mus = [], [], []
    n_steps = 140
    state_np = None
    for k in range(n_steps):
        mu = friction_np(np.asarray(x[:2], float))
        mus.append(mu)

        # f64 reference step with THIS step's plant friction + time origin
        def step_fn(xx, uu, _mu=mu):
            return _drift_step_np(xx, uu, _mu, P, dt)

        def backup_fn(xx):
            return _lane_change_np(xx, backup_y, gnp)

        def coll_fn(xx, j, _k=k):
            return collide_np(xx, (_k + j) * dt)

        if ref is None:
            ref = RefGatekeeperExt(nn, nb, eo, disc, step_fn, backup_fn,
                                   coll_fn)
        else:
            ref.step_fn, ref.backup_fn, ref.collide_fn = (
                step_fn, backup_fn, coll_fn)

        mstate, out, x1, nom = pipeline_step(
            mstate, gstate, x, u_prev, jnp.asarray(mu, jnp.float32),
            jnp.asarray(k, jnp.float32),
        )
        gstate = out.state
        rec_np = ref.step(
            np.asarray(x, float), np.asarray(nom[0], float),
            np.asarray(nom[1], float),
        )
        recs_repo.append(dict(
            event=bool(out.event_fired), found=bool(out.candidate_found),
            nominal_committed=int(out.state.nominal_steps_committed),
            using_backup=bool(out.using_backup), u=np.asarray(out.u, float),
        ))
        recs_ref.append(rec_np)
        u_prev = out.u
        x = x1

    # the scenario must exercise the handoff machinery: friction actually
    # changed, and the obstacle forced at least one shortened commitment
    assert min(mus) < 1.0 < max(mus) + 1e-9, "puddle never entered"
    lens = [r["nominal_committed"] for r in recs_ref if r["found"]]
    assert lens and min(lens) < nn, lens

    for k, (a, b) in enumerate(zip(recs_repo, recs_ref)):
        assert a["event"] == b["event"], (k, a, b)
        assert a["found"] == b["found"], (k, a, b)
        assert a["nominal_committed"] == b["nominal_committed"], (k, a, b)
        assert a["using_backup"] == b["using_backup"], (k, a, b)
        np.testing.assert_allclose(
            a["u"], b["u"],
            atol=2e-3 * max(1.0, float(np.max(np.abs(b["u"])))),
            err_msg=f"step {k}")


@pytest.mark.slow
def test_evade_bullet_respawn_parity():
    """Evade-scenario parity THROUGH a bullet respawn (evade_env.py:360-384):
    the world bullet wraps back to its spawn x mid-run, discontinuously
    changing the constant-velocity prediction (test_evade.py:373-383) that
    both gatekeepers validate against.  Decision sequences must agree
    exactly across the respawn; controls to f32 tolerance."""
    from safe_control_tpu.envs.evade_env import EvadeEnv
    from safe_control_tpu.shielding import backup as bk

    dt = 0.1
    env = EvadeEnv(
        hallway_length=40.0, hallway_width=4.0, pocket_x=16.0,
        pocket_length=10.0, pocket_width=4.0, goal_length=5.0,
        bullet_speed=3.0, bullet_width=4.0, bullet_length=3.0,
        bullet_start_x=-10.0,
    )
    spec = make_spec(DOUBLE_INTEGRATOR_2D, radius=0.5, a_max=2.0, v_max=1.5)
    model = get_model(DOUBLE_INTEGRATOR_2D)
    smargin = 0.5
    ecfg = bk.EvadeConfig(
        pocket_center=env.pocket_center,
        pocket_x_min=env.pocket_x_min, pocket_x_max=env.pocket_x_max,
        pocket_y_min=env.pocket_y_min, pocket_y_max=env.pocket_y_max,
        goal_x_min=env.goal_x_min, goal_x_max=env.goal_x_max,
        goal_y_min=-env.half_width, goal_y_max=env.half_width, has_goal=True,
    )
    nn, nb, eo, disc = 60, 80, 2, 5
    cfg = gk_mod.GatekeeperConfig(
        model_name=DOUBLE_INTEGRATOR_2D, dt=dt, nominal_steps=nn,
        backup_steps=nb, event_offset_steps=eo, discount_steps=disc,
    )
    a_max, v_max, rr = float(spec.a_max), float(spec.v_max), float(spec.radius)

    def nominal_policy(x):
        ax = 2.0 * (v_max - x[2])
        ay = 2.0 * (0.0 - x[1]) + 2.0 * (0.0 - x[3])
        a = jnp.array([ax, ay])
        mag = jnp.linalg.norm(a)
        return a * jnp.where(mag > a_max, a_max / jnp.maximum(mag, 1e-9), 1.0)

    def backup_policy(x):
        return bk.evade(x, ecfg, spec)

    @jax.jit
    def sim_step(gstate, x, bullet_x):
        def collision_fn(sv, t_idx):
            b_x = bullet_x + env.bullet_speed * t_idx * dt
            return env.check_collision(sv[:2], rr) | env.check_bullet_collision(
                sv[:2], rr + smargin, b_x)

        out = gk_mod.step(cfg, spec, gstate, x, backup_policy, collision_fn,
                          nominal_policy=nominal_policy)
        return out, model.step(x, out.u, spec, dt)

    # --------- f64 NumPy pieces (reference semantics, loop-based) ---------
    pc = np.asarray(env.pocket_center, float)
    pxn, pxx = float(env.pocket_x_min), float(env.pocket_x_max)
    pyn, pyx = float(env.pocket_y_min), float(env.pocket_y_max)
    gxn, gxx = float(env.goal_x_min), float(env.goal_x_max)
    hw, hl = float(env.half_width), float(env.hallway_length)
    blen, bw = float(env.bullet_length), float(env.bullet_width)

    def step_np(x, u):
        x = x + np.array([x[2], x[3], u[0], u[1]]) * dt
        vm = np.hypot(x[2], x[3])
        if vm > v_max:
            x = x.copy()
            x[2:4] *= v_max / vm
        return x

    def nominal_np(x):
        a = np.array([2.0 * (v_max - x[2]), -2.0 * x[1] - 2.0 * x[3]])
        m = np.hypot(*a)
        return a * (a_max / m if m > a_max else 1.0)

    def evade_np(x):
        """f64 phased PD evade (backup_controller.py:456-570)."""
        px, py, vx, vy = x
        margin = rr + 0.1
        in_goal = gxn <= px <= gxx and -hw <= py <= hw
        if in_goal:
            a = np.array([-2.0 * vx, -2.0 * vy])
        elif (pxn + margin <= px <= pxx - margin
              and pyn + margin <= py <= pyx - margin
              and np.hypot(px - pc[0], py - pc[1]) < 1.0):
            a = np.array([-2.0 * vx, -2.0 * vy])
        elif pxn - 2.0 <= px <= pxx + 2.0:
            if pxn + margin <= px <= pxx - margin:
                a = np.array([2.0 * (pc[0] - px) - 2.0 * vx,
                              2.0 * (pc[1] - py) - 2.0 * vy])
            else:
                ty = max(py, 3.0) if py > pyn else 0.0
                a = np.array([2.0 * (pc[0] - px) - 2.0 * vx,
                              2.0 * (ty - py) - 2.0 * vy])
        else:
            ty = max(py, 3.0) if (py > pyn and px > pxx) else 0.0
            ex = pc[0] - px
            a = np.array([2.0 * np.sign(ex) * min(abs(ex), 3.0) - 2.0 * vx,
                          2.0 * (ty - py) - 2.0 * vy])
        m = np.hypot(*a)
        return a * (a_max / m if m > a_max else 1.0)

    def boundary_np(p, r):
        x, y = p
        if y - r < -hw or x - r < 0.0 or x + r > hl:
            return True
        if y + r > hw:
            if pxn <= x <= pxx:
                return (y + r > pyx) or (x - r < pxn and y > hw) or (
                    x + r > pxx and y > hw)
            return True
        return False

    def bullet_np(p, r, bx):
        x, y = p
        cx = min(max(x, bx - blen / 2.0), bx + blen / 2.0 + blen / 3.0)
        cy = min(max(y, -bw / 2.0), bw / 2.0)
        return np.hypot(x - cx, y - cy) < r

    ref = RefGatekeeperExt(nn, nb, eo, disc, step_np, evade_np, None)

    gstate = gk_mod.init_state(cfg)
    x = jnp.array([12.0, 0.0, 0.0, 0.0], jnp.float32)
    bullet_x = float(env.bullet_start_x)
    respawns = 0
    recs_repo, recs_ref = [], []
    for k in range(300):
        def coll_fn(sv, j, _bx=bullet_x):
            b_x = _bx + float(env.bullet_speed) * j * dt
            p = np.asarray(sv[:2], float)
            return boundary_np(p, rr) or bullet_np(p, rr + smargin, b_x)

        ref.collide_fn = coll_fn
        # the reference rolls the nominal closed loop at each event
        # (gatekeeper.py:341-367); precompute it for the slicing interface
        x_np = np.asarray(x, float)
        nom_x, nom_u = [x_np], []
        for _ in range(nn):
            u = nominal_np(nom_x[-1])
            nom_u.append(u)
            nom_x.append(step_np(nom_x[-1], u))

        out, x1 = sim_step(gstate, x, jnp.asarray(bullet_x, jnp.float32))
        rec_np = ref.step(x_np, nom_x, nom_u)
        recs_repo.append(dict(
            event=bool(out.event_fired), found=bool(out.candidate_found),
            nominal_committed=int(out.state.nominal_steps_committed),
            using_backup=bool(out.using_backup), u=np.asarray(out.u, float),
        ))
        recs_ref.append(rec_np)
        gstate, x = out.state, x1
        bullet_x += float(env.bullet_speed) * dt
        if bullet_x > hl + blen:  # world respawn (evade_env.py:375-379)
            bullet_x = float(env.bullet_start_x)
            respawns += 1
        if bool(env.check_goal_reached(jnp.asarray(x[:2]))):
            break

    assert respawns >= 1, "bullet never respawned — scenario too short"
    assert any(r["using_backup"] for r in recs_repo), "backup never engaged"

    for k, (a, b) in enumerate(zip(recs_repo, recs_ref)):
        assert a["event"] == b["event"], (k, a, b)
        assert a["found"] == b["found"], (k, a, b)
        assert a["nominal_committed"] == b["nominal_committed"], (k, a, b)
        assert a["using_backup"] == b["using_backup"], (k, a, b)
        np.testing.assert_allclose(a["u"], b["u"], atol=5e-4,
                                   err_msg=f"step {k}")
