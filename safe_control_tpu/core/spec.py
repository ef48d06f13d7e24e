"""Robot specification pytree.

The reference (``/root/reference``) passes a mutable ``robot_spec`` dict around
and each class calls ``setdefault`` on it (e.g. robots/dynamic_unicycle2D.py:36-40,
robots/kinematic_bicycle2D.py:42-53, position_control/cbf_qp.py:12-43,
position_control/mpc_cbf.py:19-95).  Here the same configuration surface is a
single frozen pytree: every *numeric* field is a JAX scalar (so specs can be
``vmap``-ed for heterogeneous Monte-Carlo sweeps) while the model name is a
static aux field (so ``jit`` specializes per model).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

# Canonical model names (match the reference's robot_spec['model'] strings,
# tracking.py:60-99).
SINGLE_INTEGRATOR_2D = "SingleIntegrator2D"
DOUBLE_INTEGRATOR_2D = "DoubleIntegrator2D"
UNICYCLE_2D = "Unicycle2D"
DYNAMIC_UNICYCLE_2D = "DynamicUnicycle2D"
KINEMATIC_BICYCLE_2D = "KinematicBicycle2D"
KINEMATIC_BICYCLE_2D_C3BF = "KinematicBicycle2D_C3BF"
KINEMATIC_BICYCLE_2D_DPCBF = "KinematicBicycle2D_DPCBF"
QUAD_2D = "Quad2D"
QUAD_3D = "Quad3D"
VTOL_2D = "VTOL2D"
DYNAMIC_BICYCLE_2D = "DynamicBicycle2D"
DRIFTING_CAR = "DriftingCar"
MANIPULATOR_2D = "Manipulator2D"


def _beta_from_delta(delta: float, wheel_base: float, rear_ax_dist: float) -> float:
    """Slip angle from steering angle (kinematic_bicycle2D.py:55-59)."""
    return math.atan((rear_ax_dist / wheel_base) * math.tan(delta))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotSpec:
    """Superset of all per-model numeric parameters.

    Numeric fields are pytree leaves (floats or JAX scalars); ``model`` is
    static metadata.  Defaults mirror the reference's ``setdefault`` chains.
    """

    model: str = dataclasses.field(metadata=dict(static=True))

    # Geometry / limits (shared)
    radius: float = 0.25
    v_max: float = 1.0
    v_min: float = 0.0
    w_max: float = 0.5
    a_max: float = 1.0
    ax_max: float = 1.0
    ay_max: float = 1.0

    # Kinematic bicycle family
    wheel_base: float = 0.4
    body_width: float = 0.3
    front_ax_dist: float = 0.2
    rear_ax_dist: float = 0.2
    delta_max: float = math.radians(32.0)
    beta_max: float = _beta_from_delta(math.radians(32.0), 0.4, 0.2)

    # Quad2D / Quad3D / VTOL
    f_min: float = 3.0
    f_max: float = 10.0
    u_min: float = 0.0
    u_max: float = 10.0
    mass: float = 1.0
    inertia: float = 0.01
    throttle_min: float = 0.0
    throttle_max: float = 1.0
    elevator_min: float = -0.5
    elevator_max: float = 0.5
    descent_speed_max: float = 2.0
    pitch_max: float = 30.0  # degrees (VTOL), matches reference spec units

    # Manipulator2D
    link_lengths: float = 1.5
    kp: float = 5.0

    # Nominal-controller gains (robot_spec overrides in the reference, e.g.
    # dynamic_unicycle2D.py:84-86)
    nominal_k_v: float = 1.0
    nominal_k_a: float = 1.0
    nominal_k_omega: float = 2.0

    # Continuous-time CBF gains (cbf_qp.py:12-43)
    cbf_alpha: float = 1.0
    cbf_alpha1: float = 1.5
    cbf_alpha2: float = 1.5
    cbf_beta: float = 1.01  # barrier margin multiplier on d_min^2

    # Discrete-time (MPC) CBF gains (mpc_cbf.py:49-95)
    mpc_cbf_alpha: float = 0.05
    mpc_cbf_alpha1: float = 0.15
    mpc_cbf_alpha2: float = 0.15

    # Tracking orchestration
    reached_threshold: float = 0.3

    # Perception (FoV sensing, robots/robot.py)
    fov_angle: float = math.radians(70.0)
    cam_range: float = 3.0

    def replace(self, **kwargs: Any) -> "RobotSpec":
        return dataclasses.replace(self, **kwargs)


# Per-model default overrides, mirroring each reference model's setdefault
# block plus the per-model CBF gain tables in cbf_qp.py:12-35 and
# mpc_cbf.py:49-88.
_MODEL_DEFAULTS: Dict[str, Dict[str, float]] = {
    SINGLE_INTEGRATOR_2D: dict(
        v_max=1.0, w_max=0.5, cbf_alpha=1.0, mpc_cbf_alpha=0.05
    ),
    DOUBLE_INTEGRATOR_2D: dict(
        a_max=1.0, v_max=1.0, ax_max=1.0, ay_max=1.0, w_max=0.5,
        cbf_alpha1=1.5, cbf_alpha2=1.5, mpc_cbf_alpha1=0.2, mpc_cbf_alpha2=0.2,
    ),
    UNICYCLE_2D: dict(v_max=1.0, w_max=0.5, cbf_alpha=1.0, mpc_cbf_alpha=0.05),
    DYNAMIC_UNICYCLE_2D: dict(
        a_max=0.5, w_max=0.5, v_max=1.0,
        cbf_alpha1=1.5, cbf_alpha2=1.5, mpc_cbf_alpha1=0.15, mpc_cbf_alpha2=0.15,
    ),
    KINEMATIC_BICYCLE_2D: dict(
        wheel_base=0.4, body_width=0.3, radius=0.3, front_ax_dist=0.2,
        rear_ax_dist=0.2, v_max=3.5, a_max=5.0, v_min=0.2,
        cbf_alpha1=1.5, cbf_alpha2=1.5, cbf_beta=1.1,
        mpc_cbf_alpha1=0.1, mpc_cbf_alpha2=0.1,
    ),
    KINEMATIC_BICYCLE_2D_C3BF: dict(
        wheel_base=0.4, body_width=0.3, radius=0.3, front_ax_dist=0.2,
        rear_ax_dist=0.2, v_max=3.5, a_max=5.0, v_min=0.2,
        cbf_alpha=1.5, mpc_cbf_alpha=0.15, cbf_beta=1.1,
    ),
    KINEMATIC_BICYCLE_2D_DPCBF: dict(
        wheel_base=0.4, body_width=0.3, radius=0.3, front_ax_dist=0.2,
        rear_ax_dist=0.2, v_max=3.5, a_max=5.0, v_min=0.2,
        cbf_alpha=1.5, mpc_cbf_alpha=0.15, cbf_beta=1.1,
    ),
    QUAD_2D: dict(
        f_min=3.0, f_max=10.0, mass=1.0, inertia=0.01,
        cbf_alpha1=1.5, cbf_alpha2=1.5, mpc_cbf_alpha1=0.15, mpc_cbf_alpha2=0.15,
    ),
    QUAD_3D: dict(u_min=0.0, u_max=10.0, cbf_alpha=1.5, mpc_cbf_alpha=0.15),
    VTOL_2D: dict(
        v_max=20.0, pitch_max=30.0, descent_speed_max=2.0,
        cbf_alpha1=1.5, cbf_alpha2=1.5, mpc_cbf_alpha1=0.05, mpc_cbf_alpha2=0.05,
        reached_threshold=3.0,
    ),
    MANIPULATOR_2D: dict(w_max=2.0, kp=5.0, cbf_alpha=1.0),
}


def make_spec(model: str, **overrides: Any) -> RobotSpec:
    """Build a :class:`RobotSpec` for ``model`` with reference defaults.

    ``overrides`` play the role of the reference's user-supplied robot_spec
    entries (e.g. ``cbf_alpha1=...`` or ``mpc_horizon`` handled by controllers).
    """
    params: Dict[str, Any] = dict(_MODEL_DEFAULTS.get(model, {}))
    # 'a_max' override implies ax/ay (double_integrator2D.py:42-43).
    if "a_max" in overrides and model == DOUBLE_INTEGRATOR_2D:
        overrides.setdefault("ax_max", overrides["a_max"])
        overrides.setdefault("ay_max", overrides["a_max"])
    if model.startswith("KinematicBicycle2D"):
        delta_max = overrides.get("delta_max", params.get("delta_max", math.radians(32.0)))
        wb = overrides.get("wheel_base", params.get("wheel_base", 0.4))
        rd = overrides.get("rear_ax_dist", params.get("rear_ax_dist", 0.2))
        overrides.setdefault("beta_max", _beta_from_delta(delta_max, wb, rd))
    params.update(overrides)
    valid = {f.name for f in dataclasses.fields(RobotSpec)}
    params = {k: v for k, v in params.items() if k in valid}
    return RobotSpec(model=model, **params)
