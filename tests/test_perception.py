"""Perception tests: FoV detection, obstacle memory, occupancy footprint."""

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_tpu.core.spec import DOUBLE_INTEGRATOR_2D, make_spec
from safe_control_tpu.core.types import pad_obstacles
from safe_control_tpu.perception import fov as fov_mod
from safe_control_tpu.perception import grid as grid_mod

SPEC = make_spec(DOUBLE_INTEGRATOR_2D)  # fov 70 deg, cam_range 3


def test_fov_detection_semantics():
    """utils/detection.py:28-43 circle-sector intersection."""
    pos = jnp.array([0.0, 0.0])
    # dead ahead, in range
    assert bool(
        fov_mod.circle_intersects_fov(pos, 0.0, SPEC.fov_angle, SPEC.cam_range,
                                      jnp.array([2.0, 0.0]), 0.3)
    )
    # behind
    assert not bool(
        fov_mod.circle_intersects_fov(pos, 0.0, SPEC.fov_angle, SPEC.cam_range,
                                      jnp.array([-2.0, 0.0]), 0.3)
    )
    # out of range
    assert not bool(
        fov_mod.circle_intersects_fov(pos, 0.0, SPEC.fov_angle, SPEC.cam_range,
                                      jnp.array([5.0, 0.0]), 0.3)
    )
    # angular-radius widening: center outside cone but disc edge inside
    ang = SPEC.fov_angle / 2 + 0.05
    c = 2.0 * jnp.array([jnp.cos(ang), jnp.sin(ang)])
    assert bool(
        fov_mod.circle_intersects_fov(pos, 0.0, SPEC.fov_angle, SPEC.cam_range, c, 0.5)
    )
    # robot inside the obstacle counts as detected (:31-32)
    assert bool(
        fov_mod.circle_intersects_fov(pos, 0.0, SPEC.fov_angle, SPEC.cam_range,
                                      jnp.array([0.1, 0.0]), 0.5)
    )


def test_superellipsoid_circularized_on_detection():
    obs = jnp.array([1.5, 0.0, 0.6, 0.9, 2.0, 0.3, 1.0])
    out = fov_mod.circularize(obs)
    np.testing.assert_allclose(np.asarray(out), [1.5, 0.0, 0.9, 0, 0, 0, 0], atol=1e-6)


def test_memory_merge_dedup_and_persistence():
    mem = fov_mod.init_memory(4)
    det = pad_obstacles(jnp.asarray([[1.0, 1.0, 0.3, 0, 0, 0, 0]]), 4)
    mask = jnp.array([True, False, False, False])
    mem = fov_mod.merge_memory(mem, det, mask)
    assert int(mem.valid.sum()) == 1
    # same obstacle again -> no new slot
    mem = fov_mod.merge_memory(mem, det, mask)
    assert int(mem.valid.sum()) == 1
    # different obstacle -> second slot
    det2 = pad_obstacles(jnp.asarray([[3.0, 1.0, 0.4, 0, 0, 0, 0]]), 4)
    mem = fov_mod.merge_memory(mem, det2, mask)
    assert int(mem.valid.sum()) == 2
    # memory persists regardless of current FoV (the reference's
    # persistent_fov semantics, robot.py:810-816)


def test_footprint_grows_and_coverage():
    gs = grid_mod.GridSpec(width=10.0, height=10.0, resolution=0.1)
    fp = grid_mod.empty_footprint(gs)
    pos = jnp.array([5.0, 5.0])
    fp = grid_mod.update_footprint(fp, gs, pos, 0.0, SPEC)
    n1 = int(fp.sum())
    assert n1 > 0
    # point ahead inside the cone is covered; behind is not
    assert not bool(grid_mod.is_beyond_footprint(fp, gs, jnp.array([6.0, 5.0])))
    assert bool(grid_mod.is_beyond_footprint(fp, gs, jnp.array([3.0, 5.0])))
    # turning around adds area (union behavior)
    fp = grid_mod.update_footprint(fp, gs, pos, jnp.pi, SPEC)
    assert int(fp.sum()) > n1
    assert not bool(grid_mod.is_beyond_footprint(fp, gs, jnp.array([3.5, 5.0])))


def test_safety_area_tube_and_violation():
    gs = grid_mod.GridSpec(width=10.0, height=10.0, resolution=0.1)
    pos = jnp.array([5.0, 5.0])
    # the reference seeds the footprint with a 2x-radius disk (robot.py:341-351)
    fp = grid_mod.init_footprint(gs, pos, SPEC)
    fp = grid_mod.update_footprint(fp, gs, pos, 0.0, SPEC)
    # moving forward at 1 m/s with a_max 1: braking distance 0.5 -> tube
    # inside the FoV -> no violation
    tube = grid_mod.safety_area_mask(
        gs, pos, 0.0, None, None, SPEC, 0.05, max_decel=1.0,
        integrator=True, vel=jnp.array([1.0, 0.0]),
    )
    assert not bool(grid_mod.is_beyond_footprint(fp, gs, pos, safety_mask=tube))
    # moving backward (unseen area) -> violation
    tube_back = grid_mod.safety_area_mask(
        gs, pos, 0.0, None, None, SPEC, 0.05, max_decel=1.0,
        integrator=True, vel=jnp.array([-2.0, 0.0]),
    )
    assert bool(grid_mod.is_beyond_footprint(fp, gs, pos, safety_mask=tube_back))


def test_braking_arc_curves():
    pts = np.asarray(
        grid_mod.braking_arc_points(
            jnp.array([0.0, 0.0]), 0.0, 1.0, 0.5, SPEC, 0.05, 1.0, 1.0
        )
    )
    assert pts.shape[0] == 33
    # arc bends left (positive yaw rate)
    assert pts[-1, 1] > 0.01
    # decelerating: consecutive step lengths shrink
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert seg[0] > seg[15]


def test_ray_detection_mode():
    """Legacy 'ray' detection (utils/detection.py:90-132 analog): only
    obstacles overlapping the sensing footprint are detected, with a circle
    fitted to the visible extreme points."""
    gs = grid_mod.GridSpec(width=10.0, height=10.0, resolution=0.1)
    pos = jnp.array([5.0, 5.0])
    fp = grid_mod.init_footprint(gs, pos, SPEC)
    fp = grid_mod.update_footprint(fp, gs, pos, 0.0, SPEC)  # cone toward +x
    obs = pad_obstacles(
        jnp.asarray([[7.0, 5.0, 0.5, 0, 0, 0, 0], [3.0, 5.0, 0.4, 0, 0, 0, 0]]), 4
    )
    det, mask = fov_mod.detect_unknown_obs_ray(pos, obs, fp, gs)
    m = np.asarray(mask)
    assert m[0] and not m[1] and not m[2:].any()
    fitted = np.asarray(det[0])
    # fitted circle is near the true one, biased toward the visible side
    assert abs(fitted[1] - 5.0) < 0.1
    assert 6.3 < fitted[0] <= 7.05
    assert 0.2 < fitted[2] <= 0.55
