"""Tests for GT-trajectory and map-interpolated rig initialization
(reference InitRigs.cpp:58-400, InitRescaling.cpp:23-123)."""

import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.pipeline import init_rigs as ir
from visual_inertial_bundle_adjustment_tpu.pipeline.session_data import (
    _q_conj,
    _q_mul,
    _q_rot,
    _se3_inv,
    _se3_mul,
)


def _rand_quat(rng, scale=1.0):
    r = rng.normal(size=3) * scale
    return ir._so3_exp(r)


def _gt_world_poses(R, rng):
    """T_world_body (q_wb maps body->world) along a curvy walk."""
    ts = np.arange(R) * 100_000  # 10 Hz in us
    t = np.cumsum(rng.normal(size=(R, 3)) * 0.05, axis=0) + [0, 0, 1.0]
    q = np.stack([_rand_quat(rng, 0.2) for _ in range(R)])
    return ts, q, t


def _to_body_world(q_wb, t_wb):
    """T_world_body -> T_bodyImu_world arrays."""
    q, t = [], []
    for i in range(len(q_wb)):
        qi, ti = _se3_inv(q_wb[i], t_wb[i])
        q.append(qi)
        t.append(ti)
    return np.stack(q), np.stack(t)


def test_so3_log_exp_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        r = rng.normal(size=3)
        r = r / np.linalg.norm(r) * rng.uniform(0.0, 3.1)  # principal range
        q = ir._so3_exp(r)
        np.testing.assert_allclose(ir._so3_log(q), r, atol=1e-9)
        # beyond pi: exp(log(q)) must reproduce the same rotation (+-q)
        r_big = r * 2.5
        qb = ir._so3_exp(r_big)
        qb2 = ir._so3_exp(ir._so3_log(qb))
        np.testing.assert_allclose(np.abs(np.dot(qb, qb2)), 1.0, atol=1e-9)


def test_se3_interpolate_endpoints_and_midpoint():
    rng = np.random.default_rng(1)
    qa, ta = _rand_quat(rng), rng.normal(size=3)
    qb, tb = _rand_quat(rng), rng.normal(size=3)
    q0, t0 = ir._se3_interpolate(qa, ta, qb, tb, 0.0)
    np.testing.assert_allclose(t0, ta, atol=1e-12)
    np.testing.assert_allclose(np.abs(np.dot(q0, qa)), 1.0, atol=1e-12)
    q1, t1 = ir._se3_interpolate(qa, ta, qb, tb, 1.0)
    np.testing.assert_allclose(t1, tb, atol=1e-10)
    np.testing.assert_allclose(np.abs(np.dot(q1, qb)), 1.0, atol=1e-10)
    # midpoint of interpolation composed twice = full delta
    qm, tm = ir._se3_interpolate(qa, ta, qb, tb, 0.5)
    qm2, tm2 = ir._se3_interpolate(qm, tm, qb, tb, 1.0)
    np.testing.assert_allclose(tm2, tb, atol=1e-10)


def test_key_rig_init_ref_ranges_and_resets():
    # keyrigs at 5, 40, 44 with a reset at rig 42 and grow 3
    rig_to_kr, ranges = ir.compute_key_rig_init_ref(
        [5, 40, 44], num_rigs=60, reset_rig_indices=[42], rig_window_grow=3
    )
    assert rig_to_kr == {5: 0, 40: 1, 44: 2}
    # 5 -> 40 distance > 3*grow: split; 40 -> 44 has a reset in between: split
    assert len(ranges) == 3
    s0, e0 = ranges[0]
    assert s0 == 2 and e0 == 9  # grow down/up by 3 around 5
    s1, e1 = ranges[1]
    assert s1 == 37  # grow down from 40
    assert e1 == 43  # grow up from 40 stops at reset rig 42
    s2, e2 = ranges[2]
    assert s2 == 43 and e2 == 48  # grow down from 44 stops at the reset (42)


def test_key_rig_init_ref_same_interval_merges():
    _, ranges = ir.compute_key_rig_init_ref(
        [5, 40], num_rigs=60, rig_window_grow=3, same_interval=[7, 7]
    )
    assert len(ranges) == 1  # same interval: never split


def test_interpolated_trajectory_and_gt_init():
    rng = np.random.default_rng(2)
    R = 40
    ts, q_wb, t_wb = _gt_world_poses(R, rng)
    gt_q, gt_t = _to_body_world(q_wb, t_wb)
    vel_w = rng.normal(size=(R, 3))
    omega = rng.normal(size=(R, 3))
    traj = ir.InterpolatedTrajectory(ts, gt_q, gt_t, vel_w, omega)

    # exact on the nodes
    q, t = traj.T_bodyImu_world(int(ts[7]))
    np.testing.assert_allclose(t, gt_t[7], atol=1e-10)

    # noisy initial states are replaced by GT
    noisy_q = np.stack([_q_mul(_rand_quat(rng, 0.05), gt_q[i]) for i in range(R)])
    noisy_t = gt_t + rng.normal(size=(R, 3)) * 0.1
    pq, pt, v, om = ir.init_rigs_from_gt(
        noisy_q, noisy_t, vel_w, omega, ts, traj,
        pose_to_gt=True, vel_to_gt=True, omega_to_gt=True,
    )
    np.testing.assert_allclose(pt, gt_t, atol=1e-9)
    np.testing.assert_allclose(v, vel_w, atol=1e-9)
    np.testing.assert_allclose(om, omega, atol=1e-12)


def test_map_interpolated_init_recovers_map_frame_and_scale():
    """A 'trajectory' that is a uniformly scaled + rotated copy of the map:
    interpolation must land matched rigs exactly on the map poses and
    rescale velocities by ~1/scale."""
    rng = np.random.default_rng(3)
    R = 80
    ts = np.arange(R) * 100_000
    # map world positions: a large loop (baseline > 4 m so scaling kicks in)
    ang = np.linspace(0, 2 * np.pi, R)
    pos_map = np.stack([5 * np.cos(ang), 5 * np.sin(ang), np.zeros(R)], -1)
    q_wb = np.stack([ir._so3_exp([0, 0, a]) for a in ang])
    map_q, map_t = _to_body_world(q_wb, pos_map)

    # trajectory = map scaled by s around origin, rotated by Rz
    s = 1.25
    rot = ir._so3_exp([0.0, 0.0, 0.7])
    pos_traj = np.stack([_q_rot(rot, p) * s for p in pos_map])
    q_wb_traj = np.stack([_q_mul(rot, q_wb[i]) for i in range(R)])
    traj_q, traj_t = _to_body_world(q_wb_traj, pos_traj)
    # world velocity consistent with the scaled trajectory
    vel_traj = np.gradient(pos_traj, axis=0) / 0.1
    omega = np.zeros((R, 3))

    kr = np.arange(0, R, 8)
    pq, pt, v, om, active, stats = ir.init_rigs_interpolating_poses(
        traj_q, traj_t, vel_traj, omega, ts,
        kr, map_q[kr], map_t[kr], rig_window_grow=10,
    )
    assert active.all()
    # matched rigs land exactly on map poses
    for k in kr:
        np.testing.assert_allclose(pt[k], map_t[k], atol=1e-8)
    # in-between rigs are close to map poses (interp of smooth drift);
    # beyond the last keyrig the correction extrapolates as a constant
    # (reference behavior), so only the covered span is checked
    pw = -np.stack([_q_rot(_q_conj(pq[i]), pt[i]) for i in range(R)])
    pw_map = pos_map
    err = np.linalg.norm(pw - pw_map, axis=-1)[kr[0] : kr[-1] + 1]
    assert np.percentile(err, 95) < 0.1
    # velocities rescaled by ~1/s (and rotated into map world)
    vel_map = np.gradient(pos_map, axis=0) / 0.1
    mid = slice(10, R - 10)
    ratio = np.linalg.norm(v[mid], axis=-1) / np.maximum(
        np.linalg.norm(vel_map[mid], axis=-1), 1e-9
    )
    assert abs(np.median(ratio) - 1.0) < 0.05
    # direction matches map world frame
    cos = np.sum(v[mid] * vel_map[mid], -1) / (
        np.linalg.norm(v[mid], axis=-1) * np.maximum(np.linalg.norm(vel_map[mid], axis=-1), 1e-9)
    )
    assert np.median(cos) > 0.99
    # distortion stats exist (drift is smooth here, so small-ish)
    assert len(stats["dist_rot_rel"]) > 0


def test_scaling_at_timestamps_clamps():
    ts = np.asarray([100, 200], np.int64)
    vals = np.asarray([np.log(2.0), np.log(4.0)])
    out = ir.scaling_at_timestamps(ts, vals, [0, 100, 150, 200, 500])
    np.testing.assert_allclose(out, [2.0, 2.0, np.sqrt(8.0), 4.0, 4.0], rtol=1e-12)
