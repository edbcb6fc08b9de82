"""Multi-session merge: shared gravity, re-indexed batches, loop closures.

Mirrors reference MultiSessionProblem (viba/problem/MultiSessionProblem.h:24-142)
behavior: merged problems optimize jointly; without cross-terms the result
matches per-session optimization."""

import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
    BuildOptions,
    build_synthetic_problem,
)
from visual_inertial_bundle_adjustment_tpu.pipeline.multi_session import (
    make_base_map_batch,
    merge_sessions,
)
from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
from visual_inertial_bundle_adjustment_tpu.problem.optimizer import LMSettings, optimize


def _mk(seed):
    s = SyntheticSession(duration=1.6, keyframe_hz=5.0, num_points=30, seed=seed,
                         pixel_noise=0.2)
    p = build_synthetic_problem(
        s, BuildOptions(init_pose_noise=0.002, init_point_noise=0.01,
                        init_vel_noise=0.02, estimate_gravity=False)
    )
    return s, p


@pytest.mark.slow
def test_merge_and_joint_optimize():
    s1, p1 = _mk(31)
    s2, p2 = _mk(32)
    L1 = p1.variables.points.shape[0]
    R1 = p1.variables.pose_q.shape[0]

    merged = merge_sessions([p1, p2])
    mp = merged.problem
    assert mp.variables.pose_q.shape[0] == R1 + p2.variables.pose_q.shape[0]
    assert mp.variables.points.shape[0] == L1 + p2.variables.points.shape[0]
    assert merged.rig_offset == [0, R1]

    summary = optimize(mp, LMSettings(max_iterations=10, log=None))
    assert summary.final_cost < summary.initial_cost * 0.5

    # independent sessions: joint result == separate results
    s_a = optimize(p1, LMSettings(max_iterations=10, log=None))
    s_b = optimize(p2, LMSettings(max_iterations=10, log=None))
    np.testing.assert_allclose(
        summary.final_cost, s_a.final_cost + s_b.final_cost, rtol=2e-3
    )


@pytest.mark.slow
def test_merge_with_point_matches_and_base_map():
    s1, p1 = _mk(41)
    s2, p2 = _mk(42)
    matches = [(0, 0, 1, 0), (0, 1, 1, 1)]
    merged = merge_sessions([p1, p2], point_matches=matches)
    mp = merged.problem
    total = p1.variables.points.shape[0] + p2.variables.points.shape[0]
    assert mp.variables.points.shape[0] == total - 2  # two pairs merged

    # a constant base-map keyrig observing merged landmark 0
    from visual_inertial_bundle_adjustment_tpu.ops import camera as cam_ops

    pt0 = np.asarray(mp.variables.points[0])
    q_cw = np.asarray([[1.0, 0, 0, 0]])
    t_cw = -pt0[None] + np.asarray([[0.0, 0.0, 3.0]])  # point 3m in front
    intr = np.asarray(s1.camera_params)[None]
    uv, ok = cam_ops.project(cam_ops.KIND_FISHEYE624, jnp.asarray(intr[0]),
                             jnp.asarray(pt0 + t_cw[0]))
    assert bool(ok)
    cfg, data = make_base_map_batch(
        [0], q_cw, t_cw, intr, np.asarray(uv)[None] + 0.5,
        np.broadcast_to(np.eye(2) * 0.7, (1, 2, 2)), cam_ops.KIND_FISHEYE624,
    )
    merged2 = merge_sessions([p1, p2], point_matches=matches,
                             extra_batches=[(cfg, data)])
    summary = optimize(merged2.problem, LMSettings(max_iterations=8, log=None))
    assert np.isfinite(summary.final_cost)
    assert summary.final_cost < summary.initial_cost


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
