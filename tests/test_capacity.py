"""BASELINE config-5 shape: long-session capacity + distributed solve.

A 30-minute synthetic session (reduced keyframe/IMU rates to keep the CPU
test tractable; the STRUCTURE — thousands of rigs, hundreds of 5 s windows,
finite-lifetime tracks spanning block boundaries — matches the capacity
claim in reference README.md:10-11) built, tile-sharded over the virtual
8-device mesh, and optimized for a few LM steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.parallel.sharding import (
    make_mesh,
    shard_blocked_problem,
)
from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
    BuildOptions,
    build_synthetic_problem,
)
from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
from visual_inertial_bundle_adjustment_tpu.problem.optimizer import (
    LMSettings,
    optimize,
    pick_solver,
)


@pytest.mark.slow
def test_30min_sharded_session():
    s = SyntheticSession(
        duration=1800.0, keyframe_hz=2.0, gyro_hz=60.0, accel_hz=60.0,
        num_points=12000, seed=29, pixel_noise=0.3, track_lifetime_sec=30.0,
    )
    problem = build_synthetic_problem(
        s, BuildOptions(init_pose_noise=0.005, init_point_noise=0.03,
                        init_vel_noise=0.03))
    R = problem.variables.pose_q.shape[0]
    assert R == 3600
    n_obs = sum(int(d["rig"].shape[0]) for c, d in
                zip(problem.cfgs, problem.datas) if c.kind == "visual")
    assert n_obs > 100_000, n_obs

    mesh = make_mesh(8)
    shard_blocked_problem(problem, mesh)
    assert any(getattr(c, "block_info", None) for c in problem.cfgs)

    settings = pick_solver(LMSettings(max_iterations=3), R, "auto")
    summary = optimize(problem, settings)
    assert np.isfinite(summary.final_cost)
    assert summary.final_cost < summary.initial_cost * 0.5, (
        summary.initial_cost, summary.final_cost)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
