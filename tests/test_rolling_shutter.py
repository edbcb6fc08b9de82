"""Rolling-shutter machinery tests.

(a) RS tables interpolate the IMU integral correctly (vs direct integration);
(b) the rs_visual factor with zero readout/offset equals the plain visual
    factor;
(c) pipeline end-to-end: data generated with a global shutter but declared
    readout 20 ms — estimating the readout time drives it back toward zero
    (exercises the readout/time-offset derivative chain through the tables,
    reference VisualFactor.cpp:122-214 + RollingShutterData).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.models import imu as imu_model
from visual_inertial_bundle_adjustment_tpu.ops import camera as cam_ops
from visual_inertial_bundle_adjustment_tpu.ops import motion as mo
from visual_inertial_bundle_adjustment_tpu.ops import preintegration as pre
from visual_inertial_bundle_adjustment_tpu.ops import rolling_shutter as rs
from visual_inertial_bundle_adjustment_tpu.problem import factors as fct

from test_preintegration import make_stream, pad_interval, random_calib


@pytest.mark.slow
def test_rs_tables_match_direct_integration():
    calib = random_calib(3)
    g_t, g_v, a_t, a_v = make_stream(t_len=0.12, gyro_hz=200, accel_hz=200, seed=8)
    half = 0.06
    # first half [mid-half, mid] -> times relative to its start
    iv1 = pad_interval(g_t + half, g_v, a_t + half, a_v, half)
    iv2 = pad_interval(g_t, g_v, a_t, a_v, half)
    K = 80
    tables = rs.build_rs_tables(
        calib[None], jax.tree_util.tree_map(lambda a: a[None], iv1),
        jax.tree_util.tree_map(lambda a: a[None], iv2),
        jnp.asarray([0.0, 0.0, -9.81]), 80, K,
    )
    count = int(tables.count[0])
    assert count > 10
    dts = np.asarray(tables.dt[0][:count])
    assert dts[0] < -0.04 and dts[-1] > 0.04 and np.all(np.diff(dts) > 0)

    # spot-check: the table RVP at dt>0 equals direct integration [mid, mid+dt]
    for t_query in [0.013, 0.031, 0.052]:
        iv_direct = pad_interval(g_t, g_v, a_t, a_v, t_query)
        direct, *_ = pre.integrate_measurements(calib, iv_direct, 80)
        est = rs.rs_estimate(
            tables.dt[0], tables.q[0], tables.dV[0], tables.dP[0],
            tables.i_gyro[0], tables.i_accel[0], tables.i_dvel[0], tables.count[0],
            tables.gravity_w, jnp.asarray(t_query), jnp.zeros(3),
            jnp.asarray([1.0, 0, 0, 0]),
        )
        assert bool(est.valid)
        from visual_inertial_bundle_adjustment_tpu.ops import lie

        rot_err = np.linalg.norm(
            np.asarray(lie.so3_log(lie.quat_mul(est.q_mid_t, lie.quat_conj(direct.q))))
        )
        assert rot_err < 2e-4, f"rot err {rot_err} at {t_query}"

    # out-of-range query is flagged invalid (reference throws,
    # RollingShutterData.cpp:83-91)
    est = rs.rs_estimate(
        tables.dt[0], tables.q[0], tables.dV[0], tables.dP[0],
        tables.i_gyro[0], tables.i_accel[0], tables.i_dvel[0], tables.count[0],
        tables.gravity_w, jnp.asarray(0.5), jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]),
    )
    assert not bool(est.valid)


@pytest.mark.slow
def test_rs_visual_reduces_to_visual_at_zero_readout():
    from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
        BuildOptions,
        build_synthetic_problem,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession

    s = SyntheticSession(duration=1.2, keyframe_hz=5.0, num_points=25, seed=51,
                         pixel_noise=0.1)
    p = build_synthetic_problem(s, BuildOptions())
    # grab the visual batch, rebuild it as rs_visual with zero readout/offset
    vis_cfg, vis_data = next(
        (c, d) for c, d in zip(p.cfgs, p.datas) if c.kind == "visual"
    )
    res_vis, valid_vis = fct.residual_batch(vis_cfg, vis_data, p.variables)

    # tables from the body imu around each rig midpoint
    calib = imu_model.identity_calib()
    R = s.num_rigs
    half = 0.03
    g_t = s.gyro_t
    ivs1, ivs2 = [], []
    from test_preintegration import pad_interval as _pad

    for t_mid in s.rig_times:
        for t0, dst in [(t_mid - half, ivs1), (t_mid, ivs2)]:
            gi = max(np.searchsorted(s.gyro_t, t0 - 0.02), 0)
            ai = max(np.searchsorted(s.accel_t, t0 - 0.02), 0)
            dst.append(_pad(s.gyro_t[gi : gi + 160] - t0, s.gyro_v[gi : gi + 160],
                            s.accel_t[ai : ai + 160] - t0, s.accel_v[ai : ai + 160],
                            half, S=160))
    stack = lambda ivs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ivs)
    tables = rs.build_rs_tables(
        jnp.broadcast_to(calib, (R, imu_model.CALIB_DIM)), stack(ivs1), stack(ivs2),
        jnp.asarray(s.gravity), 100, 60,
    )
    rs_data = {k: v for k, v in vis_data.items() if k not in ("bias", "bias_on")}
    rs_data["rs_row"] = rs_data["rig"]
    rs_data["rs_tables"] = tables
    rs_data["rs_tpf"] = rs_data["obs_uv"][:, 1] / float(s.image_size[1]) - 0.5
    rs_cfg = fct.BatchCfg(kind="rs_visual", loss=vis_cfg.loss,
                          camera_kind=vis_cfg.camera_kind,
                          image_height=float(s.image_size[1]))
    res_rs, valid_rs = fct.residual_batch(rs_cfg, rs_data, p.variables)
    keep = (np.asarray(valid_rs) > 0.5) & (np.asarray(valid_vis) > 0.5)
    assert keep.mean() > 0.9
    # readout/time-offset are zero -> dt = 0 -> identical projections
    np.testing.assert_allclose(
        np.asarray(res_rs)[keep], np.asarray(res_vis)[keep], atol=5e-4
    )


@pytest.mark.slow
def test_pipeline_readout_recovery(tmp_path):
    from visual_inertial_bundle_adjustment_tpu.pipeline import session_data as sio
    from visual_inertial_bundle_adjustment_tpu.pipeline.adapter import (
        AdapterOptions,
        SessionAdapter,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import write_session_dir
    from visual_inertial_bundle_adjustment_tpu.problem.optimizer import LMSettings, optimize

    s = SyntheticSession(duration=4.0, keyframe_hz=5.0, gyro_hz=200.0, accel_hz=200.0,
                         num_points=120, seed=61, pixel_noise=0.2)
    write_session_dir(s, tmp_path, num_imus=1, readout_time_sec=0.02, seed=6)
    sd = sio.load_session(tmp_path)
    adapter = SessionAdapter(
        sd,
        AdapterOptions(
            estimate_cam_intr=True, estimate_cam_extr=False, estimate_imu_calib=False,
            estimate_imu_extr=False, estimate_readout=True,
            factory_prior_inflate=100.0,
        ),
        log=lambda *a: None,
    )
    problem = adapter.build()
    assert any(c.kind == "rs_visual" for c in problem.cfgs)
    readout0 = float(problem.variables.cam_intr[0, cam_ops.READOUT])
    assert abs(readout0 - 0.02) < 1e-9
    summary = optimize(problem, LMSettings(max_iterations=12, log=None))
    assert summary.final_cost < summary.initial_cost
    # data was generated WITHOUT rolling shutter: readout should shrink
    readouts = np.asarray(problem.variables.cam_intr[:, cam_ops.READOUT])
    assert np.abs(readouts).max() < 0.015, f"readouts {readouts}"


def test_segment_lookup_matches_searchsorted():
    """The 3-row-gather bucketed lookup must reproduce exact
    searchsorted(side='right') semantics on ragged +inf-padded tables,
    including out-of-range queries (validity flag = the reference's
    out-of-range throw, RollingShutterData.cpp:83-91)."""
    import jax.numpy as jnp

    from visual_inertial_bundle_adjustment_tpu.ops import rolling_shutter as rs

    rng = np.random.default_rng(4)
    R, K, N = 23, 57, 4000
    counts = rng.integers(3, K + 1, R)
    dt = np.full((R, K), np.inf)
    for r in range(R):
        # irregular ascending boundaries (jittered spacing)
        steps = rng.random(counts[r]) * 0.01 + 1e-4
        dt[r, : counts[r]] = np.cumsum(steps) - 0.03
    rows = rng.integers(0, R, N)
    t = rng.random(N) * 0.08 - 0.05  # covers in/out of range both sides

    tables = rs.RSTables(
        dt=jnp.asarray(dt),
        q=jnp.asarray(rng.standard_normal((R, K, 4))),
        dV=jnp.asarray(rng.standard_normal((R, K, 3))),
        dP=jnp.asarray(rng.standard_normal((R, K, 3))),
        i_gyro=jnp.asarray(rng.standard_normal((R, K, 3))),
        i_accel=jnp.asarray(rng.standard_normal((R, K, 3))),
        i_dvel=jnp.asarray(rng.standard_normal((R, K, 3))),
        count=jnp.asarray(counts, jnp.int32),
        gravity_w=jnp.asarray([0.0, 0.0, -9.81]),
    )
    out = rs.rs_segment_lookup(tables, jnp.asarray(rows), jnp.asarray(t))

    idx_ref = np.array([np.searchsorted(dt[r], tv, side="right")
                        for r, tv in zip(rows, t)])
    valid_ref = (idx_ref > 0) & (idx_ref < counts[rows])
    np.testing.assert_array_equal(np.asarray(out["seg_valid"]), valid_ref)
    seg_ref = np.clip(idx_ref - 1, 0, K - 1)
    np.testing.assert_allclose(
        np.asarray(out["seg_q"]), tables.q[rows, seg_ref], rtol=0, atol=0)
    dt_ref = dt[rows, seg_ref]
    np.testing.assert_allclose(
        np.asarray(out["seg_dt"]), np.where(np.isfinite(dt_ref), dt_ref, 0.0))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
