"""CLI coverage: flag wiring, --no-fprio semantics, rig subrange, per-IMU
noise models, and one end-to-end main() run over a synthetic session dir.

Covers the reference flag vocabulary semantics (viba/common/Settings.cpp:71-294
and the --no-fprio zeroing at Settings.cpp:36-43) that main_AriaKit_ViBa.cpp
wires into SingleSessionAdapter.
"""

import json
import math

import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.ops import losses
from visual_inertial_bundle_adjustment_tpu.pipeline import cli
from visual_inertial_bundle_adjustment_tpu.pipeline.adapter import SessionAdapter
from visual_inertial_bundle_adjustment_tpu.pipeline import session_data as sio
from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import write_session_dir


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli_session")
    s = SyntheticSession(
        duration=4.0, keyframe_hz=5.0, gyro_hz=200.0, accel_hz=200.0,
        num_points=60, num_cameras=1, seed=3, pixel_noise=0.3,
    )
    write_session_dir(s, path, num_imus=2, seed=7)
    return path


def _opts(argv):
    args = cli.build_arg_parser().parse_args(["-i", "unused", *argv])
    return cli.make_adapter_options(args)


def test_flag_wiring_losses_and_inflates():
    o = _opts([
        "--tracking-obs-lrad", "0.8", "--tracking-obs-lcut", "2.5",
        "--imu-lrad", "4.0", "--imu-lcut", "9.0",
        "--cam-intr-fprio-infl", "7.0", "--imu-extr-rw-infl", "3.0",
        "--rig-start", "2", "--rig-end", "11",
    ])
    assert o.reproj_loss == (losses.HUBER_CUTOFF, 0.8, 2.5)
    assert o.imu_loss == (losses.HUBER_CUTOFF, 4.0, 9.0)
    assert o.fprio_inflates["cam_intr"] == 7.0
    assert o.fprio_inflates["imu_calib"] == 100.0
    assert o.rw_inflates["imu_extr"] == 3.0
    assert o.rw_inflates["cam_intr"] == 1.0
    assert (o.rig_start, o.rig_end) == (2, 11)
    # default imu loss radius is infinite => trivial loss (Constants.h:24)
    o2 = _opts([])
    assert o2.imu_loss == (losses.TRIVIAL, 0.0, 0.0)
    assert o2.reproj_loss == (losses.HUBER_CUTOFF, 1.0, 3.0)


def test_no_fprio_zeroes_all_groups():
    o = _opts(["--no-fprio", "--imu-calib-fprio-infl", "50.0"])
    assert all(v == 0.0 for v in o.fprio_inflates.values())


def test_calib_token_dsl():
    o = _opts(["--calib-constant", "cam-all", "--calib-factory", "imu-extr"])
    assert not o.estimate_cam_intr and not o.estimate_cam_extr
    assert o.estimate_imu_calib and not o.estimate_imu_extr
    assert o.factory_init
    o2 = _opts(["--calib-constant", "all,-imu-calib"])
    assert o2.estimate_imu_calib
    assert not (o2.estimate_cam_intr or o2.estimate_cam_extr or o2.estimate_imu_extr)


@pytest.mark.slow
def test_no_fprio_removes_prior_batches(session_dir):
    sd = sio.load_session(session_dir)
    base = ["--calib-constant", "cam-intr"]
    adapter = SessionAdapter(sd, _opts(base), log=None)
    problem = adapter.build()
    kinds = {c.kind for c in problem.cfgs}
    assert "imu_calib_prior" in kinds and "cam_extr_prior" in kinds

    adapter0 = SessionAdapter(sd, _opts(base + ["--no-fprio"]), log=None)
    problem0 = adapter0.build()
    kinds0 = {c.kind for c in problem0.cfgs}
    assert not any(k.endswith("_prior") and k != "omega_prior" for k in kinds0)

    # regression for the inflate=0 bug: with priors PRESENT all weights finite
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind.endswith("_prior"):
            sh = np.asarray(data["sqrt_h"]) if "sqrt_h" in data else None
            if sh is not None:
                assert np.isfinite(sh).all() and sh.max() < 1e12, cfg.kind


@pytest.mark.slow
def test_per_group_fprio_inflate_scales_weights(session_dir):
    sd = sio.load_session(session_dir)
    a1 = SessionAdapter(sd, _opts(["--imu-calib-fprio-infl", "100"]), log=None)
    a2 = SessionAdapter(sd, _opts(["--imu-calib-fprio-infl", "200"]), log=None)
    p1, p2 = a1.build(), a2.build()

    def prior_sh(problem, kind):
        for cfg, data in zip(problem.cfgs, problem.datas):
            if cfg.kind == kind:
                return np.asarray(data["sqrt_h"])
        raise AssertionError(kind + " missing")

    s1 = prior_sh(p1, "imu_calib_prior")
    s2 = prior_sh(p2, "imu_calib_prior")
    nz = s1 > 0
    assert np.allclose(s2[nz], s1[nz] / 2.0, rtol=1e-12)
    # other groups untouched
    c1 = prior_sh(p1, "cam_extr_prior")
    c2 = prior_sh(p2, "cam_extr_prior")
    assert np.allclose(c1, c2)


@pytest.mark.slow  # smoke-gate budget (round-4 VERDICT #8): <300 s
def test_rig_subrange(session_dir):
    sd = sio.load_session(session_dir)
    full = SessionAdapter(sd, _opts([]), log=None)
    part = SessionAdapter(sd, _opts(["--rig-start", "3", "--rig-end", "12"]), log=None)
    assert part.R == 9
    assert part.rig_ts_us[0] == full.rig_ts_us[3]
    assert part.rig_ts_us[-1] == full.rig_ts_us[11]
    problem = part.build()  # subrange problem builds cleanly
    assert problem.variables.pose_q.shape[0] == 9


@pytest.mark.slow
def test_per_imu_noise_models(session_dir):
    from visual_inertial_bundle_adjustment_tpu.models import imu as imu_model

    left = imu_model.noise_model_for_label("imu-left")
    right = imu_model.noise_model_for_label("imu-right")
    assert float(left.accel_sample_var[0]) == pytest.approx(7.7951241e-3)
    assert float(right.accel_sample_var[0]) == pytest.approx(6.6297049e-3)

    sd = sio.load_session(session_dir)
    adapter = SessionAdapter(sd, _opts([]), log=None)
    # synthetic session orders labels [imu-right, imu-left]
    assert adapter.imu_noise_model(0).accel_sample_var[0] != (
        adapter.imu_noise_model(1).accel_sample_var[0]
    )
    problem = adapter.build()
    infos = {}
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind in ("inertial", "inertial_secondary"):
            infos[cfg.label] = np.asarray(data["sqrt_info"])
    assert len(infos) == 2
    # whitening differs between the two IMUs (accel rows see different vars)
    a, b = infos["inertial"], infos["inertial_imu1"]
    assert not np.allclose(a[:, 3:, 3:], b[:, 3:, 3:], rtol=1e-3)


@pytest.mark.slow
def test_preint_bucketing_matches_unbucketed(session_dir):
    """Skewed interval lengths: pow-2 bucketed preintegration must agree with
    the single-padding path while padding each pair only to its bucket."""
    import jax.numpy as jnp

    from visual_inertial_bundle_adjustment_tpu.models import imu as imu_model
    from visual_inertial_bundle_adjustment_tpu.ops import preintegration as pre

    sd = sio.load_session(session_dir)
    adapter = SessionAdapter(sd, _opts([]), log=None)
    rig_t = adapter.rig_ts_us.astype(np.float64) * 1e-6
    # three short pairs + one pair spanning most of the session
    t0s = np.array([rig_t[0], rig_t[1], rig_t[2], rig_t[0]])
    t1s = np.array([rig_t[1], rig_t[2], rig_t[3], rig_t[-2]])
    noise = adapter.imu_noise_model(0)
    calibs = jnp.broadcast_to(imu_model.identity_calib(), (4, imu_model.CALIB_DIM))

    p_b, buckets = adapter._preintegrate_pairs(0, t0s, t1s, calibs, noise)
    assert len(buckets) >= 2  # the skew actually produced multiple buckets
    # bucketed total sample padding well below the uniform one
    bucket_cells = sum(len(sel) * iv.gyro_t.shape[1] for sel, iv, _ in buckets)
    iv_u, num_steps_u = adapter._intervals_for(0, t0s, t1s)
    assert bucket_cells < 0.6 * iv_u.gyro_t.shape[0] * iv_u.gyro_t.shape[1]

    p_u = pre.preintegrate_batch(calibs, iv_u, noise, num_steps_u)
    np.testing.assert_allclose(np.asarray(p_b.rvp.q), np.asarray(p_u.rvp.q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_b.rvp.dV), np.asarray(p_u.rvp.dV), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_b.rvp.dP), np.asarray(p_u.rvp.dP), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_b.J), np.asarray(p_u.J), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_b.cov), np.asarray(p_u.cov), atol=1e-15)
    assert np.asarray(p_b.valid).all()


@pytest.mark.slow
def test_recompute_preintegrations_roundtrip(session_dir):
    """recompute_preintegrations at the unchanged calibration must reproduce
    the build-time preintegrations (exercises the bucketed recompute path)."""
    sd = sio.load_session(session_dir)
    adapter = SessionAdapter(sd, _opts([]), log=None)
    problem = adapter.build()
    before = {}
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind in ("inertial", "inertial_secondary"):
            before[cfg.label] = {
                k: np.asarray(data[k]).copy()
                for k in ("preint_q", "preint_dv", "preint_dp", "preint_J", "sqrt_info")
            }
    adapter.recompute_preintegrations()
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.label in before:
            for k, old in before[cfg.label].items():
                np.testing.assert_allclose(
                    np.asarray(data[k]), old, atol=1e-9, err_msg=f"{cfg.label}/{k}"
                )


@pytest.mark.slow
def test_cli_main_end_to_end(session_dir, tmp_path, capsys):
    out = tmp_path / "out"
    report = tmp_path / "report.json"
    rc = cli.main([
        "-i", str(session_dir), "-o", str(out),
        "--calib-constant", "cam-all",
        "--imu-calib-estimation-options", "gyro-bias,accel-bias",
        "--max-num-iterations", "4",
        "--json-report", str(report),
        "--eval-calib-vs-factory",
    ])
    assert rc == 0
    for fn in ["closed_loop_framerate_trajectory.csv",
               "open_loop_framerate_trajectory.csv",
               "online_calibration.jsonl"]:
        assert (out / fn).exists(), fn
    txt = (out / "closed_loop_framerate_trajectory.csv").read_text().splitlines()
    assert txt[0].startswith("graph_uid,tracking_timestamp_us")
    rep = json.loads(report.read_text())
    assert rep["numIterations"] >= 1
    assert rep["finalCost"] <= rep["initialCost"]
    # eval-calib-vs-factory printed percentile summaries
    assert "proj_offset" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_compute_covariances(session_dir, tmp_path):
    """--compute-covariances writes per-rig 12x12 blocks + per-window IMU
    calib covariances from ONE linearization (VERDICT item 6)."""
    out = tmp_path / "cov_out"
    rc = cli.main([
        "-i", str(session_dir), "-o", str(out),
        "--calib-constant", "cam-all",
        "--imu-calib-estimation-options", "gyro-bias,accel-bias",
        "--max-num-iterations", "2",
        "--compute-covariances", "--covariance-pcg-iterations", "150",
    ])
    assert rc == 0
    txt = (out / "rig_covariances.csv").read_text().splitlines()
    sd = sio.load_session(session_dir)
    adapter = SessionAdapter(sd, _opts([]), log=None)
    assert len(txt) == 1 + adapter.R
    row = np.array([float(x) for x in txt[1].split(",")[1:]])
    assert np.isfinite(row).all()
    assert (row[:12] >= 0).all()  # stddevs
    B = row[12:].reshape(12, 12)
    assert np.allclose(B, B.T)
    assert (np.diag(B) >= 0).all() and np.diag(B).max() > 0
    recs = [json.loads(ln) for ln in
            (out / "imu_calib_covariances.jsonl").read_text().splitlines()]
    assert recs and recs[0]["dims"]
    K = len(recs[0]["dims"])
    C = np.asarray(recs[0]["cov"]).reshape(K, K)
    assert (np.diag(C) > 0).all()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
