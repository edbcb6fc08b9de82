"""Preprocessing tool (tools/save_observations): keyframing thresholds,
observation CSV schema, end-to-end stage pipeline on a synthetic session."""

import pytest
import numpy as np

from visual_inertial_bundle_adjustment_tpu.tools import save_observations as so


def test_keyframe_selection_thresholds():
    # straight-line motion, 0.3 m per frame, 10 Hz: distance threshold (1 m)
    # should fire every ceil(1/0.3)+... frames; no rotation
    n = 50
    ts = np.arange(n, dtype=np.int64) * 100_000_000  # 0.1 s
    q = np.tile(np.array([1.0, 0, 0, 0]), (n, 1))
    t = np.stack([np.arange(n) * 0.3, np.zeros(n), np.zeros(n)], -1)
    kf = so.select_keyframes(ts, q, t)
    assert kf[0] == 0
    gaps = np.diff(kf)
    assert np.all(gaps == 4)  # 4 * 0.3m = 1.2m > 1m

    # stationary: only the elapsed-time threshold (1 s -> every 10+1 frames)
    t0 = np.zeros((n, 3))
    kf = so.select_keyframes(ts, q, t0)
    assert np.all(np.diff(kf) == 11)

    # pure rotation: 6 deg/frame -> every ceil(20/6)=4 frames
    ang = np.arange(n) * np.deg2rad(6.0)
    qr = np.stack([np.cos(ang / 2), np.sin(ang / 2), np.zeros(n), np.zeros(n)], -1)
    kf = so.select_keyframes(ts, qr, t0)
    assert np.all(np.diff(kf) == 4)


def test_observations_csv_roundtrip(tmp_path):
    pid = np.array([5, 5, 7])
    ts = np.array([1_000_000, 2_000_000, 1_000_000], np.int64)  # ns
    cam = np.array([0, 1, 0])
    xy = np.array([[10.5, 20.25], [11.0, 21.0], [30.0, 40.0]])
    path = tmp_path / "obs.csv"
    so.write_observations_csv(path, pid, ts, cam, xy)
    rows = np.genfromtxt(path, delimiter=",", names=True)
    assert list(rows.dtype.names) == so.CSV_FIELDS
    # reference writes microseconds under the _ns header
    np.testing.assert_array_equal(rows["capture_timestamp_ns"].astype(int),
                                  ts // 1000)
    np.testing.assert_allclose(rows["sqrt_h_base_res_00"], 0.7)
    np.testing.assert_allclose(rows["projection_base_res_x"], xy[:, 0])


def test_tool_pipeline_end_to_end(tmp_path):
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import write_session_dir

    s = SyntheticSession(duration=4.0, keyframe_hz=5.0, gyro_hz=100.0,
                         accel_hz=100.0, num_points=30, seed=2)
    write_session_dir(s, tmp_path / "sess", seed=2)
    obs = np.genfromtxt(tmp_path / "sess" / "session_observations.csv",
                        delimiter=",", names=True)
    with open(tmp_path / "tracks.csv", "w") as f:
        f.write("point_id,capture_timestamp_ns,camera_index,x,y\n")
        for r in obs:
            f.write(f"{int(r['point_id'])},{int(r['capture_timestamp_ns'])},"
                    f"{int(r['camera_index'])},{r['projection_base_res_x']},"
                    f"{r['projection_base_res_y']}\n")
    out = so.run(so.build_arg_parser().parse_args([
        "--trajectory", str(tmp_path / "sess" / "closed_loop_framerate_trajectory.csv"),
        "--tracks-csv", str(tmp_path / "tracks.csv"),
        "--output", str(tmp_path / "prep"),
    ]))
    assert (out / "vrs_source_info.json").exists()
    kept = np.genfromtxt(out / "session_observations.csv", delimiter=",", names=True)
    assert len(kept) > 50
    # track-length filter: every surviving track has >= 3 observations
    _, counts = np.unique(kept["point_id"].astype(int), return_counts=True)
    assert counts.min() >= 3
    # stage checkpointing: second run skips (no exception, same output)
    so.run(so.build_arg_parser().parse_args([
        "--trajectory", str(tmp_path / "sess" / "closed_loop_framerate_trajectory.csv"),
        "--tracks-csv", str(tmp_path / "tracks.csv"),
        "--output", str(tmp_path / "prep"),
    ]))


def test_process_vrs_imu_csv_roundtrip(tmp_path):
    """write_imu_csv output parses through both the native and numpy IMU
    readers used by load_session (reference ImuDataWriter.cpp:27-41 <->
    SessionData.cpp:329)."""
    from visual_inertial_bundle_adjustment_tpu.pipeline import native
    from visual_inertial_bundle_adjustment_tpu.tools import process_vrs as pv

    rng = np.random.default_rng(0)
    ts = (np.arange(50) * 1_250_000 + 10**12).astype(np.int64)
    gyro = rng.normal(size=(50, 3)) * 0.5
    accel = rng.normal(size=(50, 3)) * 3.0 + np.array([0.0, 0.0, 9.81])
    fn = tmp_path / "imu_samples_imu-left.csv"
    pv.write_imu_csv(fn, [(t, 25.0, g, a) for t, g, a in zip(ts, gyro, accel)])

    parsed = native.parse_imu_csv(fn)
    if parsed is None:
        arr = np.genfromtxt(fn, delimiter=",", skip_header=1)
        parsed = arr[:, 0].astype(np.int64), arr[:, 2:5], arr[:, 5:8]
    t2, g2, a2 = parsed
    np.testing.assert_array_equal(t2, ts)
    np.testing.assert_allclose(g2, gyro, atol=1e-7)
    np.testing.assert_allclose(a2, accel, atol=1e-7)


def test_process_vrs_gated_without_sdk(tmp_path):
    """Without projectaria_tools the tool exits with a clear message instead
    of a traceback (gating policy shared with save_observations --vrs)."""
    from visual_inertial_bundle_adjustment_tpu.tools import process_vrs as pv

    try:
        import projectaria_tools  # noqa: F401
        pytest.skip("projectaria_tools installed")
    except ImportError:
        pass
    with pytest.raises(SystemExit, match="projectaria_tools"):
        pv.process_vrs(tmp_path / "x.vrs", tmp_path / "out")
