"""Preprocessing tool (tools/save_observations): keyframing thresholds,
observation CSV schema, end-to-end stage pipeline on a synthetic session."""

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
