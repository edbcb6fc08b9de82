"""Generate the committed golden-session regression fixture.

Writes a miniature reference-format session directory plus the expected
CLI outputs (closed-loop trajectory + online calibration), produced on the
CPU/f64 test configuration. tests/test_golden_session.py re-runs the CLI on
the committed inputs and asserts the outputs still match within tight
tolerances — the regression anchor VERDICT round-1 item 4 asked for.

Run: python tools_dev/gen_golden_session.py   (rewrites tests/data/golden_session)
"""

import os
import pathlib
import shutil

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

ROOT = pathlib.Path(__file__).resolve().parent.parent
BASE = ROOT / "tests/data/golden_session"
BASE_FULL = ROOT / "tests/data/golden_session_full"

CLI_ARGS = [
    "--calib-constant", "cam-all",
    "--imu-calib-estimation-options", "gyro-bias,accel-bias",
    "--max-num-iterations", "6",
]

# full-sensor fixture (round-2 VERDICT item 5): rolling-shutter camera with
# readout + time-offset estimation, dual IMU with the full calib error
# state, every random-walk group active over 5 s windows — the hard 60% of
# the product (reference full pipeline, interfaces/ark/main_AriaKit_ViBa.cpp:32-133)
CLI_ARGS_FULL = [
    "--estimate-readout-time",
    "--estimate-time-offset",
    "--max-num-iterations", "6",
]


def main():
    import sys

    sys.path.insert(0, str(ROOT))
    from visual_inertial_bundle_adjustment_tpu.pipeline import cli
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import write_session_dir

    if BASE.exists():
        shutil.rmtree(BASE)
    s = SyntheticSession(
        duration=4.0, keyframe_hz=5.0, gyro_hz=200.0, accel_hz=200.0,
        num_points=50, num_cameras=1, seed=1234, pixel_noise=0.3,
    )
    write_session_dir(s, BASE / "input", num_imus=2, seed=9)
    cli.main(["-i", str(BASE / "input"), "-o", str(BASE / "expected"), *CLI_ARGS])
    print(f"golden session written under {BASE}")

    if BASE_FULL.exists():
        shutil.rmtree(BASE_FULL)
    sf = SyntheticSession(
        duration=12.0, keyframe_hz=5.0, gyro_hz=200.0, accel_hz=200.0,
        num_points=60, num_cameras=1, seed=77, pixel_noise=0.3,
    )
    write_session_dir(sf, BASE_FULL / "input", num_imus=2,
                      readout_time_sec=0.03, seed=8)
    cli.main(["-i", str(BASE_FULL / "input"), "-o", str(BASE_FULL / "expected"),
              *CLI_ARGS_FULL])
    print(f"full-sensor golden session written under {BASE_FULL}")


if __name__ == "__main__":
    main()
