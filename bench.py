"""Benchmark: LM iterations/sec of the full VI-BA step on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Two configs, both timed as one full LM iteration (linearize -> assemble ->
40-iteration PCG Schur solve -> retract -> comparable cost — the reference's
per-iteration work, Optimizer.cpp:768-1106, at its default PCG budget):

  1. headline — 2-minute session, 10 Hz keyframes, IMU bias estimation
     (BASELINE config-1/2 shape); `value` + `vs_baseline`.
  2. extra.full_sensor_iters_per_sec — BASELINE config-3/4 shape: 10-minute
     session through the FULL session pipeline (files -> SessionAdapter),
     rolling-shutter camera with readout + time-offset estimation, dual IMU,
     ALL calibration groups random-walking over 5 s windows with factory
     priors and omega priors.

vs_baseline: speedup vs THE SAME algorithm run on the host CPU in a
subprocess (the stand-in for the reference's single-socket CPU baseline until
ark_vi_ba can be run on identical inputs; reference publishes no numbers —
see BASELINE.md).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

DURATION = 120.0
KEYFRAME_HZ = 10.0
NUM_POINTS = 1500
TIMED_ITERS = 10
CPU_TIMED_ITERS = 2
FULL_DURATION = 600.0
FULL_POINTS = 800
FULL_TIMED_ITERS = 5


def build_problem():
    from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
        BuildOptions,
        build_synthetic_problem,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession

    s = SyntheticSession(
        duration=DURATION, keyframe_hz=KEYFRAME_HZ, gyro_hz=800.0, accel_hz=800.0,
        num_points=NUM_POINTS, seed=17, pixel_noise=0.3,
    )
    return build_synthetic_problem(
        s,
        BuildOptions(
            init_pose_noise=0.005, init_point_noise=0.03, init_vel_noise=0.03,
            estimate_imu_calib=True,
            imu_calib_options=dict(accelBias=True, gyroBias=True),
        ),
    )


def build_full_sensor_problem(tmpdir):
    """BASELINE config-3/4 shape via the full session pipeline."""
    from visual_inertial_bundle_adjustment_tpu.pipeline import session_data as sio
    from visual_inertial_bundle_adjustment_tpu.pipeline.adapter import (
        AdapterOptions,
        SessionAdapter,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import write_session_dir

    s = SyntheticSession(
        duration=FULL_DURATION, keyframe_hz=KEYFRAME_HZ, gyro_hz=800.0,
        accel_hz=800.0, num_points=FULL_POINTS, seed=23, pixel_noise=0.3,
    )
    write_session_dir(s, tmpdir, num_imus=2, readout_time_sec=0.03, seed=23)
    sd = sio.load_session(tmpdir)
    adapter = SessionAdapter(
        sd,
        AdapterOptions(estimate_readout=True, estimate_cam_time_offset=True),
        log=lambda *a: None,
    )
    return adapter.build()


def timed_iterations(problem, n_iters, pcg_iters=40):
    import jax
    import jax.numpy as jnp

    from visual_inertial_bundle_adjustment_tpu.problem.structure import t_scale

    (k_lin, k_solve, k_resolve, k_cost, k_grad, k_retract,
     k_assemble, k_step) = problem._build()
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    dtype = v.points.dtype
    lam = jnp.asarray(1e-4, dtype)

    def one_iter(v):
        lg = k_lin(datas, v, masks, None)
        asm = k_assemble(datas, lg, v, masks)
        out = k_step(asm, datas, lg, v, masks, lam, pcg_iters, 1e-10)
        v2, stats = out[7], out[9]
        return v2, stats

    # warmup/compile
    v2, stats = one_iter(v)
    jax.block_until_ready((v2, stats))
    t0 = time.time()
    for _ in range(n_iters):
        v2, stats = one_iter(v2)
    jax.block_until_ready((v2, stats))
    dt = (time.time() - t0) / n_iters
    return 1.0 / dt, float(stats.cost)


def run_device():
    problem = build_problem()
    ips, cost = timed_iterations(problem, TIMED_ITERS)
    return ips


def run_cpu_subprocess():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        "ips, _ = bench.timed_iterations(bench.build_problem(), bench.CPU_TIMED_ITERS)\n"
        "print('CPU_IPS', ips)\n"
    )
    env = dict(os.environ)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_IPS"):
                return float(line.split()[1])
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"cpu baseline failed: {e}\n")
    return None


def run_full_sensor():
    try:
        with tempfile.TemporaryDirectory() as tmp:
            problem = build_full_sensor_problem(tmp)
        ips, _ = timed_iterations(problem, FULL_TIMED_ITERS)
        return ips
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"full-sensor config failed: {e}\n")
        return None


def main():
    ips = run_device()
    full_ips = run_full_sensor()
    cpu_ips = run_cpu_subprocess()
    vs = ips / cpu_ips if cpu_ips else None
    print(
        json.dumps(
            {
                "metric": "lm_iterations_per_sec_2min_session",
                "value": round(ips, 4),
                "unit": "iters/s",
                "vs_baseline": round(vs, 3) if vs else None,
                "extra": {
                    "full_sensor_10min_iters_per_sec": (
                        round(full_ips, 4) if full_ips else None
                    ),
                    "cpu_iters_per_sec": round(cpu_ips, 4) if cpu_ips else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
