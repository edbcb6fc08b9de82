"""Benchmark: LM iterations/sec of the full VI-BA step on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is a synthetic 2-minute Aria-like session (10 Hz keyframes,
IMU preintegration, landmark Schur + PCG) built entirely on-device; the timed
unit is one full LM iteration: linearize all factor batches -> build the
Schur-reduced system -> 40-iteration block-Jacobi PCG -> back-substitute ->
retract -> comparable cost (the reference's per-iteration work,
Optimizer.cpp:768-1106, at its default PCG budget).

vs_baseline: speedup vs THE SAME algorithm run on the host CPU in a
subprocess (the stand-in for the reference's single-socket CPU baseline until
ark_vi_ba can be run on identical inputs; reference publishes no numbers —
see BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

DURATION = 120.0
KEYFRAME_HZ = 10.0
NUM_POINTS = 1500
TIMED_ITERS = 10
CPU_TIMED_ITERS = 2


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


def main():
    ips = run_device()
    cpu_ips = run_cpu_subprocess()
    vs = ips / cpu_ips if cpu_ips else None
    print(
        json.dumps(
            {
                "metric": "lm_iterations_per_sec_2min_session",
                "value": round(ips, 4),
                "unit": "iters/s",
                "vs_baseline": round(vs, 3) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
