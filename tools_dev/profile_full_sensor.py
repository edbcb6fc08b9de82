"""Per-phase timing of the full-sensor (BASELINE config-3/4 shape) workload.

Usage: python tools_dev/profile_full_sensor.py [duration_sec]

Builds a synthetic full-sensor session (RS camera with readout+time-offset
estimation, dual IMU, all calibration groups on 5 s windows) through the
real session pipeline and times each jitted phase of one LM iteration
separately on the attached device.
"""

import sys
import tempfile
import time

import jax
import jax.numpy as jnp


def build(duration=180.0, points=18000):
    from visual_inertial_bundle_adjustment_tpu.pipeline import session_data as sio
    from visual_inertial_bundle_adjustment_tpu.pipeline.adapter import (
        AdapterOptions,
        SessionAdapter,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import write_session_dir

    s = SyntheticSession(
        duration=duration, keyframe_hz=10.0, gyro_hz=800.0,
        accel_hz=800.0, num_points=points, seed=23, pixel_noise=0.3,
        track_lifetime_sec=10.0,
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_session_dir(s, tmp, num_imus=2, readout_time_sec=0.03, seed=23)
        sd = sio.load_session(tmp)
        adapter = SessionAdapter(
            sd,
            AdapterOptions(estimate_readout=True, estimate_cam_time_offset=True),
            log=lambda *a: None,
        )
        return adapter.build()


def t_call(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    t0 = time.time()
    problem = build(dur)
    print(f"build: {time.time() - t0:.1f}s")
    for cfg, data in zip(problem.cfgs, problem.datas):
        n = next(a.shape[0] for a in data.values()
                 if hasattr(a, "shape") and getattr(a, "ndim", 0) >= 1)
        bi = getattr(cfg, "block_info", None)
        print(f"  batch {cfg.kind:22s} n={n:8d} blocked={bi is not None}")

    (k_lin, k_solve, k_resolve, k_cost, k_grad, k_retract,
     k_assemble, k_step) = problem._build()
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lam = jnp.asarray(1e-4, v.points.dtype)

    t_lin, lg = t_call(k_lin, datas, v, masks, None)
    asm = k_assemble(datas, lg, v, masks)
    jax.block_until_ready(asm)
    t_step, out = t_call(k_step, asm, datas, lg, v, masks, lam, 40, 1e-10)
    print(f"lin+assemble: {t_lin * 1e3:8.1f} ms")
    print(f"k_step(40 PCG): {t_step * 1e3:8.1f} ms")
    print(f"total/iter: {(t_lin + t_step) * 1e3:8.1f} ms "
          f"-> {1.0 / (t_lin + t_step):.2f} iters/s")
    v2, stats = out[7], out[9]
    print(f"cost {float(lg.cost):.4g} -> {float(stats.cost):.4g}")


if __name__ == "__main__":
    main()
