"""Per-phase timing of one LM iteration on the bench workload (real TPU).

Prints the PERF_NOTES table inputs: linearize+assemble, per-lambda damping,
full 40-iter PCG solve, single matvec, retract, comparable cost.

Run: python tools_dev/profile_phases.py [--full]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def t(fn, *args, n=5, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3, out


def main():
    import jax.numpy as jnp

    import bench
    from visual_inertial_bundle_adjustment_tpu.problem import rcs

    if "--full" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            problem = bench.build_full_sensor_problem(tmp)
        label = "full-sensor 10min"
    else:
        problem = bench.build_problem()
        label = "bias-only 2min"
    ks = problem._build()
    k_lin, k_step = ks[0], ks[7]
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lam = jnp.asarray(1e-4, v.points.dtype)

    ms_lin, lg = t(lambda: k_lin(datas, v, masks, None))
    asm = problem._last_asm
    ms_damp, rs = t(lambda: __import__("jax").jit(
        lambda a, lam: rcs.with_damping(a, v, masks, lam))(asm, lam))
    mv = __import__("jax").jit(
        lambda rs_, x: rcs.matvec(rs_, v, x))
    ms_mv, _ = t(lambda: mv(rs, asm.g_r), n=10)
    ms_step, _ = t(lambda: k_step(asm, datas, lg, v, masks, lam, 40, 1e-10), n=3)
    ms_step1, _ = t(lambda: k_step(asm, datas, lg, v, masks, lam, 1, 1e-10), n=3)
    n_obs = sum(
        int(d["rig"].shape[0]) for c, d in zip(problem.cfgs, problem.datas)
        if c.kind in ("visual", "rs_visual"))
    print(f"[{label}] rigs {v.pose_q.shape[0]} pts {v.points.shape[0]} "
          f"obs {n_obs}")
    print(f"linearize+assemble : {ms_lin:8.2f} ms")
    print(f"with_damping       : {ms_damp:8.2f} ms")
    print(f"matvec (single)    : {ms_mv:8.2f} ms")
    print(f"k_step pcg=1       : {ms_step1:8.2f} ms")
    print(f"k_step pcg=40      : {ms_step:8.2f} ms")
    print(f"  => per-PCG-iter  : {(ms_step - ms_step1) / 39:8.3f} ms")
    print(f"  => iter total    : {ms_lin + ms_step:8.2f} ms "
          f"({1e3 / (ms_lin + ms_step):.2f} it/s)")


if __name__ == "__main__":
    main()
