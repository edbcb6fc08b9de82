"""Fine-grained phase timing of the full-sensor workload on the device.

One build (~3 min for a 180 s session), then times:
  - per-batch linearize (the rs_visual jacrev path vs the small batches)
  - assembly, with_damping (per-lambda), PCG fixed part vs per-iteration
  - retract + comparable cost

Usage: python tools_dev/profile_full_phases.py [duration_sec]
"""

import sys
import time

import jax
import jax.numpy as jnp

from profile_full_sensor import build  # noqa: E402  (same dir)


def t_call(fn, *args, n=5, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{tag:34s} {dt * 1e3:8.2f} ms")
    return out


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 18000
    t0 = time.time()
    problem = build(dur, pts)
    print(f"build: {time.time() - t0:.1f}s")

    import dataclasses as dc

    from visual_inertial_bundle_adjustment_tpu.problem import engine
    from visual_inertial_bundle_adjustment_tpu.problem import factors as fct
    from visual_inertial_bundle_adjustment_tpu.problem import rcs

    (k_lin, k_solve, k_resolve, k_cost, k_grad, k_retract,
     k_assemble, k_step) = problem._build()
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lam = jnp.asarray(1e-4, v.points.dtype)

    # pruned cfgs as _build makes them
    cfgs = engine.prune_cfgs(tuple(problem.cfgs), masks)
    for cfg, data in zip(cfgs, datas):
        if cfg.kind == "rs_visual":
            n = data["rig"].shape[0]
            print(f"rs batch n={n} block={cfg.block_info} "
                  f"active={cfg.active_groups}")

    # per-batch linearize
    for i, (cfg, data) in enumerate(zip(cfgs, datas)):
        if data["_pad" if "_pad" in data else list(data)[0]].shape[0] < 10000 \
                and cfg.kind != "rs_visual":
            continue
        f = jax.jit(lambda d, vv, mm, c=cfg: fct.linearize_batch(c, d, vv, mm))
        t_call(f, data, v, masks, tag=f"linearize[{cfg.kind}]")

    f_lin = jax.jit(lambda dd, vv, mm: engine.linearize(cfgs, dd, vv, mm, None))
    lg = t_call(f_lin, datas, v, masks, tag="engine.linearize (all)")

    f_asm = jax.jit(lambda dd, l, vv, mm: rcs.assemble(cfgs, dd, l, vv, mm))
    asm = t_call(f_asm, datas, lg, v, masks, tag="rcs.assemble")

    f_damp = jax.jit(lambda a, vv, mm, l: rcs.with_damping(a, vv, mm, l))
    t_call(f_damp, asm, v, masks, lam, tag="rcs.with_damping (per lambda)")

    for it in (1, 5, 40):
        f_sa = jax.jit(lambda a, vv, mm, l, mi=it: rcs.solve_assembled(
            a, vv, mm, l, mi, 1e-30))
        t_call(f_sa, asm, v, masks, lam, tag=f"solve_assembled({it} pcg)")

    out = k_step(asm, datas, lg, v, masks, lam, 40, 1e-10)
    jax.block_until_ready(out)
    t_call(lambda: k_step(asm, datas, lg, v, masks, lam, 40, 1e-10),
           tag="k_step(40)")
    x_r, x_l = out[0], out[1]
    f_ret = jax.jit(lambda vv, xr, xl, mm: engine and None or None)
    from visual_inertial_bundle_adjustment_tpu.problem.structure import retract, t_scale
    f_ret = jax.jit(lambda vv, xr, xl, mm: retract(vv, t_scale(xr, -1.0), -xl, mm))
    v2 = t_call(f_ret, v, x_r, x_l, masks, tag="retract")
    f_cost = jax.jit(lambda dd, vv, l: engine.comparable_cost(cfgs, dd, vv, l))
    t_call(f_cost, datas, v2, lg, tag="comparable_cost")
    print("cost", float(lg.cost), "->", float(out[9].cost))


if __name__ == "__main__":
    main()
