"""Break one PCG iteration into parts on the device (round-4 ask #1).

Times, for the bench bias-only (2-min) and full-sensor (10-min) workloads:
  - matvec alone (the Schur operator S x)
  - w_transpose_x / w_y / chol_solve / rest _hmatvec components
  - with_damping (per-lambda)
  - pcg(1) and pcg(40): per-iteration marginal = (t40 - t1)/39
    -> loop-ops overhead = marginal - matvec

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools_dev/profile_pcg_parts.py [which]
  which in {bias, full, both (default)}
"""

import sys
import tempfile
import time

import jax
import jax.numpy as jnp


def t_call(fn, *args, n=10, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)  # second call at chained-layout signature
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"  {tag:34s} {dt * 1e3:9.3f} ms", flush=True)
    return dt, out


def profile_problem(problem, name):
    from visual_inertial_bundle_adjustment_tpu.problem import engine
    from visual_inertial_bundle_adjustment_tpu.problem import rcs
    from visual_inertial_bundle_adjustment_tpu.problem.structure import zero_tangent

    print(f"== {name} ==", flush=True)
    problem._build()  # runs finalize_blocks + transpose plans (mutates cfgs)
    cfgs = engine.prune_cfgs(tuple(problem.cfgs), problem.masks)
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lam = jnp.asarray(1e-4, v.points.dtype)
    for cfg in cfgs:
        bi = getattr(cfg, "block_info", None)
        if bi:
            print(f"  batch {cfg.kind}: nt={bi.nt} ts={bi.ts} rb={bi.rb} "
                  f"prb2={bi.prb2} nhg={bi.nhg} wb={bi.wb}", flush=True)

    f_lin = jax.jit(lambda dd, vv, mm: engine.linearize(cfgs, dd, vv, mm, None))
    lg = f_lin(datas, v, masks)
    jax.block_until_ready(lg)

    f_asm = jax.jit(lambda dd, l, vv, mm: rcs.assemble(cfgs, dd, l, vv, mm))
    _, asm = t_call(f_asm, datas, lg, v, masks, n=5, tag="assemble")

    f_damp = jax.jit(lambda a, vv, mm, l: rcs.with_damping(a, vv, mm, l))
    _, rs = t_call(f_damp, asm, v, masks, lam, n=5, tag="with_damping")

    ones = jax.tree_util.tree_map(jnp.ones_like, zero_tangent(v))

    f_mv = jax.jit(lambda r, vv, x: rcs.matvec(r, vv, x))
    t_mv, _ = t_call(f_mv, rs, v, ones, tag="matvec (S x)")

    f_wtx = jax.jit(lambda r, vv, x: rcs.w_transpose_x(r, vv, x))
    t_call(f_wtx, rs, v, ones, tag="w_transpose_x (down only)")

    zl = jnp.ones_like(v.points)
    f_wy = jax.jit(lambda r, vv, z: rcs.w_y(r, vv, z))
    t_call(f_wy, rs, v, zl, tag="w_y (up only)")

    f_chol = jax.jit(engine._chol_solve)
    t_call(f_chol, rs.H_ll_inv, zl, tag="chol_solve (L,3)")

    zp = jnp.zeros_like(v.points)
    f_rest = jax.jit(lambda r, vv, x: engine._hmatvec(
        engine.LinearizedGraph(r.rest.lins, r.rest.w, 0.0, (), (), 0, 0),
        vv, x, zp))
    t_call(f_rest, rs, v, ones, tag="rest _hmatvec")

    def run_pcg(r, vv, b, iters):
        return rcs.pcg(r, vv, b, iters, 1e-30)

    f_p1 = jax.jit(lambda r, vv, b: run_pcg(r, vv, b, 1))
    f_p40 = jax.jit(lambda r, vv, b: run_pcg(r, vv, b, 40))
    t1, _ = t_call(f_p1, rs, v, ones, n=5, tag="pcg(1)")
    t40, _ = t_call(f_p40, rs, v, ones, n=5, tag="pcg(40)")
    per = (t40 - t1) / 39.0
    print(f"  {'pcg per-iter marginal':34s} {per * 1e3:9.3f} ms "
          f"(loop-ops overhead {max(per - t_mv, 0) * 1e3:.3f} ms)", flush=True)

    f_sa = jax.jit(lambda a, vv, mm, l: rcs.solve_assembled(a, vv, mm, l, 40, 1e-30))
    t_call(f_sa, asm, v, masks, lam, n=5, tag="solve_assembled(40)")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import bench

    if which in ("bias", "both"):
        t0 = time.time()
        p = bench.build_problem()
        print(f"bias-only build: {time.time() - t0:.0f}s", flush=True)
        profile_problem(p, "bias-only 2-min")
        del p
    if which in ("full", "both"):
        t0 = time.time()
        with tempfile.TemporaryDirectory() as tmp:
            p = bench.build_full_sensor_problem(tmp)
        print(f"full-sensor build: {time.time() - t0:.0f}s", flush=True)
        profile_problem(p, "full-sensor 10-min")


if __name__ == "__main__":
    main()
