"""Dev tool: per-component timing of the blocked RCS matvec on the bench
workload. Not part of the package; run as
  python tools_dev/profile_matvec.py
"""
import sys
import os
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from visual_inertial_bundle_adjustment_tpu.ops import segments as seg
from visual_inertial_bundle_adjustment_tpu.problem import engine, factors as fct, rcs
from visual_inertial_bundle_adjustment_tpu.problem.structure import (
    Tangent, t_axpy, t_dot, zero_tangent,
)


def timeit(fn, *args, reps=30, warmup=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    t0 = time.time()
    def log(m):
        print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
    log("building problem...")
    problem = bench.build_problem()
    log("problem built")
    kernels = problem._build()
    k_lin, k_solve, k_resolve, k_cost, k_grad, k_retract, k_assemble = kernels
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lam = jnp.asarray(1e-4, v.points.dtype)

    lg = k_lin(datas, v, masks, None)
    log("linearized")
    asm = k_assemble(datas, lg, v, masks)
    log("assembled")
    rs = jax.jit(rcs.with_damping)(asm, v, masks, lam)
    jax.block_until_ready(rs)

    b = asm.g_r
    x = b

    print("=== matvec components ===")
    print(f"full matvec:        {timeit(lambda rs, v, x: rcs.matvec(rs, v, x), rs, v, x):8.3f} ms")

    vis = rs.vis
    assert len(vis) >= 1
    for bi, vb in enumerate(vis):
        info = vb.info
        print(f"batch {bi}: groups={vb.groups} nt={info.nt} ts={info.ts} "
              f"pnt={info.pnt} N={vb.w.shape[0]}")
        if vb.groups == (fct.RIG,):
            (J,) = vb.jac
            t_g = timeit(
                lambda xr: seg.gather_tiles(xr, vb.rb_rows, info.nt, info.rb), x.rig)
            xt = jax.jit(lambda xr: seg.gather_tiles(xr, vb.rb_rows, info.nt, info.rb))(x.rig)
            t_f = timeit(
                lambda J, w, xt: seg.seg_mv_fused(J, w, xt, vb.rb_local, info.nt, info.ts, info.rb),
                J, vb.w, xt)
            wu, part = jax.jit(
                lambda J, w, xt: seg.seg_mv_fused(J, w, xt, vb.rb_local, info.nt, info.ts, info.rb)
            )(J, vb.w, xt)
            t_s = timeit(
                lambda p: seg.scatter_partials(p, vb.rb_rows, x.rig.shape[0], info.rb), part)
            print(f"  gather_tiles(rig): {t_g:8.3f} ms")
            print(f"  seg_mv_fused:      {t_f:8.3f} ms")
            print(f"  scatter_partials:  {t_s:8.3f} ms")
            t_perm = timeit(lambda wu: rcs.permute_cols(wu, vb.pt_perm), wu)
            print(f"  permute rig->pt:   {t_perm:8.3f} ms")
            u_po = jax.jit(lambda wu: rcs.permute_cols(wu, vb.pt_perm))(wu)
            t_ptred = timeit(
                lambda Jp, u: seg.seg_mv_scatter(Jp, u, vb.pt_local, info.pnt, info.pts, info.prb),
                vb.J_pt_po, u_po)
            ppart = jax.jit(
                lambda Jp, u: seg.seg_mv_scatter(Jp, u, vb.pt_local, info.pnt, info.pts, info.prb)
            )(vb.J_pt_po, u_po)
            t_ps = timeit(
                lambda p: seg.scatter_partials(p, vb.pt_rows, v.points.shape[0], info.prb), ppart)
            print(f"  pt seg_mv_scatter: {t_ptred:8.3f} ms")
            print(f"  pt scatter_part:   {t_ps:8.3f} ms")
            t_chol = timeit(lambda Hi, t: engine._chol_solve(Hi, t), rs.H_ll_inv,
                            jnp.zeros_like(v.points))
            print(f"  chol_solve:        {t_chol:8.3f} ms")
            # w_y components
            zl = jnp.zeros_like(v.points)
            t_gt = timeit(lambda z: seg.gather_tiles(z, vb.pt_rows, info.pnt, info.prb), zl)
            yt = jax.jit(lambda z: seg.gather_tiles(z, vb.pt_rows, info.pnt, info.prb))(zl)
            t_pg = timeit(
                lambda Jp, yt: seg.seg_mv_gather(Jp, yt, vb.pt_local, info.pnt, info.pts, info.prb),
                vb.J_pt_po, yt)
            u2_po = jax.jit(
                lambda Jp, yt: seg.seg_mv_gather(Jp, yt, vb.pt_local, info.pnt, info.pts, info.prb)
            )(vb.J_pt_po, yt)
            t_permb = timeit(lambda u: rcs.permute_cols(u, vb.pt_inv) * vb.w[None, :], u2_po)
            u2 = jax.jit(lambda u: rcs.permute_cols(u, vb.pt_inv) * vb.w[None, :])(u2_po)
            t_vs = timeit(
                lambda J, u: seg.seg_mv_scatter(J, u, vb.rb_local, info.nt, info.ts, info.rb),
                J, u2)
            print(f"  w_y gather_tiles:  {t_gt:8.3f} ms")
            print(f"  w_y seg_mv_gather: {t_pg:8.3f} ms")
            print(f"  w_y permute back:  {t_permb:8.3f} ms")
            print(f"  w_y rig scatter:   {t_vs:8.3f} ms")

    def rest_mv(x):
        hx, _ = engine._hmatvec(
            engine.LinearizedGraph(rs.rest.lins, rs.rest.w, 0.0, (), (), 0, 0),
            v, x, jnp.zeros_like(v.points))
        return hx
    print(f"rest hmatvec:       {timeit(rest_mv, x):8.3f} ms")
    print(f"  rest lins: {len(rs.rest.lins)} kinds, sizes "
          f"{[l.res.shape for l in rs.rest.lins]}")

    def damp_tree(x):
        return jax.tree_util.tree_map(
            lambda h, d, xv: h + rs.lam * (d * xv) + rs.lam * xv, x, rs.diag_r, x)
    print(f"damp tree ops:      {timeit(damp_tree, x):8.3f} ms")
    print(f"apply precond:      {timeit(lambda r: rcs._apply_precond(rs, r), x):8.3f} ms")
    print(f"t_dot:              {timeit(lambda a, b: t_dot(a, b), x, b):8.3f} ms")

    print("=== per-lambda (with_damping) ===")
    print(f"with_damping:       {timeit(lambda a: rcs.with_damping(a, v, masks, lam), asm):8.3f} ms")
    Hll_inv = rs.H_ll_inv
    print(f"  precond_finish:   {timeit(lambda a, Hi: rcs._precond_finish(a, v, masks, lam, Hi), asm, Hll_inv):8.3f} ms")

    print("=== per-linearization ===")
    print(f"linearize:          {timeit(lambda d, v: k_lin(d, v, masks, None), datas, v):8.3f} ms")
    print(f"assemble:           {timeit(lambda d, lg, v: k_assemble(d, lg, v, masks), datas, lg, v):8.3f} ms")
    print(f"cost:               {timeit(lambda d, v: k_cost(d, v, lg), datas, v):8.3f} ms")


if __name__ == "__main__":
    main()
