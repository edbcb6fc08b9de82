"""Chained-marginal timing of with_damping / assemble / linearize on the
full-sensor bench shape: jit a k-fold chain of the phase and report the
marginal cost per extra application (dispatch-overhead-free).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools_dev/profile_damp_parts.py [dur] [pts]
"""

import sys
import tempfile
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def marginal(make_chain, k1=1, k2=4, n=5, tag=""):
    f1, f2 = make_chain(k1), make_chain(k2)
    t1, t2 = timed(f1, n=n), timed(f2, n=n)
    m = (t2 - t1) / (k2 - k1)
    print(f"  {tag:44s} {m * 1e3:9.3f} ms (chain{k1}={t1*1e3:.1f}, "
          f"chain{k2}={t2*1e3:.1f})", flush=True)
    return m


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    import bench
    bench.FULL_DURATION, bench.FULL_POINTS = dur, pts
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        problem = bench.build_full_sensor_problem(tmp)
    print(f"build: {time.time() - t0:.0f}s", flush=True)

    from visual_inertial_bundle_adjustment_tpu.problem import engine, rcs
    from visual_inertial_bundle_adjustment_tpu.problem.structure import (
        retract, zero_tangent, t_scale)

    problem._build()
    cfgs = engine.prune_cfgs(tuple(problem.cfgs), problem.masks)
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lam0 = jnp.asarray(1e-4, v.points.dtype)

    lg = jax.jit(lambda dd, vv, mm: engine.linearize(cfgs, dd, vv, mm, None))(
        datas, v, masks)
    asm = jax.jit(lambda dd, l, vv, mm: rcs.assemble(cfgs, dd, l, vv, mm))(
        datas, lg, v, masks)
    jax.block_until_ready((lg, asm))

    # ---- with_damping marginal per preconditioner family ------------------
    for prec in ("gauss_seidel", "jacobi", "identity"):
        def chain(k, prec=prec):
            @jax.jit
            def f(a, vv, mm, lam):
                out = 0.0
                for i in range(k):
                    rs = rcs.with_damping(a, vv, mm, lam * (1.0 + 1e-6 * i),
                                          prec)
                    out = out + (rs.precond_inv.rig[0, 0, 0]
                                 if rs.precond_inv is not None
                                 else rs.H_ll_inv[0, 0, 0])
                return out
            return lambda: f(asm, v, masks, lam0)
        marginal(chain, tag=f"with_damping[{prec}]")

    # ---- matvec marginal (chained x -> Sx / |Sx|) -------------------------
    rs = jax.jit(lambda a, vv, mm, lam: rcs.with_damping(a, vv, mm, lam))(
        asm, v, masks, lam0)
    jax.block_until_ready(rs)
    ones = jax.tree_util.tree_map(jnp.ones_like, zero_tangent(v))

    def mv_chain(k):
        @jax.jit
        def f(r, vv, x):
            for _ in range(k):
                x = rcs.matvec(r, vv, x)
                nrm = jnp.sqrt(sum(jnp.vdot(a, a) for a in
                                   jax.tree_util.tree_leaves(x)).real)
                x = jax.tree_util.tree_map(lambda a: a / nrm, x)
            return x
        return lambda: f(rs, v, ones)
    marginal(mv_chain, tag="matvec (chained)")

    # ---- linearize marginal (chained via tiny retract) --------------------
    def lin_chain(k):
        @jax.jit
        def f(dd, vv, mm):
            c = 0.0
            for i in range(k):
                lg2 = engine.linearize(cfgs, dd, vv, mm, None)
                c = c + lg2.cost
                step = jax.tree_util.tree_map(
                    lambda a: jnp.full_like(a, 1e-9), zero_tangent(vv))
                vv = retract(vv, t_scale(step, 1.0),
                             jnp.full_like(vv.points, 1e-9), mm)
            return c
        return lambda: f(datas, v, masks)
    marginal(lin_chain, k1=1, k2=3, n=3, tag="linearize (chained)")

    # ---- assemble marginal (chained via scaled residuals) -----------------
    def asm_chain(k):
        @jax.jit
        def f(dd, l, vv, mm):
            out = 0.0
            for i in range(k):
                l2 = l._replace(lins=jax.tree_util.tree_map(
                    lambda a: (a * (1.0 + 1e-6 * i)
                               if jnp.issubdtype(a.dtype, jnp.floating) else a),
                    l.lins))
                a2 = rcs.assemble(cfgs, dd, l2, vv, mm)
                out = out + a2.g_r.rig[0, 0]
            return out
        return lambda: f(datas, lg, v, masks)
    marginal(asm_chain, k1=1, k2=3, n=3, tag="assemble (chained)")

    # ---- rest _hmatvec marginal -------------------------------------------
    zp = jnp.zeros_like(v.points)

    def rest_chain(k):
        @jax.jit
        def f(r, vv, x):
            for _ in range(k):
                hx, _ = engine._hmatvec(
                    engine.LinearizedGraph(r.rest.lins, r.rest.w, 0.0, (), (),
                                           0, 0), vv, x, zp)
                nrm = jnp.sqrt(sum(jnp.vdot(a, a) for a in
                                   jax.tree_util.tree_leaves(hx)).real) + 1.0
                x = jax.tree_util.tree_map(lambda a: a / nrm, hx)
            return x
        return lambda: f(rs, v, ones)
    marginal(rest_chain, k1=1, k2=5, tag="rest _hmatvec (chained)")

    # ---- pcg marginal ------------------------------------------------------
    def pcg_m(it):
        @jax.jit
        def f(a, vv, mm, lam):
            return rcs.solve_assembled(a, vv, mm, lam, it, 1e-30)[0].rig[0, 0]
        return lambda: f(asm, v, masks, lam0)
    f1, f40 = pcg_m(1), pcg_m(40)
    t1 = timed(f1, n=5)
    t40 = timed(f40, n=5)
    print(f"  {'solve(1) / solve(40)':44s} {t1*1e3:9.1f} / {t40*1e3:9.1f} ms"
          f" -> pcg marginal {(t40-t1)/39*1e3:.3f} ms", flush=True)

    # ---- comparable_cost marginal -----------------------------------------
    def cost_chain(k):
        @jax.jit
        def f(dd, vv, l):
            c = 0.0
            for i in range(k):
                st = engine.comparable_cost(cfgs, dd, vv, l)
                c = c + st.cost
                step = jax.tree_util.tree_map(
                    lambda a: jnp.full_like(a, 1e-9), zero_tangent(vv))
                vv = retract(vv, step, jnp.full_like(vv.points, 1e-9),
                             problem.masks)
            return c
        return lambda: f(datas, v, lg)
    marginal(cost_chain, k1=1, k2=3, n=3, tag="comparable_cost (chained)")


if __name__ == "__main__":
    main()
