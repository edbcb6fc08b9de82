"""Trustworthy per-phase timing at reduced full-sensor scale.

Through the axon tunnel `jax.block_until_ready` does not wait for remote
execution and identical execution requests are served from a cache, so the
classic time-N-identical-calls profiler (profile_full_phases.py) measures
neither reliably. Here every phase is timed as the MARGINAL of an in-jit
chained loop (k=1 vs k2), each repetition carries a distinct seed scalar,
and every measurement ends in a scalar fetch (float()) that forces a full
sync.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python tools_dev/profile_marginals.py [duration] [points]
"""

import sys
import time

import jax
import jax.numpy as jnp

from profile_full_sensor import build  # noqa: E402 (same dir)


def marginal(make, k1=1, k2=6, n=2, tag="", args=()):
    """args: large device structures passed as jit ARGUMENTS (closing over
    them embeds them in the HLO and trips the tunnel's ~100 MB limit)."""
    f1, f2 = jax.jit(make(k1)), jax.jit(make(k2))

    def t(f):
        _ = float(f(*args, jnp.float32(0.5)))
        _ = float(f(*args, jnp.float32(0.75)))
        t0 = time.time()
        for i in range(n):
            _ = float(f(*args, jnp.float32(1.0 + 1e-3 * i)))
        return (time.time() - t0) / n

    t1, t2 = t(f1), t(f2)
    m = (t2 - t1) / (k2 - k1)
    print(f"{tag:36s} {m * 1e3:8.2f} ms  (c{k1}={t1*1e3:.1f}, c{k2}={t2*1e3:.1f})",
          flush=True)
    return m


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 18000
    t0 = time.time()
    problem = build(dur, pts)
    print(f"build: {time.time() - t0:.1f}s", flush=True)

    from visual_inertial_bundle_adjustment_tpu.problem import engine
    from visual_inertial_bundle_adjustment_tpu.problem import rcs
    from visual_inertial_bundle_adjustment_tpu.problem.structure import (
        retract,
        t_scale,
    )

    (k_lin, k_solve, k_resolve, k_cost, k_grad, k_retract,
     k_assemble, k_step) = problem._build()
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    cfgs = engine.prune_cfgs(tuple(problem.cfgs), masks)
    n_obs = sum(int(d["rig"].shape[0]) for c, d in zip(cfgs, datas)
                if c.kind in ("visual", "rs_visual"))
    print(f"n_obs={n_obs}", flush=True)

    def perturb(v, s):
        return v._replace(points=v.points * (1.0 + 1e-9 * s))

    def mk_lin(k):
        def f(dd, s):
            acc = 0.0
            for i in range(k):
                lg = engine.linearize(cfgs, dd, perturb(v, s + i), masks,
                                      None)
                acc = acc + lg.cost
            return acc
        return f

    def mk_lin_asm(k):
        def f(dd, s):
            acc = 0.0
            for i in range(k):
                vv = perturb(v, s + i)
                lg = engine.linearize(cfgs, dd, vv, masks, None)
                asm = rcs.assemble(cfgs, dd, lg, vv, masks)
                acc = acc + lg.cost + asm.g_l[0, 0]
            return acc
        return f

    lg0 = jax.jit(lambda dd: engine.linearize(cfgs, dd, v, masks, None))(
        datas)
    asm0 = jax.jit(lambda dd, lg: rcs.assemble(cfgs, dd, lg, v, masks))(
        datas, lg0)
    jax.block_until_ready((lg0, asm0))

    def mk_damp(k):
        def f(a0, s):
            acc = 0.0
            for i in range(k):
                rs = rcs.with_damping(a0, v, masks,
                                      1e-4 * (s + 1e-5 * i))
                acc = acc + rs.precond_inv.rig[0, 0, 0] + rs.H_ll_inv[0, 0, 0]
            return acc
        return f

    def mk_solve(pcg):
        def mk(k):
            def f(a0, s):
                acc = 0.0
                for i in range(k):
                    out = rcs.solve_assembled(
                        a0, v, masks, 1e-4 * (s + 1e-5 * i), pcg, 1e-30)
                    acc = acc + out[0].rig[0, 0]
                return acc
            return f
        return mk

    def mk_cost(k):
        def f(dd, lg, s):
            acc = 0.0
            for i in range(k):
                st = engine.comparable_cost(cfgs, dd, perturb(v, s + i), lg)
                acc = acc + st.cost
            return acc
        return f

    def mk_retract(k):
        def f(xr, xl, s):
            acc = 0.0
            vv = v
            for i in range(k):
                # reuse a solved step scaled by the seed for the chain
                vv = retract(vv, t_scale(xr, -1e-9 * (s + i)),
                             xl * (-1e-9 * (s + i)), masks)
                acc = acc + vv.points[0, 0]
            return acc
        return f

    out0 = jax.jit(lambda a0: rcs.solve_assembled(a0, v, masks, 1e-4, 1,
                                                  1e-30))(asm0)
    x_r0, x_l0 = out0[0], out0[1]
    jax.block_until_ready((x_r0, x_l0))

    def mk_iter(k):
        lam = jnp.asarray(1e-4, v.points.dtype)

        def f(dd, s):
            vv = perturb(v, s)
            st = None
            for _ in range(k):
                lg = engine.linearize(cfgs, dd, vv, masks, None)
                asm = rcs.assemble(cfgs, dd, lg, vv, masks)
                out = rcs.solve_assembled(asm, vv, masks, lam, 40, 1e-10)
                x_r, x_l = out[0], out[1]
                vv = retract(vv, t_scale(x_r, -1.0), -x_l, masks)
                st = engine.comparable_cost(cfgs, dd, vv, lg)
            return st.cost
        return f

    marginal(mk_lin, tag="linearize", args=(datas,))
    marginal(mk_lin_asm, tag="linearize+assemble", args=(datas,))
    marginal(mk_damp, tag="with_damping", args=(asm0,))
    marginal(mk_solve(1), tag="solve(1 pcg)", args=(asm0,))
    marginal(mk_solve(11), tag="solve(11 pcg)", args=(asm0,))
    marginal(mk_cost, tag="comparable_cost", args=(datas, lg0))
    marginal(mk_retract, k1=1, k2=11, tag="retract", args=(x_r0, x_l0))
    marginal(mk_iter, k1=1, k2=3, tag="FULL LM iter (in-jit chained)",
             args=(datas,))


if __name__ == "__main__":
    main()
