"""Dev check: fused visual linearize/residual kernel vs the generic
vmapped-jacfwd path on the bench problem (real TPU). Also times both."""
import sys, time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from visual_inertial_bundle_adjustment_tpu.ops import visual_fused
from visual_inertial_bundle_adjustment_tpu.problem import factors as fct


def timeit(fn, *args, reps=20, warmup=3):
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
    return (time.perf_counter() - t0) / reps * 1e3


def cmp(name, a, b, tol, scale=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    s = scale if scale is not None else np.abs(b).max() + 1e-30
    err = np.abs(a - b).max() / s
    print(f"  {name:18s} rel-err {err:.2e}  {'OK' if err < tol else 'FAIL'}")
    assert err < tol, name


def main():
    problem = bench.build_problem()
    problem._build()
    v, masks = problem.variables, problem.masks
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind != "visual" or not getattr(cfg, "block_info", None):
            continue
        import dataclasses
        cfg = dataclasses.replace(cfg, active_groups=(fct.POINTS, fct.RIG))
        lin_f = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data)
        cfg_g = cfg
        data_g = dict(data)
        del data_g["_uvT"]  # disable the fused hook
        lin_g = jax.jit(lambda d: fct.linearize_batch(cfg_g, d, v, masks))(data_g)
        assert lin_f.groups == lin_g.groups, (lin_f.groups, lin_g.groups)
        # pads project garbage; compare only real rows
        real = np.asarray(data["_pad"]) < 0.5
        sres = np.abs(np.asarray(lin_g.res)[:, real]).max()
        cmp("res", np.asarray(lin_f.res)[:, real],
            np.asarray(lin_g.res)[:, real], 1e-5, sres)
        cmp("valid", np.asarray(lin_f.valid)[real],
            np.asarray(lin_g.valid)[real], 1e-6, 1.0)
        for g, Jf, Jg in zip(lin_f.groups, lin_f.jac, lin_g.jac):
            cmp(f"jac[{g}]", np.asarray(Jf)[..., real],
                np.asarray(Jg)[..., real], 2e-4,
                np.abs(np.asarray(Jg)[..., real]).max())
        t_f = timeit(lambda d: fct.linearize_batch(cfg, d, v, masks), data)
        t_g = timeit(lambda d: fct.linearize_batch(cfg_g, d, v, masks), data_g)
        t_rf = timeit(lambda d: fct.residual_batch(cfg, d, v), data)
        t_rg = timeit(lambda d: fct.residual_batch(cfg_g, d, v), data_g)
        print(f"  linearize fused {t_f:7.2f} ms vs generic {t_g:7.2f} ms")
        print(f"  residual  fused {t_rf:7.2f} ms vs generic {t_rg:7.2f} ms")
    print("all ok")


if __name__ == "__main__":
    main()
