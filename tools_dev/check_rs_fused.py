"""Dev check: fused RS linearize/residual kernel (ops/rs_fused) vs the
generic jacrev path on a full-sensor session (real TPU). Also times both.

Usage: python tools_dev/check_rs_fused.py [duration] [points]
"""
import sys
import time

sys.path.insert(0, ".")

import dataclasses

import jax
import numpy as np

from profile_full_sensor import build  # noqa: E402 (same dir)
from visual_inertial_bundle_adjustment_tpu.problem import factors as fct


def timeit(fn, *args, reps=10, warmup=2):
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
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    problem = build(dur, pts)
    problem._build()
    v, masks = problem.variables, problem.masks
    cfgs = [
        dataclasses.replace(
            c, active_groups=tuple(
                g for g, _ in fct.REGISTRY[c.kind]["tangents"]))
        for c in problem.cfgs
    ]
    for cfg, data in zip(cfgs, problem.datas):
        if cfg.kind != "rs_visual" or not getattr(cfg, "block_info", None):
            continue
        print(f"rs batch n={data['rig'].shape[0]} block={cfg.block_info} "
              f"groups={cfg.active_groups}")
        lin_f = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data)
        data_g = {k: a for k, a in data.items() if k != "_uvT"}
        lin_g = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data_g)
        assert lin_f.groups == lin_g.groups, (lin_f.groups, lin_g.groups)
        real = np.asarray(data["_pad"]) < 0.5
        valid_b = (np.asarray(lin_g.valid) > 0.5) & real
        sres = np.abs(np.asarray(lin_g.res)[:, valid_b]).max()
        cmp("res", np.asarray(lin_f.res)[:, valid_b],
            np.asarray(lin_g.res)[:, valid_b], 1e-5, sres)
        cmp("valid", np.asarray(lin_f.valid)[real],
            np.asarray(lin_g.valid)[real], 1e-6, 1.0)
        for g, Jf, Jg in zip(lin_f.groups, lin_f.jac, lin_g.jac):
            cmp(f"jac[{g}]", np.asarray(Jf)[..., valid_b],
                np.asarray(Jg)[..., valid_b], 3e-4,
                np.abs(np.asarray(Jg)[..., valid_b]).max())
        rf, vf = jax.jit(lambda d: fct.residual_batch(cfg, d, v))(data)
        rg, vg = jax.jit(lambda d: fct.residual_batch(cfg, d, v))(data_g)
        cmp("res-only", np.asarray(rf)[valid_b.T if rf.ndim == 2 else valid_b],
            np.asarray(rg)[valid_b.T if rg.ndim == 2 else valid_b], 1e-5, sres)
        t_f = timeit(lambda d: fct.linearize_batch(cfg, d, v, masks), data)
        t_g = timeit(lambda d: fct.linearize_batch(cfg, d, v, masks), data_g,
                     reps=3)
        t_rf = timeit(lambda d: fct.residual_batch(cfg, d, v), data)
        t_rg = timeit(lambda d: fct.residual_batch(cfg, d, v), data_g, reps=3)
        print(f"  linearize fused {t_f:7.2f} ms vs generic {t_g:7.2f} ms")
        print(f"  residual  fused {t_rf:7.2f} ms vs generic {t_rg:7.2f} ms")
    print("all ok")


if __name__ == "__main__":
    main()
