"""Runtime self-verification: numeric-vs-analytic Jacobians and the
nonlinearity debugger.

Counterpart of reference Optimizer::verifyJacobians (Factor.h:256-387,
Optimizer.cpp:73-86 — numeric check over a sample of every factor type in a
built problem) and the predicted-vs-actual cost-delta inspection
(--debug-nonlinearities-at, Optimizer.cpp:702-766).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from . import factors as fct
from .structure import retract, t_scale, zero_tangent


def verify_jacobians(problem, sample=100, eps=1e-6, tol=1e-4, log=print):
    """Numeric-vs-analytic check over a factor sample of every batch.

    Returns True if every sampled Jacobian column matches central differences
    within `tol` (column-scaled)."""
    rng = np.random.default_rng(0)
    v = problem.variables
    masks = problem.masks
    ok_all = True
    for cfg, data in zip(problem.cfgs, problem.datas):
        lin = fct.linearize_batch(cfg, data, v, masks)
        n = lin.res.shape[-1]
        rows = rng.choice(n, size=min(sample, n), replace=False)
        spec = fct.REGISTRY[cfg.kind]
        args = spec["args"](v, data)
        worst = 0.0
        for r in rows:
            ar = jax.tree_util.tree_map(lambda a: a[r], args)
            zeros = tuple(
                jnp.zeros(fct.GROUP_DIMS[g], v.points.dtype) for g, _ in spec["tangents"]
            )
            for t_i, (g, _) in enumerate(spec["tangents"]):
                dim = fct.GROUP_DIMS[g]
                for d in range(dim):
                    def f(x):
                        ts = list(zeros)
                        ts[t_i] = ts[t_i].at[d].set(x)
                        res, _ = spec["local"](tuple(ts), ar, cfg)[1]
                        return res

                    num = (np.asarray(f(eps)) - np.asarray(f(-eps))) / (2 * eps)
                    # find this tangent among the (possibly filtered) lin entries
                    positions = [
                        k for k, (gg, ii) in enumerate(zip(lin.groups, lin.idx)) if gg == g
                    ]
                    # count which occurrence of group g this tangent is
                    occ = sum(1 for gg, _ in spec["tangents"][:t_i] if gg == g)
                    if occ >= len(positions):
                        continue  # tangent dropped (constant group)
                    k = positions[occ]
                    ana = np.asarray(lin.jac[k][:, d, r])
                    # analytic is mask-scaled; skip masked dims
                    m = np.asarray(getattr(masks, g))
                    mrow = m if m.ndim == 1 else m[int(np.asarray(lin.idx[k][r]))]
                    if mrow[d] == 0:
                        continue
                    scale = max(np.abs(num).max(), 1.0)
                    err = np.abs(ana - num).max() / scale
                    worst = max(worst, err)
        status = "OK" if worst < tol else "MISMATCH"
        ok_all &= worst < tol
        log(f"verifyJacobians[{cfg.label or cfg.kind}]: worst col-rel err {worst:.2e} {status}")
    return ok_all


def debug_nonlinearities(problem, lam=1e-4, top=5, log=print):
    """Predicted-vs-actual per-batch cost deltas for one damped GN step.

    Reference Optimizer.cpp:702-766: reports the factor classes whose actual
    cost change deviates most from the quadratic model."""
    cfgs, datas = tuple(problem.cfgs), tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lg = engine.linearize(cfgs, datas, v, masks)
    x_r, x_l, model_red, *_ = engine.solve_step(
        cfgs, datas, lg, v, masks, jnp.asarray(lam, v.points.dtype), max_iters=400,
        rel_tol=1e-12,
    )
    v2 = retract(v, t_scale(x_r, -1.0), -x_l, masks)
    rows = []
    for cfg, data, stored, v0 in zip(cfgs, datas, lg.stored_cost, lg.valid0):
        res, valid = fct.residual_batch(cfg, data, v2)
        cost_new, _ = engine._batch_cost_terms(cfg, res, valid)
        actual = float(jnp.sum(cost_new) - jnp.sum(stored))
        rows.append((cfg.label or cfg.kind, float(jnp.sum(stored)), actual))
    rows.sort(key=lambda r: r[2])
    log("nonlinearity debug (per batch cost deltas for one GN step):")
    for name, c0, dc in rows[: top + len(rows)]:
        log(f"  {name}: cost {c0:.6g}, actual delta {dc:+.6g}")
    log(f"  total model reduction: {float(model_red):.6g}")
    return rows
