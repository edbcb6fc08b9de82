"""Per-landmark 3x3 mini-LM run before the full optimization.

Counterpart of reference viba/problem/PointRefinement.cpp:22-196: the
reference discovers visual factors by demangled-type-name introspection and
runs a small per-point LM (5 iterations, damping 1e-5, reduced-step retry);
here the visual batches are explicit, all landmarks refine as one vmapped
batch of damped 3x3 solves with a cost-increase step-halving retry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import losses
from . import factors as fct

NUM_ITERATIONS = 5  # reference PointRefinement.cpp
DAMPING = 1e-5
NUM_STEP_RETRIES = 2


def _point_cost_grad_hess(problem, points):
    """Total robust cost / grad / Gauss-Newton Hessian per landmark (L,...)."""
    v = problem.variables._replace(points=points)
    L = points.shape[0]
    dtype = points.dtype
    cost = jnp.zeros(L, dtype)
    grad = jnp.zeros((L, 3), dtype)
    hess = jnp.zeros((L, 3, 3), dtype)
    for cfg, data in zip(problem.cfgs, problem.datas):
        spec = fct.REGISTRY[cfg.kind]
        if not any(g == fct.POINTS for g, _ in spec["tangents"]):
            continue
        # only the 3 landmark tangent columns are needed — dropping every
        # other group skips their forward-AD columns entirely (the reference
        # passes NullRefs for non-point Jacobians, PointRefinement.cpp:96-158)
        cfg = dataclasses.replace(cfg, active_groups=(fct.POINTS,))
        lin = fct.linearize_batch(cfg, data, v, problem.masks)
        s = jnp.sum(lin.res * lin.res, axis=0)
        kind, a, k = cfg.loss
        val, der = losses.loss_jet2(kind, a, k, s)
        w = der * lin.valid
        for g, idx, J, ell in zip(lin.groups, lin.idx, lin.jac, lin.ell):
            if g != fct.POINTS:
                continue
            cost = cost + fct.scatter_rows(ell, idx, (0.5 * val * lin.valid)[None], L)[:, 0]
            gc = jnp.einsum("dkn,dn->kn", J, w[None, :] * lin.res)
            grad = grad + fct.scatter_rows(ell, idx, gc, L)
            hc = jnp.einsum("dan,dbn->abn", J * w[None, None, :], J)
            hess = hess + fct.scatter_rows(ell, idx, hc, L)
    return cost, grad, hess


def refine_points(problem, log=None):
    """Refine all landmarks in place; returns (new_points, info dict)."""
    pts0 = problem.variables.points
    if pts0.shape[0] == 0:
        return pts0, {}

    def body(_, pts):
        cost, grad, hess = _point_cost_grad_hess(problem, pts)
        eye = jnp.eye(3, dtype=pts.dtype)
        diag = jnp.diagonal(hess, axis1=-2, axis2=-1)
        hd = hess + eye * (DAMPING * diag + DAMPING)[..., None, :] * eye
        step = -jnp.linalg.solve(hd, grad[..., None])[..., 0]
        step = jnp.where(jnp.isfinite(step), step, 0.0)

        new_pts = pts + step
        new_cost, _, _ = _point_cost_grad_hess(problem, new_pts)
        # reduced-step retry for points whose cost increased
        for _ in range(NUM_STEP_RETRIES):
            worse = new_cost > cost
            step = jnp.where(worse[:, None], step * 0.5, step)
            new_pts = pts + step
            new_cost, _, _ = _point_cost_grad_hess(problem, new_pts)
        accept = (new_cost <= cost)[:, None]
        return jnp.where(accept, new_pts, pts)

    pts = jax.lax.fori_loop(0, NUM_ITERATIONS, body, pts0)
    problem.variables = problem.variables._replace(points=pts)
    if log:
        c0, _, _ = _point_cost_grad_hess(problem, pts0)
        c1, _, _ = _point_cost_grad_hess(problem, pts)
        log(f"refinePoints: cost {float(c0.sum()):.6g} -> {float(c1.sum()):.6g}")
    return pts, {}
