"""Condensed (marginal) factors: quadratic factors re-injecting marginalized
information.

Counterpart of reference lib/small_thing/CondensedFactor.h:36-572 +
Proxies.h: a condensed factor is 1/2 x^T H x + b^T x + c over
proxy-transformed variables, where x stacks box-minus deltas against stored
linearization points (DirectForward proxies, with the SE3/S2/vector box ops)
or relative-pose logs (ProxyRelativePoses). In the whitened-residual engine
it becomes res = A x + u with H = A^T A (A = chol(H)^T) and u = A^-T b, so
the generic machinery reproduces gradient H x + b and Gauss-Newton Hessian H
exactly (cost differs by the constant c, which LM never uses).

One batch kind exists per static signature `condensed_rigs{K}`: K rig states
(pose+vel+omega, 12 dims each) plus gravity (2), D = 12K + 2. The builder
`marginalize_onto_rigs` computes (H, b) of the full problem marginalized onto
the kept rigs (reference computeMarginalProblem, Optimizer.cpp:422-494) via
Schur-reduced covariance solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from . import covariance, engine
from . import factors as fct
from .structure import GRAVITY_MAG, OMEGA, POSE, VEL


def _condensed_local(ts, ar, cfg):
    K = (len(ts) - 1)
    xs = []
    for k in range(K):
        xi = ts[k]
        Tq, Tt = fct._se3_at(ar[f"pose_q{k}"], ar[f"pose_t{k}"], xi[POSE])
        dpose = lie.se3_boxminus((Tq, Tt), (ar[f"lin_q{k}"], ar[f"lin_t{k}"]))
        dvel = ar[f"vel{k}"] + xi[VEL] - ar[f"lin_vel{k}"]
        dom = ar[f"omega{k}"] + xi[OMEGA] - ar[f"lin_omega{k}"]
        xs.append(jnp.concatenate([dpose, dvel, dom]))
    grav = lie.s2_boxplus(ar["grav"], GRAVITY_MAG, ts[-1])
    xs.append(lie.s2_boxminus(grav, ar["lin_grav"], GRAVITY_MAG))
    x = jnp.concatenate(xs)
    res = ar["A"] @ x + ar["u"]
    return res, (res, jnp.asarray(True))


def _condensed_args(K):
    def fn(v, d):
        out = {}
        for k in range(K):
            idx = d[f"rig{k}"]
            out[f"pose_q{k}"] = fct._take(v.pose_q, idx)
            out[f"pose_t{k}"] = fct._take(v.pose_t, idx)
            out[f"vel{k}"] = fct._take(v.vel, idx)
            out[f"omega{k}"] = fct._take(v.omega, idx)
            for f in (f"lin_q{k}", f"lin_t{k}", f"lin_vel{k}", f"lin_omega{k}"):
                out[f] = d[f]
        n = d["rig0"].shape[0]
        out["grav"] = jnp.broadcast_to(v.gravity, (n, 3))
        out["lin_grav"] = d["lin_grav"]
        out["A"] = d["A"]
        out["u"] = d["u"]
        return out

    return fn


def ensure_condensed_kind(K: int) -> str:
    """Register (once) the batch kind for K rig states + gravity."""
    kind = f"condensed_rigs{K}"
    if kind not in fct.REGISTRY:
        fct.REGISTRY[kind] = dict(
            local=_condensed_local,
            args=_condensed_args(K),
            tangents=[(fct.RIG, f"rig{k}") for k in range(K)] + [(fct.GRAVITY, None)],
            optional=False,
        )
    return kind


def make_condensed_batch(v, rig_indices, H, b):
    """Batch data for ONE condensed factor over `rig_indices` + gravity.

    H: (D, D) marginal information, b: (D,) gradient at the current values
    (which become the stored linearization points). D = 12*K + 2."""
    K = len(rig_indices)
    D = 12 * K + 2
    assert H.shape == (D, D) and b.shape == (D,)
    # H = A^T A with A upper triangular; u = A^-T b
    w, V = np.linalg.eigh(0.5 * (H + H.T))
    w = np.maximum(w, 1e-12 * max(w.max(), 1.0))
    A = (V * np.sqrt(w)) @ V.T  # symmetric sqrt (works for PSD marginals)
    u = np.linalg.solve(A.T, b)
    data = {}
    for k, r in enumerate(rig_indices):
        data[f"rig{k}"] = jnp.asarray([r], jnp.int32)
        data[f"lin_q{k}"] = v.pose_q[r][None]
        data[f"lin_t{k}"] = v.pose_t[r][None]
        data[f"lin_vel{k}"] = v.vel[r][None]
        data[f"lin_omega{k}"] = v.omega[r][None]
    data["lin_grav"] = v.gravity[None]
    data["A"] = jnp.asarray(A)[None]
    data["u"] = jnp.asarray(u)[None]
    return ensure_condensed_kind(K), data


def marginalize_onto_rigs(problem, rig_indices, lam=1e-7, **kw):
    """(H, b) of the problem marginalized onto rigs + gravity.

    b = Hm x* where x* is the full minimizer restricted to the kept entries
    (equivalently the Schur-reduced gradient), so that re-injecting the
    factor reproduces the marginal's minimum at the current linearization.
    """
    entries = [("rig", int(r), d) for r in rig_indices for d in range(12)]
    entries += [("gravity", 0, d) for d in range(2)]
    Hm = covariance.marginal_information(problem, entries, lam=lam, **kw)

    # full gradient and solve
    cfgs, datas = tuple(problem.cfgs), tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lg = engine.linearize(cfgs, datas, v, masks)
    x_r, x_l, *_ = engine.solve_step(
        cfgs, datas, lg, v, masks, jnp.asarray(lam, v.points.dtype),
        max_iters=kw.get("pcg_iters", 800), rel_tol=kw.get("pcg_tol", 1e-12),
    )
    xk = []
    for r in rig_indices:
        xk.append(np.asarray(x_r.rig[int(r)]))
    xk.append(np.asarray(x_r.gravity))
    xstar = np.concatenate(xk)
    b = Hm @ xstar
    return Hm, b
