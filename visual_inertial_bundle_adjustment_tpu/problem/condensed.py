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


#
# Relative (gauge-invariant) condensed factors — reference Proxies.h
# (ProxyRelativePoses :152-196, ProxyTransformedVelocities :252-295,
# ProxyS2 :57-104): the marginal's coordinates are re-expressed relative to a
# base pose variable, so re-injecting into a problem whose world frame has
# moved (applyWorldTransformation) leaves the factor's cost unchanged, and
# the information correctly follows the base pose.
#
# x layout (matching marginalize_rel_onto_rigs entry order):
#   [base vel (3, base-frame), base omega (3)]
#   + per rig k: [rel-pose log (6), vel in base frame (3), omega (3)]
#   + gravity in base frame (S2 tangent, 2)
# D = 6 + 12K + 2. Omegas are body-frame (gyro) quantities, hence already
# gauge-invariant and forwarded directly (DirectForward).
#


def _condensed_rel_local(ts, ar, cfg):
    K = len(ts) - 2  # ts = [base, rig0..rig{K-1}, gravity]
    xib = ts[0]
    Tbq, Tbt = fct._se3_at(ar["base_q"], ar["base_t"], xib[POSE])
    Tb_inv = lie.se3_inverse((Tbq, Tbt))
    xs = [
        lie.quat_rotate(Tbq, ar["base_vel"] + xib[VEL]) - ar["lin_bvel"],
        ar["base_omega"] + xib[OMEGA] - ar["lin_bomega"],
    ]
    for k in range(K):
        xi = ts[k + 1]
        Ti = fct._se3_at(ar[f"pose_q{k}"], ar[f"pose_t{k}"], xi[POSE])
        rel = lie.se3_mul(Ti, Tb_inv)
        dpose = lie.se3_boxminus(rel, (ar[f"lin_q{k}"], ar[f"lin_t{k}"]))
        dvel = lie.quat_rotate(Tbq, ar[f"vel{k}"] + xi[VEL]) - ar[f"lin_vel{k}"]
        dom = ar[f"omega{k}"] + xi[OMEGA] - ar[f"lin_omega{k}"]
        xs.append(jnp.concatenate([dpose, dvel, dom]))
    grav = lie.s2_boxplus(ar["grav"], GRAVITY_MAG, ts[-1])
    grav_b = lie.quat_rotate(Tbq, grav)
    xs.append(lie.s2_boxminus(grav_b, ar["lin_grav"], GRAVITY_MAG))
    x = jnp.concatenate(xs)
    res = ar["A"] @ x + ar["u"]
    return res, (res, jnp.asarray(True))


def _condensed_rel_args(K):
    def fn(v, d):
        out = {}
        bidx = d["base"]
        out["base_q"] = fct._take(v.pose_q, bidx)
        out["base_t"] = fct._take(v.pose_t, bidx)
        out["base_vel"] = fct._take(v.vel, bidx)
        out["base_omega"] = fct._take(v.omega, bidx)
        for f in ("lin_bvel", "lin_bomega"):
            out[f] = d[f]
        for k in range(K):
            idx = d[f"rig{k}"]
            out[f"pose_q{k}"] = fct._take(v.pose_q, idx)
            out[f"pose_t{k}"] = fct._take(v.pose_t, idx)
            out[f"vel{k}"] = fct._take(v.vel, idx)
            out[f"omega{k}"] = fct._take(v.omega, idx)
            for f in (f"lin_q{k}", f"lin_t{k}", f"lin_vel{k}", f"lin_omega{k}"):
                out[f] = d[f]
        n = bidx.shape[0]
        out["grav"] = jnp.broadcast_to(v.gravity, (n, 3))
        out["lin_grav"] = d["lin_grav"]
        out["A"] = d["A"]
        out["u"] = d["u"]
        return out

    return fn


def ensure_condensed_rel_kind(K: int) -> str:
    """Register (once) the relative batch kind for K rigs + base + gravity."""
    kind = f"condensed_rel_rigs{K}"
    if kind not in fct.REGISTRY:
        fct.REGISTRY[kind] = dict(
            local=_condensed_rel_local,
            args=_condensed_rel_args(K),
            tangents=[(fct.RIG, "base")]
            + [(fct.RIG, f"rig{k}") for k in range(K)]
            + [(fct.GRAVITY, None)],
            optional=False,
        )
    return kind


def _rel_linearization(v, base_rig, rig_indices):
    """Proxy linearization points (base-relative coords) at current values."""
    b = int(base_rig)
    Tb = (np.asarray(v.pose_q[b]), np.asarray(v.pose_t[b]))
    Rb = np.asarray(lie.quat_to_matrix(v.pose_q[b]))
    lin = {
        "lin_bvel": Rb @ np.asarray(v.vel[b]),
        "lin_bomega": np.asarray(v.omega[b]),
        "lin_grav": Rb @ np.asarray(v.gravity),
    }
    Tb_inv = lie.se3_inverse((v.pose_q[b], v.pose_t[b]))
    for k, r in enumerate(rig_indices):
        r = int(r)
        rq, rt = lie.se3_mul((v.pose_q[r], v.pose_t[r]), Tb_inv)
        lin[f"lin_q{k}"] = np.asarray(rq)
        lin[f"lin_t{k}"] = np.asarray(rt)
        lin[f"lin_vel{k}"] = Rb @ np.asarray(v.vel[r])
        lin[f"lin_omega{k}"] = np.asarray(v.omega[r])
    return lin


def _abs_to_rel_jacobian(v, base_rig, rig_indices):
    """S = d(proxy coords)/d(absolute tangent) at the linearization point.

    The marginal (H, b) lives in absolute tangent coordinates (base pose
    held constant); the condensed factor evaluates proxy coordinates. Pose
    and omega blocks are exactly identity (log(exp(xi) * rel * rel^-1) = xi);
    velocity blocks rotate by R_base; the gravity block is the 2x2 map
    ortho(R_b g) R_b ortho(g)^T. Computed by jacfwd of the proxy map for
    robustness (D is tiny)."""
    b = int(base_rig)
    K = len(rig_indices)
    D = 6 + 12 * K + 2
    lin = _rel_linearization(v, base_rig, rig_indices)
    Tb_inv = lie.se3_inverse((v.pose_q[b], v.pose_t[b]))

    def proxy(xabs):
        # xabs: [base vel 3, base om 3] + per-rig 12 + grav 2 (base pose FIXED)
        xs = [
            lie.quat_rotate(v.pose_q[b], v.vel[b] + xabs[0:3]) - lin["lin_bvel"],
            v.omega[b] + xabs[3:6] - lin["lin_bomega"],
        ]
        off = 6
        for k, r in enumerate(rig_indices):
            r = int(r)
            xi = xabs[off : off + 12]
            Ti = lie.se3_boxplus((v.pose_q[r], v.pose_t[r]), xi[POSE])
            rel = lie.se3_mul(Ti, Tb_inv)
            dpose = lie.se3_boxminus(rel, (lin[f"lin_q{k}"], lin[f"lin_t{k}"]))
            dvel = lie.quat_rotate(v.pose_q[b], v.vel[r] + xi[VEL]) - lin[f"lin_vel{k}"]
            dom = v.omega[r] + xi[OMEGA] - lin[f"lin_omega{k}"]
            xs.append(jnp.concatenate([dpose, dvel, dom]))
            off += 12
        grav = lie.s2_boxplus(v.gravity, GRAVITY_MAG, xabs[off : off + 2])
        grav_b = lie.quat_rotate(v.pose_q[b], grav)
        xs.append(lie.s2_boxminus(grav_b, lin["lin_grav"], GRAVITY_MAG))
        return jnp.concatenate(xs)

    S = np.asarray(jax.jacfwd(proxy)(jnp.zeros((D,), v.points.dtype)))
    return S, lin


def make_condensed_rel_batch(v, base_rig, rig_indices, H, b):
    """Batch data for ONE relative condensed factor (base + K rigs + gravity).

    H: (D, D), b: (D,) in ABSOLUTE tangent coordinates over
    [base vel, base omega] + rigs + gravity with the base pose held constant
    (as produced by marginalize_rel_onto_rigs); transformed here into the
    proxy coordinates the factor evaluates."""
    K = len(rig_indices)
    D = 6 + 12 * K + 2
    assert H.shape == (D, D) and b.shape == (D,)
    S, lin = _abs_to_rel_jacobian(v, base_rig, rig_indices)
    Sinv = np.linalg.inv(S)
    Hp = Sinv.T @ H @ Sinv
    bp = Sinv.T @ b
    w, V = np.linalg.eigh(0.5 * (Hp + Hp.T))
    w = np.maximum(w, 1e-12 * max(w.max(), 1.0))
    A = (V * np.sqrt(w)) @ V.T
    u = np.linalg.solve(A.T, bp)
    data = {"base": jnp.asarray([int(base_rig)], jnp.int32)}
    for k, r in enumerate(rig_indices):
        data[f"rig{k}"] = jnp.asarray([int(r)], jnp.int32)
    for key, val in lin.items():
        data[key] = jnp.asarray(val)[None]
    data["A"] = jnp.asarray(A)[None]
    data["u"] = jnp.asarray(u)[None]
    return ensure_condensed_rel_kind(K), data


def marginalize_rel_onto_rigs(problem, base_rig, rig_indices, lam=1e-7, **kw):
    """(H, b) marginalized onto [base vel/omega] + rigs + gravity with the
    base rig's POSE held constant (the gauge anchor), in absolute tangent
    coordinates — feed to make_condensed_rel_batch.

    Mirrors reference TestCondensedFactor.cpp:335-774 usage: pose 0 constant,
    marginal over surviving poses + all velocities (+ gravity)."""
    b = int(base_rig)
    masks = problem.masks
    saved_rig = masks.rig
    problem.masks = masks._replace(
        rig=masks.rig.at[b, 0:6].set(0.0)
    )
    problem._jits = None
    try:
        entries = [("rig", b, d) for d in range(6, 12)]
        entries += [("rig", int(r), d) for r in rig_indices for d in range(12)]
        entries += [("gravity", 0, d) for d in range(2)]
        Hm = covariance.marginal_information(problem, entries, lam=lam, **kw)

        datas = tuple(problem.datas)
        cfgs = engine.prune_cfgs(tuple(problem.cfgs), problem.masks)
        v = problem.variables
        lg = engine.linearize(cfgs, datas, v, problem.masks)
        x_r, x_l, *_ = engine.solve_step(
            cfgs, datas, lg, v, problem.masks, jnp.asarray(lam, v.points.dtype),
            max_iters=kw.get("pcg_iters", 800), rel_tol=kw.get("pcg_tol", 1e-12),
        )
        xk = [np.asarray(x_r.rig[b, 6:12])]
        for r in rig_indices:
            xk.append(np.asarray(x_r.rig[int(r)]))
        xk.append(np.asarray(x_r.gravity))
        xstar = np.concatenate(xk)
        bvec = Hm @ xstar
    finally:
        problem.masks = problem.masks._replace(rig=saved_rig)
        problem._jits = None
    return Hm, bvec


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
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    cfgs = engine.prune_cfgs(tuple(problem.cfgs), masks)
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
