"""Reference-formulation CPU baseline: assembled sparse Hessian + direct solve.

The reference (`ark_vi_ba`) cannot be built here (its BaSpaCho /
projectaria_tools submodules are empty in the snapshot), so BENCH's
`vs_baseline` needs a defensible stand-in for its per-iteration work on the
host CPU. This module times one LM iteration the way the reference's direct
mode does it (lib/small_thing/Optimizer.cpp:166-331: assemble the
block-sparse Hessian, eliminate the landmark block, factor the reduced
camera system with a sparse direct solver, back-substitute):

  1. residual + Jacobian evaluation          (JAX CPU linearize — a stand-in
                                              for the hand-derived C++
                                              Jacobians, same math)
  2. scipy COO assembly of H = J^T W J, g = J^T W r   (numpy)
  3. landmark Schur elimination (batched 3x3 inverses, sparse W H_ll^-1 W^T)
  4. SuperLU factorization + solve of the reduced system, back-substitution

Steps 2-4 are plain numpy/scipy — no JAX — i.e. the same algorithm class as
BaSpaCho's supernodal Cholesky (SuperLU is a general LU; BaSpaCho's
symmetric solver would be ~2x faster at equal ordering quality — noted in
BASELINE.md when interpreting the speedup).
"""

from __future__ import annotations

import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

GROUP_OFFSETS = None


def _layout(v):
    """Variable layout: [rig 12R | cam_intr 17Wc | cam_extr 6We | imu_calib
    23Wi | imu_extr 6Wx | det_bias 2C | gravity 2] + landmarks last."""
    sizes = {
        "rig": (v.pose_q.shape[0], 12),
        "cam_intr": (v.cam_intr.shape[0], 17),
        "cam_extr": (v.cam_extr_q.shape[0], 6),
        "imu_calib": (v.imu_calib.shape[0], 23),
        "imu_extr": (v.imu_extr_q.shape[0], 6),
        "det_bias": (v.det_bias.shape[0], 2),
        "gravity": (1, 2),
    }
    offsets = {}
    off = 0
    for g, (n, d) in sizes.items():
        offsets[g] = off
        off += n * d
    D_r = off
    L = v.points.shape[0]
    return offsets, sizes, D_r, L


def assemble(lg, v):
    """(H_rr coo, W (D_r x 3L) coo, H_ll blocks (L,3,3), g_r, g_l)."""
    offsets, sizes, D_r, L = _layout(v)
    rows_h, cols_h, vals_h = [], [], []
    rows_w, cols_w, vals_w = [], [], []
    H_ll = np.zeros((L, 3, 3))
    g_r = np.zeros(D_r)
    g_l = np.zeros(3 * L)

    for lin, w in zip(lg.lins, lg.w):
        w = np.asarray(w)
        res = np.asarray(lin.res)  # (d, N)
        entries = []
        for group, idx, J in zip(lin.groups, lin.idx, lin.jac):
            entries.append((group, np.asarray(idx), np.asarray(J)))
        for gi, idx_i, J_i in entries:
            di = J_i.shape[1]
            gc = np.einsum("dkn,dn->nk", J_i, res * w[None, :])
            if gi == "points":
                np.add.at(g_l.reshape(L, 3), idx_i, gc)
            elif gi == "gravity":
                g_r[offsets[gi]: offsets[gi] + di] += gc.sum(0)
            else:
                np.add.at(
                    g_r,
                    (offsets[gi] + idx_i * di)[:, None] + np.arange(di)[None, :],
                    gc,
                )
            def block_rows(g, idx, d):
                base = offsets[g] + (0 if g == "gravity" else idx * d)
                n = 1 if g == "gravity" else len(idx)
                return (np.asarray(base).reshape(-1, 1)
                        + np.arange(d)[None, :]).reshape(n, d)

            # ALL ordered (gi, gj) pairs: H is assembled fully symmetric
            # (each off-diagonal appears once per ordered pair, as its own
            # transpose on the swapped pair)
            for gj, idx_j, J_j in entries:
                dj = J_j.shape[1]
                if gi == "points" and gj == "points":
                    B = np.einsum("dan,dbn->nab", J_i * w[None, None, :], J_j)
                    np.add.at(H_ll, idx_i, B)
                    continue
                if gj == "points":
                    continue
                if gi == "points":
                    # W^T row block -> store into W (reduced rows, point cols)
                    B = np.einsum("dan,dbn->nba", J_i * w[None, None, :], J_j)
                    r = block_rows(gj, idx_j, dj)  # (n|1, dj)
                    n = B.shape[0]
                    r = np.broadcast_to(r[..., None], (max(r.shape[0], 1), dj, 3))
                    if r.shape[0] == 1:
                        r = np.broadcast_to(r, (n, dj, 3))
                    c = (idx_i * 3)[:, None, None] + np.arange(3)[None, None, :]
                    c = np.broadcast_to(c, (n, dj, 3))
                    rows_w.append(r.ravel())
                    cols_w.append(c.ravel())
                    vals_w.append(B.ravel())
                    continue
                B = np.einsum("dan,dbn->nab", J_i * w[None, None, :], J_j)
                n = B.shape[0]
                r = block_rows(gi, idx_i, di)
                c = block_rows(gj, idx_j, dj)
                if r.shape[0] == 1:
                    r = np.broadcast_to(r, (n, di))
                if c.shape[0] == 1:
                    c = np.broadcast_to(c, (n, dj))
                rr = np.broadcast_to(r[:, :, None], (n, di, dj))
                cc = np.broadcast_to(c[:, None, :], (n, di, dj))
                rows_h.append(rr.ravel())
                cols_h.append(cc.ravel())
                vals_h.append(B.ravel())

    H_rr = sp.coo_matrix(
        (np.concatenate(vals_h), (np.concatenate(rows_h), np.concatenate(cols_h))),
        shape=(D_r, D_r),
    ).tocsr()
    if rows_w:
        W = sp.coo_matrix(
            (np.concatenate(vals_w), (np.concatenate(rows_w), np.concatenate(cols_w))),
            shape=(D_r, 3 * L),
        ).tocsr()
    else:
        W = sp.csr_matrix((D_r, 3 * L))
    return H_rr, W, H_ll, g_r, g_l


def one_iteration(lg, v, lam=1e-4):
    """Assemble + Schur + SuperLU factor/solve + back-substitution (timed)."""
    t0 = time.time()
    H_rr, W, H_ll, g_r, g_l = assemble(lg, v)
    t_asm = time.time() - t0

    t0 = time.time()
    # damping: diag*(1+lam)+lam on both blocks (reference addDamping)
    d = H_rr.diagonal()
    H_rr = H_rr + sp.diags(lam * d + lam)
    dl = np.einsum("lii->li", H_ll)
    H_ll = H_ll + np.eye(3)[None] * (lam * dl + lam)[:, None, :] * np.eye(3)[None]
    H_ll_inv = np.linalg.inv(H_ll)
    L = H_ll.shape[0]
    rr = (3 * np.arange(L))[:, None, None] + np.arange(3)[None, :, None]
    cc = (3 * np.arange(L))[:, None, None] + np.arange(3)[None, None, :]
    Hinv_sp = sp.coo_matrix(
        (H_ll_inv.ravel(),
         (np.broadcast_to(rr, (L, 3, 3)).ravel(),
          np.broadcast_to(cc, (L, 3, 3)).ravel())),
        shape=(3 * L, 3 * L),
    ).tocsr()
    S = (H_rr - W @ Hinv_sp @ W.T).tocsc()
    b = g_r - W @ (Hinv_sp @ g_l)
    lu = spla.splu(S)
    x_r = lu.solve(b)
    x_l = Hinv_sp @ (g_l - W.T @ x_r)
    t_solve = time.time() - t0
    return x_r, x_l, t_asm, t_solve


def timed_reference_iterations(problem, n_iters=2, lam=1e-4):
    """iters/s of (linearize + assemble + Schur + direct factor/solve)."""
    import jax

    from visual_inertial_bundle_adjustment_tpu.problem import engine

    cfgs = engine.prune_cfgs(tuple(problem.cfgs), problem.masks)
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lin = jax.jit(lambda: engine.linearize(cfgs, datas, v, masks))
    lg = jax.block_until_ready(lin())  # compile
    t0 = time.time()
    lg = jax.block_until_ready(lin())
    t_lin = time.time() - t0
    lg = jax.tree_util.tree_map(np.asarray, lg)
    times = []
    for _ in range(n_iters):
        _, _, t_asm, t_solve = one_iteration(lg, v, lam)
        times.append(t_lin + t_asm + t_solve)
    dt = float(np.median(times))
    return 1.0 / dt, dict(linearize=t_lin, assemble=t_asm, solve=t_solve)
