"""Landmark triangulation: vectorized RANSAC on ray pairs + robust refinement.

Re-derivation of reference viba/single_session/Triangulation.cpp:30-165 with
all tracks processed as one padded batch: 10 RANSAC iterations on random ray
pairs (closest-point candidate, clamped-angle score, reference
Triangulation.h:13-44 constants), then two Huber-weighted 3x3 Gauss-Newton
refinement passes against reprojection error with inlier thresholds 3.0 /
2.5 px. Deterministic per-point randomness uses jax PRNG keys folded with
pointId + 1729 (the reference seeds mt19937 the same way,
InitPointTracks.cpp:44; sequences differ, determinism is preserved).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as cam_ops
from ..ops import lie

# reference Triangulation.h:13-44
NUM_RANSAC = 10
OUTLIER_OBS_RAD = np.deg2rad(0.4)
MIN_INLIERS_CANDIDATE = 2
MIN_INLIER_OBS = 3
REFINE = [
    dict(outlier_threshold=3.0, skip_outliers=False, iters=3, loss_radius=1.5),
    dict(outlier_threshold=2.5, skip_outliers=True, iters=3, loss_radius=1.0),
]
MIN_INLIERS_AFTER_REFINE = 3
SEED_OFFSET = 1729


def _huber_jet2(s, a):
    b = a * a
    r = jnp.sqrt(jnp.maximum(s, 1e-30))
    in_quad = s <= b
    return jnp.where(in_quad, s, 2 * a * r - b), jnp.where(in_quad, 1.0, a / r)


def _ransac_candidate(key, starts, dirs, valid):
    """Best closest-point candidate over random ray pairs (one track)."""
    T = starts.shape[0]
    count = jnp.sum(valid.astype(jnp.int32))

    def body(i, best):
        best_point, best_score, best_inl = best
        k = jax.random.fold_in(key, i)
        ka, kb = jax.random.split(k)
        a = jax.random.randint(ka, (), 0, jnp.maximum(count, 1))
        off = jax.random.randint(kb, (), 1, jnp.maximum(count, 2))
        b = (a + off) % jnp.maximum(count, 1)
        sa, da = starts[a], dirs[a]
        sb, db = starts[b], dirs[b]
        ortho = jnp.cross(da, db)
        onorm = jnp.linalg.norm(ortho)
        ok = onorm >= 1e-4
        on = ortho / jnp.where(ok, onorm, 1.0)
        a_lat = jnp.cross(on, da)
        b_lat = jnp.cross(on, db)
        b_fact = jnp.dot(a_lat, sa - sb) / jnp.where(jnp.abs(jnp.dot(a_lat, db)) < 1e-30, 1e-30, jnp.dot(a_lat, db))
        a_fact = jnp.dot(b_lat, sb - sa) / jnp.where(jnp.abs(jnp.dot(b_lat, da)) < 1e-30, 1e-30, jnp.dot(b_lat, da))
        ok &= (b_fact >= 0.0) & (a_fact >= 0.0)
        cand = sa + a_fact * da + on * (0.5 * jnp.dot(on, sb - sa))

        alt = cand[None, :] - starts
        alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-12)
        chord = jnp.linalg.norm(dirs - alt, axis=-1)
        ang = 2.0 * jnp.arcsin(jnp.clip(chord * 0.5, 0.0, 1.0))
        is_inl = (ang < OUTLIER_OBS_RAD) & valid
        score = jnp.sum(jnp.where(valid, jnp.where(is_inl, ang, OUTLIER_OBS_RAD), 0.0))
        n_inl = jnp.sum(is_inl.astype(jnp.int32))
        ok &= n_inl >= MIN_INLIERS_CANDIDATE
        better = ok & (score < best_score)
        return (
            jnp.where(better, cand, best_point),
            jnp.where(better, score, best_score),
            jnp.where(better, n_inl, best_inl),
        )

    init = (jnp.zeros(3, starts.dtype), jnp.asarray(jnp.inf, starts.dtype), jnp.asarray(0))
    point, _, n_inl = jax.lax.fori_loop(0, NUM_RANSAC, body, init)
    return point, n_inl >= MIN_INLIERS_CANDIDATE


def _refine_pass(point, cam_q, cam_t, intr, obs_uv, sqrt_h, valid, camera_kind,
                 outlier_threshold, skip_outliers, iters, loss_radius):
    """Robust 3x3 GN on reprojection error (one track, padded obs)."""
    thr2 = outlier_threshold * outlier_threshold

    def body(_, state):
        pt, _ = state
        p_cam = lie.quat_rotate(cam_q, pt[None, :]) + cam_t
        uv, pvalid = cam_ops.project(camera_kind, intr, p_cam)
        err = uv - obs_uv
        werr = jnp.einsum("nij,nj->ni", sqrt_h, err)
        sq_img = jnp.sum(err * err, axis=-1)
        is_inl = (sq_img < thr2) & valid & pvalid
        use = valid & pvalid & (is_inl | (not skip_outliers))

        # d(werr)/d(world point) via jvp on 3 basis vectors
        def werr_of(p):
            pc = lie.quat_rotate(cam_q, p[None, :]) + cam_t
            u, _ = cam_ops.project(camera_kind, intr, pc)
            return jnp.einsum("nij,nj->ni", sqrt_h, u - obs_uv)

        Jcols = []
        for i in range(3):
            e = jnp.zeros(3, pt.dtype).at[i].set(1.0)
            _, jc = jax.jvp(werr_of, (pt,), (e,))
            Jcols.append(jc)
        J = jnp.stack(Jcols, axis=-1)  # (T, 2, 3)

        s = jnp.sum(werr * werr, axis=-1)
        _, der = _huber_jet2(s, loss_radius)
        w = der * use.astype(pt.dtype)
        grad = jnp.einsum("nij,ni->j", J * w[:, None, None], werr)
        H = jnp.einsum("nij,nik->jk", J * w[:, None, None], J)
        H = H + jnp.eye(3, dtype=pt.dtype) * 1e-12
        step = jnp.linalg.solve(H, grad)
        return pt - step, is_inl

    # one extra classification round at the refined point
    pt, _ = jax.lax.fori_loop(0, iters, body, (point, valid))
    p_cam = lie.quat_rotate(cam_q, pt[None, :]) + cam_t
    uv, pvalid = cam_ops.project(camera_kind, intr, p_cam)
    sq_img = jnp.sum((uv - obs_uv) ** 2, axis=-1)
    is_inl = (sq_img < thr2) & valid & pvalid
    return pt, is_inl


@partial(jax.jit, static_argnames=("camera_kind",))
def triangulate_tracks(point_ids, cam_q, cam_t, intr, obs_uv, sqrt_h, valid,
                       camera_kind=cam_ops.KIND_FISHEYE624):
    """Batched triangulation.

    All arrays have shape (P, T, ...) — P tracks padded to T observations.
    cam_q/cam_t: T_cam_world per observation. Returns (points (P,3),
    ok (P,), inlier mask (P, T))."""

    def one(pid, cq, ct, it, uv, sh, vm):
        # rays: start = camera center, dir towards the observed pixel
        key = jax.random.PRNGKey(pid + SEED_OFFSET)
        qi = lie.quat_conj(cq)
        starts = -lie.quat_rotate(qi, ct)
        ray_cam = cam_ops.unproject(camera_kind, it, uv)
        dirs = lie.quat_rotate(qi, ray_cam)
        cand, ok = _ransac_candidate(key, starts, dirs, vm)
        pt = cand
        inl = vm
        for cfgr in REFINE:
            pt, inl = _refine_pass(pt, cq, ct, it, uv, sh, vm, camera_kind, **cfgr)
        ok &= jnp.sum(inl.astype(jnp.int32)) >= MIN_INLIERS_AFTER_REFINE
        ok &= jnp.all(jnp.isfinite(pt))
        return pt, ok, inl

    return jax.vmap(one)(point_ids, cam_q, cam_t, intr, obs_uv, sqrt_h, valid)
