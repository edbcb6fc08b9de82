"""Engine validation: gradient/matvec vs dense autodiff, Schur solve vs dense
solve, and LM ground-truth recovery on a synthetic VI session.

Mirrors the reference test strategy (TestOptimizer.cpp:22-84: cross-check
against dense Eigen solves on small problems) with jax.jacfwd as the dense
reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.ops import losses
from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
    BuildOptions,
    build_synthetic_problem,
)
from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
from visual_inertial_bundle_adjustment_tpu.problem import engine
from visual_inertial_bundle_adjustment_tpu.problem import factors as fct
from visual_inertial_bundle_adjustment_tpu.problem.optimizer import LMSettings, optimize
from visual_inertial_bundle_adjustment_tpu.problem.structure import (
    Tangent,
    retract,
    t_dot,
    zero_tangent,
)


@pytest.fixture(scope="module")
def small_session():
    return SyntheticSession(duration=2.0, keyframe_hz=5.0, num_points=40, seed=3,
                            pixel_noise=0.2)


@pytest.fixture(scope="module")
def small_problem(small_session):
    return build_synthetic_problem(
        small_session,
        BuildOptions(init_pose_noise=0.01, init_point_noise=0.05, init_vel_noise=0.05),
    )


def flatten_tangent(t: Tangent, tp):
    parts = [np.asarray(x).reshape(-1) for x in t] + [np.asarray(tp).reshape(-1)]
    return np.concatenate(parts)


def unflatten_tangent(v, flat):
    t0 = zero_tangent(v)
    out = []
    off = 0
    for x in t0:
        n = x.size
        out.append(jnp.asarray(flat[off : off + n]).reshape(x.shape))
        off += n
    tp = jnp.asarray(flat[off:]).reshape(v.points.shape)
    return Tangent(*out), tp


def dense_reference(problem):
    """Dense weighted GN matrix + gradient via autodiff (small problems)."""
    v = problem.variables
    masks = problem.masks
    cfgs, datas = problem.cfgs, problem.datas

    def all_residuals(flat):
        t, tp = unflatten_tangent(v, flat)
        v2 = retract(v, t, tp, masks)
        out = []
        for cfg, data in zip(cfgs, datas):
            res, valid = fct.residual_batch(cfg, data, v2)
            out.append((res, valid))
        return out

    lg = engine.linearize(tuple(cfgs), tuple(datas), v, masks)
    n = sum(x.size for x in zero_tangent(v)) + v.points.size
    flat0 = np.zeros(n)

    def stacked(flat):
        return jnp.concatenate([r.reshape(-1) for r, _ in all_residuals(flat)])

    J = np.asarray(jax.jacfwd(stacked)(jnp.asarray(flat0)))
    # per-row weights from the linearization
    w_rows = []
    for lin, w in zip(lg.lins, lg.w):
        w_rows.append(np.repeat(np.asarray(w), lin.res.shape[1]))
    w_rows = np.concatenate(w_rows)
    res0 = np.asarray(jnp.concatenate([lin.res.reshape(-1) for lin in lg.lins]))
    H = J.T @ (w_rows[:, None] * J)
    g = J.T @ (w_rows * res0)
    return H, g, lg, J


def test_gradient_matches_dense(small_problem):
    H, g, lg, _ = dense_reference(small_problem)
    v = small_problem.variables
    g_r, g_l = engine._accumulate_grad(lg, v)
    g_engine = flatten_tangent(g_r, g_l)
    np.testing.assert_allclose(g_engine, g, atol=1e-8)


def test_matvec_and_schur_solve_match_dense(small_problem):
    H, g, lg, _ = dense_reference(small_problem)
    v = small_problem.variables
    masks = small_problem.masks
    lam = 1e-3
    n_r = sum(x.size for x in zero_tangent(v))
    L = v.points.shape[0]

    # damped dense H: diag*(1+lam)+lam
    Hd = H.copy()
    np.fill_diagonal(Hd, np.diag(H) * (1 + lam) + lam)

    # dense Schur elimination of points
    Hrr, Hrl = Hd[:n_r, :n_r], Hd[:n_r, n_r:]
    Hll = Hd[n_r:, n_r:]
    S_dense = Hrr - Hrl @ np.linalg.solve(Hll, Hrl.T)

    rs = engine.build_reduced_system(lg, v, masks, jnp.asarray(lam))

    # matvec check on random vectors
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = rng.normal(size=n_r)
        # zero masked dims (dense S has lam-only rows there; engine keeps zeros)
        xm_t, _ = unflatten_tangent(v, np.concatenate([x, np.zeros(3 * L)]))
        from visual_inertial_bundle_adjustment_tpu.problem.structure import apply_masks

        xm_t = apply_masks(xm_t, masks)
        x = flatten_tangent(xm_t, np.zeros((L, 3)))[:n_r]
        y_engine = engine.reduced_matvec(lg, v, rs, xm_t)
        y_flat = flatten_tangent(y_engine, np.zeros((L, 3)))[:n_r]
        y_dense = S_dense @ x
        np.testing.assert_allclose(y_flat, y_dense, atol=1e-7 * max(1, np.abs(y_dense).max()))

    # full solve check vs dense solve (free dims only)
    x_r, x_l, model_red, rel, iters, rs2, (g_r, g_l) = engine.solve_step(
        tuple(small_problem.cfgs), tuple(small_problem.datas), lg, v, masks,
        jnp.asarray(lam), max_iters=800, rel_tol=1e-13,
    )
    free = flatten_tangent(
        engine.zero_tangent(v)._replace(
            rig=masks.rig, cam_intr=masks.cam_intr, cam_extr=masks.cam_extr,
            imu_calib=masks.imu_calib, imu_extr=masks.imu_extr,
            det_bias=masks.det_bias, gravity=masks.gravity,
        ),
        np.asarray(masks.points),
    ) > 0.5
    x_dense = np.zeros(n_r + 3 * L)
    x_dense[free] = np.linalg.solve(Hd[np.ix_(free, free)],
                                    np.concatenate([g, np.zeros(0)])[free])
    x_engine = flatten_tangent(x_r, x_l)
    scale = max(1.0, np.abs(x_dense).max())
    np.testing.assert_allclose(x_engine, x_dense, atol=2e-5 * scale)


def test_lm_recovers_ground_truth(small_session, small_problem):
    import copy

    problem = build_synthetic_problem(
        small_session,
        BuildOptions(init_pose_noise=0.01, init_point_noise=0.05, init_vel_noise=0.05),
    )
    s = small_session
    settings = LMSettings(max_iterations=30, log=None)
    summary = optimize(problem, settings)
    assert summary.final_cost < summary.initial_cost * 0.05

    v = problem.variables
    # trajectory error vs ground truth: ATE on positions (world frame)
    pos_est = np.asarray(
        -np.einsum(
            "nij,nj->ni",
            np.asarray(jax.vmap(lambda q: jnp.linalg.inv(_qmat(q)))(v.pose_q)),
            np.asarray(v.pose_t),
        )
    )
    pos_gt = s.gt_pos_w
    ate = np.sqrt(np.mean(np.sum((pos_est - pos_gt) ** 2, axis=-1)))
    assert ate < 0.02, f"ATE {ate} m"


def _qmat(q):
    from visual_inertial_bundle_adjustment_tpu.ops import lie

    return lie.quat_to_matrix(q)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
