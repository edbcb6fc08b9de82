"""Lie-group numerics: round trips, group laws, and Jacobian identities.

Mirrors the numeric-differentiation test style of the reference
(lib/small_thing/tests, lib/motion/preintegration/tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.ops import lie

RNG = np.random.default_rng(0)


def rand_w(scale=1.0, n=()):
    """Random axis-angle with norm < min(scale, 0.97*pi) (log wraps beyond pi)."""
    v = RNG.normal(size=n + (3,))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    ang = RNG.uniform(0.0, min(scale, 0.97 * np.pi), size=n + (1,))
    return jnp.asarray(v * ang)


def rand_quat(n=()):
    return lie.so3_exp(rand_w(2.0, n))


def rand_se3(n=()):
    return rand_quat(n), jnp.asarray(RNG.normal(size=n + (3,)))


def numdiff(f, x, eps=1e-7):
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(jnp.asarray(x)))
    cols = []
    for i in range(x.size):
        xp = x.copy().reshape(-1)
        xm = x.copy().reshape(-1)
        xp[i] += eps
        xm[i] -= eps
        yp = np.asarray(f(jnp.asarray(xp.reshape(x.shape))))
        ym = np.asarray(f(jnp.asarray(xm.reshape(x.shape))))
        cols.append((yp - ym).reshape(-1) / (2 * eps))
    return np.stack(cols, axis=-1), y0


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_w(2.0, (64,))
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=1e-12)

    def test_exp_log_small_angle(self):
        w = rand_w(1e-9, (16,))
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-15)

    def test_rotate_matches_matrix(self):
        q = rand_quat((32,))
        v = jnp.asarray(RNG.normal(size=(32, 3)))
        np.testing.assert_allclose(
            lie.quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), v),
            atol=1e-13,
        )

    def test_matrix_quat_roundtrip(self):
        q = rand_quat((64,))
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-12)

    def test_left_jacobian_identity(self):
        # d/dd log(exp(d) * exp(w)) |_{d=0} = Jl^{-1}(w)
        w = rand_w(1.5)
        q0 = lie.so3_exp(w)

        def f(d):
            return lie.so3_log(lie.quat_mul(lie.so3_exp(d), q0))

        J, _ = numdiff(f, np.zeros(3))
        np.testing.assert_allclose(J, lie.so3_left_jacobian_inverse(w), atol=1e-6)

    def test_left_jacobian_inverse_consistent(self):
        w = rand_w(1.5, (8,))
        J = lie.so3_left_jacobian(w)
        Ji = lie.so3_left_jacobian_inverse(w)
        np.testing.assert_allclose(J @ Ji, jnp.broadcast_to(jnp.eye(3), (8, 3, 3)), atol=1e-10)

    def test_exp_derivative_is_left_jacobian(self):
        # d/dw exp(w) * p: numerical check of Jl: dR/dw p = -R hat(p) ... use
        # identity d exp(w)p/dw = -exp(w) hat(p) Jr(w) = hat(-exp(w)p)Jl + ...
        # simpler: d log(exp(w+dw) exp(w)^-1)/ddw = Jl(w)
        w = rand_w(1.5)

        def f(dw):
            return lie.so3_log(lie.quat_mul(lie.so3_exp(w + dw), lie.quat_conj(lie.so3_exp(w))))

        J, _ = numdiff(f, np.zeros(3))
        np.testing.assert_allclose(J, lie.so3_left_jacobian(w), atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(64, 6)))
        xi2 = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(xi2, xi, atol=1e-11)

    def test_group_ops(self):
        T1, T2 = rand_se3((16,)), rand_se3((16,))
        p = jnp.asarray(RNG.normal(size=(16, 3)))
        lhs = lie.se3_apply(lie.se3_mul(T1, T2), p)
        rhs = lie.se3_apply(T1, lie.se3_apply(T2, p))
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)
        q, t = lie.se3_mul(T1, lie.se3_inverse(T1))
        np.testing.assert_allclose(np.abs(np.asarray(q[..., 0])), 1.0, atol=1e-12)
        np.testing.assert_allclose(t, 0.0, atol=1e-12)

    def test_boxplus_boxminus(self):
        T = rand_se3((8,))
        xi = jnp.asarray(RNG.normal(size=(8, 6)) * 0.5)
        T2 = lie.se3_boxplus(T, xi)
        np.testing.assert_allclose(lie.se3_boxminus(T2, T), xi, atol=1e-10)

    def test_adjoint(self):
        # exp(Adj(T) xi) = T exp(xi) T^-1
        T = rand_se3()
        xi = jnp.asarray(RNG.normal(size=(6,)) * 0.3)
        lhs = lie.se3_exp(lie.se3_adj(T) @ xi)
        rhs = lie.se3_mul(T, lie.se3_mul(lie.se3_exp(xi), lie.se3_inverse(T)))
        np.testing.assert_allclose(lie.se3_boxminus(lhs, rhs), 0.0, atol=1e-10)

    def test_left_jacobian_inverse_identity(self):
        # d/dd log(exp(d) * exp(xi)) |_{d=0} = Jl^{-1}(xi)
        xi = jnp.asarray(RNG.normal(size=(6,)) * 0.8)
        T0 = lie.se3_exp(xi)

        def f(d):
            return lie.se3_log(lie.se3_mul(lie.se3_exp(jnp.asarray(d)), T0))

        J, _ = numdiff(f, np.zeros(6))
        np.testing.assert_allclose(J, lie.se3_left_jacobian_inverse(xi), atol=1e-6)

    def test_left_jacobian_consistent(self):
        xi = jnp.asarray(RNG.normal(size=(8, 6)))
        J = lie.se3_left_jacobian(xi)
        Ji = lie.se3_left_jacobian_inverse(xi)
        np.testing.assert_allclose(J @ Ji, jnp.broadcast_to(jnp.eye(6), (8, 6, 6)), atol=1e-9)


class TestS2:
    def test_ortho_basis(self):
        v = jnp.asarray(RNG.normal(size=(32, 3)) * 3.0)
        B = lie.s2_ortho(v)
        # rows are orthonormal and orthogonal to v
        np.testing.assert_allclose(
            jnp.einsum("nij,nkj->nik", B, B), np.broadcast_to(np.eye(2), (32, 2, 2)), atol=1e-12
        )
        np.testing.assert_allclose(jnp.einsum("nij,nj->ni", B, v), 0.0, atol=1e-12)

    def test_boxplus_boxminus_roundtrip(self):
        # Reference semantics (Variable.h:190-208): boxplus moves by angle
        # |step|/r (tan-scaled chart), boxminus returns r*tan(angle) in the
        # same direction — a first-order inverse, exact in direction.
        radius = 9.81
        v = jnp.asarray(RNG.normal(size=(16, 3)))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True) * radius
        step = jnp.asarray(RNG.normal(size=(16, 2)) * 0.5)
        v2 = lie.s2_boxplus(v, radius, step)
        np.testing.assert_allclose(jnp.linalg.norm(v2, axis=-1), radius, atol=1e-12)
        step2 = lie.s2_boxminus(v2, v, radius)
        ang = np.linalg.norm(np.asarray(step), axis=-1) / radius
        expect = np.asarray(step) * (np.tan(ang) / ang)[:, None]
        np.testing.assert_allclose(np.asarray(step2), expect, atol=1e-9)
        # small steps: near-exact roundtrip
        small = jnp.asarray(RNG.normal(size=(16, 2)) * 1e-4)
        v3 = lie.s2_boxplus(v, radius, small)
        np.testing.assert_allclose(lie.s2_boxminus(v3, v, radius), small, atol=1e-10)


class TestReverseModeAtSingularities:
    """jacrev must stay finite exactly at the small-angle branch points.

    Reverse mode backprops a ZERO cotangent through the unselected exact
    branch of every Taylor guard; if that branch is evaluated at the singular
    input its local derivative is inf and 0*inf = NaN (the double-where
    rule). Forward mode never sees this, so only jacrev catches regressions —
    hit in production by random-walk factors between identically-initialized
    calibration windows (relative pose exactly identity)."""

    def _check(self, f, *args):
        for mode in (jax.jacrev, jax.jacfwd):
            J = mode(f)(*args)
            assert jnp.all(jnp.isfinite(jnp.asarray(J))), (mode, J)

    def test_se3_boxminus_at_identity(self):
        q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        t = jnp.asarray([0.3, -0.2, 1.0])
        self._check(lambda tt: lie.se3_boxminus((q, tt), (q, t)), t)
        self._check(
            lambda xi: lie.se3_boxminus(lie.se3_boxplus((q, t), xi), (q, t)),
            jnp.zeros(6),
        )

    def test_so3_exp_log_jacobians_at_zero(self):
        self._check(lie.so3_exp, jnp.zeros(3))
        self._check(lambda w: lie.so3_log(lie.so3_exp(w)), jnp.zeros(3))
        self._check(lie.so3_left_jacobian, jnp.zeros(3))
        self._check(lie.so3_left_jacobian_inverse, jnp.zeros(3))
        self._check(lie.se3_left_jacobian_inverse, jnp.zeros(6))

    def test_s2_box_at_zero_step(self):
        radius = 9.81
        v = jnp.asarray([0.1, -0.2, -radius])
        v = v / jnp.linalg.norm(v) * radius
        self._check(lambda s: lie.s2_boxplus(v, radius, s), jnp.zeros(2))
        self._check(lambda x: lie.s2_boxminus(x, v, radius), v)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
