"""RotVelPos algebra tests mirroring reference TestMotionIntegral.cpp:37-175."""

import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.ops import lie
from visual_inertial_bundle_adjustment_tpu.ops import motion as mo

RNG = np.random.default_rng(1)


def rand_rvp(n=(), dt_scale=0.5):
    q = lie.so3_exp(jnp.asarray(RNG.normal(size=n + (3,)) * 0.8))
    return mo.RotVelPos(
        q,
        jnp.asarray(RNG.normal(size=n + (3,))),
        jnp.asarray(RNG.normal(size=n + (3,))),
        jnp.asarray(RNG.uniform(0.05, dt_scale, size=n)),
    )


def test_box_ops_roundtrip():
    a, b = rand_rvp((16,)), rand_rvp((16,))
    delta = mo.rvp_boxminus(a, b)
    a2 = mo.rvp_boxplus(b, delta)
    np.testing.assert_allclose(mo.rvp_boxminus(a2, a), 0.0, atol=1e-12)


def test_combine_uncombine():
    a, b = rand_rvp((8,)), rand_rvp((8,))
    c = mo.rvp_combine(a, b)
    b2 = mo.rvp_uncombine_left(c, a)
    a2 = mo.rvp_uncombine_right(c, b)
    for got, want in [(b2, b), (a2, a)]:
        np.testing.assert_allclose(mo.rvp_boxminus(got, want), 0.0, atol=1e-12)
        np.testing.assert_allclose(got.dt, want.dt, atol=1e-12)


def test_combine_associative():
    a, b, c = rand_rvp(), rand_rvp(), rand_rvp()
    lhs = mo.rvp_combine(mo.rvp_combine(a, b), c)
    rhs = mo.rvp_combine(a, mo.rvp_combine(b, c))
    np.testing.assert_allclose(mo.rvp_boxminus(lhs, rhs), 0.0, atol=1e-12)


def test_integrate_matches_small_steps():
    """Closed-form constant-signal integral == many small Euler-ish steps."""
    gyro = jnp.asarray([0.4, -1.2, 0.7])
    accel = jnp.asarray([1.0, 2.0, -9.0])
    dt = jnp.asarray(0.8)
    full = mo.rvp_integrate(gyro, accel, dt)
    n = 2000
    step = mo.rvp_integrate(gyro, accel, dt / n)
    acc = mo.rvp_identity()
    for _ in range(n):
        acc = mo.rvp_combine(acc, step)
    np.testing.assert_allclose(mo.rvp_boxminus(acc, full), 0.0, atol=1e-9)
    np.testing.assert_allclose(acc.dt, full.dt, atol=1e-12)


def test_integrate_jacobian_numeric():
    gyro = np.asarray([0.4, -1.2, 0.7])
    accel = np.asarray([1.0, 2.0, -9.0])
    dt = jnp.asarray(0.35)
    _, J = mo.rvp_integrate(jnp.asarray(gyro), jnp.asarray(accel), dt, with_jac=True)
    eps = 1e-7
    num = np.zeros((9, 6))
    base = mo.rvp_integrate(jnp.asarray(gyro), jnp.asarray(accel), dt)
    for i in range(6):
        g, a = gyro.copy(), accel.copy()
        if i < 3:
            g[i] += eps
        else:
            a[i - 3] += eps
        pert = mo.rvp_integrate(jnp.asarray(g), jnp.asarray(a), dt)
        num[:, i] = np.asarray(mo.rvp_boxminus(pert, base)) / eps
    np.testing.assert_allclose(np.asarray(J), num, atol=1e-6)


def test_integrate_jacobian_small_angle():
    gyro = jnp.asarray([1e-8, -2e-8, 1e-8])
    accel = jnp.asarray([1.0, 2.0, -9.0])
    _, J = mo.rvp_integrate(gyro, accel, jnp.asarray(0.1), with_jac=True)
    assert np.all(np.isfinite(np.asarray(J)))


def test_combine_jacs_numeric():
    """Chain rule through combine vs numeric diff of a 6-dof parametrization."""
    gyro_a, accel_a = RNG.normal(size=3), RNG.normal(size=3) * 3
    gyro_b, accel_b = RNG.normal(size=3), RNG.normal(size=3) * 3
    dta, dtb = jnp.asarray(0.3), jnp.asarray(0.4)

    def build(pa, pb):
        a, Ja = mo.rvp_integrate(pa[:3], pa[3:], dta, with_jac=True)
        b, Jb = mo.rvp_integrate(pb[:3], pb[3:], dtb, with_jac=True)
        return a, b, Ja, Jb

    pa0 = jnp.asarray(np.concatenate([gyro_a, accel_a]))
    pb0 = jnp.asarray(np.concatenate([gyro_b, accel_b]))
    a, b, Ja, Jb = build(pa0, pb0)
    # parameters: 12-dim (pa, pb); aJac covers first 6 cols, bJac last 6
    Z = jnp.zeros((9, 6))
    aJac = jnp.concatenate([Ja, Z], axis=1)
    bJac = jnp.concatenate([Z, Jb], axis=1)
    c, cJac = mo.rvp_combine_jacs(a, b, aJac, bJac)
    # crosscheck combine
    c2 = mo.rvp_combine(a, b)
    np.testing.assert_allclose(mo.rvp_boxminus(c, c2), 0.0, atol=1e-13)

    eps = 1e-7
    num = np.zeros((9, 12))
    for i in range(12):
        p = np.concatenate([gyro_a, accel_a, gyro_b, accel_b])
        p[i] += eps
        a2, b2, _, _ = build(jnp.asarray(p[:6]), jnp.asarray(p[6:]))
        cp = mo.rvp_combine(a2, b2)
        num[:, i] = np.asarray(mo.rvp_boxminus(cp, c)) / eps
    np.testing.assert_allclose(np.asarray(cJac), num, atol=1e-5)


def test_differentiate_integrate_inverse():
    rvp = rand_rvp((8,), dt_scale=0.3)
    interp = mo.rvp_differentiate(rvp)
    recon = mo.rvp_integrate_interp(interp, rvp.dt)
    np.testing.assert_allclose(mo.rvp_boxminus(recon, rvp), 0.0, atol=1e-10)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
