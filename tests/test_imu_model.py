"""IMU calibration-compensation Jacobians vs numeric differentiation.

Mirrors reference lib/motion/preintegration/tests/TestCompensateJac.cpp:91 —
numeric check over a randomized calibration, plus box-op consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.models import imu

RNG = np.random.default_rng(7)


def random_calib(dtype=jnp.float64):
    c = np.zeros(imu.CALIB_DIM)
    c[imu.GYRO_BIAS] = RNG.normal(size=3) * 0.02
    c[imu.ACCEL_BIAS] = RNG.normal(size=3) * 0.1
    c[imu.GYRO_SCALE] = 1.0 + RNG.normal(size=3) * 0.01
    c[imu.ACCEL_SCALE] = 1.0 + RNG.normal(size=3) * 0.01
    c[imu.GYRO_NONORTH] = RNG.normal(size=6) * 0.01
    c[imu.ACCEL_NONORTH] = RNG.normal(size=3) * 0.01
    c[imu.DT_REF_GYRO] = RNG.normal() * 1e-3
    c[imu.DT_REF_ACCEL] = RNG.normal() * 1e-3
    return jnp.asarray(c, dtype)


def test_boxplus_boxminus_roundtrip():
    a = random_calib()
    step = jnp.asarray(RNG.normal(size=imu.CALIB_DIM) * 0.01)
    b = imu.calib_boxplus(a, step)
    np.testing.assert_allclose(imu.calib_boxminus(b, a), step, atol=1e-12)


def test_measurement_model_invertible():
    """compensate inverts the forward distortion model."""
    c = random_calib()
    true_gyro = jnp.asarray(RNG.normal(size=3))
    true_accel = jnp.asarray(RNG.normal(size=3) * 5)
    # forward model: meas = diag(scale) @ N @ (true + bias)
    gyro_meas = (c[imu.GYRO_SCALE]) * (
        imu.gyro_nonorth_matrix(c) @ (true_gyro + c[imu.GYRO_BIAS])
    )
    accel_meas = (c[imu.ACCEL_SCALE]) * (
        imu.accel_nonorth_matrix(c) @ (true_accel + c[imu.ACCEL_BIAS])
    )
    g, a = imu.compensate(c, gyro_meas, accel_meas)
    np.testing.assert_allclose(g, true_gyro, atol=1e-12)
    np.testing.assert_allclose(a, true_accel, atol=1e-12)


def test_calib_jacobian_numeric():
    c = random_calib()
    gyro_raw = jnp.asarray(RNG.normal(size=3))
    accel_raw = jnp.asarray(RNG.normal(size=3) * 9)
    g0, a0, calib_jac, meas_jac = imu.compensate_with_jac(c, gyro_raw, accel_raw)
    # consistency of values
    g1, a1 = imu.compensate(c, gyro_raw, accel_raw)
    np.testing.assert_allclose(g0, g1, atol=1e-14)
    np.testing.assert_allclose(a0, a1, atol=1e-14)

    eps = 1e-7
    num = np.zeros((6, imu.CALIB_DIM))
    for i in range(imu.CALIB_DIM):
        step = jnp.zeros(imu.CALIB_DIM).at[i].set(eps)
        cp = imu.calib_boxplus(c, step)
        cm = imu.calib_boxplus(c, -step)
        gp, ap = imu.compensate(cp, gyro_raw, accel_raw)
        gm, am = imu.compensate(cm, gyro_raw, accel_raw)
        num[:3, i] = np.asarray(gp - gm) / (2 * eps)
        num[3:, i] = np.asarray(ap - am) / (2 * eps)
    # time-offset columns do not affect compensation
    np.testing.assert_allclose(num[:, 21:], 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(calib_jac), num, atol=1e-6)


def test_meas_jacobian_numeric():
    c = random_calib()
    gyro_raw = np.asarray(RNG.normal(size=3))
    accel_raw = np.asarray(RNG.normal(size=3) * 9)
    _, _, _, meas_jac = imu.compensate_with_jac(c, jnp.asarray(gyro_raw), jnp.asarray(accel_raw))
    eps = 1e-7
    num = np.zeros((6, 6))
    for i in range(6):
        dg = np.zeros(3)
        da = np.zeros(3)
        (dg if i < 3 else da)[i % 3] = eps
        gp, ap = imu.compensate(c, jnp.asarray(gyro_raw + dg), jnp.asarray(accel_raw + da))
        gm, am = imu.compensate(c, jnp.asarray(gyro_raw - dg), jnp.asarray(accel_raw - da))
        num[:3, i] = np.asarray(gp - gm) / (2 * eps)
        num[3:, i] = np.asarray(ap - am) / (2 * eps)
    np.testing.assert_allclose(np.asarray(meas_jac), num, atol=1e-7)


def test_option_masks():
    m = imu.options_mask(gyroBias=True, accelBias=False, refImuTimeOffset=True)
    assert m[0:3].all() and not m[3:6].any() and m[21] and not m[22]
    all_masks = imu.all_test_option_masks()
    assert all_masks.shape == (256, imu.CALIB_DIM)
    assert not all_masks[0].any() and all_masks[255].all()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
