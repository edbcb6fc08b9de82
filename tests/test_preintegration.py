"""Preintegration validation, mirroring reference TestPreIntegration.cpp:104-203:

(a) full Jacobian (incl. both time-offset columns and the aligned gyro/accel
    corner case) vs central differences of the preintegration itself;
(b) Monte-Carlo covariance: whitened perturbations from per-sample noise must
    have near-unit singular values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.models import imu
from visual_inertial_bundle_adjustment_tpu.ops import motion as mo
from visual_inertial_bundle_adjustment_tpu.ops import preintegration as pre

RNG = np.random.default_rng(11)


def make_stream(
    t_len=0.5,
    gyro_hz=190.0,
    accel_hz=240.0,
    margin=0.1,
    aligned=False,
    seed=0,
):
    """Synthetic raw IMU stream around an interval [0, t_len]."""
    rng = np.random.default_rng(seed)
    if aligned:
        accel_hz = gyro_hz
    g_t = np.arange(-margin, t_len + margin, 1.0 / gyro_hz)
    g_t = g_t + (0.0 if aligned else rng.uniform(0, 1e-4, size=g_t.shape))
    a_t = np.arange(-margin, t_len + margin, 1.0 / accel_hz)
    a_t = a_t + (0.0 if aligned else rng.uniform(0, 1e-4, size=a_t.shape))
    if aligned:
        a_t = g_t.copy()

    def sig(t, f, amp):
        return np.stack(
            [amp * np.sin(2 * np.pi * f * t), amp * np.cos(2 * np.pi * f * t * 1.3),
             amp * np.sin(2 * np.pi * f * t * 0.7 + 1.0)],
            axis=-1,
        )

    g_v = sig(g_t, 1.1, 0.8) + rng.normal(size=(len(g_t), 3)) * 0.01
    a_v = sig(a_t, 0.9, 3.0) + np.array([0.0, 0.0, 9.8]) + rng.normal(size=(len(a_t), 3)) * 0.02
    return g_t, g_v, a_t, a_v


def pad_interval(g_t, g_v, a_t, a_v, t_len, S=None, dtype=jnp.float64):
    S = S or max(len(g_t), len(a_t))
    def pad_t(t):
        out = np.full(S, 1e9)
        out[: min(len(t), S)] = t[:S]
        return out
    def pad_v(v):
        out = np.zeros((S, 3))
        out[: min(len(v), S)] = v[:S]
        return out
    return pre.PreintInterval(
        jnp.asarray(pad_t(g_t), dtype),
        jnp.asarray(pad_v(g_v), dtype),
        jnp.asarray(pad_t(a_t), dtype),
        jnp.asarray(pad_v(a_v), dtype),
        jnp.asarray(t_len, dtype),
    )


def random_calib(seed=3):
    rng = np.random.default_rng(seed)
    c = np.zeros(imu.CALIB_DIM)
    c[imu.GYRO_BIAS] = rng.normal(size=3) * 0.02
    c[imu.ACCEL_BIAS] = rng.normal(size=3) * 0.1
    c[imu.GYRO_SCALE] = 1.0 + rng.normal(size=3) * 0.01
    c[imu.ACCEL_SCALE] = 1.0 + rng.normal(size=3) * 0.01
    c[imu.GYRO_NONORTH] = rng.normal(size=6) * 0.005
    c[imu.ACCEL_NONORTH] = rng.normal(size=3) * 0.005
    c[imu.DT_REF_GYRO] = rng.normal() * 2e-4
    c[imu.DT_REF_ACCEL] = rng.normal() * 2e-4
    return jnp.asarray(c)


NOISE = imu.default_noise_model()
T_LEN = 0.5
NUM_STEPS = 300


@pytest.fixture(scope="module")
def stream():
    return make_stream(t_len=T_LEN, seed=5)


def test_matches_plain_integration(stream):
    """Full preintegration RVP == RVP-only integration == combine of halves."""
    calib = random_calib()
    iv = pad_interval(*stream, T_LEN)
    p = pre.preintegrate(calib, iv, NOISE, NUM_STEPS)
    assert bool(p.valid)
    rvp2, _, _, _, _ = pre.integrate_measurements(calib, iv, NUM_STEPS)
    np.testing.assert_allclose(mo.rvp_boxminus(p.rvp, rvp2), 0.0, atol=1e-12)
    np.testing.assert_allclose(p.rvp.dt, T_LEN, atol=1e-9)

    # interval splitting: combine of two halves equals the whole
    g_t, g_v, a_t, a_v = stream
    iv1 = pad_interval(g_t, g_v, a_t, a_v, T_LEN / 2)
    half = T_LEN / 2
    iv2 = pad_interval(g_t - half, g_v, a_t - half, a_v, T_LEN / 2)
    pa = pre.preintegrate(calib, iv1, NOISE, NUM_STEPS)
    pb = pre.preintegrate(calib, iv2, NOISE, NUM_STEPS)
    comb = mo.rvp_combine(pa.rvp, pb.rvp)
    np.testing.assert_allclose(mo.rvp_boxminus(comb, p.rvp), 0.0, atol=1e-10)


@pytest.mark.parametrize("aligned", [False, True])
def test_jacobian_numeric(aligned):
    """J vs central differences over calib perturbations (all 23 columns)."""
    g_t, g_v, a_t, a_v = make_stream(t_len=T_LEN, aligned=aligned, seed=9)
    iv = pad_interval(g_t, g_v, a_t, a_v, T_LEN)
    calib = random_calib(4)
    if aligned:
        # identical clocks so boundaries stay aligned after offsets
        calib = calib.at[imu.DT_REF_GYRO].set(1.23e-4).at[imu.DT_REF_ACCEL].set(1.23e-4)
    p = pre.preintegrate(calib, iv, NOISE, NUM_STEPS)
    assert bool(p.valid)

    # Pick the time-offset finite-difference step small enough not to slide a
    # boundary of one stream across a boundary of the other (the function has
    # kinks there; the analytic column is the derivative of the smooth part,
    # and for the aligned case the symmetrized average across the kink).
    if aligned:
        eps_t = 2.0e-5
    else:
        dtg = float(calib[imu.DT_REF_GYRO])
        dta = float(calib[imu.DT_REF_ACCEL])
        bg = g_t[(g_t - dtg > 0) & (g_t - dtg < T_LEN)] - dtg
        ba = a_t[(a_t - dta > 0) & (a_t - dta < T_LEN)] - dta
        min_cross = np.abs(bg[:, None] - ba[None, :]).min()
        eps_t = max(min(0.3 * min_cross, 2.0e-5), 1e-7)

    fn = jax.jit(lambda c: pre.preintegrate(c, iv, NOISE, NUM_STEPS).rvp)
    num = np.zeros((9, imu.CALIB_DIM))
    for i in range(imu.CALIB_DIM):
        eps = 1e-6 if i < 21 else eps_t
        step = jnp.zeros(imu.CALIB_DIM).at[i].set(eps)
        rp = fn(imu.calib_boxplus(calib, step))
        rm = fn(imu.calib_boxplus(calib, -step))
        num[:, i] = np.asarray(mo.rvp_boxminus(rp, rm)) / (2 * eps)
    J = np.asarray(p.J)
    # scale-aware comparison: columns have very different magnitudes
    scale = np.maximum(np.abs(num).max(axis=0), 1.0)
    err = np.abs(J - num) / scale
    assert err[:, :21].max() < 1e-5, f"calib cols err {err[:, :21].max()}"
    assert err[:, 21:].max() < 2e-3, (
        f"time cols err {err[:, 21:].max()} (eps_t={eps_t})"
    )


def test_monte_carlo_covariance(stream):
    """Whitened noise-driven perturbations have unit covariance (±8%).

    Reference TestPreIntegration.cpp:150-203 (250k samples there; fewer here,
    with tolerance ~2*sqrt(9/N) widened accordingly)."""
    calib = random_calib(6)
    g_t, g_v, a_t, a_v = stream
    iv = pad_interval(g_t, g_v, a_t, a_v, T_LEN)
    p = pre.preintegrate(calib, iv, NOISE, NUM_STEPS)
    assert bool(p.valid)

    N = 16000
    rng = np.random.default_rng(123)
    g_std = np.sqrt(np.asarray(NOISE.gyro_sample_var))
    a_std = np.sqrt(np.asarray(NOISE.accel_sample_var))
    g_noise = jnp.asarray(rng.normal(size=(N,) + g_v.shape) * g_std)
    a_noise = jnp.asarray(rng.normal(size=(N,) + a_v.shape) * a_std)

    base_gv = jnp.asarray(np.pad(g_v, ((0, iv.gyro_v.shape[0] - len(g_v)), (0, 0))))
    base_av = jnp.asarray(np.pad(a_v, ((0, iv.accel_v.shape[0] - len(a_v)), (0, 0))))

    @jax.jit
    def run(gn, an):
        iv2 = iv._replace(gyro_v=base_gv + gn, accel_v=base_av + an)
        rvp, *_ = pre.integrate_measurements(calib, iv2, NUM_STEPS)
        return mo.rvp_boxminus(rvp, p.rvp)

    deltas = jax.vmap(run)(
        jnp.pad(g_noise, ((0, 0), (0, iv.gyro_v.shape[0] - len(g_v)), (0, 0))),
        jnp.pad(a_noise, ((0, 0), (0, iv.accel_v.shape[0] - len(a_v)), (0, 0))),
    )
    L = np.linalg.cholesky(np.asarray(p.cov))
    white = np.linalg.solve(L, np.asarray(deltas).T).T  # (N, 9)
    sample_cov = white.T @ white / N
    svals = np.linalg.svd(sample_cov, compute_uv=False)
    assert np.all(np.abs(svals - 1.0) < 0.07), f"singular values {svals}"


def test_invalid_when_window_too_short():
    g_t, g_v, a_t, a_v = make_stream(t_len=0.2, seed=5)
    iv = pad_interval(g_t, g_v, a_t, a_v, 0.5)  # samples end before interval
    p = pre.preintegrate(random_calib(), iv, NOISE, NUM_STEPS)
    assert not bool(p.valid)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
