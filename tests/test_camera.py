"""Camera model tests: project/unproject round trips and Jacobian smoothness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.ops import camera

RNG = np.random.default_rng(21)

# Aria-like SLAM camera fisheye624 parameters (640x480-class sensor)
ARIA_LIKE = np.array(
    [241.0, 316.0, 237.0,  # f, cx, cy
     -0.02, 0.05, -0.04, 0.009, 0.002, -0.0015,  # k0..k5
     0.0004, -0.0002,  # p0, p1
     0.0012, -0.0008, 0.0006, -0.0003]  # s0..s3
)


def rand_rays(n, max_angle_deg=70.0):
    """Random rays within max_angle of the optical axis, unit depth spread."""
    ang = RNG.uniform(0, np.deg2rad(max_angle_deg), size=n)
    azi = RNG.uniform(0, 2 * np.pi, size=n)
    d = RNG.uniform(0.3, 10.0, size=n)
    x = np.sin(ang) * np.cos(azi)
    y = np.sin(ang) * np.sin(azi)
    z = np.cos(ang)
    return jnp.asarray(np.stack([x, y, z], -1) * d[:, None])


class TestFisheye624:
    def test_project_unproject_roundtrip(self):
        params = jnp.asarray(ARIA_LIKE)
        pts = rand_rays(256)
        uv, valid = camera.project(camera.KIND_FISHEYE624, params, pts)
        assert bool(jnp.all(valid))
        rays = camera.unproject(camera.KIND_FISHEYE624, params, uv)
        # rays parallel to pts
        cos = jnp.sum(rays * pts, axis=-1) / jnp.linalg.norm(pts, axis=-1)
        np.testing.assert_allclose(cos, 1.0, atol=1e-10)

    def test_reduces_to_equidistant_without_distortion(self):
        params = jnp.zeros(15).at[0].set(250.0).at[1].set(320.0).at[2].set(240.0)
        pt = jnp.asarray([0.3, -0.2, 1.0])
        uv, _ = camera.project(camera.KIND_FISHEYE624, params, pt)
        r = np.hypot(0.3, -0.2)
        theta = np.arctan2(r, 1.0)
        expect = 250.0 * theta * np.array([0.3, -0.2]) / r + np.array([320.0, 240.0])
        np.testing.assert_allclose(np.asarray(uv), expect, atol=1e-12)

    def test_invalid_behind_camera(self):
        params = jnp.asarray(ARIA_LIKE)
        _, valid = camera.project(
            camera.KIND_FISHEYE624, params, jnp.asarray([[0.1, 0.1, -1.0], [0.1, 0.1, 1.0]])
        )
        np.testing.assert_array_equal(np.asarray(valid), [False, True])

    def test_jacobians_finite_and_match_numeric(self):
        params = jnp.asarray(ARIA_LIKE)
        pt = jnp.asarray([0.4, -0.3, 0.9])

        jac_pt = jax.jacfwd(lambda p: camera.project(camera.KIND_FISHEYE624, params, p)[0])(pt)
        jac_par = jax.jacfwd(
            lambda c: camera.project(camera.KIND_FISHEYE624, c, pt)[0]
        )(params)
        assert np.all(np.isfinite(jac_pt)) and np.all(np.isfinite(jac_par))

        eps = 1e-7
        num = np.zeros((2, 3))
        for i in range(3):
            d = np.zeros(3)
            d[i] = eps
            up, _ = camera.project(camera.KIND_FISHEYE624, params, pt + jnp.asarray(d))
            um, _ = camera.project(camera.KIND_FISHEYE624, params, pt - jnp.asarray(d))
            num[:, i] = np.asarray(up - um) / (2 * eps)
        np.testing.assert_allclose(np.asarray(jac_pt), num, atol=1e-5)

    def test_on_axis_stable(self):
        params = jnp.asarray(ARIA_LIKE)
        uv, valid = camera.project(camera.KIND_FISHEYE624, params, jnp.asarray([0.0, 0.0, 2.0]))
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(uv), ARIA_LIKE[1:3], atol=1e-9)
        g = jax.jacfwd(lambda p: camera.project(camera.KIND_FISHEYE624, params, p)[0])(
            jnp.asarray([1e-9, 1e-9, 2.0])
        )
        assert np.all(np.isfinite(np.asarray(g)))


class TestPinhole:
    def test_roundtrip(self):
        params = jnp.asarray([400.0, 410.0, 320.0, 240.0])
        pts = rand_rays(64, max_angle_deg=35.0)
        uv, valid = camera.project(camera.KIND_LINEAR, params, pts)
        assert bool(jnp.all(valid))
        rays = camera.unproject(camera.KIND_LINEAR, params, uv)
        cos = jnp.sum(rays * pts, axis=-1) / jnp.linalg.norm(pts, axis=-1)
        np.testing.assert_allclose(cos, 1.0, atol=1e-12)


def test_fisheye624_matches_golden():
    """Golden project pairs from an INDEPENDENT scalar 50-digit-mpmath
    re-derivation of the published FisheyeRadTanThinPrism model
    (tools_dev/gen_fisheye_golden.py; the SDK delegation this replaces is
    interfaces/ark/camera_model/CameraModelParam.h:35-60). Sub-1e-6-px
    agreement across three parameter sets incl. zero- and strong-distortion."""
    import json
    import pathlib

    data = json.loads(
        (pathlib.Path(__file__).parent / "data/fisheye624_golden.json").read_text()
    )
    assert len(data) >= 3
    for case in data:
        params = jnp.asarray(case["params"], jnp.float64)
        pts = jnp.asarray([p["point"] for p in case["pairs"]], jnp.float64)
        uv_gold = np.asarray([p["uv"] for p in case["pairs"]])
        uv, valid = camera.project(camera.KIND_FISHEYE624, params, pts)
        assert bool(jnp.all(valid))
        err = np.linalg.norm(np.asarray(uv) - uv_gold, axis=-1)
        assert err.max() < 1e-6, err.max()
        # and unprojection recovers the golden ray directions
        rays = camera.unproject(camera.KIND_FISHEYE624, params,
                                jnp.asarray(uv_gold))
        cos = jnp.sum(rays * pts, axis=-1) / (
            jnp.linalg.norm(pts, axis=-1) * jnp.linalg.norm(rays, axis=-1))
        np.testing.assert_allclose(np.asarray(cos), 1.0, atol=1e-9)


def test_pad_params():
    p = camera.pad_params(ARIA_LIKE, readout=0.016, time_offset=1e-3)
    assert p.shape == (17,)
    assert p[camera.READOUT] == 0.016 and p[camera.TIME_OFFSET] == 1e-3


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
