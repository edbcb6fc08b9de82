"""Generate golden Fisheye624 (FisheyeRadTanThinPrism) projection pairs.

INDEPENDENT implementation of the published model — scalar mpmath at 50
digits, written directly from the model definition (theta-polynomial radial
fisheye + tangential + thin-prism, the model the projectaria SDK calls
Fisheye624 and the reference delegates to at
interfaces/ark/camera_model/CameraModelParam.h:35-60):

    r      = |(x, y)|,  theta = atan2(r, z)
    thetaD = theta * (1 + k0 th^2 + ... + k5 th^12)
    (a, b) = thetaD * (x, y) / r
    rho2   = a^2 + b^2
    u_d    = a + p0 (rho2 + 2 a^2) + 2 p1 a b + s0 rho2 + s1 rho2^2
    v_d    = b + p1 (rho2 + 2 b^2) + 2 p0 a b + s2 rho2 + s3 rho2^2
    uv     = f * (u_d, v_d) + (cx, cy)

Shares NO code with visual_inertial_bundle_adjustment_tpu/ops/camera/*: no
jax, no vectorization, Horner-free explicit powers, mpmath atan2. The output
JSON anchors tests/test_camera.py::test_fisheye624_matches_golden at
sub-1e-6-px agreement in f64.

Run: python tools_dev/gen_fisheye_golden.py  (writes tests/data/fisheye624_golden.json)
"""

import json
import pathlib
import random

import mpmath as mp

mp.mp.dps = 50

# realistic Aria SLAM-camera-like parameter sets (focal px, principal point,
# six radial, two tangential, four thin-prism) + a distortion-free set and a
# strong-distortion set
PARAM_SETS = [
    [241.09, 319.53, 239.77,
     -0.0254, 0.0961, -0.1173, 0.0661, -0.0157, 0.0011,
     0.00042, -0.00031, 0.00013, -0.00052, 0.00021, -0.00017],
    [150.0, 320.0, 240.0] + [0.0] * 12,
    [410.5, 704.8, 703.2,
     0.391, -0.125, 0.046, -0.0088, 0.00074, -0.00002,
     -0.0013, 0.0009, 0.0011, 0.0004, -0.0006, 0.0002],
]


def project_scalar(p, x, y, z):
    f, cx, cy = mp.mpf(p[0]), mp.mpf(p[1]), mp.mpf(p[2])
    k = [mp.mpf(v) for v in p[3:9]]
    p0, p1 = mp.mpf(p[9]), mp.mpf(p[10])
    s0, s1, s2, s3 = [mp.mpf(v) for v in p[11:15]]
    x, y, z = mp.mpf(x), mp.mpf(y), mp.mpf(z)
    r = mp.sqrt(x * x + y * y)
    theta = mp.atan2(r, z)
    th2 = theta * theta
    m = 1 + k[0] * th2 + k[1] * th2**2 + k[2] * th2**3 \
        + k[3] * th2**4 + k[4] * th2**5 + k[5] * th2**6
    if r == 0:
        a = b = mp.mpf(0)
    else:
        a = theta * m * x / r
        b = theta * m * y / r
    rho2 = a * a + b * b
    u_d = a + p0 * (rho2 + 2 * a * a) + 2 * p1 * a * b + s0 * rho2 + s1 * rho2**2
    v_d = b + p1 * (rho2 + 2 * b * b) + 2 * p0 * a * b + s2 * rho2 + s3 * rho2**2
    return f * u_d + cx, f * v_d + cy


def main():
    rng = random.Random(1729)
    cases = []
    for pi, params in enumerate(PARAM_SETS):
        pts = []
        # structured: rays over a polar grid of incidence angles up to ~75 deg
        for theta_deg in [0.0, 1.0, 5.0, 15.0, 30.0, 45.0, 60.0, 75.0]:
            for phi_deg in [0.0, 37.0, 90.0, 151.0, 233.0, 301.0]:
                th = mp.mpf(theta_deg) * mp.pi / 180
                ph = mp.mpf(phi_deg) * mp.pi / 180
                d = mp.mpf(rng.uniform(0.3, 8.0))
                pts.append((float(d * mp.sin(th) * mp.cos(ph)),
                            float(d * mp.sin(th) * mp.sin(ph)),
                            float(d * mp.cos(th))))
        # random in-front points
        for _ in range(40):
            pts.append((rng.uniform(-3, 3), rng.uniform(-3, 3),
                        rng.uniform(0.05, 10.0)))
        rows = []
        for (x, y, z) in pts:
            u, v = project_scalar(params, x, y, z)
            rows.append(dict(point=[x, y, z], uv=[float(u), float(v)]))
        cases.append(dict(params=params, pairs=rows))
    out = pathlib.Path(__file__).resolve().parent.parent / "tests/data/fisheye624_golden.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(cases, indent=1))
    print(f"wrote {out} ({sum(len(c['pairs']) for c in cases)} pairs)")


if __name__ == "__main__":
    main()
