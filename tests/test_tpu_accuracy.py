"""TPU-only accuracy coverage for the bf16 / Pallas fast paths.

Round-2 VERDICT item 3: the bf16 J matvec storage (problem/rcs.py
MATVEC_BF16), the Pallas segment kernels (ops/segments.py), and the fused
visual linearizer (ops/visual_fused.py) only engage on the TPU backend —
the rest of the suite runs f64-on-CPU where they are dormant. These tests
execute them on the real chip and assert the stated accuracy bounds
(PERF_NOTES.md "Hard-won TPU lessons"), with the rigor of the reference's
preconditioner/PCG tests (lib/small_thing/tests/TestPCG.cpp:28-145)
applied to the TPU kernels.

Run with:  VIBA_TEST_BACKEND=tpu python -m pytest tests/test_tpu_accuracy.py -m tpu
(conftest.py keeps the real backend + native f32 under that env var).
ONE TPU process at a time — do not run concurrently with bench/profiling.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs the real TPU backend (VIBA_TEST_BACKEND=tpu)")
pytestmark = [pytest.mark.tpu, pytest.mark.slow, requires_tpu]


def _blocked_problem():
    """~60 s session large enough that the blocked MXU engine engages
    (>= 16384 visual observations, rcs.finalize_blocks threshold)."""
    from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
        BuildOptions,
        build_synthetic_problem,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import (
        SyntheticSession,
    )

    s = SyntheticSession(duration=60.0, keyframe_hz=10.0, gyro_hz=200.0,
                         accel_hz=200.0, num_points=300, seed=9,
                         pixel_noise=0.3)
    return build_synthetic_problem(
        s, BuildOptions(init_pose_noise=0.005, init_point_noise=0.03,
                        init_vel_noise=0.03))


def _one_step(problem, lam=1e-4, iters=40, tol=1e-10):
    ks = problem._build()
    k_lin, k_assemble, k_step = ks[0], ks[6], ks[7]
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    lg = k_lin(datas, v, masks, None)
    asm = k_assemble(datas, lg, v, masks)
    out = k_step(asm, datas, lg, v, masks, jnp.asarray(lam, v.points.dtype),
                 iters, tol)
    jax.block_until_ready(out)
    return lg, out


def _flat_step(out):
    x_r, x_l = out[0], out[1]
    parts = [np.asarray(getattr(x_r, f), np.float64).ravel()
             for f in x_r._fields]
    parts.append(np.asarray(x_l, np.float64).ravel())
    return np.concatenate(parts)


def test_bf16_matvec_step_agreement():
    """One LM step with bf16 J matvec storage vs f32: the PCG operator is
    consistently rounded (the reference's LowerPrecSolvePrecond trade,
    Preconditioner.h:163, applied to the reduced operator), so the solved
    step must agree in direction and model reduction within stated bounds."""
    from visual_inertial_bundle_adjustment_tpu.problem import rcs

    saved = rcs.MATVEC_BF16
    try:
        rcs.MATVEC_BF16 = True
        lg_a, out_a = _one_step(_blocked_problem())
        rcs.MATVEC_BF16 = False
        lg_b, out_b = _one_step(_blocked_problem())
    finally:
        rcs.MATVEC_BF16 = saved

    # linearization (f32 both ways) must agree tightly
    np.testing.assert_allclose(float(lg_a.cost), float(lg_b.cost), rtol=1e-6)

    sa, sb = _flat_step(out_a), _flat_step(out_b)
    cos = float(sa @ sb / (np.linalg.norm(sa) * np.linalg.norm(sb)))
    assert cos > 0.999, f"step direction cosine {cos}"
    rel = float(np.linalg.norm(sa - sb) / np.linalg.norm(sb))
    assert rel < 0.05, f"step relative L2 difference {rel}"
    # model reduction and achieved new cost agree
    np.testing.assert_allclose(float(out_a[2]), float(out_b[2]), rtol=2e-2)
    np.testing.assert_allclose(float(out_a[9].cost), float(out_b[9].cost),
                               rtol=1e-3)


def test_fused_visual_linearizer_matches_generic():
    """ops/visual_fused.py (analytic Pallas linearizer) vs the generic
    vmapped-AD path on the same blocked batch (tools_dev/check_visual_fused
    folded into pytest)."""
    from visual_inertial_bundle_adjustment_tpu.problem import factors as fct

    problem = _blocked_problem()
    problem._build()
    v, masks = problem.variables, problem.masks
    checked = 0
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind != "visual" or not getattr(cfg, "block_info", None):
            continue
        if "_uvT" not in data:
            continue
        cfg = dataclasses.replace(cfg, active_groups=(fct.POINTS, fct.RIG))
        lin_f = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data)
        data_g = {k: a for k, a in data.items() if k != "_uvT"}
        lin_g = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data_g)
        assert lin_f.groups == lin_g.groups
        real = np.asarray(data["_pad"]) < 0.5

        def rel_err(a, b):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

        assert rel_err(np.asarray(lin_f.res)[:, real],
                       np.asarray(lin_g.res)[:, real]) < 1e-5
        assert rel_err(np.asarray(lin_f.valid)[real],
                       np.asarray(lin_g.valid)[real]) < 1e-6
        for g, Jf, Jg in zip(lin_f.groups, lin_f.jac, lin_g.jac):
            assert rel_err(np.asarray(Jf)[..., real],
                           np.asarray(Jg)[..., real]) < 2e-4, g
        checked += 1
    assert checked, "no blocked visual batch with the fused hook was built"


def test_fused_visual_cal_linearizer_matches_generic():
    """ops/visual_fused.py CAL path (round-3 VERDICT ask #5: in-kernel
    reverse-mode Jacobians for point/pose/cam-extr/cam-intr) vs the generic
    vmapped-AD path, on a blocked plain-visual batch with the camera
    calibration random-walking."""
    from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
        BuildOptions,
        build_synthetic_problem,
    )
    from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import (
        SyntheticSession,
    )
    from visual_inertial_bundle_adjustment_tpu.problem import factors as fct

    s = SyntheticSession(duration=60.0, keyframe_hz=10.0, gyro_hz=200.0,
                         accel_hz=200.0, num_points=300, seed=9,
                         pixel_noise=0.3)
    problem = build_synthetic_problem(
        s, BuildOptions(init_pose_noise=0.005, init_point_noise=0.03,
                        init_vel_noise=0.03, estimate_cam_intr=True,
                        estimate_cam_extr=True))
    problem._build()
    v, masks = problem.variables, problem.masks
    checked = 0
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind != "visual" or not getattr(cfg, "block_info", None):
            continue
        if "_uvT" not in data:
            continue
        cfg = dataclasses.replace(
            cfg, active_groups=(fct.POINTS, fct.RIG, fct.CAM_EXTR,
                                fct.CAM_INTR))
        lin_f = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data)
        data_g = {k: a for k, a in data.items() if k != "_uvT"}
        lin_g = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data_g)
        assert lin_f.groups == lin_g.groups
        assert fct.CAM_INTR in lin_f.groups
        real = np.asarray(data["_pad"]) < 0.5

        def rel_err(a, b):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

        assert rel_err(np.asarray(lin_f.res)[:, real],
                       np.asarray(lin_g.res)[:, real]) < 1e-5
        assert rel_err(np.asarray(lin_f.valid)[real],
                       np.asarray(lin_g.valid)[real]) < 1e-6
        for g, Jf, Jg in zip(lin_f.groups, lin_f.jac, lin_g.jac):
            assert rel_err(np.asarray(Jf)[..., real],
                           np.asarray(Jg)[..., real]) < 3e-4, g
        checked += 1
    assert checked, "no blocked cal-coupled visual batch was built"


def test_fused_rs_linearizer_matches_generic():
    """ops/rs_fused.py (in-kernel segment lookup + reverse-mode AD inside
    the Pallas kernel) vs the generic jacrev path on a full-sensor session
    (tools_dev/check_rs_fused folded into pytest)."""
    import sys

    sys.path.insert(0, "tools_dev")
    from profile_full_sensor import build

    from visual_inertial_bundle_adjustment_tpu.problem import factors as fct

    problem = build(60.0, 2000)
    problem._build()
    v, masks = problem.variables, problem.masks
    checked = 0
    for cfg, data in zip(problem.cfgs, problem.datas):
        if cfg.kind != "rs_visual" or not getattr(cfg, "block_info", None):
            continue
        cfg = dataclasses.replace(cfg, active_groups=tuple(
            g for g, _ in fct.REGISTRY[cfg.kind]["tangents"]))
        lin_f = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data)
        data_g = {k: a for k, a in data.items() if k != "_uvT"}
        lin_g = jax.jit(lambda d: fct.linearize_batch(cfg, d, v, masks))(data_g)
        assert lin_f.groups == lin_g.groups
        real = np.asarray(data["_pad"]) < 0.5
        ok = (np.asarray(lin_g.valid) > 0.5) & real

        def rel_err(a, b):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

        assert rel_err(np.asarray(lin_f.res)[:, ok],
                       np.asarray(lin_g.res)[:, ok]) < 1e-4
        np.testing.assert_array_equal(np.asarray(lin_f.valid)[real],
                                      np.asarray(lin_g.valid)[real])
        for g, Jf, Jg in zip(lin_f.groups, lin_f.jac, lin_g.jac):
            assert rel_err(np.asarray(Jf)[..., ok],
                           np.asarray(Jg)[..., ok]) < 3e-4, g
        checked += 1
    assert checked, "no blocked rs_visual batch was built"


def _tile_plan(rng, n_rows, n_obs, rb, ts):
    """Random sorted keys + ragged tile plan with 8-aligned bases
    (mirrors rcs._tile_plan; from tools_dev/check_table_kernels)."""
    keys = np.sort(rng.integers(0, n_rows, n_obs))
    starts, bases = [], []
    i = 0
    while i < n_obs:
        base = int(keys[i]) & ~7
        end = min(i + ts, int(np.searchsorted(keys, base + rb, side="left")))
        starts.append(i)
        bases.append(base)
        i = end
    nt = len(starts)
    npad = nt * ts
    local = np.zeros(npad, np.int32)
    w = np.zeros(npad, np.float32)
    starts_a = np.asarray(starts + [n_obs])
    for t in range(nt):
        s, e = starts_a[t], starts_a[t + 1]
        local[t * ts: t * ts + (e - s)] = keys[s:e] - bases[t]
        w[t * ts: t * ts + (e - s)] = rng.random(e - s) + 0.1
    return (jnp.asarray(local), jnp.asarray(w),
            jnp.asarray(np.asarray(bases, np.int32)), nt)


def test_table_kernels_pallas_vs_xla():
    """Pallas segment kernels vs their exact one-hot-matmul XLA fallbacks
    (tools_dev/check_table_kernels folded into pytest): outputs must agree
    to f32 reduction-order noise."""
    from visual_inertial_bundle_adjustment_tpu.ops import segments as seg

    rng = np.random.default_rng(0)
    d, k = 2, 12
    n_rows, n_obs, rb, ts = 600, 60_000, 128, 4096
    local, w, bases, nt = _tile_plan(rng, n_rows, n_obs, rb, ts)
    npad = nt * ts
    J = jnp.asarray(rng.standard_normal((d, k, npad)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n_rows, k)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((d, npad)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((9, npad)), jnp.float32)

    real = seg.use_pallas

    def run(fn, *args):
        out_tpu = jax.jit(fn)(*args)
        seg.use_pallas = lambda *a: False
        out_ref = jax.jit(fn)(*args)
        seg.use_pallas = real
        return out_tpu, out_ref

    def assert_close(name, a, b, tol=1e-5):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert err < tol, f"{name}: rel-err {err:.2e}"

    try:
        (wu_t, y_t), (wu_r, y_r) = run(
            lambda J, w, x: seg.seg_mv_fused_table(
                J, w, x, local, bases, nt, ts, rb), J, w, x)
        assert_close("seg_mv_fused_table.wu", wu_t, wu_r)
        assert_close("seg_mv_fused_table.y", y_t, y_r)

        g_t, g_r = run(
            lambda J, x: seg.seg_mv_gather_table(
                J, x, local, bases, nt, ts, rb), J, x)
        assert_close("seg_mv_gather_table", g_t, g_r)

        s_t, s_r = run(
            lambda J, u: seg.seg_mv_scatter_table(
                J, u, local, bases, nt, ts, rb, n_rows), J, u)
        assert_close("seg_mv_scatter_table", s_t, s_r)

        r_t, r_r = run(
            lambda c: seg.seg_reduce_table(
                c, local, bases, nt, ts, rb, n_rows), c)
        assert_close("seg_reduce_table", r_t, r_r)
    finally:
        seg.use_pallas = real


def _schur_plan(rng, n_rows, n_obs, rb, ts):
    """Tile plan + correlated point ids with bounded per-tile hi windows
    (mirrors rcs.finalize_blocks; from tools_dev/check_table_kernels)."""
    local, w, bases, nt = _tile_plan(rng, n_rows, n_obs, rb, ts)
    pt_keys = np.minimum(
        (np.asarray(local) + np.repeat(np.asarray(bases), ts)) * 2,
        3 * n_rows - 1).astype(np.int64)
    n_pts = int(pt_keys.max()) + 1
    base2 = []
    for t in range(nt):
        sk = pt_keys[t * ts:(t + 1) * ts][np.asarray(w)[t * ts:(t + 1) * ts] > 0]
        base2.append((int(sk.min()) & ~1023) if len(sk) else 0)
    base2 = np.asarray(base2, np.int64)
    span = max(int(pt_keys[t * ts:(t + 1) * ts].max() - base2[t]) + 1
               for t in range(nt))
    nhw = ((-(-span // 128)) + 7) // 8 * 8
    hib = (base2 >> 7).astype(np.int32)
    nhg = ((max(-(-n_pts // 128), int(hib.max()) + nhw)) + 7) // 8 * 8
    ploc = (pt_keys - np.repeat(base2, ts)).astype(np.int32)
    ploc[np.asarray(w) <= 0] = 0
    return (local, w, bases, nt, jnp.asarray(ploc), jnp.asarray(hib),
            n_pts, nhw, nhg)


def test_windowed_rig_kernels_match_resident():
    """The windowed (per-tile HBM partial) mode of the rig-grid kernels —
    the >14k-rig capacity path that fixes the BENCH_r04 scoped-VMEM compile
    OOM at the reference's PCG-switch scale (Settings.cpp:296-320) — must
    match the grid-resident mode to f32 reduction-order noise. Forced on at
    a small shape via seg.RIG_RESIDENT_MAX_BYTES = 0."""
    from visual_inertial_bundle_adjustment_tpu.ops import segments as seg

    rng = np.random.default_rng(3)
    d, k = 2, 6
    n_rows, n_obs, rb, ts = 600, 60_000, 112, 4096
    (local, w, bases, nt, ploc, hib, n_pts, nhw, nhg) = _schur_plan(
        rng, n_rows, n_obs, rb, ts)
    npad = nt * ts
    J = jnp.asarray(rng.standard_normal((d, k, npad)), jnp.float32)
    Jp = jnp.asarray(rng.standard_normal((d, 3, npad)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((d, npad)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n_rows, k)), jnp.float32)
    Hs = rng.standard_normal((n_pts, 3, 3)).astype(np.float32)
    Hs = jnp.asarray(Hs + np.swapaxes(Hs, 1, 2))

    fns = {
        "assemble": lambda J, Jp, res, w: seg.seg_assemble_rig(
            J, Jp, res, w, local, ploc, hib, bases, n_pts, nt, ts, rb,
            nhw, nhg, n_rows),
        "schur_pcg": lambda J, Jp, w, x, H: seg.seg_schur_pcg(
            J, Jp, w, local, ploc, hib, x, H, bases, n_pts, nt, ts, rb,
            nhw, nhg),
        "precond": lambda J, Jp, w, H: seg.seg_precond_rig(
            J, Jp, w, local, ploc, hib, H, bases, nt, ts, rb, nhw, nhg,
            n_rows),
    }
    args = {
        "assemble": (J, Jp, res, w),
        "schur_pcg": (J, Jp, w, x, Hs),
        "precond": (J, Jp, w, Hs),
    }
    saved = seg.RIG_RESIDENT_MAX_BYTES
    try:
        resident = {n: jax.tree.map(np.asarray, jax.jit(f)(*args[n]))
                    for n, f in fns.items()}
        seg.RIG_RESIDENT_MAX_BYTES = 0  # force the windowed mode
        # fresh jit wrappers so the re-trace sees the new gate
        windowed = {n: jax.tree.map(np.asarray, jax.jit(f)(*args[n]))
                    for n, f in fns.items()}
    finally:
        seg.RIG_RESIDENT_MAX_BYTES = saved
    for n in fns:
        for i, (a, b) in enumerate(zip(jax.tree.leaves(resident[n]),
                                       jax.tree.leaves(windowed[n]))):
            err = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
            assert err < 2e-5, f"{n}[{i}]: windowed vs resident rel-err {err:.2e}"
