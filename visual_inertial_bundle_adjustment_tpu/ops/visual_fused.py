"""Fused Pallas linearization of blocked plain-visual batches.

One pass over the rig grid computes, per observation, the whitened residual
and the analytic pose/point Jacobian blocks of the visual factor
(reference VisualFactor.cpp:36-120), with every variable table VMEM-resident:

  p_rig = R(T) p + t(T)          T = exp(xi_pose) T0   (left boxplus,
  p_cam = R(E) p_rig + t(E)                             lie.se3_boxplus)
  res   = sqrt_h (proj(intr, p_cam) - obs + bias_on * bias)

The camera model runs componentized on (ts,) lane vectors; its 2x3 Jacobian
wrt p_cam comes from jax.linearize INSIDE the kernel (3 tangent passes
through the distortion), then chains analytically:

  d p_rig / d xi_pose = [ I | -hat(p_rig) ]   (tangent order [v, w])
  J_pose = sqrt_h D R(E) [ I | -hat(p_rig) ],  J_pt = sqrt_h D R(E) R(T)

This replaces the generic vmapped-jacfwd path (factors.linearize_batch) for
these batches: that path carries 15 AD columns through the full projection
and issues ~8 HBM row-gathers of 778k rows each (pose, point, intrinsics,
...) — the gathers alone dominate. Here gathers are one-hot MXU dots against
resident tables (pose via the rig window, points via the hierarchical
hi/lo window, intr/extr/bias via their tiny tables).

Numerics match the generic path to f32 rounding (same formulas, same
epsilons); the CPU/f64 fallback is the generic path itself.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import segments as seg
from .camera import KIND_FISHEYE624, KIND_LINEAR

MIN_Z = 1e-6


# ---------------------------------------------------------------------------
# componentized camera models on (ts,) lane vectors
# (mirror ops/camera/fisheye624.py:project and pinhole.py:project exactly,
# including the axis/zero guards)
# ---------------------------------------------------------------------------


def _atan2_rz(r, z):
    """atan2(r, z) for r > 0 (Mosaic has no atan2 primitive).

    Range-reduce m = min/max to [0,1], halve the angle twice
    (atan(m) = 2 atan(m / (1 + sqrt(1 + m^2)))), then a 5-term odd series —
    max error ~2 ulp f32 (next term y^11/11 < 2e-9 at y <= 0.2)."""
    az = jnp.abs(z)
    mx = jnp.maximum(r, az)
    mn = jnp.minimum(r, az)
    m = mn / jnp.where(mx <= 0.0, 1.0, mx)
    y = m / (1.0 + jnp.sqrt(1.0 + m * m))
    y = y / (1.0 + jnp.sqrt(1.0 + y * y))
    y2 = y * y
    a = 4.0 * y * (1.0 + y2 * (-1.0 / 3 + y2 * (0.2 + y2 * (-1.0 / 7 + y2 / 9))))
    theta0 = jnp.where(r > az, jnp.float32(jnp.pi / 2) - a, a)
    return jnp.where(z >= 0.0, theta0, jnp.float32(jnp.pi) - theta0)


def _proj_fisheye624(intr, x, y, z):
    f, cx, cy = intr[0], intr[1], intr[2]
    ks = intr[3:9]
    p0, p1 = intr[9], intr[10]
    s0, s1, s2, s3 = intr[11], intr[12], intr[13], intr[14]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + 1e-30)
    theta = _atan2_rz(r, z)
    theta2 = theta * theta
    m = jnp.ones_like(theta2)
    acc = jnp.ones_like(theta2)
    for i in range(6):
        acc = acc * theta2
        m = m + ks[i] * acc
    near = r < 1e-12
    r_safe = jnp.where(near, 1.0, r)
    z_safe = jnp.where(jnp.abs(z) < MIN_Z, MIN_Z, z)
    scale = jnp.where(near, 1.0 / z_safe, theta * m / r_safe)
    a = x * scale
    b = y * scale
    rho2 = a * a + b * b
    ab = a * b
    tx = p0 * (rho2 + 2.0 * a * a) + 2.0 * p1 * ab
    ty = p1 * (rho2 + 2.0 * b * b) + 2.0 * p0 * ab
    tpx = s0 * rho2 + s1 * rho2 * rho2
    tpy = s2 * rho2 + s3 * rho2 * rho2
    return (a + tx + tpx) * f + cx, (b + ty + tpy) * f + cy


def _proj_pinhole(intr, x, y, z):
    z_safe = jnp.where(jnp.abs(z) < MIN_Z, MIN_Z, z)
    return (intr[0] * x / z_safe + intr[2],
            intr[1] * y / z_safe + intr[3])


_PROJ = {KIND_FISHEYE624: _proj_fisheye624, KIND_LINEAR: _proj_pinhole}


def _qrot(q, v):
    """quat_rotate componentized: q = (w, x, y, z), v = (vx, vy, vz)."""
    qw, qx, qy, qz = q
    vx, vy, vz = v
    ux = qy * vz - qz * vy
    uy = qz * vx - qx * vz
    uz = qx * vy - qy * vx
    uux = qy * uz - qz * uy
    uuy = qz * ux - qx * uz
    uuz = qx * uy - qy * ux
    return (vx + 2.0 * (qw * ux + uux),
            vy + 2.0 * (qw * uy + uuy),
            vz + 2.0 * (qw * uz + uuz))


def _rot_cols(q, like):
    """Rotation matrix columns R[:, j] = R e_j as 3 lane-vector triples."""
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return [_qrot(q, (one, zero, zero)),
            _qrot(q, (zero, one, zero)),
            _qrot(q, (zero, zero, one))]


def _small_gather(tab_ref, idx, D):
    """(m, D) resident table + lane indices (ts,) -> list of D (ts,) rows."""
    m = tab_ref.shape[0]
    oh = seg._oh_t(idx, m).astype(jnp.bfloat16)
    G = seg._sel_dot(tab_ref[:], oh, ((0,), (0,)))  # (D, ts)
    return [G[j, :] for j in range(D)]


def _visual_kernel(kind, rb, nhw, nhg, with_jac, win, rbases_ref, hib_ref,
                   rloc_ref, ploc_ref, pad_ref, iw_ref, ie_ref, ib_ref,
                   bon_ref, uv_ref, sh_ref, pose_ref, pt_ref, intr_ref,
                   extr_ref, bias_ref, res_ref, val_ref, jp_ref=None,
                   jr_ref=None):
    i = pl.program_id(0)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    # --- gathers (all lane-major) ---
    ohr = seg._oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    # windowed pose table: pre-gathered (rb, 13) tile window instead of the
    # grid-resident (npad_r, 13) table (capacity scales, see
    # seg.RIG_RESIDENT_MAX_BYTES)
    pose_tile = pose_ref[0] if win else pose_ref[pl.ds(base, rb), :]
    PG = seg._sel_dot(pose_tile, ohr, ((0,), (0,)))
    Tq = (PG[0, :], PG[1, :], PG[2, :], PG[3, :])
    Tt = (PG[4, :], PG[5, :], PG[6, :])
    rmask = [PG[7 + j, :] for j in range(6)]

    hi, lo = seg._hi_lo(ploc_ref[0, 0])
    ohlo = seg._oh_t(lo, 128).astype(jnp.bfloat16)  # (128, ts)
    ohhi = seg._oh_t(hi, nhw)  # (nhw, ts) bool
    Zw = jnp.concatenate(
        [pt_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(6)], axis=0)
    Gt = seg._sel_dot(Zw, ohlo, ((1,), (0,)))  # (6*nhw, ts)
    col = [jnp.sum(jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
           for j in range(6)]
    p = (col[0], col[1], col[2])
    pmask = (col[3], col[4], col[5])

    IN = _small_gather(intr_ref, iw_ref[0, 0], intr_ref.shape[1])
    EX = _small_gather(extr_ref, ie_ref[0, 0], 7)
    BI = _small_gather(bias_ref, ib_ref[0, 0], 2)
    Eq = (EX[0], EX[1], EX[2], EX[3])
    Et = (EX[4], EX[5], EX[6])

    # --- geometry chain ---
    pr = _qrot(Tq, p)
    pr = (pr[0] + Tt[0], pr[1] + Tt[1], pr[2] + Tt[2])
    pc = _qrot(Eq, pr)
    pc = (pc[0] + Et[0], pc[1] + Et[1], pc[2] + Et[2])

    proj = _PROJ[kind]
    if with_jac:
        (u, v), lin = jax.linearize(
            lambda x, y, z: proj(IN, x, y, z), pc[0], pc[1], pc[2])
        one = jnp.ones_like(u)
        zero = jnp.zeros_like(u)
        D = [lin(one, zero, zero), lin(zero, one, zero), lin(zero, zero, one)]
        # D[c] = (du/dpc_c, dv/dpc_c)
    else:
        u, v = proj(IN, pc[0], pc[1], pc[2])

    # --- residual ---
    h00, h01, h10, h11 = sh_ref[0, :], sh_ref[1, :], sh_ref[2, :], sh_ref[3, :]
    bon = bon_ref[0, 0]
    e0 = u - uv_ref[0, :] + bon * BI[0]
    e1 = v - uv_ref[1, :] + bon * BI[1]
    res_ref[0, :] = (h00 * e0 + h01 * e1).astype(res_ref.dtype)
    res_ref[1, :] = (h10 * e0 + h11 * e1).astype(res_ref.dtype)
    valid = (pc[2] >= MIN_Z).astype(res_ref.dtype)
    val_ref[0, :] = jnp.maximum(valid, pad_ref[0, 0].astype(valid.dtype))
    if not with_jac:
        return

    # --- Jacobian chains ---
    # A2 = sqrt_h D (2,3); A3 = A2 R(E); J_pt = A3 R(T); J_rot[r] = pr x A3[r]
    A2 = [[h00 * D[c][0] + h01 * D[c][1] for c in range(3)],
          [h10 * D[c][0] + h11 * D[c][1] for c in range(3)]]
    RE = _rot_cols(Eq, u)  # RE[j] = column j (3 lane vectors)
    RT = _rot_cols(Tq, u)
    A3 = [[sum(A2[r][i2] * RE[j][i2] for i2 in range(3)) for j in range(3)]
          for r in range(2)]
    Jpt = [[sum(A3[r][i2] * RT[j][i2] for i2 in range(3)) * pmask[j]
            for j in range(3)] for r in range(2)]
    Jrot = [[(pr[(j + 1) % 3] * A3[r][(j + 2) % 3]
              - pr[(j + 2) % 3] * A3[r][(j + 1) % 3]) * rmask[3 + j]
             for j in range(3)] for r in range(2)]
    Jtr = [[A3[r][j] * rmask[j] for j in range(3)] for r in range(2)]

    jp_ref[:] = jnp.concatenate(
        [jnp.concatenate([c[None, :] for c in Jpt[r]], axis=0)[None]
         for r in range(2)], axis=0).astype(jp_ref.dtype)
    zeros6 = jnp.zeros((6, u.shape[0]), u.dtype)
    jr_ref[:] = jnp.concatenate(
        [jnp.concatenate(
            [c[None, :] for c in (Jtr[r] + Jrot[r])] + [zeros6],
            axis=0)[None]
         for r in range(2)], axis=0).astype(jr_ref.dtype)


def _pad_rows(a, mult=8):
    n = a.shape[0]
    npad = ((n + mult - 1) // mult) * mult
    return jnp.pad(a, ((0, npad - n), (0, 0)))


def _run(camera_kind, data, v, masks, info, with_jac):
    if camera_kind not in _PROJ or info.prb2 == 0 or info.nhg == 0:
        return None
    if not seg.use_pallas(v.points) or "_rg_pt_local" not in data:
        return None
    nt, ts, rb, nhg = info.nt, info.ts, info.rb, info.nhg
    nhw = info.prb2 // 128
    N = nt * ts
    dtype = v.points.dtype

    rig_mask = (masks.rig[:, :6].astype(dtype) if masks is not None
                else jnp.ones((v.pose_q.shape[0], 6), dtype))
    pt_mask = (masks.points.astype(dtype) if masks is not None
               else jnp.ones_like(v.points))
    poseM = jnp.concatenate([v.pose_q, v.pose_t, rig_mask], axis=1)
    poseM, npad_r = seg._table_pad(poseM, rb)
    win = not seg._rig_resident(npad_r)
    if win:
        # capacity scales: per-tile (rb, 13) pose windows instead of the
        # grid-resident (npad_r, 13) table (see seg.RIG_RESIDENT_MAX_BYTES)
        rows = seg._rows_from_bases(data["_rb_base"].astype(jnp.int32),
                                    nt, rb)
        poseM = seg.gather_tiles(poseM, rows, nt, rb)
        pose_spec = pl.BlockSpec((1, rb, 13), lambda i, b, h: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    ptM = seg.pt_table_to_kernel(
        jnp.concatenate([v.points, pt_mask], axis=1), nhg)
    intr_tab = _pad_rows(v.cam_intr)
    extr_tab = _pad_rows(
        jnp.concatenate([v.cam_extr_q, v.cam_extr_t], axis=1))
    bias_tab = _pad_rows(v.det_bias)
    nwp, nep, nbp = intr_tab.shape[0], extr_tab.shape[0], bias_tab.shape[0]
    ndim = intr_tab.shape[1]

    ts_spec = pl.BlockSpec((1, 1, ts), lambda i, b, h: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i, b, h: (0,) * len(shape),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    if not win:
        pose_spec = const((npad_r, 13))
    out_specs = [
        pl.BlockSpec((2, ts), lambda i, b, h: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts), lambda i, b, h: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((2, N), dtype),
        jax.ShapeDtypeStruct((1, N), dtype),
    ]
    if with_jac:
        out_specs += [
            pl.BlockSpec((2, 3, ts), lambda i, b, h: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 12, ts), lambda i, b, h: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((2, 3, N), dtype),
            jax.ShapeDtypeStruct((2, 12, N), dtype),
        ]
    return pl.pallas_call(
        partial(_visual_kernel, camera_kind, rb, nhw, nhg, with_jac, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                ts_spec, ts_spec, ts_spec, ts_spec, ts_spec, ts_spec, ts_spec,
                pl.BlockSpec((2, ts), lambda i, b, h: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, ts), lambda i, b, h: (0, i),
                             memory_space=pltpu.VMEM),
                pose_spec,
                const((6 * nhg, 128)),
                const((nwp, ndim)),
                const((nep, 7)),
                const((nbp, 2)),
            ],
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shape),
    )(
        data["_rb_base"].astype(jnp.int32),
        data["_rg_hib"].astype(jnp.int32),
        data["_rb_local"].reshape(nt, 1, ts).astype(jnp.int32),
        data["_rg_pt_local"].reshape(nt, 1, ts).astype(jnp.int32),
        data["_pad"].reshape(nt, 1, ts),
        data["intr"].reshape(nt, 1, ts).astype(jnp.int32),
        data["extr"].reshape(nt, 1, ts).astype(jnp.int32),
        data["bias"].reshape(nt, 1, ts).astype(jnp.int32),
        data["bias_on"].reshape(nt, 1, ts).astype(dtype),
        data["_uvT"],
        data["_sh4"],
        poseM,
        ptM,
        intr_tab,
        extr_tab,
        bias_tab,
    )


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _visual_cal_kernel(kind, rb, nhw, nhg, rbases_ref, hib_ref, rloc_ref,
                       ploc_ref, iw_ref, ie_ref, ib_ref, pad_ref, bon_ref,
                       uv_ref, sh_ref, pose_ref, pt_ref, intr_ref, extr_ref,
                       bias_ref, res_ref, val_ref, jp_ref, jr_ref, jc_ref):
    """Calib-coupled plain-visual linearization (round-3 VERDICT ask #5):
    point + pose + cam extr + cam intr Jacobians from jax.linearize +
    linear_transpose IN-KERNEL (2 cotangent passes), the way rs_fused
    does for rolling shutter. Reference analytic hot kernel:
    viba/problem/VisualFactor.cpp:36-120."""
    i = pl.program_id(0)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    ohr = seg._oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
    PG = seg._sel_dot(pose_ref[pl.ds(base, rb), :], ohr, ((0,), (0,)))
    Tq0 = (PG[0, :], PG[1, :], PG[2, :], PG[3, :])
    Tt0 = (PG[4, :], PG[5, :], PG[6, :])
    rmask = [PG[7 + j, :] for j in range(6)]

    hi, lo = seg._hi_lo(ploc_ref[0, 0])
    ohlo = seg._oh_t(lo, 128).astype(jnp.bfloat16)
    ohhi = seg._oh_t(hi, nhw)
    Zw = jnp.concatenate(
        [pt_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(6)], axis=0)
    Gt = seg._sel_dot(Zw, ohlo, ((1,), (0,)))
    col = [jnp.sum(jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
           for j in range(6)]
    P0 = (col[0], col[1], col[2])
    pmask = (col[3], col[4], col[5])

    nin = intr_ref.shape[1]
    IN_all = _small_gather(intr_ref, iw_ref[0, 0], nin)
    IN = IN_all[:17]
    imask = IN_all[17:34]
    EX_all = _small_gather(extr_ref, ie_ref[0, 0], 13)
    Eq0 = (EX_all[0], EX_all[1], EX_all[2], EX_all[3])
    Et0 = (EX_all[4], EX_all[5], EX_all[6])
    emask = EX_all[7:13]
    BI = _small_gather(bias_ref, ib_ref[0, 0], 2)

    obs0, obs1 = uv_ref[0, :], uv_ref[1, :]
    h00, h01, h10, h11 = sh_ref[0, :], sh_ref[1, :], sh_ref[2, :], sh_ref[3, :]
    bon = bon_ref[0, 0]
    proj = _PROJ[kind]
    one = jnp.ones_like(obs0)

    def f(xi):
        # xi: [pt 0:3 | pose v 3:6, w 6:9 | extr v 9:12, w 12:15 | intr 15:32]
        pt = (P0[0] + xi[0], P0[1] + xi[1], P0[2] + xi[2])
        dq = (one, 0.5 * xi[6], 0.5 * xi[7], 0.5 * xi[8])
        Tq = _qmul(dq, Tq0)
        rt = _qrot(dq, Tt0)
        Tt = (xi[3] + rt[0], xi[4] + rt[1], xi[5] + rt[2])
        dqe = (one, 0.5 * xi[12], 0.5 * xi[13], 0.5 * xi[14])
        Eq = _qmul(dqe, Eq0)
        re = _qrot(dqe, Et0)
        Et = (xi[9] + re[0], xi[10] + re[1], xi[11] + re[2])
        intr = [IN[j] + xi[15 + j] for j in range(17)]
        pr = _qrot(Tq, pt)
        pr = (pr[0] + Tt[0], pr[1] + Tt[1], pr[2] + Tt[2])
        pc = _qrot(Eq, pr)
        pc = (pc[0] + Et[0], pc[1] + Et[1], pc[2] + Et[2])
        u, v = proj(intr, pc[0], pc[1], pc[2])
        e0 = u - obs0 + bon * BI[0]
        e1 = v - obs1 + bon * BI[1]
        return (h00 * e0 + h01 * e1, h10 * e0 + h11 * e1, pc[2])

    zeros = tuple(jnp.zeros_like(one) for _ in range(32))
    (r0, r1, zc), lin = jax.linearize(f, zeros)
    vjp = jax.linear_transpose(lin, zeros)
    zero = jnp.zeros_like(one)
    (row0,) = vjp((one, zero, zero))
    (row1,) = vjp((zero, one, zero))

    res_ref[0, :] = r0.astype(res_ref.dtype)
    res_ref[1, :] = r1.astype(res_ref.dtype)
    valid = (zc >= MIN_Z).astype(res_ref.dtype)
    val_ref[0, :] = jnp.maximum(valid, pad_ref[0, 0].astype(valid.dtype))

    mask32 = list(pmask) + rmask + list(emask) + list(imask)

    jp_ref[:] = jnp.concatenate(
        [jnp.concatenate([(row[c] * mask32[c])[None, :] for c in range(3)],
                         axis=0)[None]
         for row in (row0, row1)], axis=0).astype(jp_ref.dtype)
    zeros6 = jnp.zeros((6, one.shape[0]), one.dtype)
    jr_ref[:] = jnp.concatenate(
        [jnp.concatenate(
            [(row[c] * mask32[c])[None, :] for c in range(3, 9)] + [zeros6],
            axis=0)[None]
         for row in (row0, row1)], axis=0).astype(jr_ref.dtype)
    jc_ref[:] = jnp.concatenate(
        [jnp.concatenate(
            [(row[c] * mask32[c])[None, :] for c in range(9, 32)],
            axis=0)[None]
         for row in (row0, row1)], axis=0).astype(jc_ref.dtype)


def _run_cal(camera_kind, data, v, masks, info):
    """Fused calib-coupled plain-visual linearize (sub-tiled like rs_fused:
    the in-kernel-AD live set wants fine tiles; the layout's coarse tiles
    subdivide without data movement)."""
    if camera_kind not in _PROJ or info.prb2 == 0 or info.nhg == 0:
        return None
    if not seg.use_pallas(v.points) or "_rg_pt_local" not in data:
        return None
    nt, ts, rb, nhg = info.nt, info.ts, info.rb, info.nhg
    nhw = info.prb2 // 128
    N = nt * ts
    dtype = v.points.dtype
    SUB_TS = 1024
    if ts > SUB_TS and ts % SUB_TS:
        return None
    if ts > SUB_TS:
        sub = ts // SUB_TS
        nt, ts = nt * sub, SUB_TS
        rbases = jnp.repeat(data["_rb_base"].astype(jnp.int32), sub)
        hibs = jnp.repeat(data["_rg_hib"].astype(jnp.int32), sub)
    else:
        rbases = data["_rb_base"].astype(jnp.int32)
        hibs = data["_rg_hib"].astype(jnp.int32)

    rig_mask = (masks.rig[:, :6].astype(dtype) if masks is not None
                else jnp.ones((v.pose_q.shape[0], 6), dtype))
    pt_mask = (masks.points.astype(dtype) if masks is not None
               else jnp.ones_like(v.points))
    intr_mask = (masks.cam_intr.astype(dtype) if masks is not None
                 else jnp.ones_like(v.cam_intr))
    extr_mask = (masks.cam_extr.astype(dtype) if masks is not None
                 else jnp.ones((v.cam_extr_q.shape[0], 6), dtype))
    poseM = jnp.concatenate([v.pose_q, v.pose_t, rig_mask], axis=1)
    poseM, npad_r = seg._table_pad(poseM, rb)
    ptM = seg.pt_table_to_kernel(
        jnp.concatenate([v.points, pt_mask], axis=1), nhg)
    intr_tab = _pad_rows(jnp.concatenate(
        [v.cam_intr[:, :17], intr_mask[:, :17]], axis=1))
    extr_tab = _pad_rows(jnp.concatenate(
        [v.cam_extr_q, v.cam_extr_t, extr_mask], axis=1))
    bias_tab = _pad_rows(v.det_bias)
    nwp, nep, nbp = intr_tab.shape[0], extr_tab.shape[0], bias_tab.shape[0]
    nin = intr_tab.shape[1]

    ts_spec = pl.BlockSpec((1, 1, ts), lambda i, b, h: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i, b, h: (0,) * len(shape),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    row_spec = lambda d: pl.BlockSpec((d, ts), lambda i, b, h: (0, i),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_visual_cal_kernel, camera_kind, rb, nhw, nhg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                ts_spec, ts_spec, ts_spec, ts_spec, ts_spec, ts_spec,
                ts_spec,
                row_spec(2), row_spec(4),
                const((npad_r, 13)),
                const((6 * nhg, 128)),
                const((nwp, nin)),
                const((nep, 13)),
                const((nbp, 2)),
            ],
            out_specs=(
                row_spec(2), row_spec(1),
                pl.BlockSpec((2, 3, ts), lambda i, b, h: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 12, ts), lambda i, b, h: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 23, ts), lambda i, b, h: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, N), dtype),
            jax.ShapeDtypeStruct((1, N), dtype),
            jax.ShapeDtypeStruct((2, 3, N), dtype),
            jax.ShapeDtypeStruct((2, 12, N), dtype),
            jax.ShapeDtypeStruct((2, 23, N), dtype),
        ),
    )(
        rbases,
        hibs,
        data["_rb_local"].reshape(nt, 1, ts).astype(jnp.int32),
        data["_rg_pt_local"].reshape(nt, 1, ts).astype(jnp.int32),
        data["intr"].reshape(nt, 1, ts).astype(jnp.int32),
        data["extr"].reshape(nt, 1, ts).astype(jnp.int32),
        data["bias"].reshape(nt, 1, ts).astype(jnp.int32),
        data["_pad"].reshape(nt, 1, ts),
        data["bias_on"].reshape(nt, 1, ts).astype(dtype),
        data["_uvT"],
        data["_sh4"],
        poseM,
        ptM,
        intr_tab,
        extr_tab,
        bias_tab,
    )


def linearize_visual_cal_fused(camera_kind, data, v, masks, info):
    """Fused linearize for a blocked CALIB-COUPLED plain-visual batch.

    Returns (res (2,N), valid (N,), J_pt (2,3,N), J_rig (2,12,N),
    J_cal (2,23,N) = extr 6 | intr 17), or None when inapplicable."""
    out = _run_cal(camera_kind, data, v, masks, info)
    if out is None:
        return None
    res, valid, J_pt, J_r, J_cal = out
    return res, valid[0], J_pt, J_r, J_cal


def linearize_visual_fused(camera_kind, data, v, masks, info):
    """Fused linearize for a blocked rig-only visual batch.

    Returns (res (2, N), valid (N,), J_pt (2, 3, N), J_rig (2, 12, N)) in the
    blocked (padded grid) order, or None when the fast path does not apply.
    """
    out = _run(camera_kind, data, v, masks, info, with_jac=True)
    if out is None:
        return None
    res, valid, J_pt, J_r = out
    return res, valid[0], J_pt, J_r


def residual_visual_fused(camera_kind, data, v, masks, info):
    """(res (2, N), valid (N,)) of a blocked visual batch, or None."""
    out = _run(camera_kind, data, v, masks, info, with_jac=False)
    if out is None:
        return None
    res, valid = out
    return res, valid[0]
