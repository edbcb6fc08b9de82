"""Fused Pallas linearization of blocked ROLLING-SHUTTER visual batches.

The full-sensor hot path (reference RollingShutterVisualFactor,
viba/problem/VisualFactor.cpp:122-214): per observation the capture-time
pose shift is interpolated from the per-rig RS table segment, the point is
projected through the full camera model, and the whitened residual plus the
analytic Jacobian blocks for (point 3 | rig pose+vel 9 | cam extr 6 |
cam intr 17 incl. readout + time offset) are produced in ONE pass over the
rig tile grid with every variable table VMEM-resident.

The generic path (factors.linearize_batch jacrev) pays ~8 HBM row-gathers of
the per-observation argument arrays plus a chunked 2-pass VJP through the
whole chain per 2-row residual — measured 453 ms at the 10-minute bench
scale (1.75M observations, v5e). Here the entire chain is componentized on
(ts,) lane vectors and the Jacobian comes from jax.linearize +
jax.linear_transpose INSIDE the kernel (2 cotangent passes, all VPU
elementwise), i.e. exactly the reverse-mode math with zero argument
materialization. The interpolation SEGMENT is chosen outside at the current
readout/time-offset (rs_segment_lookup) and is locally constant under AD,
matching the generic path and the reference's re-query-per-evaluation
semantics (RollingShutterData.cpp:70-113); the readout/time-offset
derivative flows through the interpolant time dt.

First-order boxplus: Jacobians are evaluated at xi = 0, where
se3_boxplus(T, xi) = exp(xi) * T has value T and tangent
(dq, dt) = ((0, dw/2), dv) — the unnormalized quaternion (1, w/2) and
translation v reproduce both exactly, so the kernel composes with that
2-term exp and jax.linearize recovers the exact analytic chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import segments as seg
from .visual_fused import _PROJ, _pad_rows, _small_gather, MIN_Z

# bf16 split count for the in-kernel table gathers (pose / point / RS
# slab). These gathers fetch PRIMAL world-frame values: 2 splits keep only
# ~16 mantissa bits, i.e. ~1.5e-5 RELATIVE of coordinates that are tens of
# meters — an absolute position error of ~1e-4 m that projection amplifies
# (focal/depth ~ 200 px/m) to ~3e-3 px of residual error, 30x over the
# kernel's 1e-4 accuracy bound (measured on-chip, round 5). Primal gathers
# must stay exact: 3 splits.
GATHER_SPLITS = 3

# ---------------------------------------------------------------------------
# componentized quaternion / motion-integral helpers on lane vectors
# (mirror ops/lie.py and ops/motion.py exactly, incl. the double-where
# Taylor guards that keep both AD modes finite at zero rotation)
# ---------------------------------------------------------------------------


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qconj(q):
    return (q[0], -q[1], -q[2], -q[3])


def _qrot3(q, v):
    qw = q[0]
    qv = (q[1], q[2], q[3])
    u = _cross(qv, v)
    uu = _cross(qv, u)
    return (v[0] + 2.0 * (qw * u[0] + uu[0]),
            v[1] + 2.0 * (qw * u[1] + uu[1]),
            v[2] + 2.0 * (qw * u[2] + uu[2]))


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _so3_exp_c(om, theta2):
    """Componentized lie.so3_exp with its double-where Taylor guard."""
    small = theta2 < 1e-6
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    ts_ = jnp.sqrt(t2s)
    half = 0.5 * ts_
    sinc_half = jnp.where(
        small, 0.5 - theta2 / 48.0 + theta2 * theta2 / 3840.0,
        jnp.sin(half) / ts_)
    cw = jnp.where(small, 1.0 - theta2 / 8.0 + theta2 * theta2 / 384.0,
                   jnp.cos(half))
    return (cw, sinc_half * om[0], sinc_half * om[1], sinc_half * om[2])


def _int_coeffs_c(theta2):
    """Componentized motion._integration_coeffs (c1..c3 only)."""
    theta = jnp.sqrt(theta2 + 1e-30)
    th4 = theta2 * theta2
    small = theta < 1e-3
    theta2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    s_over = jnp.sin(theta) / jnp.where(small, jnp.ones_like(theta), theta)
    mC_over = (1.0 - jnp.cos(theta)) / theta2s
    c1 = jnp.where(small, 1.0 / 2.0 - theta2 / 24.0 + th4 / 729.0, mC_over)
    c2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + th4 / 5040.0,
                   (1.0 - s_over) / theta2s)
    c3 = jnp.where(small, 1.0 / 24.0 - theta2 / 729.0 + th4 / 40320.0,
                   (0.5 - mC_over) / theta2s)
    return c1, c2, c3


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# segment slab components: [dt(1) | q(4) | dV(3) | dP(3) | i_gyro(3) |
#                            i_accel(3) | i_dvel(3)] = 20, laid out
# slab[r, c*K + k]; the +inf sample padding is replaced by BIG (a bf16-exact
# finite sentinel — inf would shatter into inf+NaN under the 3-term bf16
# selection-dot split)
SEG_COMPS = 20
BIG = 1e30


def _rs_kernel(kind, rb, nhw, nhg, K, with_jac, with_cal, *refs):
    (rbases_ref, hib_ref, rloc_ref, ploc_ref, iw_ref, ie_ref, pad_ref,
     tpf_ref, uv_ref, sh_ref, grav_ref, pose_ref, pt_ref, intr_ref,
     extr_ref, slab_hbm) = refs[:16]
    outs = refs[16:-2]
    slab_vmem, sem = refs[-2], refs[-1]
    res_ref, val_ref = outs[0], outs[1]
    jp_ref = outs[2] if with_jac else None
    jr_ref = outs[3] if with_jac else None
    jc_ref = outs[4] if with_jac and with_cal else None

    i = pl.program_id(0)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    # RS-table slab window for this tile's rigs: HBM -> VMEM DMA (the full
    # (R, 20K) table exceeds VMEM at session scale)
    cp = pltpu.make_async_copy(slab_hbm.at[pl.ds(base, rb), :],
                               slab_vmem, sem)
    cp.start()

    # --- gathers (all lane-major; see visual_fused._visual_kernel) ---
    ohr = seg._oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
    # exact 3-split gathers for PRIMAL values (see GATHER_SPLITS above —
    # 2 splits measured 3.6e-3 px of residual error on-chip, 30x over the
    # kernel's 1e-4 bound, because world coordinates are tens of meters)
    PG = seg._sel_dot(pose_ref[pl.ds(base, rb), :], ohr, ((0,), (0,)),
                      n=GATHER_SPLITS)
    Tq0 = (PG[0, :], PG[1, :], PG[2, :], PG[3, :])
    Tt0 = (PG[4, :], PG[5, :], PG[6, :])
    V0 = (PG[7, :], PG[8, :], PG[9, :])
    rmask = [PG[10 + j, :] for j in range(9)]
    countL = PG[19, :]

    hi, lo = seg._hi_lo(ploc_ref[0, 0])
    ohlo = seg._oh_t(lo, 128).astype(jnp.bfloat16)
    ohhi = seg._oh_t(hi, nhw)
    Zw = jnp.concatenate(
        [pt_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(6)], axis=0)
    Gt = seg._sel_dot(Zw, ohlo, ((1,), (0,)), n=GATHER_SPLITS)
    col = [jnp.sum(jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
           for j in range(6)]
    P0 = (col[0], col[1], col[2])
    pmask = (col[3], col[4], col[5])

    nin = intr_ref.shape[1]  # 17 params + 17 masks
    IN_all = _small_gather(intr_ref, iw_ref[0, 0], nin)
    IN = IN_all[:17]
    imask = IN_all[17:34]
    EX_all = _small_gather(extr_ref, ie_ref[0, 0], 13)
    Eq0 = (EX_all[0], EX_all[1], EX_all[2], EX_all[3])
    Et0 = (EX_all[4], EX_all[5], EX_all[6])
    emask = EX_all[7:13]

    tpf = tpf_ref[0, :]
    one = jnp.ones_like(tpf)

    # --- in-kernel segment lookup (RollingShutterData.cpp:70-113): the
    # per-rig RS table windows ride the SAME rig one-hot as the pose table;
    # the searchsorted index is a vectorized count over the K dt boundaries,
    # all chosen at the PRIMAL readout/time-offset (locally constant under
    # AD, like the outside rs_segment_lookup) ---
    cp.wait()
    sl = slab_vmem[...]  # (rb, >= SEG_COMPS*K)
    dtt0 = IN[15] * tpf - IN[16]
    # STACKED selection dots gather several components' K rows at once (K is
    # a sublane multiple, so the per-component slices are aligned): a dot
    # per component would pad each K~24 to the 128-row MXU tile, ~5x the
    # cycles. Groups stay <= 128 rows so each (rows, ts) f32 block and its
    # split-accumulation temporaries stay small (a single 20K-row stack blew
    # the 16 MiB scoped-VMEM limit at ts=1024).
    group = max(1, 128 // K)

    def _slab_rows(g0, g1):
        blk = seg._sel_dot(sl[:, g0 * K:g1 * K], ohr, ((0,), (0,)),
                           n=GATHER_SPLITS)
        return [jax.lax.slice_in_dim(blk, (c - g0) * K, (c - g0 + 1) * K,
                                     axis=0) for c in range(g0, g1)]

    rows0 = _slab_rows(0, min(group, SEG_COMPS))
    dtK = rows0[0]  # (K, ts)
    cnt = jnp.sum((dtK <= dtt0[None, :]).astype(jnp.float32), axis=0)
    idx = cnt.astype(jnp.int32)
    seg_i = jnp.maximum(idx - 1, 0)
    segv = (idx > 0) & (cnt < countL)
    ohK = seg._oh_t(seg_i, K)  # (K, ts) bool

    _vals = [jnp.sum(jnp.where(ohK, r, 0.0), axis=0) for r in rows0]
    for g0 in range(group, SEG_COMPS, group):
        for r in _slab_rows(g0, min(g0 + group, SEG_COMPS)):
            _vals.append(jnp.sum(jnp.where(ohK, r, 0.0), axis=0))

    def seg_comp(c):
        return _vals[c]

    seg_dt = seg_comp(0)
    seg_dt = jnp.where(seg_dt > BIG * 0.5, 0.0, seg_dt)
    seg_q = (seg_comp(1), seg_comp(2), seg_comp(3), seg_comp(4))
    seg_dv = (seg_comp(5), seg_comp(6), seg_comp(7))
    seg_dp = (seg_comp(8), seg_comp(9), seg_comp(10))
    ig = (seg_comp(11), seg_comp(12), seg_comp(13))
    ia = (seg_comp(14), seg_comp(15), seg_comp(16))
    idv = (seg_comp(17), seg_comp(18), seg_comp(19))
    grav = (grav_ref[0, 0] * one, grav_ref[0, 1] * one, grav_ref[0, 2] * one)
    obs0, obs1 = uv_ref[0, :], uv_ref[1, :]
    h00, h01, h10, h11 = sh_ref[0, :], sh_ref[1, :], sh_ref[2, :], sh_ref[3, :]
    proj = _PROJ[kind]

    def f(xi):
        # xi: (35,) tuple of lane tangents
        # [pt 0:3 | pose v 3:6, w 6:9 | vel 9:12 | extr v 12:15, w 15:18 |
        #  intr 18:35]
        pt = (P0[0] + xi[0], P0[1] + xi[1], P0[2] + xi[2])
        dq = (one, 0.5 * xi[6], 0.5 * xi[7], 0.5 * xi[8])
        Tq = _qmul(dq, Tq0)
        rt = _qrot3(dq, Tt0)
        Tt = (xi[3] + rt[0], xi[4] + rt[1], xi[5] + rt[2])
        vel = (V0[0] + xi[9], V0[1] + xi[10], V0[2] + xi[11])
        dqe = (one, 0.5 * xi[15], 0.5 * xi[16], 0.5 * xi[17])
        Eq = _qmul(dqe, Eq0)
        re = _qrot3(dqe, Et0)
        Et = (xi[12] + re[0], xi[13] + re[1], xi[14] + re[2])
        intr = [IN[j] + xi[18 + j] for j in range(17)]

        # per-row capture time + local constant-signal integration
        # (VisualFactor.cpp:141-144; motion.rvp_integrate_interp)
        dtt = intr[15] * tpf - intr[16]
        dtl = dtt - seg_dt
        om = (ig[0] * dtl, ig[1] * dtl, ig[2] * dtl)
        up = (ia[0] * dtl, ia[1] * dtl, ia[2] * dtl)
        theta2 = om[0] * om[0] + om[1] * om[1] + om[2] * om[2]
        c1, c2, c3 = _int_coeffs_c(theta2)
        q_loc = _so3_exp_c(om, theta2)
        oxu = _cross(om, up)
        oxoxu = _cross(om, oxu)
        dP_loc = tuple(
            (0.5 * up[j] + c2 * oxu[j] + c3 * oxoxu[j]) * dtl + idv[j] * dtl
            for j in range(3))
        # combine with the segment base RVP (motion.rvp_combine; dV unused)
        q_t = _qmul(seg_q, q_loc)
        rdp = _qrot3(seg_q, dP_loc)
        dP_t = tuple(seg_dp[j] + seg_dv[j] * dtl + rdp[j] for j in range(3))
        grav_mid = _qrot3(Tq, grav)
        vel_mid = _qrot3(Tq, vel)
        hdtt2 = 0.5 * dtt * dtt
        p_mid = tuple(dP_t[j] + vel_mid[j] * dtt + grav_mid[j] * hdtt2
                      for j in range(3))
        # T_bodyImuAtT_world = (q_t, p_mid)^-1 * T (factors._rs_visual_local)
        Sq = _qconj(q_t)
        St = _qrot3(Sq, p_mid)
        St = (-St[0], -St[1], -St[2])
        Tq2 = _qmul(Sq, Tq)
        rt2 = _qrot3(Sq, Tt)
        Tt2 = (rt2[0] + St[0], rt2[1] + St[1], rt2[2] + St[2])

        pr = _qrot3(Tq2, pt)
        pr = (pr[0] + Tt2[0], pr[1] + Tt2[1], pr[2] + Tt2[2])
        pc = _qrot3(Eq, pr)
        pc = (pc[0] + Et[0], pc[1] + Et[1], pc[2] + Et[2])
        u, v = proj(intr, pc[0], pc[1], pc[2])
        e0 = u - obs0
        e1 = v - obs1
        # camera-z rides along as an output for the validity flag (its
        # cotangent is zero in the VJP passes)
        return (h00 * e0 + h01 * e1, h10 * e0 + h11 * e1, pc[2])

    zeros = tuple(jnp.zeros_like(one) for _ in range(35))
    if with_jac:
        (r0, r1, zc), lin = jax.linearize(f, zeros)
        vjp = jax.linear_transpose(lin, zeros)
        zero = jnp.zeros_like(one)
        (row0,) = vjp((one, zero, zero))
        (row1,) = vjp((zero, one, zero))
    else:
        r0, r1, zc = f(zeros)

    res_ref[0, :] = r0.astype(res_ref.dtype)
    res_ref[1, :] = r1.astype(res_ref.dtype)
    valid = ((zc >= MIN_Z) & segv).astype(res_ref.dtype)
    val_ref[0, :] = jnp.maximum(valid, pad_ref[0, 0].astype(valid.dtype))
    if not with_jac:
        return

    mask35 = (list(pmask) + rmask[:6] + rmask[6:9] + list(emask)
              + list(imask))

    def out_rows(ref, cols):
        ref[:] = jnp.concatenate(
            [jnp.concatenate(
                [(row[c] * mask35[c])[None, :] for c in cols], axis=0)[None]
             for row in (row0, row1)], axis=0).astype(ref.dtype)

    jp_ref[:] = jnp.concatenate(
        [jnp.concatenate([(row[c] * mask35[c])[None, :] for c in range(3)],
                         axis=0)[None]
         for row in (row0, row1)], axis=0).astype(jp_ref.dtype)
    zero3 = jnp.zeros((3, one.shape[0]), one.dtype)
    jr_ref[:] = jnp.concatenate(
        [jnp.concatenate(
            [(row[c] * mask35[c])[None, :] for c in range(3, 12)] + [zero3],
            axis=0)[None]
         for row in (row0, row1)], axis=0).astype(jr_ref.dtype)
    if with_cal:
        out_rows(jc_ref, range(12, 35))


def _rs_slab(tables, dtype):
    """(R, SEG_COMPS*K8) resident slab, slab[r, c*K8 + k]; K8 = K rounded up
    to a sublane multiple so the stacked in-kernel gather (ONE selection dot
    over all SEG_COMPS*K8 rows — a per-component dot would pad each K~23 to
    the 128-row MXU tile, ~5x the cycles) can slice per component at aligned
    offsets. +inf dt entries (incl. the K->K8 pad rows) become the finite
    BIG sentinel (bf16-split-safe); other components pad with zero (never
    selected: seg_i < count <= K)."""
    R, K = tables.dt.shape
    K8 = ((K + 7) // 8) * 8
    dt = jnp.where(jnp.isfinite(tables.dt), tables.dt, BIG)
    comps = jnp.concatenate([
        dt[..., None], tables.q, tables.dV, tables.dP,
        tables.i_gyro, tables.i_accel, tables.i_dvel,
    ], axis=-1)  # (R, K, SEG_COMPS)
    if K8 != K:
        comps = jnp.pad(comps, ((0, 0), (0, K8 - K), (0, 0)))
        comps = comps.at[:, K:, 0].set(BIG)
    slab = jnp.moveaxis(comps, -1, 1).reshape(R, SEG_COMPS * K8).astype(dtype)
    w = slab.shape[1]
    wp = -(-w // 128) * 128  # DMA slices must be lane-tile (128) aligned
    return jnp.pad(slab, ((0, 0), (0, wp - w))), K8


def _run_rs(camera_kind, data, v, masks, info, with_jac, with_cal):
    if camera_kind not in _PROJ or info.prb2 == 0 or info.nhg == 0:
        return None
    if not seg.use_pallas(v.points) or "_rg_pt_local" not in data:
        return None
    tables = data["rs_tables"]
    K = tables.dt.shape[1]
    if K > 256 or tables.dt.shape[0] != v.pose_q.shape[0]:
        return None  # slab too wide for VMEM / tables not rig-indexed
    nt, ts, rb, nhg = info.nt, info.ts, info.rb, info.nhg
    nhw = info.prb2 // 128
    N = nt * ts
    dtype = v.points.dtype
    # this kernel's in-kernel-AD live set overflows the 16 MiB scoped-VMEM
    # stack at ts=4096, but the OTHER kernels sharing this layout (Schur
    # matvec family) run best on coarse tiles — so subdivide each layout
    # tile into sub-tiles here: sub-tile b of tile i keeps tile i's rig/
    # window bases (spans only shrink), and the flat per-observation arrays
    # reshape without any data movement
    RS_TS = 1024
    if ts > RS_TS and ts % RS_TS:
        return None  # non-multiple tile size: fall back to the generic path
    if ts > RS_TS:
        sub = ts // RS_TS
        nt, ts = nt * sub, RS_TS
        rbases = jnp.repeat(data["_rb_base"].astype(jnp.int32), sub)
        hibs = jnp.repeat(data["_rg_hib"].astype(jnp.int32), sub)
    else:
        rbases = data["_rb_base"].astype(jnp.int32)
        hibs = data["_rg_hib"].astype(jnp.int32)

    rig_mask = (masks.rig[:, :9].astype(dtype) if masks is not None
                else jnp.ones((v.pose_q.shape[0], 9), dtype))
    pt_mask = (masks.points.astype(dtype) if masks is not None
               else jnp.ones_like(v.points))
    intr_mask = (masks.cam_intr.astype(dtype) if masks is not None
                 else jnp.ones_like(v.cam_intr))
    extr_mask = (masks.cam_extr.astype(dtype) if masks is not None
                 else jnp.ones((v.cam_extr_q.shape[0], 6), dtype))
    poseM = jnp.concatenate(
        [v.pose_q, v.pose_t, v.vel, rig_mask,
         tables.count.astype(dtype)[:, None]], axis=1)
    poseM, npad_r = seg._table_pad(poseM, rb)
    ptM = seg.pt_table_to_kernel(
        jnp.concatenate([v.points, pt_mask], axis=1), nhg)
    intr_tab = _pad_rows(jnp.concatenate(
        [v.cam_intr[:, :17], intr_mask[:, :17]], axis=1))
    extr_tab = _pad_rows(jnp.concatenate(
        [v.cam_extr_q, v.cam_extr_t, extr_mask], axis=1))
    nwp, nep = intr_tab.shape[0], extr_tab.shape[0]
    nin = intr_tab.shape[1]

    slab_raw, K8 = _rs_slab(tables, dtype)
    slab, _ = seg._table_pad(slab_raw, rb)
    grav = jnp.asarray(tables.gravity_w, dtype).reshape(1, 3)

    ts_spec = pl.BlockSpec((1, 1, ts), lambda i, b, h: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i, b, h: (0,) * len(shape),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    row_spec = lambda d: pl.BlockSpec((d, ts), lambda i, b, h: (0, i),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    out_specs = [row_spec(2), row_spec(1)]
    out_shape = [jax.ShapeDtypeStruct((2, N), dtype),
                 jax.ShapeDtypeStruct((1, N), dtype)]
    if with_jac:
        out_specs += [
            pl.BlockSpec((2, 3, ts), lambda i, b, h: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 12, ts), lambda i, b, h: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [jax.ShapeDtypeStruct((2, 3, N), dtype),
                      jax.ShapeDtypeStruct((2, 12, N), dtype)]
        if with_cal:
            out_specs.append(pl.BlockSpec(
                (2, 23, ts), lambda i, b, h: (0, 0, i),
                memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((2, 23, N), dtype))
    return pl.pallas_call(
        partial(_rs_kernel, camera_kind, rb, nhw, nhg, K8, with_jac,
                with_cal),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                ts_spec, ts_spec, ts_spec, ts_spec, ts_spec,
                row_spec(1),
                row_spec(2), row_spec(4),
                const((1, 3)),
                const((npad_r, 20)),
                const((6 * nhg, 128)),
                const((nwp, nin)),
                const((nep, 13)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((rb, slab.shape[1]), dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=tuple(out_shape),
    )(
        rbases,
        hibs,
        data["_rb_local"].reshape(nt, 1, ts).astype(jnp.int32),
        data["_rg_pt_local"].reshape(nt, 1, ts).astype(jnp.int32),
        data["intr"].reshape(nt, 1, ts).astype(jnp.int32),
        data["extr"].reshape(nt, 1, ts).astype(jnp.int32),
        data["_pad"].reshape(nt, 1, ts),
        data["rs_tpf"].reshape(1, N).astype(dtype),
        data["_uvT"],
        data["_sh4"],
        grav,
        poseM,
        ptM,
        intr_tab,
        extr_tab,
        slab,
    )


def linearize_rs_fused(camera_kind, data, v, masks, info, with_cal):
    """Fused linearize for a blocked rs_visual batch.

    Returns (res (2,N), valid (N,), J_pt (2,3,N), J_rig (2,12,N)[,
    J_cal (2,23,N) = extr 6 | intr 17]) in blocked order, or None when the
    fast path does not apply."""
    out = _run_rs(camera_kind, data, v, masks, info, True, with_cal)
    if out is None:
        return None
    if with_cal:
        res, valid, J_pt, J_r, J_cal = out
        return res, valid[0], J_pt, J_r, J_cal
    res, valid, J_pt, J_r = out
    return res, valid[0], J_pt, J_r


def residual_rs_fused(camera_kind, data, v, info):
    """(res (2,N), valid (N,)) of a blocked rs_visual batch, or None."""
    out = _run_rs(camera_kind, data, v, None, info, False, False)
    if out is None:
        return None
    res, valid = out
    return res, valid[0]
