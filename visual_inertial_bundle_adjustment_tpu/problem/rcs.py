"""Blocked reduced-camera-system solver: MXU one-hot gather/scatter engine.

TPU gathers and scatters run at ~1-2 GElem/s (row-latency-bound) while the
MXU streams matmuls at tens of TFLOP/s — so the factor-side Schur PCG of
engine.py, whose matvec re-gathers/scatters 769k-observation index sets 40x
per solve, is gather-bound (~41 ms/matvec measured on v5e for a 2-minute
session). This module removes every large gather/scatter from the solve:

  * visual-family batches are REORDERED AT BUILD TIME: sorted by rig and
    padded into a (num_rig_blocks x obs_per_block) grid (and, through a
    static permutation, into a second point-sorted grid). Padded rows carry
    zero whitening so they contribute exactly nothing.
  * every factor->rig / factor->landmark reduction becomes a BLOCK-DIAGONAL
    ONE-HOT MATMUL: within a 128-row block, gather = onehot @ table and
    scatter-add = onehot^T @ contributions, both on the MXU (measured 2 ms
    for the full rig matvec vs 41 ms with XLA scatters). f32 one-hot keeps
    selection exact (1.0 * x); the per-matvec cross-structure cost is two
    (N,)-row permutes of the 2-vector residual payload between the rig- and
    point-sorted grids.
  * small batches (inertial chains, priors, random walks — O(R) factors)
    keep the generic engine paths: their gathers are tiny.

This replaces the reference's assembled block-CSR + BaSpaCho supernodal
solve / PCG (lib/small_thing/Optimizer.cpp:166-331): the symbolic analysis
(reordering, block grids, permutations) happens once on the host like
BaSpaCho's symbolic factorization; the numeric phase is pure MXU work.
Semantics (damping formula, Schur elimination, block-Jacobi + Gauss-Seidel
Schur-corrected preconditioner, PCG) are identical to engine.py.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import segments as seg
from . import engine
from . import factors as fct
from .structure import (Masks, Tangent, pack_blocks,
                        pack_info as _pack_info, pack_t, t_dot,
                        unpack_t, zero_tangent)

VISUAL_KINDS = ("visual", "rs_visual")

# Structurally nonzero rig tangent columns per visual kind: the rig tangent
# is [pose(0:6), vel(6:9), omega(9:12)]; plain visual factors touch only the
# pose, rolling-shutter ones also the velocity (through the RS estimate),
# neither touches omega. Slicing the J blocks (and the rig table) to this
# prefix halves (or better) the J HBM traffic and selection-dot FLOPs of
# every solver kernel (PERF_NOTES candidate #4).
RIG_COLS = {"visual": 6, "rs_visual": 9}

# Store bf16 copies of the J blocks for the PCG-loop matvec kernels (TPU
# only): the 40-iteration solve loop re-reads J every matvec and is HBM-
# bound; bf16 halves that traffic. Cost, gradient, assembly and the final
# back-substitution RHS stay f32 — the PCG solves the consistently-rounded
# operator S~ = J~^T w J~ - W~ H_ll^-1 W~^T (symmetric PSD), i.e. the
# reference's LowerPrecSolvePrecond precision trade (Preconditioner.h:163)
# applied to the reduced operator itself; LM's model-cost check and exact
# cost evaluation guard the step quality.
MATVEC_BF16 = True


def _padk(y, k):
    """(n, k) rig-column result back to the full 12-column tangent layout."""
    return jnp.pad(y, ((0, 0), (0, 12 - k))) if k < 12 else y


def _padkk(B, k):
    """(n, k, k) rig blocks back to (n, 12, 12)."""
    return jnp.pad(B, ((0, 0), (0, 12 - k), (0, 12 - k))) if k < 12 else B


# ---------------------------------------------------------------------------
# Host-side symbolic phase: sort, pad, build block grids + permutations
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockInfo:
    """Static ragged-tile geometry for one visual batch (hashable, in cfg).

    Observations sorted by rig are chopped into fixed-size tiles of `ts`
    rows; a tile is cut early whenever its rig span would exceed `rb`, so
    every tile addresses rows [base, base+rb) of the rig table (block-CSR
    with a fixed tile height — skew costs at most one partial tile per cut,
    unlike a uniform grid which pads every block to the max-degree block).
    Same scheme for the point-sorted grid (pts/pnt/prb)."""

    rb: int  # rig rows addressable per tile
    nt: int  # number of rig tiles
    ts: int  # observations per tile
    prb: int  # point rows addressable per tile
    pnt: int  # number of point tiles
    pts: int  # observations per point tile
    # width of the per-RIG-tile point window (0 = unbounded, single-pass
    # matvec unavailable): on sequential recordings point ids are created in
    # time order, so the landmarks observed by 128 consecutive rigs span a
    # bounded id range — the whole Schur matvec then runs on the rig grid
    # alone with no rig<->point permutes (segments.seg_schur_down/up)
    prb2: int = 0
    # padded point-table height in 128-row units for the VMEM-resident point
    # accumulator of the single-pass kernels (0 = table too large for VMEM)
    nhg: int = 0
    # calibration-window rows addressable per tile (0 = no cal plan): within
    # a rig tile the consecutive rigs span only a handful of 5 s calibration
    # windows, so calib columns get the same per-tile base + one-hot
    # treatment as rig columns (segments.seg_schur_down_cal family)
    wb: int = 0


def _tile_plan(key_sorted, rb, ts):
    """Ragged tiling of a SORTED key array: returns (slot (n,), base (nt,)).
    slot[i] is the padded position of sorted row i; tiles cut at `ts` rows or
    when key - base would reach rb (a few hundred searchsorted steps). Bases
    are floored to multiples of 8 so the table-resident Pallas kernels can
    dynamic-slice [base, base+rb) on an f32 sublane boundary."""
    n = len(key_sorted)
    starts, bases = [], []
    i = 0
    while i < n:
        base = int(key_sorted[i]) & ~7
        end = min(i + ts, int(np.searchsorted(key_sorted, base + rb, side="left")))
        starts.append(i)
        bases.append(base)
        i = end
    nt = len(starts)
    starts_a = np.asarray(starts + [n], np.int64)
    slot = np.arange(n, dtype=np.int64)
    tile_of = np.searchsorted(starts_a, slot, side="right") - 1
    slot = slot - starts_a[tile_of] + tile_of * ts
    return slot, np.asarray(bases, np.int64), nt


def finalize_blocks(problem, rb: int = 128, prb: int = 128, ts: int = 4096,
                    prb2_cap: int = 4096, nhg_cap: int = 2048):
    """Reorder visual-family batches by rig, lay them out in ragged tiles,
    and attach the point-grid permutation. Mutates problem.{cfgs,datas}
    (host, one-time — the TPU analog of BaSpaCho's symbolic analysis).
    The fused RS linearizer subdivides these tiles internally (ops/rs_fused
    RS_TS) to fit its in-kernel AD live set in scoped VMEM."""
    R = int(problem.variables.pose_q.shape[0])
    L = int(problem.variables.points.shape[0])
    cal_rows_eq = (problem.variables.cam_intr.shape[0]
                   == problem.variables.cam_extr_q.shape[0])
    cal_est = bool(np.asarray(problem.masks.cam_intr).any()
                   or np.asarray(problem.masks.cam_extr).any())
    for bi, (cfg, data) in enumerate(zip(problem.cfgs, problem.datas)):
        if cfg.kind not in VISUAL_KINDS or getattr(cfg, "block_info", None):
            continue
        rig = np.asarray(data["rig"])
        pt = np.asarray(data["point"])
        if len(rig) < 4 * ts:
            continue  # tiny batch: generic path is fine
        # calib-coupled batches tile at rb=112 so rb + wb <= 128: the fused
        # PCG matvec then packs the rig and window one-hots into a single
        # 128-row MXU selection tile (_down_light_cal_kernel/_up_du_cal_kernel)
        rb_b = rb
        if (cal_est and rb == 128 and "intr" in data and cal_rows_eq
                and np.array_equal(np.asarray(data["intr"]),
                                   np.asarray(data["extr"]))):
            rb_b = 112
        order = np.argsort(rig, kind="stable")
        slot, base, nt = _tile_plan(rig[order], rb_b, ts)
        npad = nt * ts
        n_obs = len(rig)
        new = {}
        for k, a in data.items():
            if k.startswith("_ell"):
                continue  # rebuilt later from the new order
            if isinstance(a, tuple) or not hasattr(a, "shape") \
                    or getattr(a, "ndim", 0) < 1 or a.shape[0] != n_obs:
                new[k] = a  # non-per-factor payload (e.g. rs_tables)
                continue
            a = np.asarray(a)
            out = np.zeros((npad,) + a.shape[1:], a.dtype)
            out[slot] = a[order]
            new[k] = out
        pad = np.ones(npad, np.float32)
        pad[slot] = 0.0
        tile_base = np.repeat(base, ts)
        new["rig"] = np.where(pad > 0.5, tile_base, new["rig"]).astype(np.int32)
        new["_pad"] = pad  # 1.0 on padded rows
        new["_rb_local"] = (new["rig"].astype(np.int64) - tile_base).astype(np.int32)
        new["_rb_rows"] = (base[:, None] + np.arange(rb_b)[None, :]).astype(
            np.int32).reshape(-1)
        new["_rb_base"] = base.astype(np.int32)
        # lane-major copies of the per-observation constants for the fused
        # visual linearize kernel (ops/visual_fused.py)
        new["_uvT"] = np.ascontiguousarray(new["obs_uv"].T)
        new["_sh4"] = np.ascontiguousarray(new["sqrt_h"].reshape(npad, 4).T)

        # per-rig-tile point windows for the single-pass matvec: point ids
        # observed within one rig tile usually span a bounded range (tracks
        # live 1-2 s and ids are assigned in time order); if the widest tile
        # stays under prb2_cap the matvec never leaves the rig grid
        pt_full = np.zeros(npad, np.int64)
        pt_full[slot] = pt[order]
        pt_tiles = pt_full.reshape(nt, ts)
        pad_tiles = pad.reshape(nt, ts) > 0.5
        big = np.where(pad_tiles, np.int64(np.iinfo(np.int64).max), pt_tiles)
        small = np.where(pad_tiles, np.int64(-1), pt_tiles)
        pmin = big.min(axis=1)
        pmax = small.max(axis=1)
        # window bases at multiples of 1024 = 128*8 so hib = base2/128 is a
        # sublane-aligned (x8) offset into the resident (3*nhg, 128) table
        base2 = (pmin & ~1023).astype(np.int64)
        span = int((pmax - base2).max()) + 1
        nhw = -(-span // 128)
        nhw = ((nhw + 7) // 8) * 8
        prb2 = 128 * nhw
        hib = (base2 >> 7).astype(np.int32)
        nhg = max(-(-L // 128), int(hib.max()) + nhw)
        nhg = ((nhg + 7) // 8) * 8
        if prb2 <= prb2_cap and nhg <= nhg_cap:
            loc2 = pt_full - base2.repeat(ts)
            loc2[pad.reshape(-1) > 0.5] = 0
            new["_rg_pt_local"] = loc2.astype(np.int32)
            new["_rg_hib"] = hib
        else:
            prb2 = 0
            nhg = 0

        # calibration-window plan: per-tile 8-aligned window-row base + local
        # indices, when the batch couples calib windows (intr/extr share the
        # window-row index array in the adapter). Skewed tiles spanning more
        # than wb_cap window rows fall back to the two-grid path.
        wb = 0
        cal_rows_match = (problem.variables.cam_intr.shape[0]
                          == problem.variables.cam_extr_q.shape[0])
        if ("intr" in new and cal_rows_match
                and np.array_equal(new["intr"], new["extr"])):
            wrow = new["intr"].astype(np.int64).reshape(nt, ts)
            pad_t = pad.reshape(nt, ts) > 0.5
            big = np.where(pad_t, np.int64(np.iinfo(np.int64).max), wrow)
            wmin = big.min(axis=1)
            wmin = np.where(wmin == np.iinfo(np.int64).max, 0, wmin)
            cbase = (wmin & ~7).astype(np.int64)
            wmax = np.where(pad_t, np.int64(-1), wrow).max(axis=1)
            span = int(np.maximum(wmax - cbase, 0).max()) + 1
            wb = ((span + 7) // 8) * 8
            if wb <= 128:
                cloc = wrow - cbase[:, None]
                cloc[pad_t] = 0
                new["_cb_local"] = cloc.reshape(-1).astype(np.int32)
                new["_cb_base"] = cbase.astype(np.int32)
            else:
                wb = 0
        real = np.nonzero(pad < 0.5)[0]
        porder = np.argsort(pt_full[real], kind="stable")
        real_idx = real[porder]
        pkey = pt_full[real_idx]
        pslot, pbase, pnt = _tile_plan(pkey, prb, ts)
        pnpad = pnt * ts
        perm = np.zeros(pnpad, np.int64)  # point-grid slot -> rig-grid index
        perm[pslot] = real_idx
        pw = np.zeros(pnpad, np.float32)
        pw[pslot] = 1.0
        pt_local = np.zeros(pnpad, np.int32)
        pt_local[pslot] = (pkey - pbase[pslot // ts]).astype(np.int32)
        inv = np.zeros(npad, np.int64)  # rig-grid index -> point-grid slot
        inv[real_idx] = pslot
        new["_pt_perm"] = perm.astype(np.int32)
        new["_pt_w"] = pw
        new["_pt_local"] = pt_local
        new["_pt_inv"] = inv.astype(np.int32)
        new["_pt_rows"] = (pbase[:, None] + np.arange(prb)[None, :]).astype(
            np.int32).reshape(-1)
        new["_pt_base"] = pbase.astype(np.int32)
        problem.datas[bi] = {
            k: (v if isinstance(v, tuple) else jnp.asarray(v))
            for k, v in new.items()
        }
        problem.cfgs[bi] = dataclasses.replace(
            cfg, block_info=BlockInfo(rb_b, nt, ts, prb, pnt, ts, prb2, nhg, wb)
        )
    problem._jits = None
    problem._k_iter = None
    return problem


# ---------------------------------------------------------------------------
# Ragged-tile one-hot primitives (device)
# ---------------------------------------------------------------------------


def reduce_rows(contrib, local, bases, nt, ts, rb, n_rows):
    """Segment-sum `contrib` (D, Npad) into (n_rows, D): per-tile one-hot
    matmul with the output table resident in VMEM across the whole grid
    (ops/segments.py seg_reduce_table — no partials scatter)."""
    return seg.seg_reduce_table(contrib, local, bases, nt, ts, rb, n_rows)


def permute_cols(a, idx):
    """a[..., idx] for a (..., N): TPU gathers along the minor (lane) axis
    run at scalar rates — relayout to rows, gather, relayout back instead."""
    moved = jnp.moveaxis(a, -1, 0)
    return jnp.moveaxis(jnp.take(moved, idx, axis=0), 0, -1)


class VisBatch(NamedTuple):
    """Per-visual-batch solver state for one linearization."""

    info: object  # BlockInfo (static)
    w: jnp.ndarray  # (N,) robust weight * valid * (1 - pad)
    rb_local: jnp.ndarray  # (N,)
    rb_rows: jnp.ndarray  # (nt*rb,) addressed rig rows per tile
    pt_rows: jnp.ndarray  # (pnt*prb,) addressed point rows per tile
    rb_base: jnp.ndarray  # (nt,) 8-aligned rig-row base per tile
    pt_base: jnp.ndarray  # (pnt,) 8-aligned point-row base per tile
    rg_pt_local: jnp.ndarray  # (N,) point index within the rig tile's window (or None)
    rg_hib: jnp.ndarray  # (nt,) x8-aligned window base per RIG tile, in 128-row units (or None)
    groups: tuple  # static: non-point group names in lin order
    rig_k: int  # static: rig J blocks carry only the first rig_k columns
    cal_groups: tuple  # static: ((group, dim), ...) folded into J_cal, or ()
    idx: tuple  # per non-point group (N,) index arrays
    jac: tuple  # per non-point group (d, dim, N); RIG entry sliced to rig_k
    ells: tuple
    J_cal: jnp.ndarray  # (d, kc, N) concat of cal-group Jacobians (or None)
    cal_local: jnp.ndarray  # (N,) window row within [cal_base, cal_base+wb)
    cal_base: jnp.ndarray  # (nt,) 8-aligned window-row base per tile
    J_mv: jnp.ndarray  # bf16 copies for the PCG matvec loop (or None)
    J_pt_mv: jnp.ndarray
    J_cal_mv: jnp.ndarray
    J_pt: jnp.ndarray  # (d, 3, N) rig order
    J_pt_po: jnp.ndarray  # (d, 3, Np) point order
    w_po: jnp.ndarray  # (Np,)
    pt_local: jnp.ndarray  # (Np,)
    pt_perm: jnp.ndarray  # (Np,) rig-grid index per point slot
    pt_inv: jnp.ndarray  # (N,) point slot per rig-grid index
    pt_idx: jnp.ndarray  # (N,) global point id (rig order)


jax.tree_util.register_pytree_node(
    VisBatch,
    lambda b: ((b.w, b.rb_local, b.rb_rows, b.pt_rows, b.rb_base, b.pt_base,
                b.rg_pt_local, b.rg_hib,
                b.idx, b.jac, b.ells, b.J_pt, b.J_pt_po, b.w_po, b.pt_local,
                b.pt_perm, b.pt_inv, b.pt_idx, b.J_cal, b.cal_local,
                b.cal_base, b.J_mv, b.J_pt_mv, b.J_cal_mv),
               (b.info, b.groups, b.rig_k, b.cal_groups)),
    lambda aux, ch: VisBatch(
        info=aux[0], w=ch[0], rb_local=ch[1], rb_rows=ch[2], pt_rows=ch[3],
        rb_base=ch[4], pt_base=ch[5], rg_pt_local=ch[6], rg_hib=ch[7],
        groups=aux[1], rig_k=aux[2], cal_groups=aux[3], idx=ch[8], jac=ch[9],
        ells=ch[10], J_pt=ch[11], J_pt_po=ch[12], w_po=ch[13], pt_local=ch[14],
        pt_perm=ch[15], pt_inv=ch[16], pt_idx=ch[17], J_cal=ch[18],
        cal_local=ch[19], cal_base=ch[20], J_mv=ch[21], J_pt_mv=ch[22],
        J_cal_mv=ch[23],
    ),
)


def _split(cfgs, lg):
    """(visual (cfg, lin, w) triples, rest graph, point-coupled rest graph).

    Any non-blocked batch that references landmarks (small visual batches
    below the blocking threshold, multi-session base-map factors) must still
    contribute to the Schur cross terms W = H_rl — rest_pt carries exactly
    those lins so matvec/w_transpose_x/w_y can add their coupling."""
    vis, rest_lins, rest_w, pt_lins, pt_w = [], [], [], [], []
    for cfg, lin, w in zip(cfgs, lg.lins, lg.w):
        if getattr(cfg, "block_info", None):
            vis.append((cfg, lin, w))
        else:
            rest_lins.append(lin)
            rest_w.append(w)
            if fct.POINTS in lin.groups:
                pt_lins.append(lin)
                pt_w.append(w)
    rest = engine.LinearizedGraph(
        lins=tuple(rest_lins), w=tuple(rest_w), cost=lg.cost,
        stored_cost=(), valid0=(), num_invalid=lg.num_invalid,
        num_optional=lg.num_optional,
    )
    rest_pt = engine.LinearizedGraph(
        lins=tuple(pt_lins), w=tuple(pt_w), cost=0.0, stored_cost=(),
        valid0=(), num_invalid=0, num_optional=0,
    )
    return vis, rest, rest_pt


class RestStack(NamedTuple):
    """Stacked SoA operand for the rest-graph (non-visual) Hessian matvec:
    one residual-dim bucket of lins, variable slots padded to S, tangent
    columns padded to the packed width K. rows index the PACKED reduced
    state; row nb is a shared zero dummy for pad slots."""

    rows: jnp.ndarray  # (S, N) int32 packed-row ids
    J: jnp.ndarray  # (S, d, K, N)
    w: jnp.ndarray  # (N,)


def build_rest_stacks(rest, v):
    """Stack the rest lins into one SoA operand per residual-dim bucket.

    engine._hmatvec over the rest graph evaluates ~250 tiny einsum/gather/
    scatter ops per PCG matvec (counted at the full-sensor bench shape),
    ~0.5 ms of pure op overhead x 40 iterations per LM step. The stacked
    form is ~5 ops per d-bucket over identical values: one row gather from
    the packed state, two elementwise contractions, one row scatter-add.
    The K-padding costs ~70 MB of extra J reads per matvec at the bench
    shape (~0.1 ms of HBM) — op count, not bandwidth, is what the 40x loop
    pays for. Reference analog: the assembled block-sparse Hessian reused
    across the solve (lib/small_thing/Optimizer.cpp:166-331). Point slots
    are dropped: the reduced matvec evaluates H_rr only (x_l = 0, y_l
    discarded — exactly engine._hmatvec's use here)."""
    counts, dims, K = _pack_info(zero_tangent(v))
    offs = _packed_sections(counts)
    off_by = dict(zip(Tangent._fields, offs))
    nb = sum(counts)
    dtype = v.points.dtype
    buckets = {}
    for lin, w in zip(rest.lins, rest.w):
        entries = [(g, ix, J) for g, ix, J in zip(lin.groups, lin.idx, lin.jac)
                   if g != fct.POINTS]
        if not entries:
            continue
        d = entries[0][2].shape[0]
        buckets.setdefault(d, []).append((entries, w))
    stacks = []
    for d, items in sorted(buckets.items()):
        S = max(len(e) for e, _ in items)
        rows_p, J_p, w_p = [], [], []
        for entries, w in items:
            N = w.shape[0]
            slot_rows, slot_J = [], []
            for s in range(S):
                if s < len(entries):
                    g, ix, J = entries[s]
                    if g == fct.GRAVITY:
                        r = jnp.full((N,), off_by[g], jnp.int32)
                    else:
                        r = off_by[g] + ix.astype(jnp.int32)
                    k = J.shape[1]
                    slot_J.append(jnp.pad(J.astype(dtype),
                                          ((0, 0), (0, K - k), (0, 0))))
                else:
                    r = jnp.full((N,), nb, jnp.int32)
                    slot_J.append(jnp.zeros((d, K, N), dtype))
                slot_rows.append(r)
            rows_p.append(jnp.stack(slot_rows))
            J_p.append(jnp.stack(slot_J))
            w_p.append(w.astype(dtype))
        stacks.append(RestStack(jnp.concatenate(rows_p, axis=-1),
                                jnp.concatenate(J_p, axis=-1),
                                jnp.concatenate(w_p, axis=-1)))
    return tuple(stacks)


def rest_hmatvec(stacks, v, x: Tangent) -> Tangent:
    """H_rest x via the stacked operands — value-identical (up to summation
    order) to engine._hmatvec(rest, v, x, 0) over the reduced groups."""
    counts, dims, K = _pack_info(x)
    nb = sum(counts)
    xp = pack_t(x, counts, dims, K)
    xe = jnp.concatenate([xp, jnp.zeros((1, K), xp.dtype)], axis=0)
    yp = jnp.zeros((nb + 1, K), xp.dtype)
    for st in stacks:
        xgT = jnp.swapaxes(xe[st.rows], 1, 2)  # (S, K, N)
        # elementwise contractions (VPU, f32/f64-exact): bare einsums would
        # lower to DEFAULT-precision MXU dots (PERF_NOTES lesson 4)
        u = jnp.sum(st.J * xgT[:, None, :, :], axis=(0, 2))  # (d, N)
        wu = u * st.w[None, :]
        contrib = jnp.sum(st.J * wu[None, :, None, :], axis=1)  # (S, K, N)
        yp = yp.at[st.rows.reshape(-1)].add(
            jnp.swapaxes(contrib, 1, 2).reshape(-1, K))
    return unpack_t(yp[:nb], counts, dims, K)


def _vis_batches(cfgs, datas, lg):
    """[(VisBatch, Lin)] for every blocked visual batch."""
    out = []
    for (cfg, lin, w), data in zip(zip(cfgs, lg.lins, lg.w), datas):
        if not getattr(cfg, "block_info", None):
            continue
        info = cfg.block_info
        wv = w * (1.0 - data["_pad"])
        rig_k = RIG_COLS.get(cfg.kind, 12)
        groups, idx, jac, ells = [], [], [], []
        J_pt = None
        pt_idx = None
        for g, ix, J, ell in zip(lin.groups, lin.idx, lin.jac, lin.ell):
            if g == fct.POINTS:
                J_pt = J
                pt_idx = ix
            else:
                if g == fct.RIG and rig_k < J.shape[1]:
                    J = jax.lax.slice_in_dim(J, 0, rig_k, axis=1)
                groups.append(g)
                idx.append(ix)
                jac.append(J)
                ells.append(ell)
        # calibration-window column folding: when the batch's non-rig groups
        # are exactly cam_extr/cam_intr (sharing the window-row index) and a
        # window plan exists, concatenate their J blocks into one cal group
        # for the single-pass cal kernels
        cal_groups = ()
        J_cal = None
        if info.wb > 0 and "_cb_local" in data:
            extra = [g for g in groups if g != fct.RIG]
            if extra and all(g in (fct.CAM_EXTR, fct.CAM_INTR) for g in extra):
                cal_groups = tuple(
                    (g, J.shape[1]) for g, J in zip(groups, jac)
                    if g != fct.RIG)
                J_cal = jnp.concatenate(
                    [J for g, J in zip(groups, jac) if g != fct.RIG], axis=1)
        # single-pass batches never touch the point-sorted grid: skip the
        # global permutes (J_pt_po etc.) entirely — saves the per-step
        # permute work single-chip and keeps all per-factor state local
        # under mesh sharding (no cross-shard permutations)
        single = (info.prb2 > 0 and info.nhg > 0
                  and "_rg_pt_local" in data
                  and (tuple(groups) == (fct.RIG,)
                       or (cal_groups
                           and len(groups) == 1 + len(cal_groups)
                           and groups[0] == fct.RIG)))
        J_mv = J_pt_mv = J_cal_mv = None
        if (single and MATVEC_BF16 and jax.default_backend() == "tpu"
                and J_pt.dtype == jnp.float32):
            J_mv = jac[0].astype(jnp.bfloat16)
            J_pt_mv = J_pt.astype(jnp.bfloat16)
            if J_cal is not None:
                J_cal_mv = J_cal.astype(jnp.bfloat16)
                # pad the cal column count to a sublane multiple (8): the
                # stacked matvec kernels (_down_light_cal_kernel/_up_du_cal_kernel) then slice
                # its gathered (kc+k, tsc) array at aligned row boundaries
                # only — misaligned sublane slices cost a Mosaic relayout
                # of the whole chunk per phase
                kc = J_cal_mv.shape[1]
                kc8 = ((kc + 7) // 8) * 8
                if kc8 != kc:
                    J_cal_mv = jnp.pad(
                        J_cal_mv, ((0, 0), (0, kc8 - kc), (0, 0)))
        if single or "_pt_perm" not in data:
            J_pt_po = w_po = perm = pt_local = pt_inv = pt_rows = pt_base = None
        else:
            perm = data["_pt_perm"]
            J_pt_po = permute_cols(J_pt, perm) * data["_pt_w"][None, None, :]
            w_po = wv[perm] * data["_pt_w"]
            pt_local, pt_inv = data["_pt_local"], data["_pt_inv"]
            pt_rows, pt_base = data["_pt_rows"], data["_pt_base"]
        out.append((VisBatch(
            info=info, w=wv, rb_local=data["_rb_local"], rb_rows=data["_rb_rows"],
            pt_rows=pt_rows, rb_base=data["_rb_base"],
            pt_base=pt_base, rg_pt_local=data.get("_rg_pt_local"),
            rg_hib=data.get("_rg_hib"), groups=tuple(groups), rig_k=rig_k,
            cal_groups=cal_groups,
            idx=tuple(idx), jac=tuple(jac), ells=tuple(ells), J_pt=J_pt,
            J_pt_po=J_pt_po, w_po=w_po,
            pt_local=pt_local, pt_perm=perm, pt_inv=pt_inv,
            pt_idx=pt_idx, J_cal=J_cal, cal_local=data.get("_cb_local"),
            cal_base=data.get("_cb_base"), J_mv=J_mv, J_pt_mv=J_pt_mv,
            J_cal_mv=J_cal_mv,
        ), lin))
    return out


# ---------------------------------------------------------------------------
# Assembly (once per linearization)
# ---------------------------------------------------------------------------


class RcsAsm(NamedTuple):
    """Lambda-INDEPENDENT assembly for one linearization: damping retries
    (Optimizer.cpp:826-854) reuse this and pay only the per-lambda work
    (landmark damping/inverses, Schur-corrected preconditioner blocks)."""

    vis: tuple  # tuple[VisBatch]
    rest: object  # LinearizedGraph of small batches
    rest_pt: object  # LinearizedGraph: point-coupled small batches (W terms)
    H_ll0: jnp.ndarray  # (L, 3, 3) UNdamped landmark blocks
    diag_r: Tangent  # undamped reduced diagonal entries
    g_r: Tangent  # gradient (reduced)
    g_l: jnp.ndarray  # gradient (landmarks)
    A_rp: tuple  # per vis batch: (12, 3, N) Jw_rig x J_pt (for the precond corr)
    blocks0: dict  # per-group UNdamped block-Jacobi blocks (Schur corr not yet applied)
    rest_stacks: tuple = ()  # tuple[RestStack]: stacked rest-Hessian operands


class RcsSystem(NamedTuple):
    vis: tuple  # tuple[VisBatch]
    rest: object  # LinearizedGraph of small batches
    rest_pt: object  # LinearizedGraph: point-coupled small batches (W terms)
    H_ll: jnp.ndarray  # (L, 3, 3) damped
    H_ll_inv: jnp.ndarray
    diag_r: Tangent  # undamped reduced diagonal
    lam: jnp.ndarray
    precond_inv: Tangent
    rest_stacks: tuple = ()  # tuple[RestStack]: stacked rest-Hessian operands


def _point_blocks_blocked(vis, rest, v, lam):
    """Damped landmark blocks H_ll (L,3,3): visual batches via the point grid
    (permute (6,N) + block one-hot), small batches via scatter."""
    L = v.points.shape[0]
    H = jnp.zeros((L, 9), v.points.dtype)
    for b in vis:
        if _single_pass(b):
            continue  # fused into seg_assemble_rig/_cal (assemble)
        A = jnp.einsum("dan,dbn->abn", b.J_pt_po * b.w_po[None, None, :], b.J_pt_po)
        H = H + reduce_rows(A.reshape(9, -1), b.pt_local, b.pt_base,
                            b.info.pnt, b.info.pts, b.info.prb, L)
    H = H.reshape(L, 3, 3)
    for lin, w in zip(rest.lins, rest.w):
        for group, idx, J, ell in zip(lin.groups, lin.idx, lin.jac, lin.ell):
            if group != fct.POINTS:
                continue
            contrib = jnp.einsum("dan,dbn->abn", J * w[None, None, :], J)
            H = H + fct.scatter_rows(ell, idx, contrib, L)
    if lam is None:
        return H
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    eye = jnp.eye(3, dtype=H.dtype)
    return H + eye * (lam * diag + lam)[..., None, :] * eye


def _grad(vis, rest, v):
    """(Tangent, points) gradient J^T w res; rig/point sides blocked."""
    g = zero_tangent(v)._asdict()
    gp = jnp.zeros_like(v.points)
    # rest batches via the generic engine path
    g_rest, gp_rest = engine._accumulate_grad(
        engine.LinearizedGraph(rest.lins, rest.w, 0.0, (), (), 0, 0), v
    )
    g = {k: g[k] + getattr(g_rest, k) for k in g}
    gp = gp + gp_rest
    for b, lin in vis:
        if _single_pass(b):
            continue  # fused into seg_assemble_rig/_cal (assemble)
        wres = lin.res * b.w[None, :]  # (d, N)
        for group, idx, J, ell in zip(b.groups, b.idx, b.jac, b.ells):
            contrib = jnp.einsum("dkn,dn->kn", J, wres)
            if group == fct.RIG:
                g[group] = g[group] + _padk(reduce_rows(
                    contrib, b.rb_local, b.rb_base, b.info.nt, b.info.ts,
                    b.info.rb, g[group].shape[0]), b.rig_k)
            elif group == fct.GRAVITY:
                g[group] = g[group] + jnp.sum(contrib, axis=-1)
            else:
                g[group] = g[group] + fct.scatter_rows(ell, idx, contrib,
                                                       g[group].shape[0])
        # weight applied once (in wres); pads vanish through J_pt_po's mask
        cp = jnp.einsum("dkn,dn->kn", b.J_pt_po, permute_cols(wres, b.pt_perm))
        gp = gp + reduce_rows(cp, b.pt_local, b.pt_base, b.info.pnt,
                              b.info.pts, b.info.prb, gp.shape[0])
    return Tangent(**g), gp


def _diag(vis, rest, v):
    d = zero_tangent(v)._asdict()
    d_rest, _ = engine._hess_diag(
        engine.LinearizedGraph(rest.lins, rest.w, 0.0, (), (), 0, 0), v
    )
    d = {k: d[k] + getattr(d_rest, k) for k in d}
    for b in vis:
        if _single_pass(b):
            continue  # fused into seg_assemble_rig/_cal (assemble)
        for group, idx, J, ell in zip(b.groups, b.idx, b.jac, b.ells):
            contrib = jnp.einsum("dkn,dkn->kn", J, J * b.w[None, None, :])
            if group == fct.RIG:
                d[group] = d[group] + _padk(reduce_rows(
                    contrib, b.rb_local, b.rb_base, b.info.nt, b.info.ts,
                    b.info.rb, d[group].shape[0]), b.rig_k)
            elif group == fct.GRAVITY:
                d[group] = d[group] + jnp.sum(contrib, axis=-1)
            else:
                d[group] = d[group] + fct.scatter_rows(ell, idx, contrib,
                                                       d[group].shape[0])
    return Tangent(**d)


def _precond_blocks_static(vis, rest, v, masks):
    """Lambda-free block-Jacobi blocks per group + the A products needed for
    the per-lambda Schur correction (engine._build_preconditioner semantics;
    visual rig blocks via bf16 blocked reductions — a preconditioner only
    needs approximate blocks, the trade the reference's LowerPrecSolvePrecond
    makes, Preconditioner.h:163)."""
    dims = fct.GROUP_DIMS
    groups = [fct.RIG, fct.CAM_INTR, fct.CAM_EXTR, fct.IMU_CALIB, fct.IMU_EXTR,
              fct.DET_BIAS, fct.GRAVITY]
    blocks = {
        g: jnp.zeros(((getattr(masks, g).shape[0] if getattr(masks, g).ndim > 1 else 1),
                      dims[g], dims[g]), v.points.dtype)
        for g in groups
    }
    for lin, w in zip(rest.lins, rest.w):
        for group, idx, J, ell in zip(lin.groups, lin.idx, lin.jac, lin.ell):
            if group == fct.POINTS:
                continue
            B = jnp.einsum("dan,dbn->abn", J * w[None, None, :], J)
            if group == fct.GRAVITY:
                blocks[group] = blocks[group].at[0].add(jnp.sum(B, axis=-1))
            else:
                blocks[group] = blocks[group] + fct.scatter_rows(
                    ell, idx, B, blocks[group].shape[0])
    A_rp = []
    for b in vis:
        if _single_pass(b):
            # whole rig block (J^T w J - Schur correction) is computed by the
            # fused per-lambda kernel (seg_precond_rig); cal-fast window
            # blocks come from seg_assemble_cal — nothing static here
            A_rp.append(None)
            continue
        A_b = None
        for group, idx, J, ell in zip(b.groups, b.idx, b.jac, b.ells):
            Jw = J * b.w[None, None, :]
            B = jnp.einsum("dan,dbn->abn", Jw, J)
            if group == fct.RIG:
                A_b = jnp.einsum("dan,dbn->abn", Jw, b.J_pt)  # (rig_k, 3, N)
                k = B.shape[0]
                red = reduce_rows(
                    B.reshape(k * k, -1).astype(jnp.bfloat16),
                    b.rb_local, b.rb_base, b.info.nt, b.info.ts, b.info.rb,
                    blocks[group].shape[0])
                blocks[group] = blocks[group] + _padkk(
                    red.reshape(-1, k, k), k).astype(blocks[group].dtype)
            elif group == fct.GRAVITY:
                blocks[group] = blocks[group].at[0].add(jnp.sum(B, axis=-1))
            else:
                blocks[group] = blocks[group] + fct.scatter_rows(
                    ell, idx, B, blocks[group].shape[0])
        A_rp.append(A_b)
    return blocks, tuple(A_rp)


def _precond_finish(asm: "RcsAsm", v, masks, lam, H_ll_inv,
                    precond="gauss_seidel", axis=None):
    """Per-lambda: subtract the Schur self-correction from the rig blocks,
    damp, mask, invert.

    `precond` selects the family (reference Preconditioner.h): "identity"
    returns None (no preconditioning); "jacobi" keeps plain block-Jacobi
    (no Schur correction); "gauss_seidel"/"lower_prec" apply the Schur
    self-correction (the bf16 block accumulation of _precond_blocks_static
    already IS the lower-precision trade of LowerPrecSolvePrecond)."""
    if precond == "identity":
        return None
    schur_corr = precond in ("gauss_seidel", "lower_prec")
    blocks = dict(asm.blocks0)
    rig_local = jnp.zeros_like(blocks[fct.RIG])  # per-shard contributions
    for b, A in zip(asm.vis, asm.A_rp):
        if _single_pass(b):
            # bf16 J + bf16 H_ll^-1 in the fused kernel: the blocks only
            # precondition, so 1-split selection dots suffice (the
            # LowerPrecSolvePrecond trade, Preconditioner.h:163). With the
            # correction disabled the kernel still produces the plain
            # J^T w J rig blocks (H_ll_inv of zero zeroes the subtracted
            # term exactly). For cal-fast batches the window blocks were
            # accumulated lambda-free in seg_assemble_cal.
            J, J_pt, _ = _mv_jacs(b)
            Hinv_used = H_ll_inv if schur_corr else jnp.zeros_like(H_ll_inv)
            rig_local = rig_local + _padkk(seg.seg_precond_rig(
                J, J_pt, b.w, b.rb_local, b.rg_pt_local, b.rg_hib,
                Hinv_used, b.rb_base, b.info.nt, b.info.ts, b.info.rb,
                b.info.prb2 // 128, b.info.nhg, blocks[fct.RIG].shape[0]),
                b.rig_k)
            continue
        if A is None or not schur_corr:
            continue
        HinvN = H_ll_inv[b.pt_idx]  # (N, 3, 3)
        corr = jnp.einsum("abn,nbc,dcn->adn", A, HinvN, A)
        k = corr.shape[0]
        red = reduce_rows(
            corr.reshape(k * k, -1).astype(jnp.bfloat16),
            b.rb_local, b.rb_base, b.info.nt, b.info.ts, b.info.rb,
            blocks[fct.RIG].shape[0])
        rig_local = rig_local - _padkk(
            red.reshape(-1, k, k), k).astype(blocks[fct.RIG].dtype)
    blocks[fct.RIG] = blocks[fct.RIG] + _maybe_psum(rig_local, axis)
    inv = {}
    for g, B in blocks.items():
        dim = B.shape[-1]
        eye = jnp.eye(dim, dtype=B.dtype)
        diag = jnp.diagonal(B, axis1=-2, axis2=-1)
        B = B + eye * (lam * jnp.maximum(diag, 0.0) + lam)[..., None, :] * eye
        m = getattr(masks, g)
        if m.ndim == 1:
            m = m[None, :]
        B = B * m[:, :, None] * m[:, None, :] + eye * (1.0 - m)[..., None, :] * eye
        tr = jnp.trace(B, axis1=-2, axis2=-1)[..., None, None]
        B = B + eye * tr * 1e-12
        inv[g] = engine._precond_inv(B)
    return Tangent(
        rig=inv[fct.RIG], cam_intr=inv[fct.CAM_INTR], cam_extr=inv[fct.CAM_EXTR],
        imu_calib=inv[fct.IMU_CALIB], imu_extr=inv[fct.IMU_EXTR],
        det_bias=inv[fct.DET_BIAS], gravity=inv[fct.GRAVITY][0],
    )


def assemble(cfgs, datas, lg, v, masks: Masks, axis=None) -> RcsAsm:
    """Everything lambda-independent for this linearization. Under mesh
    sharding (`axis` set) the factor-sum tables (gradients, diagonals,
    landmark blocks, block-Jacobi blocks) are psum-completed; per-factor
    state (vis batches, rest lins, A_rp) stays shard-local."""
    pairs = _vis_batches(cfgs, datas, lg)
    vis = tuple(b for b, _ in pairs)
    _, rest, rest_pt = _split(cfgs, lg)
    H_ll0 = _point_blocks_blocked(vis, rest, v, None)
    diag_r = _diag(vis, rest, v)
    g_r, g_l = _grad(pairs, rest, v)
    blocks0, A_rp = _precond_blocks_static(vis, rest, v, masks)
    blocks0 = dict(blocks0)
    # fast batches: gradient + diagonal + landmark blocks (+ window blocks)
    # in one fused kernel pass over the rig grid (seg_assemble_rig/_cal)
    for b, lin in pairs:
        if _rig_only_fast(b):
            (J,) = b.jac
            gr_b, dg_b, gl_b, H_b = seg.seg_assemble_rig(
                J, b.J_pt, lin.res, b.w, b.rb_local, b.rg_pt_local, b.rg_hib,
                b.rb_base, v.points.shape[0], b.info.nt, b.info.ts, b.info.rb,
                b.info.prb2 // 128, b.info.nhg, g_r.rig.shape[0])
        elif _cal_fast(b):
            J = b.jac[0]
            n_c = (v.cam_intr.shape[0] if b.cal_groups[0][0] == fct.CAM_INTR
                   else v.cam_extr_q.shape[0])
            gr_b, dg_b, gc_b, dc_b, blocks_c, gl_b, H_b = seg.seg_assemble_cal(
                J, b.J_cal, b.J_pt, lin.res, b.w, b.rb_local, b.cal_local,
                b.rg_pt_local, b.rg_hib, b.rb_base, b.cal_base,
                v.points.shape[0], b.info.nt, b.info.ts, b.info.rb,
                b.info.wb, b.info.prb2 // 128, b.info.nhg,
                g_r.rig.shape[0], n_c, tuple(d for _, d in b.cal_groups))
            gd = g_r._asdict()
            dd = diag_r._asdict()
            gd = _cal_scatter_back(b, gd, gc_b)
            dd = _cal_scatter_back(b, dd, dc_b)
            g_r, diag_r = Tangent(**gd), Tangent(**dd)
            for (g, _), Bc in zip(b.cal_groups, blocks_c):
                blocks0[g] = blocks0[g] + Bc
        else:
            continue
        g_r = g_r._replace(rig=g_r.rig + _padk(gr_b, b.rig_k))
        diag_r = diag_r._replace(rig=diag_r.rig + _padk(dg_b, b.rig_k))
        g_l = g_l + gl_b
        H_ll0 = H_ll0 + H_b
    H_ll0, diag_r, g_r, g_l, blocks0 = _maybe_psum(
        (H_ll0, diag_r, g_r, g_l, blocks0), axis)
    return RcsAsm(vis, rest, rest_pt, H_ll0, diag_r, g_r, g_l, A_rp, blocks0,
                  build_rest_stacks(rest, v))


def with_damping(asm: RcsAsm, v, masks, lam, precond="gauss_seidel",
                 axis=None) -> RcsSystem:
    """Per-lambda completion: damped landmark inverses + preconditioner."""
    lam = jnp.asarray(lam, v.points.dtype)
    diag = jnp.diagonal(asm.H_ll0, axis1=-2, axis2=-1)
    eye = jnp.eye(3, dtype=asm.H_ll0.dtype)
    H_ll = asm.H_ll0 + eye * (lam * diag + lam)[..., None, :] * eye
    H_ll_inv = engine._inv3(H_ll)
    precond_inv = _precond_finish(asm, v, masks, lam, H_ll_inv, precond, axis)
    return RcsSystem(asm.vis, asm.rest, asm.rest_pt, H_ll, H_ll_inv,
                     asm.diag_r, lam, precond_inv, asm.rest_stacks)


# ---------------------------------------------------------------------------
# Matvec / PCG (per lambda)
# ---------------------------------------------------------------------------


def _rig_cols(x_rig, k):
    """First k columns of the (R, 12) rig table (cheap lane slice)."""
    return jax.lax.slice_in_dim(x_rig, 0, k, axis=1) if k < 12 else x_rig


def _vis_u(b: VisBatch, x: Tangent):
    """u = sum_g J_g x_g over non-point groups (d, N), rig order."""
    u = None
    for group, idx, J in zip(b.groups, b.idx, b.jac):
        if group == fct.RIG:
            term = seg.seg_mv_gather_table(J, _rig_cols(x.rig, b.rig_k),
                                           b.rb_local, b.rb_base, b.info.nt,
                                           b.info.ts, b.info.rb)
            u = term if u is None else u + term
            continue
        elif group == fct.GRAVITY:
            xg = jnp.broadcast_to(x.gravity[None, :], (J.shape[-1], 2))
        else:
            xg = getattr(x, group)[idx]
        term = jnp.einsum("dkn,nk->dn", J, xg)
        u = term if u is None else u + term
    return u


def _vis_scatter(b: VisBatch, y: dict, wu):
    """y_g += J_g^T wu for non-point groups."""
    for group, idx, J, ell in zip(b.groups, b.idx, b.jac, b.ells):
        if group == fct.RIG:
            y[group] = y[group] + _padk(seg.seg_mv_scatter_table(
                J, wu, b.rb_local, b.rb_base, b.info.nt, b.info.ts,
                b.info.rb, y[group].shape[0]), b.rig_k)
            continue
        contrib = jnp.einsum("dkn,dn->kn", J, wu)
        if group == fct.GRAVITY:
            y[group] = y[group] + jnp.sum(contrib, axis=-1)
        else:
            y[group] = y[group] + fct.scatter_rows(ell, idx, contrib, y[group].shape[0])
    return y


def _pt_reduce(b: VisBatch, wu, n_rows):
    """W^T-side point summand: wu (d, N) rig order -> (n_rows, 3) table."""
    u_po = permute_cols(wu, b.pt_perm)  # (d, Np); pads masked inside J_pt_po
    return seg.seg_mv_scatter_table(b.J_pt_po, u_po, b.pt_local, b.pt_base,
                                    b.info.pnt, b.info.pts, b.info.prb, n_rows)


def w_transpose_x(rs: RcsSystem, v, x: Tangent, axis=None):
    """W^T x (L, 3): per batch, u in rig order -> permute (d,N) -> point grid."""
    t = jnp.zeros_like(v.points)
    for b in rs.vis:
        if _rig_only_fast(b):
            (J,) = b.jac
            _, t_b = seg.seg_schur_down(
                J, b.J_pt, b.w, b.rb_local, b.rg_pt_local, b.rg_hib,
                _rig_cols(x.rig, b.rig_k),
                b.rb_base, t.shape[0], b.info.nt, b.info.ts, b.info.rb,
                b.info.prb2 // 128, b.info.nhg)
            t = t + t_b
            continue
        if _cal_fast(b):
            J = b.jac[0]
            _, _, t_b = seg.seg_schur_down_cal(
                J, b.J_cal, b.J_pt, b.w, b.rb_local, b.cal_local,
                b.rg_pt_local, b.rg_hib, _rig_cols(x.rig, b.rig_k),
                _cal_table(b, x), b.rb_base, b.cal_base, t.shape[0],
                b.info.nt, b.info.ts, b.info.rb, b.info.wb,
                b.info.prb2 // 128, b.info.nhg)
            t = t + t_b
            continue
        wu = _vis_u(b, x) * b.w[None, :]
        t = t + _pt_reduce(b, wu, t.shape[0])
    if rs.rest_pt.lins:  # point-coupled non-blocked batches: H_lr x
        _, hp = engine._hmatvec(rs.rest_pt, v, x, jnp.zeros_like(v.points))
        t = t + hp
    return _maybe_psum(t, axis)


def _pt_expand(b: VisBatch, yl):
    """u2 (d, N) rig order = w * permute_back(J_pt_po @ gathered y_l)."""
    u2_po = seg.seg_mv_gather_table(b.J_pt_po, yl, b.pt_local, b.pt_base,
                                    b.info.pnt, b.info.pts, b.info.prb)
    return permute_cols(u2_po, b.pt_inv) * b.w[None, :]


def w_y(rs: RcsSystem, v, yl, axis=None):
    """W y_l (Tangent): per batch, u2 in point order -> permute back."""
    y = zero_tangent(v)._asdict()
    for b in rs.vis:
        if _rig_only_fast(b):
            J, J_pt, _ = _mv_jacs(b)
            y[fct.RIG] = y[fct.RIG] + _padk(seg.seg_schur_up(
                J, J_pt, b.w, b.rb_local, b.rg_pt_local, b.rg_hib, yl,
                b.rb_base, b.info.nt, b.info.ts, b.info.rb,
                b.info.prb2 // 128, b.info.nhg, y[fct.RIG].shape[0]), b.rig_k)
            continue
        if _cal_fast(b):
            J, J_pt, J_cal = _mv_jacs(b)
            n_c = y[b.cal_groups[0][0]].shape[0]
            y_r, y_c = seg.seg_schur_up_cal(
                J, J_cal, J_pt, b.w, b.rb_local, b.cal_local,
                b.rg_pt_local, b.rg_hib, yl, b.rb_base, b.cal_base,
                b.info.nt, b.info.ts, b.info.rb, b.info.wb,
                b.info.prb2 // 128, b.info.nhg, y[fct.RIG].shape[0], n_c)
            y[fct.RIG] = y[fct.RIG] + _padk(y_r, b.rig_k)
            y = _cal_scatter_back(b, y, y_c)
            continue
        y = _vis_scatter(b, y, _pt_expand(b, yl))
    out = Tangent(**y)
    if rs.rest_pt.lins:  # point-coupled non-blocked batches: H_rl y_l
        hx, _ = engine._hmatvec(rs.rest_pt, v, zero_tangent(v), yl)
        out = jax.tree_util.tree_map(jnp.add, out, hx)
    return _maybe_psum(out, axis)


def _maybe_psum(x, axis):
    """psum over the factor-shard mesh axis (None = single-shard, no-op).
    Under shard_map every factor->table reduction produces a PARTIAL table
    (local factors only); one psum completes it — the deterministic
    replacement for the reference's cross-thread atomic adds."""
    if axis is None:
        return x
    return jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axis), x)


class PointHaloPlan:
    """Landmark-table halo exchange (SURVEY §7 step 8 landmark shards).

    Factor tiles are sharded as contiguous trajectory spans and landmark ids
    are time-sorted, so each shard's contributions to the (L, 3) point table
    fall in a contiguous range that overlaps only its NEIGHBOR shards'
    ranges. Each shard owns rows [own_lo[i], own_lo[i+1]); contributions
    beyond the ownership boundary (at most `halo` rows per side) ride two
    ppermutes of (halo, 3) instead of a full-table psum — per-matvec
    collective bytes are independent of total L. Static (host) object:
    closed over by the shard_map trace, never crosses a jit boundary."""

    def __init__(self, own_lo, halo: int, n_shards: int):
        self.own_lo = jnp.asarray(own_lo, jnp.int32)  # (S+1,), [0]=0, [S]=L
        self.halo = int(halo)
        self.n = int(n_shards)

    def bytes_per_matvec(self, itemsize=4, width=3):
        return 4 * self.halo * width * itemsize  # 2 phases x 2 directions


def _halo_reduce_points(t, axis, plan: PointHaloPlan):
    """Complete the partial per-shard point sums on each shard's OWNED rows.
    Rows outside ownership stay partial — _halo_fetch_points repairs the
    halo after the per-point solve."""
    H, S = plan.halo, plan.n
    w = t.shape[1]
    i = jax.lax.axis_index(axis)
    lo = jnp.take(plan.own_lo, i)
    hi = jnp.take(plan.own_lo, i + 1)
    z0 = jnp.zeros((), lo.dtype)
    # rows I contributed below my ownership -> left neighbor's owned tail
    left = jax.lax.dynamic_slice(t, (lo - H, z0), (H, w))
    recv_l = jax.lax.ppermute(left, axis, [(s, s - 1) for s in range(1, S)])
    # rows I contributed above my ownership -> right neighbor's owned head
    right = jax.lax.dynamic_slice(t, (hi, z0), (H, w))
    recv_r = jax.lax.ppermute(right, axis, [(s, s + 1) for s in range(S - 1)])
    # edge shards receive zeros (no pair targets them): adds are harmless
    tail = jax.lax.dynamic_slice(t, (hi - H, z0), (H, w)) + recv_l
    t = jax.lax.dynamic_update_slice(t, tail, (hi - H, z0))
    head = jax.lax.dynamic_slice(t, (lo, z0), (H, w)) + recv_r
    return jax.lax.dynamic_update_slice(t, head, (lo, z0))


def _halo_fetch_points(z, axis, plan: PointHaloPlan):
    """Overwrite each shard's halo rows (outside ownership) with the owning
    neighbor's values, so downstream W y_l gathers read complete data."""
    H, S = plan.halo, plan.n
    w = z.shape[1]
    i = jax.lax.axis_index(axis)
    lo = jnp.take(plan.own_lo, i)
    hi = jnp.take(plan.own_lo, i + 1)
    z0 = jnp.zeros((), lo.dtype)
    tail = jax.lax.dynamic_slice(z, (hi - H, z0), (H, w))  # my owned tail
    head = jax.lax.dynamic_slice(z, (lo, z0), (H, w))  # my owned head
    from_left = jax.lax.ppermute(tail, axis, [(s, s + 1) for s in range(S - 1)])
    from_right = jax.lax.ppermute(head, axis, [(s, s - 1) for s in range(1, S)])
    # guard edge shards: their clamped update offsets would clobber owned rows
    z_l = jax.lax.dynamic_update_slice(z, from_left, (lo - H, z0))
    z = jnp.where(i > 0, z_l, z)
    z_r = jax.lax.dynamic_update_slice(z, from_right, (hi, z0))
    return jnp.where(i < S - 1, z_r, z)


def _rig_only_fast(b: VisBatch):
    """Batch qualifies for the single-pass rig-grid matvec: couples only rig
    variables, rig tiles have bounded point windows, and the point table
    fits the kernels' VMEM-resident accumulator."""
    return b.groups == (fct.RIG,) and b.info.prb2 > 0 and b.info.nhg > 0


def _cal_fast(b: VisBatch):
    """Batch qualifies for the single-pass CALIB-coupled kernels: rig + the
    cam_extr/cam_intr window groups (folded into J_cal), bounded per-tile
    point AND window ranges (full-sensor sessions stay off the two-grid
    permute path)."""
    return (bool(b.cal_groups) and b.J_cal is not None
            and b.info.prb2 > 0 and b.info.nhg > 0 and b.info.wb > 0
            and b.groups[0] == fct.RIG
            and len(b.groups) == 1 + len(b.cal_groups))


def _single_pass(b: VisBatch):
    return _rig_only_fast(b) or _cal_fast(b)


def _mv_jacs(b: VisBatch):
    """(J_r, J_pt, J_cal) for the PCG matvec loop: bf16 copies on TPU."""
    if b.J_mv is not None:
        return b.J_mv, b.J_pt_mv, b.J_cal_mv
    return (b.jac[0], b.J_pt, b.J_cal)


def _cal_table(b: VisBatch, x: Tangent):
    """Concatenated (n_c, kc) window table in cal_groups order."""
    parts = [getattr(x, g) for g, _ in b.cal_groups]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _cal_scatter_back(b: VisBatch, y: dict, y_c):
    """Split a (n_c, kc) cal result back into its group tables."""
    off = 0
    n_c = y_c.shape[0]
    for g, dim in b.cal_groups:
        y[g] = y[g] + jax.lax.slice(y_c, (0, off), (n_c, off + dim))
        off += dim
    return y


def _complete_tangent(S: Tangent, axis, t_plans) -> Tangent:
    """Complete per-shard partial factor sums: groups with a halo plan ride
    neighbor ppermutes (owned rows complete, halo rows stay partial); the
    rest (gravity, det_bias, any group whose plan bailed) psum. Per-matvec
    collective bytes for planned groups are independent of table height."""
    d = S._asdict()
    rest = {g: a for g, a in d.items() if g not in t_plans}
    rest = _maybe_psum(rest, axis)
    for g, plan in t_plans.items():
        d[g] = _halo_reduce_points(d[g], axis, plan)
    d.update(rest)
    return Tangent(**d)


def _fetch_tangent_halo(x: Tangent, axis, t_plans) -> Tangent:
    """Repair halo rows of planned groups from the owning neighbor."""
    d = x._asdict()
    for g, plan in t_plans.items():
        d[g] = _halo_fetch_points(d[g], axis, plan)
    return Tangent(**d)


def matvec(rs: RcsSystem, v, x: Tangent, axis=None, pt_plan=None,
           t_plans=None) -> Tangent:
    """S x = (H_rr + damping) x - W H_ll^-1 W^T x.

    Single pass per visual batch: wu = w * (J_r x) is computed ONCE and feeds
    both the rig-side scatter (H_rr x) and the point-side reduction (W^T x).
    Rig-only batches with bounded per-tile point windows run entirely on the
    rig grid (seg_schur_down/up — no rig<->point permutes, J read once per
    pass); others fall back to the two-grid permute path.

    Under mesh sharding the factor sums come back partial and are completed
    in ONE step (a single fused psum, or per-group halo exchanges when
    `t_plans` carries plans — SURVEY §7 step 8, rig/window tables); damping
    is added rowwise AFTER completion so neighbor slabs never double-count
    it."""
    S = _matvec_factor_sums(rs, v, x, axis, pt_plan)
    if t_plans:
        S = _complete_tangent(S, axis, t_plans)
    else:
        S = _maybe_psum(S, axis)
    return jax.tree_util.tree_map(
        lambda h, d, xv: h + rs.lam * (d * xv) + rs.lam * xv, S, rs.diag_r, x)


def _matvec_factor_sums(rs: RcsSystem, v, x: Tangent, axis=None,
                        pt_plan=None) -> Tangent:
    """Per-shard partial (H_rr x - W H_ll^-1 W^T x): no damping, no final
    tangent completion (the caller psums or halo-exchanges once). The
    point-side solve is completed internally (halo plan or psum) because the
    up-pass gathers from it.

    Single-chip with exactly one fast visual batch (the bench shapes): the
    whole Schur matvec runs as ONE fused kernel (seg_schur_pcg[_cal]) —
    down + landmark solve + up with the point tables resident in VMEM."""
    if axis is None and len(rs.vis) == 1 and not rs.rest_pt.lins \
            and _single_pass(rs.vis[0]):
        b = rs.vis[0]
        y = zero_tangent(v)._asdict()
        if _cal_fast(b):
            J, J_pt, J_cal = _mv_jacs(b)
            y_r, y_c = seg.seg_schur_pcg_cal(
                J, J_cal, J_pt, b.w, b.rb_local, b.cal_local,
                b.rg_pt_local, b.rg_hib, _rig_cols(x.rig, b.rig_k),
                _cal_table(b, x), rs.H_ll_inv, b.rb_base, b.cal_base,
                v.points.shape[0], b.info.nt, b.info.ts, b.info.rb,
                b.info.wb, b.info.prb2 // 128, b.info.nhg)
            y[fct.RIG] = y[fct.RIG] + _padk(y_r, b.rig_k)
            y = _cal_scatter_back(b, y, y_c)
        else:
            J, J_pt, _ = _mv_jacs(b)
            y_r = seg.seg_schur_pcg(
                J, J_pt, b.w, b.rb_local, b.rg_pt_local, b.rg_hib,
                _rig_cols(x.rig, b.rig_k), rs.H_ll_inv, b.rb_base,
                v.points.shape[0], b.info.nt, b.info.ts, b.info.rb,
                b.info.prb2 // 128, b.info.nhg)
            y[fct.RIG] = y[fct.RIG] + _padk(y_r, b.rig_k)
        hx_rest = rest_hmatvec(rs.rest_stacks, v, x)
        return jax.tree_util.tree_map(jnp.add, Tangent(**y), hx_rest)
    y = zero_tangent(v)._asdict()
    t = jnp.zeros_like(v.points)
    for b in rs.vis:
        if _rig_only_fast(b):
            J, J_pt, _ = _mv_jacs(b)
            y_tab, t_b = seg.seg_schur_down(
                J, J_pt, b.w, b.rb_local, b.rg_pt_local, b.rg_hib,
                _rig_cols(x.rig, b.rig_k),
                b.rb_base, t.shape[0], b.info.nt, b.info.ts, b.info.rb,
                b.info.prb2 // 128, b.info.nhg)
            y[fct.RIG] = y[fct.RIG] + _padk(y_tab, b.rig_k)
            t = t + t_b
            continue
        if _cal_fast(b):
            J, J_pt, J_cal = _mv_jacs(b)
            y_r, y_c, t_b = seg.seg_schur_down_cal(
                J, J_cal, J_pt, b.w, b.rb_local, b.cal_local,
                b.rg_pt_local, b.rg_hib, _rig_cols(x.rig, b.rig_k),
                _cal_table(b, x), b.rb_base, b.cal_base, t.shape[0],
                b.info.nt, b.info.ts, b.info.rb, b.info.wb,
                b.info.prb2 // 128, b.info.nhg)
            y[fct.RIG] = y[fct.RIG] + _padk(y_r, b.rig_k)
            y = _cal_scatter_back(b, y, y_c)
            t = t + t_b
            continue
        if b.groups == (fct.RIG,):
            (J,) = b.jac
            wu, y_tab = seg.seg_mv_fused_table(
                J, b.w, _rig_cols(x.rig, b.rig_k), b.rb_local, b.rb_base,
                b.info.nt, b.info.ts, b.info.rb)
            y[fct.RIG] = y[fct.RIG] + _padk(y_tab, b.rig_k)
        else:
            wu = _vis_u(b, x) * b.w[None, :]
            y = _vis_scatter(b, y, wu)
        t = t + _pt_reduce(b, wu, t.shape[0])
    hx_rest = rest_hmatvec(rs.rest_stacks, v, x)
    if rs.rest_pt.lins:  # point-coupled non-blocked batches: W^T x side
        # H_lr x needs the point rows too (rest_stacks drop them)
        _, hp_rest = engine._hmatvec(
            engine.LinearizedGraph(rs.rest_pt.lins, rs.rest_pt.w, 0.0, (),
                                   (), 0, 0),
            v, x, jnp.zeros_like(v.points))
        t = t + hp_rest
    hx = jax.tree_util.tree_map(jnp.add, Tangent(**y), hx_rest)
    if axis is not None and pt_plan is not None:
        # landmark shards: neighbor-only halo exchange instead of the (L, 3)
        # full-table psum — collective bytes independent of L
        t = _halo_reduce_points(t, axis, pt_plan)
        z = engine._chol_solve(rs.H_ll_inv, t)
        z = _halo_fetch_points(z, axis, pt_plan)
    else:
        t = _maybe_psum(t, axis)
        z = engine._chol_solve(rs.H_ll_inv, t)
    corr = w_y(rs, v, z, axis=None)  # caller completes the combined sum once
    return jax.tree_util.tree_map(jnp.subtract, hx, corr)


def _apply_precond(rs: RcsSystem, r: Tangent) -> Tangent:
    p = rs.precond_inv
    if p is None:  # IdentityPrecond (Preconditioner.h:44-50)
        return r
    return Tangent(
        rig=jnp.einsum("nij,nj->ni", p.rig, r.rig),
        cam_intr=jnp.einsum("nij,nj->ni", p.cam_intr, r.cam_intr),
        cam_extr=jnp.einsum("nij,nj->ni", p.cam_extr, r.cam_extr),
        imu_calib=jnp.einsum("nij,nj->ni", p.imu_calib, r.imu_calib),
        imu_extr=jnp.einsum("nij,nj->ni", p.imu_extr, r.imu_extr),
        det_bias=jnp.einsum("nij,nj->ni", p.det_bias, r.det_bias),
        gravity=p.gravity @ r.gravity,
    )


# --- packed PCG state ------------------------------------------------------
# The PCG loop ops (dots, axpys, preconditioner apply) over the 7-leaf
# Tangent tree cost ~0.7 ms/iteration in small-op overhead on v5e (PERF_NOTES
# candidate #1). Packing the reduced state into ONE (nb, K) array — rows
# partition the groups, columns padded to the widest tangent dim — turns
# each dot/axpy into a single fused op and the block-Jacobi apply into one
# masked elementwise contraction. Pads stay exactly zero end to end (packed
# inputs are zero-padded, preconditioner blocks are zero outside their
# group's dims), so packed dots equal the tree t_dot bit-for-bit up to
# reduction order.


def _packed_sections(counts):
    offs, off = [], 0
    for c in counts:
        offs.append(off)
        off += c
    return tuple(offs)


def pcg(rs: RcsSystem, v, b: Tangent, max_iters: int, rel_tol, axis=None,
        pt_plan=None, t_plans=None):
    """Packed-state PCG on the reduced system.

    With `t_plans` (mesh sharding with rig/window halo plans) the reduced
    state is only OWNED-row-correct on each shard: matvec outputs complete
    owned rows via neighbor ppermutes, scalar dots mask to owned rows and
    psum (planless groups counted once on shard 0), the search direction's
    halo rows are re-fetched each iteration, and the solution is completed
    by one masked psum at the end. Per-iteration collective bytes are then
    independent of session length (SURVEY §7 step 8)."""
    counts, dims, K = _pack_info(b)
    offs = _packed_sections(counts)
    bp = pack_t(b, counts, dims, K)
    Pm = (pack_blocks(rs.precond_inv, counts, dims, K)
          if rs.precond_inv is not None else None)

    if t_plans:
        i = jax.lax.axis_index(axis)
        mparts = []
        for f, cnt in zip(Tangent._fields, counts):
            if f in t_plans:
                lo = jnp.take(t_plans[f].own_lo, i)
                hi = jnp.take(t_plans[f].own_lo, i + 1)
                ii = jnp.arange(cnt)
                mparts.append(((ii >= lo) & (ii < hi)).astype(bp.dtype))
            else:  # complete on every shard: count once (shard 0)
                mparts.append(jnp.full((cnt,), (i == 0).astype(bp.dtype)))
        own = jnp.concatenate(mparts)[:, None]  # (nb, 1)

    def mv(xp):
        y = matvec(rs, v, unpack_t(xp, counts, dims, K), axis, pt_plan,
                   t_plans)
        return pack_t(y, counts, dims, K)

    def prec(rp):
        if Pm is None:
            return rp
        # elementwise contraction (VPU, f32/f64-exact): a batched matmul
        # would round through bf16 on the MXU at DEFAULT precision
        return jnp.sum(Pm * rp[:, None, :], axis=-1)

    def dot1(a, c):
        if not t_plans:
            return jnp.vdot(a, c)
        return jax.lax.psum(jnp.vdot(a * own, c), axis)

    def dot2(a, c1, c2):
        """(a.c1, a.c2) in one collective round."""
        if not t_plans:
            return jnp.vdot(a, c1), jnp.vdot(a, c2)
        am = a * own
        s = jax.lax.psum(jnp.stack([jnp.vdot(am, c1), jnp.vdot(am, c2)]),
                         axis)
        return s[0], s[1]

    def fetch_p(pp):
        if not t_plans:
            return pp
        for f, off, cnt in zip(Tangent._fields, offs, counts):
            if f in t_plans:
                sec = jax.lax.slice(pp, (off, 0), (off + cnt, K))
                sec = _halo_fetch_points(sec, axis, t_plans[f])
                pp = jax.lax.dynamic_update_slice(
                    pp, sec, (jnp.asarray(off), jnp.asarray(0)))
        return pp

    x0 = jnp.zeros_like(bp)
    z0 = prec(bp)
    rz0, b_norm2 = dot2(bp, z0, bp)

    def cond(state):
        _, _, _, _, it, _, rr = state
        return (it < max_iters) & (rr > rel_tol * rel_tol * b_norm2)

    def body(state):
        x, r, z, p, it, rz, _ = state
        Ap = mv(p)
        pAp = dot1(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new, rr = dot2(r, z, r)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = fetch_p(z + beta * p)
        return (x, r, z, p, it + 1, rz_new, rr)

    x, r, _, _, iters, _, rr = jax.lax.while_loop(
        cond, body, (x0, bp, z0, z0, 0, rz0, b_norm2))
    if t_plans:  # complete the solution: owned rows summed exactly once
        x = jax.lax.psum(x * own, axis)
    rel = jnp.sqrt(rr / jnp.where(b_norm2 == 0, 1.0, b_norm2))
    return unpack_t(x, counts, dims, K), rel, iters


def solve_assembled(asm: RcsAsm, v, masks, lam, max_iters=250, rel_tol=1e-10,
                    precond="gauss_seidel", axis=None, pt_plan=None,
                    t_plans=None):
    """Per-lambda solve on a prebuilt assembly; `precond` picks the
    preconditioner family exactly as on the generic path
    (engine.build_reduced_system). The one-time (per-solve) reductions here
    stay full psums; only the per-PCG-iteration ones ride the halo plans."""
    rs = with_damping(asm, v, masks, lam, precond, axis)
    g_r, g_l = asm.g_r, asm.g_l
    z = engine._chol_solve(rs.H_ll_inv, g_l)
    b = jax.tree_util.tree_map(jnp.subtract, g_r, w_y(rs, v, z, axis))
    x_r, rel, iters = pcg(rs, v, b, max_iters, rel_tol, axis, pt_plan,
                          t_plans)
    x_l = engine._chol_solve(rs.H_ll_inv,
                             g_l - w_transpose_x(rs, v, x_r, axis))
    model_red = 0.5 * (t_dot(x_r, g_r) + jnp.vdot(x_l, g_l))
    return x_r, x_l, model_red, rel, iters, rs, (g_r, g_l)


def solve_step(cfgs, datas, lg, v, masks, lam, max_iters=250, rel_tol=1e-10,
               precond="gauss_seidel"):
    """engine.solve_step-compatible single-shot entry (assemble + solve)."""
    asm = assemble(cfgs, datas, lg, v, masks)
    return solve_assembled(asm, v, masks, lam, max_iters, rel_tol, precond)


def solve_with_system(lg, v, rs: RcsSystem, g_r, g_l, max_iters=250, rel_tol=1e-10,
                      axis=None, pt_plan=None, t_plans=None):
    z = engine._chol_solve(rs.H_ll_inv, g_l)
    b = jax.tree_util.tree_map(jnp.subtract, g_r, w_y(rs, v, z, axis))
    x_r, _, _ = pcg(rs, v, b, max_iters, rel_tol, axis, pt_plan, t_plans)
    x_l = engine._chol_solve(rs.H_ll_inv, g_l - w_transpose_x(rs, v, x_r, axis))
    return x_r, x_l
