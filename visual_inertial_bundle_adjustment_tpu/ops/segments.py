"""Pallas ragged-tile segment kernels for the blocked RCS solver.

The blocked solver (problem/rcs.py) expresses every factor->variable
reduction (scatter-add) and variable->factor expansion (gather) as one-hot
matmuls over fixed-size tiles: within a tile of `ts` observations all rig
(or landmark) indices fall in a window of `rb` rows, so gather = oh @ rows
and scatter = oh^T @ contribs with oh a (ts, rb) selection matrix.

Pure-XLA one-hot einsums materialize oh in HBM — (nt, ts, rb) f32 is
~400 MB for a 2-minute session and is re-written and re-read on every PCG
matvec, which makes the solve HBM-bound. These kernels build the one-hot
tile in VMEM from the (ts,) local-index vector and keep the contraction on
the MXU, so HBM traffic drops to the payload (J blocks, partials).

Fused variants evaluate the whole rig-side Schur matvec contribution
  wu = w * (J @ gather(x)),   y_part = oh^T @ (J^T @ wu)
in one kernel per tile, reading the (d, k, ts) Jacobian block exactly once.

All kernels have an exact XLA one-hot fallback used on non-TPU backends
(tests/f64) — selection by {0,1} matmul is exact in either implementation.

Replaces the reference's assembled block-CSR SpMV inside BaSpaCho
(lib/small_thing/Optimizer.cpp:212-331); the ragged-tile plan is built once
on the host (rcs.finalize_blocks), these kernels are the numeric phase.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_pallas(*arrays) -> bool:
    """Pallas path: TPU backend and no f64 operands (Mosaic has no f64)."""
    if jax.default_backend() != "tpu":
        return False
    return all(a.dtype != jnp.float64 for a in arrays)


def _sel_precision(dtype):
    """f32 one-hot contractions must run f32-exact on the MXU (DEFAULT would
    round the selected values to bf16); bf16 operands are exact under DEFAULT
    (bf16 products, f32 accumulate) and Mosaic rejects fp32 precision on them."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _oh(loc, rb):
    """(ts, rb) one-hot selection tile from tile-local indices (ts,)."""
    ts = loc.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ts, rb), 1)
    return cols == loc[:, None]


# ---------------------------------------------------------------------------
# seg_reduce: segment-sum contributions into tile partials
# ---------------------------------------------------------------------------


def _seg_reduce_kernel(loc_ref, c_ref, out_ref):
    rb = out_ref.shape[1]
    oh = _oh(loc_ref[0, 0], rb).astype(c_ref.dtype)
    # (rb, D) = oh^T (rb, ts) @ c^T (ts, D), contracted without transposes
    out_ref[0] = jax.lax.dot_general(
        oh, c_ref[:], (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype),
    ).astype(out_ref.dtype)


def seg_reduce_partials(contrib, local, nt, ts, rb):
    """contrib (D, nt*ts), local (nt*ts,) -> tile partials (nt, rb, D)."""
    D = contrib.shape[0]
    if not use_pallas(contrib):
        oh = (
            jnp.arange(rb, dtype=local.dtype)[None, :, None]
            == local.reshape(nt, ts)[:, None, :]
        ).astype(contrib.dtype)
        part = jnp.einsum(
            "tro,dto->trd", oh, contrib.reshape(D, nt, ts),
            preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype),
        ).astype(contrib.dtype)
        return part
    return pl.pallas_call(
        _seg_reduce_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ts), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, rb, D), contrib.dtype),
    )(local.reshape(nt, 1, ts).astype(jnp.int32), contrib)


# ---------------------------------------------------------------------------
# seg_gather: expand tile rows to per-observation rows
# ---------------------------------------------------------------------------


def _seg_gather_kernel(loc_ref, xt_ref, out_ref):
    rb = xt_ref.shape[1]
    oh = _oh(loc_ref[0, 0], rb).astype(xt_ref.dtype)
    out_ref[:] = jnp.dot(
        oh, xt_ref[0], preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype)
    ).astype(out_ref.dtype)


def seg_gather_from_tiles(xt, local, nt, ts, rb):
    """xt (nt, rb, D) addressed tile rows -> per-observation rows (nt*ts, D)."""
    D = xt.shape[-1]
    if not use_pallas(xt):
        oh = (
            jnp.arange(rb, dtype=local.dtype)[None, :, None]
            == local.reshape(nt, ts)[:, None, :]
        ).astype(xt.dtype)
        out = jnp.einsum("tro,trd->tod", oh, xt, preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype))
        return out.reshape(nt * ts, D).astype(xt.dtype)
    return pl.pallas_call(
        _seg_gather_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ts, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * ts, D), xt.dtype),
    )(local.reshape(nt, 1, ts).astype(jnp.int32), xt)


# ---------------------------------------------------------------------------
# Fused matvec kernels: J read once per tile
# ---------------------------------------------------------------------------


def _mv_fused_kernel(loc_ref, xt_ref, j_ref, w_ref, wu_ref, y_ref):
    """wu = w * (J @ oh-gather(x));  y_part = oh^T @ (J^T @ wu)."""
    rb = xt_ref.shape[1]
    oh = _oh(loc_ref[0, 0], rb).astype(xt_ref.dtype)
    # xgT (k, ts) = xt^T (k, rb) @ oh^T — contract rb on both, no transposes
    xgT = jax.lax.dot_general(
        xt_ref[0], oh, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype),
    )
    J = j_ref[:]  # (d, k, ts)
    u = jnp.sum(J * xgT[None, :, :], axis=1)  # (d, ts)
    wu = u * w_ref[0, 0][None, :]
    wu_ref[:] = wu.astype(wu_ref.dtype)
    contrib = jnp.sum(J * wu[:, None, :], axis=0)  # (k, ts)
    y_ref[0] = jax.lax.dot_general(
        oh, contrib, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype),
    ).astype(y_ref.dtype)


def seg_mv_fused(J, w, xt, local, nt, ts, rb):
    """Rig-side matvec tile pass.

    J (d, k, nt*ts), w (nt*ts,), xt (nt, rb, k) gathered tile rows ->
    (wu (d, nt*ts), y_part (nt, rb, k)).
    """
    d, k, _ = J.shape
    if not use_pallas(J):
        xg = seg_gather_from_tiles(xt, local, nt, ts, rb)  # (N, k)
        u = jnp.einsum("dkn,nk->dn", J, xg)
        wu = u * w[None, :]
        contrib = jnp.einsum("dkn,dn->kn", J, wu)
        return wu, seg_reduce_partials(contrib, local, nt, ts, rb)
    return pl.pallas_call(
        _mv_fused_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, ts), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, ts), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, nt * ts), J.dtype),
            jax.ShapeDtypeStruct((nt, rb, k), J.dtype),
        ),
    )(
        local.reshape(nt, 1, ts).astype(jnp.int32),
        xt,
        J,
        w.reshape(nt, 1, ts),
    )


def _mv_gather_kernel(loc_ref, xt_ref, j_ref, u_ref):
    """u = J @ oh-gather(x) (no weighting)."""
    rb = xt_ref.shape[1]
    oh = _oh(loc_ref[0, 0], rb).astype(xt_ref.dtype)
    xgT = jax.lax.dot_general(
        xt_ref[0], oh, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype),
    )
    u_ref[:] = jnp.sum(j_ref[:] * xgT[None, :, :], axis=1).astype(u_ref.dtype)


def seg_mv_gather(J, xt, local, nt, ts, rb):
    """u (d, nt*ts) = J @ gathered table rows (xt (nt, rb, k))."""
    d, k, _ = J.shape
    if not use_pallas(J):
        xg = seg_gather_from_tiles(xt, local, nt, ts, rb)
        return jnp.einsum("dkn,nk->dn", J, xg)
    return pl.pallas_call(
        _mv_gather_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, ts), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, ts), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, nt * ts), J.dtype),
    )(local.reshape(nt, 1, ts).astype(jnp.int32), xt, J)


def _mv_scatter_kernel(loc_ref, j_ref, u_ref, y_ref):
    """y_part = oh^T @ (J^T @ u)."""
    rb = y_ref.shape[1]
    oh = _oh(loc_ref[0, 0], rb).astype(j_ref.dtype)
    contrib = jnp.sum(j_ref[:] * u_ref[:][:, None, :], axis=0)  # (k, ts)
    y_ref[0] = jax.lax.dot_general(
        oh, contrib, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype),
    ).astype(y_ref.dtype)


def seg_mv_scatter(J, u, local, nt, ts, rb):
    """Tile partials (nt, rb, k) of the segment-sum of J^T u."""
    d, k, _ = J.shape
    if not use_pallas(J):
        contrib = jnp.einsum("dkn,dn->kn", J, u)
        return seg_reduce_partials(contrib, local, nt, ts, rb)
    return pl.pallas_call(
        _mv_scatter_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, ts), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ts), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, rb, k), J.dtype),
    )(local.reshape(nt, 1, ts).astype(jnp.int32), J, u)


# ---------------------------------------------------------------------------
# Table-resident fused kernels: the variable table lives in VMEM for the
# whole grid; per tile the kernel dynamic-slices rows [base, base+rb) out of
# it (gather) or accumulates partials back into it (scatter) — the
# sequential-TPU-grid reduction pattern. This removes the separate XLA
# gather/scatter ops (gather_tiles / scatter_partials) that bracketed every
# tile kernel: measured ~1 ms each on v5e for a 2-minute session, i.e. most
# of the PCG matvec cost. Tile bases must be multiples of 8 (f32 sublane) —
# rcs.finalize_blocks aligns them.
# ---------------------------------------------------------------------------


def _table_pad(table, rb):
    """Pad a (n_rows, D) table so any [base, base+rb) slice is in bounds."""
    n = table.shape[0]
    npad = ((n + rb + 7) // 8) * 8
    return jnp.pad(table, ((0, npad - n), (0, 0))), npad


def _grid1(nt, *specs, outs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=list(specs),
        out_specs=outs,
    )


def _mv_fused_tbl_kernel(rb, bases_ref, loc_ref, w_ref, x_ref, j_ref,
                         wu_ref, y_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(bases_ref[i], 8)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    oh = _oh(loc_ref[0, 0], rb).astype(x_ref.dtype)  # (ts, rb)
    xt = x_ref[pl.ds(base, rb), :]  # (rb, k)
    xgT = jax.lax.dot_general(  # (k, ts)
        xt, oh, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype)
    )
    J = j_ref[:]  # (d, k, ts)
    wu = jnp.sum(J * xgT[None, :, :], axis=1) * w_ref[0, 0][None, :]
    wu_ref[:] = wu.astype(wu_ref.dtype)
    contrib = jnp.sum(J * wu[:, None, :], axis=0)  # (k, ts)
    part = jax.lax.dot_general(  # (rb, k)
        oh, contrib, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype)
    ).astype(y_ref.dtype)
    y_ref[pl.ds(base, rb), :] = y_ref[pl.ds(base, rb), :] + part


def seg_mv_fused_table(J, w, x_table, local, bases, nt, ts, rb):
    """Whole rig-side Schur matvec pass with VMEM-resident tables.

    J (d, k, nt*ts), w (nt*ts,), x_table (n_rows, k), tile-local indices
    (nt*ts,), tile bases (nt,) multiples of 8 ->
    (wu (d, nt*ts), y (n_rows, k) = segment-sum of J^T w J x).
    """
    d, k, _ = J.shape
    n_rows = x_table.shape[0]
    if not use_pallas(J):
        xt = gather_tiles(x_table, _rows_from_bases(bases, nt, rb), nt, rb)
        wu, part = seg_mv_fused(J, w, xt, local, nt, ts, rb)
        return wu, scatter_partials(part, _rows_from_bases(bases, nt, rb), n_rows, rb)
    xp, npad = _table_pad(x_table, rb)
    wu, y = pl.pallas_call(
        partial(_mv_fused_tbl_kernel, rb),
        grid_spec=_grid1(
            nt,
            pl.BlockSpec((1, 1, ts), lambda i, b: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts), lambda i, b: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, k), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, ts), lambda i, b: (0, 0, i), memory_space=pltpu.VMEM),
            outs=(
                pl.BlockSpec((d, ts), lambda i, b: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((npad, k), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, nt * ts), J.dtype),
            jax.ShapeDtypeStruct((npad, k), J.dtype),
        ),
    )(
        bases.astype(jnp.int32),
        local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        xp,
        J,
    )
    return wu, y[:n_rows]


def _mv_scatter_tbl_kernel(rb, bases_ref, loc_ref, u_ref, j_ref, y_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(bases_ref[i], 8)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    oh = _oh(loc_ref[0, 0], rb).astype(j_ref.dtype)
    contrib = jnp.sum(j_ref[:] * u_ref[:][:, None, :], axis=0)  # (k, ts)
    part = jax.lax.dot_general(
        oh, contrib, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype)
    ).astype(y_ref.dtype)
    y_ref[pl.ds(base, rb), :] = y_ref[pl.ds(base, rb), :] + part


def seg_mv_scatter_table(J, u, local, bases, nt, ts, rb, n_rows):
    """Segment-sum of J^T u into a (n_rows, k) table (fused scatter)."""
    d, k, _ = J.shape
    if not use_pallas(J):
        part = seg_mv_scatter(J, u, local, nt, ts, rb)
        return scatter_partials(part, _rows_from_bases(bases, nt, rb), n_rows, rb)
    npad = ((n_rows + rb + 7) // 8) * 8
    y = pl.pallas_call(
        partial(_mv_scatter_tbl_kernel, rb),
        grid_spec=_grid1(
            nt,
            pl.BlockSpec((1, 1, ts), lambda i, b: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ts), lambda i, b: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, ts), lambda i, b: (0, 0, i), memory_space=pltpu.VMEM),
            outs=pl.BlockSpec((npad, k), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((npad, k), J.dtype),
    )(
        bases.astype(jnp.int32),
        local.reshape(nt, 1, ts).astype(jnp.int32),
        u,
        J,
    )
    return y[:n_rows]


def _mv_gather_tbl_kernel(rb, bases_ref, loc_ref, x_ref, j_ref, u_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(bases_ref[i], 8)
    oh = _oh(loc_ref[0, 0], rb).astype(x_ref.dtype)
    xt = x_ref[pl.ds(base, rb), :]
    xgT = jax.lax.dot_general(
        xt, oh, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype)
    )
    u_ref[:] = jnp.sum(j_ref[:] * xgT[None, :, :], axis=1).astype(u_ref.dtype)


def seg_mv_gather_table(J, x_table, local, bases, nt, ts, rb):
    """u (d, nt*ts) = J @ table rows (fused gather)."""
    d, k, _ = J.shape
    if not use_pallas(J):
        xt = gather_tiles(x_table, _rows_from_bases(bases, nt, rb), nt, rb)
        return seg_mv_gather(J, xt, local, nt, ts, rb)
    xp, npad = _table_pad(x_table, rb)
    return pl.pallas_call(
        partial(_mv_gather_tbl_kernel, rb),
        grid_spec=_grid1(
            nt,
            pl.BlockSpec((1, 1, ts), lambda i, b: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, k), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, ts), lambda i, b: (0, 0, i), memory_space=pltpu.VMEM),
            outs=pl.BlockSpec((d, ts), lambda i, b: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((d, nt * ts), J.dtype),
    )(
        bases.astype(jnp.int32),
        local.reshape(nt, 1, ts).astype(jnp.int32),
        xp,
        J,
    )


def _reduce_tbl_kernel(rb, bases_ref, loc_ref, c_ref, y_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(bases_ref[i], 8)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    oh = _oh(loc_ref[0, 0], rb).astype(c_ref.dtype)
    part = jax.lax.dot_general(
        oh, c_ref[:], (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_sel_precision(oh.dtype)
    ).astype(y_ref.dtype)
    y_ref[pl.ds(base, rb), :] = y_ref[pl.ds(base, rb), :] + part


def seg_reduce_table(contrib, local, bases, nt, ts, rb, n_rows):
    """Segment-sum contrib (D, nt*ts) into a (n_rows, D) table."""
    D = contrib.shape[0]
    if not use_pallas(contrib):
        part = seg_reduce_partials(contrib, local, nt, ts, rb)
        return scatter_partials(part, _rows_from_bases(bases, nt, rb), n_rows, rb)
    npad = ((n_rows + rb + 7) // 8) * 8
    y = pl.pallas_call(
        partial(_reduce_tbl_kernel, rb),
        grid_spec=_grid1(
            nt,
            pl.BlockSpec((1, 1, ts), lambda i, b: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, ts), lambda i, b: (0, i), memory_space=pltpu.VMEM),
            outs=pl.BlockSpec((npad, D), lambda i, b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((npad, D), contrib.dtype),
    )(
        bases.astype(jnp.int32),
        local.reshape(nt, 1, ts).astype(jnp.int32),
        contrib,
    )
    return y[:n_rows]


def _rows_from_bases(bases, nt, rb):
    """XLA-fallback helper: expand (nt,) bases to per-tile row ids (nt*rb,)."""
    return (bases[:, None].astype(jnp.int32)
            + jnp.arange(rb, dtype=jnp.int32)[None, :]).reshape(-1)


# ---------------------------------------------------------------------------
# Single-pass Schur matvec kernels on the RIG grid. When every rig tile's
# observed landmark ids fall in a bounded window (rcs.finalize_blocks checks
# and records prb2), the whole Schur-complement matvec
#   y  = H_rr x           (rig side)
#   t  = W^T x            (landmark side)           [down]
#   y -= W (H_ll^-1 t)                              [up, after the 3x3 solves]
# runs on the rig-sorted grid alone: no point-sorted J copy, no rig<->point
# column permutes (measured ~8 ms of a ~10 ms matvec on v5e). Each kernel
# reads the J blocks exactly once; the observation axis is chunked so the
# one-hot tiles stay ~2 MB of VMEM.
# ---------------------------------------------------------------------------


def _schur_chunk(ts, rb, nh):
    """Largest power-of-two chunk of the observation axis keeping the one-hot
    tiles (tsc x (rb + 128 + nh) f32) around 4 MB of VMEM."""
    tsc = ts
    while tsc > 256 and tsc * (rb + 128 + nh) > 1024 * 1024:
        tsc //= 2
    return tsc


def _hi_lo(ploc, nh):
    """Split window-local point indices into (hi one-hot (tsc, nh) f32-ish
    bool, lo indices) for the hierarchical selection id = hi*128 + lo."""
    lo = jnp.bitwise_and(ploc, 127)
    hi = jnp.right_shift(ploc, 7)
    return hi, lo


def _schur_down_kernel(rb, nh, rbases_ref, rloc_ref, ploc_ref, w_ref,
                       x_ref, jr_ref, jp_ref, y_ref, tp_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    @pl.when(c == 0)
    def _():
        tp_ref[:] = jnp.zeros_like(tp_ref)

    ohr = _oh(rloc_ref[0, 0], rb).astype(x_ref.dtype)  # (tsc, rb)
    xt = x_ref[pl.ds(base, rb), :]  # (rb, k)
    xgT = jax.lax.dot_general(  # (k, tsc)
        xt, ohr, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_sel_precision(ohr.dtype))
    Jr = jr_ref[:]  # (d, k, tsc)
    wu = jnp.sum(Jr * xgT[None, :, :], axis=1) * w_ref[0, 0][None, :]
    contrib_r = jnp.sum(Jr * wu[:, None, :], axis=0)  # (k, tsc)
    part = jax.lax.dot_general(  # (rb, k)
        ohr, contrib_r, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(ohr.dtype)).astype(y_ref.dtype)
    y_ref[pl.ds(base, rb), :] = y_ref[pl.ds(base, rb), :] + part
    # hierarchical point scatter: id = hi*128 + lo. M[:, j*nh+h] =
    # ohhi[:, h] * contrib_p[j], then one (tsc,128)-wide selection dot
    # P = M^T ohlo gives P[j*nh+h, l] = sum over obs with (hi, lo)==(h, l).
    hi, lo = _hi_lo(ploc_ref[0, 0], nh)
    ohlo = _oh(lo, 128).astype(x_ref.dtype)  # (tsc, 128)
    ohhi = _oh(hi, nh).astype(x_ref.dtype)  # (tsc, nh)
    contrib_p = jnp.sum(jp_ref[:] * wu[:, None, :], axis=0)  # (3, tsc)
    M = jnp.concatenate(
        [ohhi * contrib_p[j][:, None] for j in range(3)], axis=1)
    tp_ref[0] = tp_ref[0] + jax.lax.dot_general(  # (3*nh, 128)
        M, ohlo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(ohlo.dtype)).astype(tp_ref.dtype)


def seg_schur_down(J_r, J_p, w, rig_local, pt_local, x_table, r_bases,
                   nt, ts, rb, prb2):
    """(y = segment-sum_rig of J_r^T w J_r x,  tpart (nt, prb2, 3) point
    partials of J_p^T w J_r x) in one pass over the rig grid."""
    d, k, _ = J_r.shape
    n_rows = x_table.shape[0]
    if not use_pallas(J_r):
        xg = seg_gather_from_tiles(
            gather_tiles(x_table, _rows_from_bases(r_bases, nt, rb), nt, rb),
            rig_local, nt, ts, rb)  # (N, k)
        wu = jnp.einsum("dkn,nk->dn", J_r, xg) * w[None, :]
        y = seg_mv_scatter_table(J_r, wu, rig_local, r_bases, nt, ts, rb,
                                 n_rows)
        contrib_p = jnp.einsum("dkn,dn->kn", J_p, wu)
        return y, seg_reduce_partials(contrib_p, pt_local, nt, ts, prb2)
    nh = prb2 // 128
    tsc = _schur_chunk(ts, rb, nh)
    nc = ts // tsc
    xp, npad = _table_pad(x_table, rb)
    y, tpart = pl.pallas_call(
        partial(_schur_down_kernel, rb, nh),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, nc),
            in_specs=[
                pl.BlockSpec((1, 1, tsc), lambda i, c, b: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad, k), lambda i, c, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, tsc), lambda i, c, b: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc), lambda i, c, b: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((npad, k), lambda i, c, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * nh, 128), lambda i, c, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, k), J_r.dtype),
            jax.ShapeDtypeStruct((nt, 3 * nh, 128), J_r.dtype),
        ),
    )(
        r_bases.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        xp,
        J_r,
        J_p,
    )
    # (nt, 3*nh, 128): [j*nh+h, l] -> (nt, prb2, 3): [h*128+l, j]
    tpart = (tpart.reshape(nt, 3, nh, 128)
             .transpose(0, 2, 3, 1).reshape(nt, prb2, 3))
    return y[:n_rows], tpart


def _schur_up_kernel(rb, nh, rbases_ref, rloc_ref, ploc_ref, w_ref,
                     z_ref, jr_ref, jp_ref, y_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # hierarchical point gather: G = ohlo z^T gives G[n, j*nh+h] =
    # z[hi(n)*128+lo(n), j] for every candidate hi=h; the nh-way ohhi
    # contraction picks the right one on the VPU.
    hi, lo = _hi_lo(ploc_ref[0, 0], nh)
    ohlo = _oh(lo, 128).astype(z_ref.dtype)  # (tsc, 128)
    ohhi = _oh(hi, nh)  # (tsc, nh) bool
    G = jax.lax.dot_general(  # (tsc, 3*nh)
        ohlo, z_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(ohlo.dtype))
    Jp = jp_ref[:]  # (d, 3, tsc)
    w = w_ref[0, 0]
    u2 = jnp.zeros((Jp.shape[0], lo.shape[0]), G.dtype)  # (d, tsc)
    for j in range(3):
        zg_j = jnp.sum(
            jnp.where(ohhi, G[:, j * nh:(j + 1) * nh], 0.0), axis=1)
        u2 = u2 + Jp[:, j, :] * zg_j[None, :]
    wu2 = u2 * w[None, :]
    contrib = jnp.sum(jr_ref[:] * wu2[:, None, :], axis=0)  # (k, tsc)
    ohr = _oh(rloc_ref[0, 0], rb).astype(z_ref.dtype)
    part = jax.lax.dot_general(
        ohr, contrib, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(ohr.dtype)).astype(y_ref.dtype)
    y_ref[pl.ds(base, rb), :] = y_ref[pl.ds(base, rb), :] + part


def seg_schur_up(J_r, J_p, w, rig_local, pt_local, z_tiles, r_bases,
                 nt, ts, rb, prb2, n_rows):
    """y (n_rows, k) = segment-sum_rig of J_r^T w J_p z over the rig grid,
    z gathered from the per-tile point windows (z_tiles (nt, prb2, 3))."""
    d, k, _ = J_r.shape
    if not use_pallas(J_r):
        zg = seg_gather_from_tiles(z_tiles, pt_local, nt, ts, prb2)  # (N, 3)
        u2 = jnp.einsum("dkn,nk->dn", J_p, zg) * w[None, :]
        return seg_mv_scatter_table(J_r, u2, rig_local, r_bases, nt, ts, rb,
                                    n_rows)
    nh = prb2 // 128
    tsc = _schur_chunk(ts, rb, nh)
    nc = ts // tsc
    npad = ((n_rows + rb + 7) // 8) * 8
    # (nt, prb2, 3): [h*128+l, j] -> (nt, 3*nh, 128): [j*nh+h, l]
    zr = (z_tiles.reshape(nt, nh, 128, 3)
          .transpose(0, 3, 1, 2).reshape(nt, 3 * nh, 128))
    y = pl.pallas_call(
        partial(_schur_up_kernel, rb, nh),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, nc),
            in_specs=[
                pl.BlockSpec((1, 1, tsc), lambda i, c, b: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * nh, 128), lambda i, c, b: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, tsc), lambda i, c, b: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc), lambda i, c, b: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((npad, k), lambda i, c, b: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((npad, k), J_r.dtype),
    )(
        r_bases.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        zr,
        J_r,
        J_p,
    )
    return y[:n_rows]


# ---------------------------------------------------------------------------
# Partials <-> global rows (tiny XLA gather/scatter over nt*rb rows)
# ---------------------------------------------------------------------------


def scatter_partials(part, rows, n_rows, rb):
    """(nt, rb, D) partials + addressed rows (nt*rb,) -> (n_rows, D)."""
    D = part.shape[-1]
    out = jnp.zeros((n_rows + rb, D), part.dtype)
    out = out.at[rows].add(part.reshape(-1, D))
    return out[:n_rows]


def gather_tiles(table, rows, nt, rb):
    """(n_rows, D) table + addressed rows -> (nt, rb, D) tile rows."""
    D = table.shape[-1]
    text = jnp.concatenate([table, jnp.zeros((rb, D), table.dtype)], axis=0)
    return text[rows].reshape(nt, rb, D)
