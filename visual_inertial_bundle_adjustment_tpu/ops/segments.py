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


# Explicit opt-out for CPU execution inside a TPU process (e.g. a CPU
# baseline via jax.default_device(cpu)): trace-time code cannot see the
# eventual placement of tracers, so callers running on a non-default
# backend set this before (re)tracing their kernels.
FORCE_XLA = False


def use_pallas(*arrays) -> bool:
    """Pallas path: TPU backend and no f64 operands (Mosaic has no f64)."""
    if FORCE_XLA or jax.default_backend() != "tpu":
        return False
    return all(a.dtype != jnp.float64 for a in arrays)


# A grid-resident (npad, k<=36) rig table is lane-padded to 128 inside the
# kernel, costing npad*128*itemsize bytes of scoped VMEM for the WHOLE grid.
# Past ~14k rows that (plus the point tables and input chunks) approaches
# the 16 MiB Mosaic scoped-VMEM stack limit — BENCH_r04 compile-OOM'd at
# 21.6k rigs inside the one-jit LM iteration (the reference's PCG-switch
# scale, viba/common/Constants.h:15). Above this budget the rig-grid
# kernels switch to WINDOWED mode: scatter-side outputs become per-tile
# (nt, rb, D) HBM partials combined by one XLA scatter-add, gather-side
# inputs are pre-gathered (nt, rb, k) tile windows — VMEM residency then no
# longer scales with the number of rigs.
RIG_RESIDENT_MAX_BYTES = 7 * 2**20


def _rig_resident(npad, dtype=jnp.float32) -> bool:
    return npad * 128 * jnp.dtype(dtype).itemsize <= RIG_RESIDENT_MAX_BYTES


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


def _oh_t(loc, rb):
    """(rb, ts) TRANSPOSED one-hot from lane-major indices (ts,). Unlike
    _oh, `loc` stays in the lane dimension — `loc[:, None]` would force a
    lane->sublane relayout of the whole index vector inside the kernel,
    which Mosaic implements as an expensive shuffle."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, loc.shape[0]), 0)
    return rows == loc[None, :]


# ---------------------------------------------------------------------------
# seg_reduce: segment-sum contributions into tile partials
# ---------------------------------------------------------------------------


def _seg_reduce_kernel(loc_ref, c_ref, out_ref):
    rb = out_ref.shape[1]
    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    out_ref[0] = _sel_dot(oh, c_ref[:], ((1,), (1,))).astype(out_ref.dtype)


def seg_reduce_partials(contrib, local, nt, ts, rb):
    """contrib (D, nt*ts), local (nt*ts,) -> tile partials (nt, rb, D)."""
    D = contrib.shape[0]
    if not use_pallas(contrib):
        oh = (
            jnp.arange(rb, dtype=local.dtype)[None, :, None]
            == local.reshape(nt, ts)[:, None, :]
        ).astype(contrib.dtype)
        pet = contrib.dtype if contrib.dtype == jnp.float64 else jnp.float32
        part = jnp.einsum(
            "tro,dto->trd", oh, contrib.reshape(D, nt, ts),
            preferred_element_type=pet,
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
    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    out_ref[:] = _sel_dot(oh, xt_ref[0], ((0,), (0,))).astype(out_ref.dtype)


def seg_gather_from_tiles(xt, local, nt, ts, rb):
    """xt (nt, rb, D) addressed tile rows -> per-observation rows (nt*ts, D)."""
    D = xt.shape[-1]
    if not use_pallas(xt):
        oh = (
            jnp.arange(rb, dtype=local.dtype)[None, :, None]
            == local.reshape(nt, ts)[:, None, :]
        ).astype(xt.dtype)
        pet = xt.dtype if xt.dtype == jnp.float64 else jnp.float32
        out = jnp.einsum("tro,trd->tod", oh, xt, preferred_element_type=pet,
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
    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    xgT = _sel_dot(xt_ref[0], oh, ((0,), (0,)))  # (k, ts)
    J = j_ref[:]  # (d, k, ts)
    u = jnp.sum(J * xgT.astype(J.dtype)[None, :, :], axis=1)  # (d, ts)
    wu = u * w_ref[0, 0][None, :]
    wu_ref[:] = wu.astype(wu_ref.dtype)
    contrib = jnp.sum(J * wu[:, None, :], axis=0)  # (k, ts)
    y_ref[0] = _sel_dot(oh, contrib, ((1,), (1,))).astype(y_ref.dtype)


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
    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    xgT = _sel_dot(xt_ref[0], oh, ((0,), (0,)))  # (k, ts)
    u_ref[:] = jnp.sum(j_ref[:] * xgT.astype(j_ref.dtype)[None, :, :],
                       axis=1).astype(u_ref.dtype)


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
    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    contrib = jnp.sum(j_ref[:] * u_ref[:][:, None, :], axis=0)  # (k, ts)
    y_ref[0] = _sel_dot(oh, contrib, ((1,), (1,))).astype(y_ref.dtype)


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

    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    xt = x_ref[pl.ds(base, rb), :]  # (rb, k)
    xgT = _sel_dot(xt, oh, ((0,), (0,)))  # (k, ts)
    J = j_ref[:]  # (d, k, ts)
    wu = jnp.sum(J * xgT.astype(J.dtype)[None, :, :], axis=1) \
        * w_ref[0, 0][None, :]
    wu_ref[:] = wu.astype(wu_ref.dtype)
    contrib = jnp.sum(J * wu[:, None, :], axis=0)  # (k, ts)
    part = _sel_dot(oh, contrib, ((1,), (1,))).astype(y_ref.dtype)  # (rb, k)
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

    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    contrib = jnp.sum(j_ref[:] * u_ref[:][:, None, :], axis=0)  # (k, ts)
    part = _sel_dot(oh, contrib, ((1,), (1,))).astype(y_ref.dtype)
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
    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    xt = x_ref[pl.ds(base, rb), :]
    xgT = _sel_dot(xt, oh, ((0,), (0,)))  # (k, ts)
    u_ref[:] = jnp.sum(j_ref[:] * xgT.astype(j_ref.dtype)[None, :, :],
                       axis=1).astype(u_ref.dtype)


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

    oh = _oh_t(loc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    part = _sel_dot(oh, c_ref[:], ((1,), (1,))).astype(y_ref.dtype)
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
# and records prb2 = 128*nhw) AND the whole point tangent table fits VMEM
# (nhg*128 rows), the Schur-complement matvec
#   y  = H_rr x           (rig side)
#   t  = W^T x            (landmark side)           [down]
#   y -= W (H_ll^-1 t)                              [up, after the 3x3 solves]
# runs on the rig-sorted grid alone: no point-sorted J copy, no rig<->point
# column permutes, no per-tile partials in HBM. The point table is VMEM-
# resident in a (3*nhg, 128) layout (row j*nhg + hi, lane lo for point
# id = hi*128 + lo, coordinate j); per-tile windows bound the hi range so
# the per-observation selection factors into one (tsc, 128) one-hot MXU dot
# plus an nhw-wide VPU contraction.
# ---------------------------------------------------------------------------


def _schur_chunk(ts, rb, nhw):
    """Largest power-of-two chunk of the observation axis keeping the one-hot
    tiles (tsc x (rb + 128 + 3*nhw)) around 4 MB of VMEM."""
    tsc = ts
    while tsc > 256 and tsc * (rb + 128 + 3 * nhw) > 2560 * 1024:
        tsc //= 2
    return tsc


def _hi_lo(ploc):
    """Window-local point index -> (hi, lo) for id = hi*128 + lo."""
    return jnp.right_shift(ploc, 7), jnp.bitwise_and(ploc, 127)


# Split count for the PCG-LOOP matvec kernels' value-side operands (the
# solve re-runs these dots 40x per LM iteration and their MXU cycles scale
# linearly with the split count): 3 = exact f32 (24-bit mantissa), 2 = ~16
# mantissa bits (~1.5e-5 relative rounding of iterate-dependent values —
# far below the bf16 J storage rounding the operator already carries; CG
# behaves as inexact-Krylov with a residual floor ~eps*kappa, well past the
# accuracy LM needs from a step). Assembly / gradient / preconditioner /
# cost kernels always use the exact 3-split.
MV_SPLITS = 2


def _splitn(x, n):
    """n-term bf16 decomposition of an f32 array (n=3 is exact: 24-bit
    mantissa <= 3x8 + rounding carry; n=2 keeps ~16 bits). Selection dots
    against a {0,1} one-hot (exact in bf16) then run at full bf16 MXU rate
    with f32 accumulation. bf16 inputs pass through as one term."""
    if x.dtype == jnp.bfloat16:
        return (x,)
    out = []
    r = x
    for _ in range(n - 1):
        h = r.astype(jnp.bfloat16)
        out.append(h)
        r = r - h.astype(jnp.float32)
    out.append(r.astype(jnp.bfloat16))
    return tuple(out)


def _split3(x):
    return _splitn(x, 3)


def _sel_dot(a, b, dims, n=3):
    """dot_general for selection contractions: one operand is a one-hot
    already cast to bf16, the other carries f32 values (split via _splitn).
    Accumulates in f32."""
    acc = None
    for x in _splitn(a, n):
        for y in _splitn(b, n):
            t = jax.lax.dot_general(x, y, (dims, ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc


def _SEL_DOT_MV(a, b, dims):
    """Matvec-kernel selection dot at the reduced MV_SPLITS precision."""
    return _sel_dot(a, b, dims, n=MV_SPLITS)


def _to_pt_rows(pt_local, hib, nt, ts):
    """Window-local point indices + per-tile hi bases -> global point rows."""
    return (jnp.repeat(hib.astype(jnp.int32) * 128, ts) +
            pt_local.astype(jnp.int32))


def pt_table_to_kernel(z, nhg):
    """(n_pts, D) point table -> (D*nhg, 128) kernel layout (row j*nhg + hi,
    lane lo for point id = hi*128 + lo, column j)."""
    n_pts, D = z.shape
    zp = jnp.pad(z, ((0, nhg * 128 - n_pts), (0, 0)))
    return zp.reshape(nhg, 128, D).transpose(2, 0, 1).reshape(D * nhg, 128)


def pt_table_from_kernel(t, n_pts, D=3):
    """(D*nhg, 128) kernel layout -> (n_pts, D) point table."""
    nhg = t.shape[0] // D
    return (t.reshape(D, nhg, 128).transpose(1, 2, 0)
            .reshape(nhg * 128, D)[:n_pts])


def _schur_down_kernel(rb, nhw, nhg, win, rbases_ref, hib_ref, rloc_ref,
                       ploc_ref, w_ref, x_ref, jr_ref, jp_ref, y_ref, tp_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    if win:
        @pl.when(c == 0)
        def _():
            y_ref[0] = jnp.zeros_like(y_ref[0])

        @pl.when((i == 0) & (c == 0))
        def _():
            tp_ref[:] = jnp.zeros_like(tp_ref)
    else:
        @pl.when((i == 0) & (c == 0))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
            tp_ref[:] = jnp.zeros_like(tp_ref)

    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, tsc)
    xt = x_ref[0] if win else x_ref[pl.ds(base, rb), :]  # (rb, k)
    xgT = _SEL_DOT_MV(xt, ohr, ((0,), (0,)))  # (k, tsc)
    Jr = jr_ref[:].astype(xgT.dtype)  # (d, k, tsc); bf16 storage upcast once
    wu = jnp.sum(Jr * xgT[None, :, :], axis=1) \
        * w_ref[0, 0][None, :]
    contrib_r = jnp.sum(Jr * wu[:, None, :], axis=0)  # (k, tsc)
    part = _SEL_DOT_MV(ohr, contrib_r, ((1,), (1,)))  # (rb, k)
    if win:
        y_ref[0] = y_ref[0] + part.astype(y_ref.dtype)
    else:
        y_ref[pl.ds(base, rb), :] = (y_ref[pl.ds(base, rb), :]
                                     + part.astype(y_ref.dtype))
    # hierarchical point scatter: id = hi*128 + lo. MT[j*nhw+h, :] =
    # ohhi[h, :] * contrib_p[j], then one 128-row selection dot
    # P = MT ohlo^T gives P[j*nhw+h, l] = sum over obs with (hi, lo)==(h, l),
    # accumulated into the resident table at sublane offset j*nhg + hb.
    # Everything stays lane-major in the observation axis.
    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)  # (128, tsc)
    ohhi = _oh_t(hi, nhw).astype(wu.dtype)  # (nhw, tsc)
    contrib_p = jnp.sum(jp_ref[:].astype(wu.dtype) * wu[:, None, :],
                        axis=0)  # (3, tsc)
    MT = jnp.concatenate(
        [ohhi * contrib_p[j][None, :] for j in range(3)], axis=0)
    P = _SEL_DOT_MV(MT, ohlo, ((1,), (1,)))  # (3*nhw, 128)
    for j in range(3):
        tp_ref[pl.ds(j * nhg + hb, nhw), :] = (
            tp_ref[pl.ds(j * nhg + hb, nhw), :]
            + P[j * nhw:(j + 1) * nhw].astype(tp_ref.dtype))


def seg_schur_down(J_r, J_p, w, rig_local, pt_local, hib, x_table, r_bases,
                   n_pts, nt, ts, rb, nhw, nhg):
    """One pass over the rig grid: returns
      y (n_rows, k) = segment-sum_rig of J_r^T w J_r x
      t (n_pts, 3)  = segment-sum_pt  of J_p^T w J_r x   (= W^T x)
    with the point table accumulated VMEM-resident (no per-tile partials)."""
    d, k, _ = J_r.shape
    n_rows = x_table.shape[0]
    if not use_pallas(w):
        J_r = J_r.astype(w.dtype)
        J_p = J_p.astype(w.dtype)
        xg = seg_gather_from_tiles(
            gather_tiles(x_table, _rows_from_bases(r_bases, nt, rb), nt, rb),
            rig_local, nt, ts, rb)  # (N, k)
        wu = jnp.einsum("dkn,nk->dn", J_r, xg) * w[None, :]
        y = seg_mv_scatter_table(J_r, wu, rig_local, r_bases, nt, ts, rb,
                                 n_rows)
        contrib_p = jnp.einsum("dkn,dn->kn", J_p, wu)
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        t = jnp.zeros((nhg * 128, 3), J_r.dtype).at[rows].add(contrib_p.T)
        return y, t[:n_pts]
    tsc = _schur_chunk(ts, rb, nhw)
    nc = ts // tsc
    xp, npad = _table_pad(x_table, rb)
    win = not _rig_resident(npad, w.dtype)
    if win:
        rows = _rows_from_bases(r_bases, nt, rb)
        x_arg = gather_tiles(x_table, rows, nt, rb)
        x_spec = pl.BlockSpec((1, rb, k), lambda i, c, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((1, rb, k), lambda i, c, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((nt, rb, k), w.dtype)
    else:
        x_arg = xp
        x_spec = pl.BlockSpec((npad, k), lambda i, c, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((npad, k), lambda i, c, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((npad, k), w.dtype)
    y, t = pl.pallas_call(
        partial(_schur_down_kernel, rb, nhw, nhg, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, nc),
            in_specs=[
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                x_spec,
                pl.BlockSpec((d, k, tsc),
                             lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc),
                             lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                y_spec,
                pl.BlockSpec((3 * nhg, 128), lambda i, c, b, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            y_shape,
            jax.ShapeDtypeStruct((3 * nhg, 128), w.dtype),
        ),
    )(
        r_bases.astype(jnp.int32),
        hib.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        x_arg,
        J_r,
        J_p,
    )
    if win:
        y = scatter_partials(y, rows, n_rows, rb)
    else:
        y = y[:n_rows]
    return y, pt_table_from_kernel(t, n_pts)


def _schur_up_kernel(rb, nhw, nhg, win, rbases_ref, hib_ref, rloc_ref,
                     ploc_ref, w_ref, z_ref, jr_ref, jp_ref, y_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    if win:
        @pl.when(c == 0)
        def _():
            y_ref[0] = jnp.zeros_like(y_ref[0])
    else:
        @pl.when((i == 0) & (c == 0))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

    # hierarchical point gather from the resident z table: Gt = Zw ohlo
    # gives Gt[j*nhw+h, n] = z[(hb+h)*128+lo(n), j] for every candidate
    # hi=h; the nhw-way ohhi contraction picks the right one on the VPU.
    # Everything stays lane-major in the observation axis.
    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)  # (128, tsc)
    ohhi = _oh_t(hi, nhw)  # (nhw, tsc) bool
    Zw = jnp.concatenate(
        [z_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(3)], axis=0)
    Gt = _SEL_DOT_MV(Zw, ohlo, ((1,), (0,)))  # (3*nhw, tsc)
    Jp = jp_ref[:].astype(w_ref.dtype)  # (d, 3, tsc)
    w = w_ref[0, 0]
    u2 = jnp.zeros((Jp.shape[0], lo.shape[0]), Jp.dtype)  # (d, tsc)
    for j in range(3):
        zg_j = jnp.sum(
            jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
        u2 = u2 + Jp[:, j, :] * zg_j.astype(Jp.dtype)[None, :]
    wu2 = u2 * w[None, :]
    contrib = jnp.sum(jr_ref[:].astype(wu2.dtype) * wu2[:, None, :],
                      axis=0)  # (k, tsc)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, tsc)
    part = _SEL_DOT_MV(ohr, contrib, ((1,), (1,)))  # (rb, k)
    if win:
        y_ref[0] = y_ref[0] + part.astype(y_ref.dtype)
    else:
        y_ref[pl.ds(base, rb), :] = (y_ref[pl.ds(base, rb), :]
                                     + part.astype(y_ref.dtype))


def seg_schur_up(J_r, J_p, w, rig_local, pt_local, hib, z, r_bases,
                 nt, ts, rb, nhw, nhg, n_rows):
    """y (n_rows, k) = segment-sum_rig of J_r^T w J_p z over the rig grid,
    z (n_pts, 3) held VMEM-resident in kernel layout (= W y_l)."""
    d, k, _ = J_r.shape
    if not use_pallas(w):
        J_r = J_r.astype(w.dtype)
        J_p = J_p.astype(w.dtype)
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        zp = jnp.pad(z, ((0, nhg * 128 - z.shape[0]), (0, 0)))
        zg = zp[rows]  # (N, 3)
        u2 = jnp.einsum("dkn,nk->dn", J_p, zg) * w[None, :]
        return seg_mv_scatter_table(J_r, u2, rig_local, r_bases, nt, ts, rb,
                                    n_rows)
    tsc = _schur_chunk(ts, rb, nhw)
    nc = ts // tsc
    npad = ((n_rows + rb + 7) // 8) * 8
    win = not _rig_resident(npad, w.dtype)
    if win:
        y_spec = pl.BlockSpec((1, rb, k), lambda i, c, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((nt, rb, k), w.dtype)
    else:
        y_spec = pl.BlockSpec((npad, k), lambda i, c, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((npad, k), w.dtype)
    zr = pt_table_to_kernel(z, nhg)
    y = pl.pallas_call(
        partial(_schur_up_kernel, rb, nhw, nhg, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, nc),
            in_specs=[
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * nhg, 128), lambda i, c, b, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, tsc),
                             lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc),
                             lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=y_spec,
        ),
        out_shape=y_shape,
    )(
        r_bases.astype(jnp.int32),
        hib.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        zr,
        J_r,
        J_p,
    )
    if win:
        return scatter_partials(y, _rows_from_bases(r_bases, nt, rb),
                                n_rows, rb)
    return y[:n_rows]


def _triu_pairs(k):
    return [(a, b) for a in range(k) for b in range(a, k)]


def _assemble_rig_kernel(rb, nhw, nhg, win, rbases_ref, hib_ref, rloc_ref,
                         ploc_ref, w_ref, res_ref, jr_ref, jp_ref,
                         y_ref, tp_ref):
    i = pl.program_id(0)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when(i == 0)
    def _():
        if not win:
            y_ref[:] = jnp.zeros_like(y_ref)
        tp_ref[:] = jnp.zeros_like(tp_ref)

    Jr = jr_ref[:]  # (d, k, ts)
    Jp = jp_ref[:]  # (d, 3, ts)
    w = w_ref[0, 0]
    d, k = Jr.shape[0], Jr.shape[1]
    ts_n = Jr.shape[2]
    wres = res_ref[:] * w[None, :]  # (d, ts) dense
    # rig side: gradient + Hessian diagonal, one (rb, 2k) reduce. All
    # products DENSE-stacked: per-scalar (1, ts) rows occupy one sublane.
    gr = jnp.sum(Jr * wres[:, None, :], axis=0)  # (k, ts)
    dg = jnp.sum(Jr * Jr, axis=0) * w[None, :]  # (k, ts)
    C = jnp.concatenate([gr, dg], axis=0)  # (2k, ts)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, ts)
    part = _sel_dot(ohr, C, ((1,), (1,)))  # (rb, 2k)
    if win:
        # windowed: each tile owns its (rb, 2k) HBM partial (grid has no
        # chunk dim here — written exactly once)
        y_ref[0] = part.astype(y_ref.dtype)
    else:
        y_ref[pl.ds(base, rb), :] = (y_ref[pl.ds(base, rb), :]
                                     + part.astype(y_ref.dtype))
    # point side: gradient (3) + symmetric landmark block (6), scattered
    # into the resident (9*nhg, 128) table through the hi/lo hierarchy
    gl = jnp.sum(Jp * wres[:, None, :], axis=0)  # (3, ts)
    Hf = sum(Jp[dd][:, None, :] * Jp[dd][None, :, :]
             for dd in range(d)) * w[None, None, :]  # (3, 3, ts)
    Ht = jnp.concatenate(
        [Hf[a][b][None, :] for a, b in _triu_pairs(3)], axis=0)  # (6, ts)
    X = jnp.concatenate([gl, Ht], axis=0)  # (9, ts)
    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)  # (128, ts)
    ohhi = _oh_t(hi, nhw).astype(w.dtype)  # (nhw, ts)
    MT = (X[:, None, :] * ohhi[None, :, :]).reshape(9 * nhw, ts_n)
    P = _sel_dot(MT, ohlo, ((1,), (1,)))  # (9*nhw, 128)
    for j in range(9):
        tp_ref[pl.ds(j * nhg + hb, nhw), :] = (
            tp_ref[pl.ds(j * nhg + hb, nhw), :]
            + P[j * nhw:(j + 1) * nhw].astype(tp_ref.dtype))


def seg_assemble_rig(J_r, J_p, res, w, rig_local, pt_local, hib, r_bases,
                     n_pts, nt, ts, rb, nhw, nhg, n_rows):
    """All lambda-independent assembly of a rig-only visual batch in ONE
    pass over the rig grid (J read once):
      g_r    (n_rows, k): sum J^T w res        (rig gradient)
      diag_r (n_rows, k): sum diag(J^T w J)    (rig Hessian diagonal)
      g_l    (n_pts, 3):  sum J_p^T w res      (landmark gradient)
      H_ll0  (n_pts, 3, 3): sum J_p^T w J_p    (undamped landmark blocks)
    Replaces the separate point-grid einsum/reduce passes (rcs._grad /
    _diag / _point_blocks_blocked) for fast batches — no point-sorted J
    copy, no rig<->point permutes."""
    d, k, _ = J_r.shape
    if not use_pallas(J_r):
        wres = res * w[None, :]
        g_r = seg_mv_scatter_table(J_r, wres, rig_local, r_bases, nt, ts, rb,
                                   n_rows)
        dcontrib = jnp.einsum("dkn,dkn->kn", J_r, J_r * w[None, None, :])
        diag_r = seg_reduce_table(dcontrib, rig_local, r_bases, nt, ts, rb,
                                  n_rows)
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        gl_c = jnp.einsum("dbn,dn->nb", J_p, wres)
        Hc = jnp.einsum("dan,dbn->nab", J_p * w[None, None, :], J_p)
        buf = jnp.zeros((nhg * 128, 12), J_r.dtype)
        buf = buf.at[rows, :3].add(gl_c)
        buf = buf.at[rows, 3:].add(Hc.reshape(-1, 9))
        return (g_r, diag_r, buf[:n_pts, :3],
                buf[:n_pts, 3:].reshape(n_pts, 3, 3))
    xpad = ((n_rows + rb + 7) // 8) * 8
    win = not _rig_resident(xpad, J_r.dtype)
    if win:
        y_spec = pl.BlockSpec((1, rb, 2 * k), lambda i, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((nt, rb, 2 * k), J_r.dtype)
    else:
        y_spec = pl.BlockSpec((xpad, 2 * k), lambda i, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((xpad, 2 * k), J_r.dtype)
    y, t = pl.pallas_call(
        partial(_assemble_rig_kernel, rb, nhw, nhg, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1, ts), lambda i, b, h: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ts), lambda i, b, h: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ts), lambda i, b, h: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, ts), lambda i, b, h: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, ts), lambda i, b, h: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, ts), lambda i, b, h: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                y_spec,
                pl.BlockSpec((9 * nhg, 128), lambda i, b, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            y_shape,
            jax.ShapeDtypeStruct((9 * nhg, 128), J_r.dtype),
        ),
    )(
        r_bases.astype(jnp.int32),
        hib.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        res,
        J_r,
        J_p,
    )
    if win:
        y = scatter_partials(y, _rows_from_bases(r_bases, nt, rb), n_rows, rb)
    else:
        y = y[:n_rows]
    g_r, diag_r = y[:, :k], y[:, k:]
    pt = pt_table_from_kernel(t, n_pts, D=9)  # (n_pts, 9)
    g_l = pt[:, :3]
    tri = pt[:, 3:]  # [H00,H01,H02,H11,H12,H22]
    import numpy as _np
    tri_idx = _np.zeros((3, 3), _np.int32)
    for m, (a, b) in enumerate(_triu_pairs(3)):
        tri_idx[a, b] = tri_idx[b, a] = m
    H = tri[:, tri_idx.reshape(-1)].reshape(n_pts, 3, 3)
    return g_r, diag_r, g_l, H


# ---------------------------------------------------------------------------
# Calibration-coupled single-pass Schur kernels. Full-sensor sessions couple
# each visual observation to its 5-second calibration-window variables
# (camera extrinsics 6 + intrinsics 17 -> one concatenated "cal" column
# group of kc <= 23 columns, indexed by window row = window(rig)*nC + ci).
# Within one rig tile the consecutive rigs span only a handful of windows,
# so the cal side gets the same treatment as the rig side: a per-tile
# 8-aligned base + a (wb, tsc) one-hot, with the (n_cal, kc) tables VMEM-
# resident across the whole grid. This keeps BASELINE config-3/4 workloads
# (all calibration random-walking) on the single-pass rig grid instead of
# the two-grid permute path.
# ---------------------------------------------------------------------------


def _schur_chunk_cal(ts, rb, wb, nhw):
    tsc = ts
    while tsc > 256 and tsc * (rb + wb + 128 + 3 * nhw) > 2560 * 1024:
        tsc //= 2
    return tsc


def _schur_down_cal_kernel(rb, wb, nhw, nhg, rbases_ref, cbases_ref, hib_ref,
                           rloc_ref, cloc_ref, ploc_ref, w_ref, xr_ref,
                           xc_ref, jr_ref, jc_ref, jp_ref, yr_ref, yc_ref,
                           tp_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    cb = pl.multiple_of(cbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        yr_ref[:] = jnp.zeros_like(yr_ref)
        yc_ref[:] = jnp.zeros_like(yc_ref)
        tp_ref[:] = jnp.zeros_like(tp_ref)

    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, tsc)
    ohc = _oh_t(cloc_ref[0, 0], wb).astype(jnp.bfloat16)  # (wb, tsc)
    xgT_r = _SEL_DOT_MV(xr_ref[pl.ds(base, rb), :], ohr, ((0,), (0,)))  # (k, tsc)
    xgT_c = _SEL_DOT_MV(xc_ref[pl.ds(cb, wb), :], ohc, ((0,), (0,)))  # (kc, tsc)
    Jr = jr_ref[:].astype(xgT_r.dtype)  # (d, k, tsc); bf16 storage upcast once
    Jc = jc_ref[:].astype(xgT_c.dtype)  # (d, kc, tsc)
    u = (jnp.sum(Jr * xgT_r[None, :, :], axis=1)
         + jnp.sum(Jc * xgT_c[None, :, :], axis=1))
    wu = u * w_ref[0, 0][None, :]
    contrib_r = jnp.sum(Jr * wu[:, None, :], axis=0)  # (k, tsc)
    part_r = _SEL_DOT_MV(ohr, contrib_r, ((1,), (1,)))
    yr_ref[pl.ds(base, rb), :] = (yr_ref[pl.ds(base, rb), :]
                                  + part_r.astype(yr_ref.dtype))
    contrib_c = jnp.sum(Jc * wu[:, None, :], axis=0)  # (kc, tsc)
    part_c = _SEL_DOT_MV(ohc, contrib_c, ((1,), (1,)))
    yc_ref[pl.ds(cb, wb), :] = (yc_ref[pl.ds(cb, wb), :]
                                + part_c.astype(yc_ref.dtype))
    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)  # (128, tsc)
    ohhi = _oh_t(hi, nhw).astype(wu.dtype)  # (nhw, tsc)
    contrib_p = jnp.sum(jp_ref[:].astype(wu.dtype) * wu[:, None, :],
                        axis=0)  # (3, tsc)
    MT = jnp.concatenate(
        [ohhi * contrib_p[j][None, :] for j in range(3)], axis=0)
    P = _SEL_DOT_MV(MT, ohlo, ((1,), (1,)))  # (3*nhw, 128)
    for j in range(3):
        tp_ref[pl.ds(j * nhg + hb, nhw), :] = (
            tp_ref[pl.ds(j * nhg + hb, nhw), :]
            + P[j * nhw:(j + 1) * nhw].astype(tp_ref.dtype))


def seg_schur_down_cal(J_r, J_c, J_p, w, rig_local, cal_local, pt_local, hib,
                       x_r, x_c, r_bases, c_bases, n_pts, nt, ts, rb, wb,
                       nhw, nhg):
    """Single pass over the rig grid for a calib-coupled visual batch:
      y_r (n_r, k)   = seg_rig  J_r^T w u
      y_c (n_c, kc)  = seg_cal  J_c^T w u
      t   (n_pts, 3) = seg_pt   J_p^T w u
    with u = J_r x_r[rig] + J_c x_c[cal] — the full H x and W^T x of the
    batch, every table VMEM-resident. J_c may carry sublane-alignment pad
    columns beyond x_c's width (zeros, see rcs._vis_batches); x_c is padded
    to match and y_c's pad columns come back zero."""
    d, k, _ = J_r.shape
    kc = J_c.shape[1]
    if x_c.shape[1] < kc:
        x_c = jnp.pad(x_c, ((0, 0), (0, kc - x_c.shape[1])))
    n_r, n_c = x_r.shape[0], x_c.shape[0]
    if not use_pallas(w):
        J_r, J_c, J_p = (J_r.astype(w.dtype), J_c.astype(w.dtype),
                         J_p.astype(w.dtype))
        xg_r = seg_gather_from_tiles(
            gather_tiles(x_r, _rows_from_bases(r_bases, nt, rb), nt, rb),
            rig_local, nt, ts, rb)
        xg_c = seg_gather_from_tiles(
            gather_tiles(x_c, _rows_from_bases(c_bases, nt, wb), nt, wb),
            cal_local, nt, ts, wb)
        wu = (jnp.einsum("dkn,nk->dn", J_r, xg_r)
              + jnp.einsum("dkn,nk->dn", J_c, xg_c)) * w[None, :]
        y_r = seg_mv_scatter_table(J_r, wu, rig_local, r_bases, nt, ts, rb,
                                   n_r)
        y_c = seg_mv_scatter_table(J_c, wu, cal_local, c_bases, nt, ts, wb,
                                   n_c)
        contrib_p = jnp.einsum("dkn,dn->kn", J_p, wu)
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        t = jnp.zeros((nhg * 128, 3), J_r.dtype).at[rows].add(contrib_p.T)
        return y_r, y_c, t[:n_pts]
    tsc = _schur_chunk_cal(ts, rb, wb, nhw)
    nc_ch = ts // tsc
    xrp, npad_r = _table_pad(x_r, rb)
    xcp, npad_c = _table_pad(x_c, wb)
    ts_spec = lambda: pl.BlockSpec((1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    y_r, y_c, t = pl.pallas_call(
        partial(_schur_down_cal_kernel, rb, wb, nhw, nhg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt, nc_ch),
            in_specs=[
                ts_spec(), ts_spec(), ts_spec(),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad_r, k), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad_c, kc), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, tsc),
                             lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, kc, tsc),
                             lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc),
                             lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((npad_r, k), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad_c, kc), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * nhg, 128), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad_r, k), w.dtype),
            jax.ShapeDtypeStruct((npad_c, kc), w.dtype),
            jax.ShapeDtypeStruct((3 * nhg, 128), w.dtype),
        ),
    )(
        r_bases.astype(jnp.int32),
        c_bases.astype(jnp.int32),
        hib.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        cal_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        xrp,
        xcp,
        J_r,
        J_c,
        J_p,
    )
    return y_r[:n_r], y_c[:n_c], pt_table_from_kernel(t, n_pts)


def _schur_up_cal_kernel(rb, wb, nhw, nhg, rbases_ref, cbases_ref, hib_ref,
                         rloc_ref, cloc_ref, ploc_ref, w_ref, z_ref, jr_ref,
                         jc_ref, jp_ref, yr_ref, yc_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    cb = pl.multiple_of(cbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        yr_ref[:] = jnp.zeros_like(yr_ref)
        yc_ref[:] = jnp.zeros_like(yc_ref)

    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)  # (128, tsc)
    ohhi = _oh_t(hi, nhw)  # (nhw, tsc) bool
    Zw = jnp.concatenate(
        [z_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(3)], axis=0)
    Gt = _SEL_DOT_MV(Zw, ohlo, ((1,), (0,)))  # (3*nhw, tsc)
    Jr = jr_ref[:].astype(w_ref.dtype)
    Jc = jc_ref[:].astype(w_ref.dtype)
    Jp = jp_ref[:].astype(w_ref.dtype)
    w = w_ref[0, 0]
    u2 = jnp.zeros((Jp.shape[0], lo.shape[0]), Jp.dtype)
    for j in range(3):
        zg_j = jnp.sum(
            jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
        u2 = u2 + Jp[:, j, :] * zg_j.astype(Jp.dtype)[None, :]
    wu2 = u2 * w[None, :]
    contrib_r = jnp.sum(Jr * wu2[:, None, :], axis=0)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
    part_r = _SEL_DOT_MV(ohr, contrib_r, ((1,), (1,)))
    yr_ref[pl.ds(base, rb), :] = (yr_ref[pl.ds(base, rb), :]
                                  + part_r.astype(yr_ref.dtype))
    contrib_c = jnp.sum(Jc * wu2[:, None, :], axis=0)
    ohc = _oh_t(cloc_ref[0, 0], wb).astype(jnp.bfloat16)
    part_c = _SEL_DOT_MV(ohc, contrib_c, ((1,), (1,)))
    yc_ref[pl.ds(cb, wb), :] = (yc_ref[pl.ds(cb, wb), :]
                                + part_c.astype(yc_ref.dtype))


def seg_schur_up_cal(J_r, J_c, J_p, w, rig_local, cal_local, pt_local, hib,
                     z, r_bases, c_bases, nt, ts, rb, wb, nhw, nhg,
                     n_r, n_c):
    """(y_r, y_c) = segment sums of (J_r, J_c)^T w J_p z over the rig grid
    (z (n_pts, 3) VMEM-resident): the W y_l coupling of rig AND cal columns."""
    d, k, _ = J_r.shape
    kc = J_c.shape[1]
    if not use_pallas(w):
        J_r, J_c, J_p = (J_r.astype(w.dtype), J_c.astype(w.dtype),
                         J_p.astype(w.dtype))
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        zp = jnp.pad(z, ((0, nhg * 128 - z.shape[0]), (0, 0)))
        u2 = jnp.einsum("dkn,nk->dn", J_p, zp[rows]) * w[None, :]
        y_r = seg_mv_scatter_table(J_r, u2, rig_local, r_bases, nt, ts, rb,
                                   n_r)
        y_c = seg_mv_scatter_table(J_c, u2, cal_local, c_bases, nt, ts, wb,
                                   n_c)
        return y_r, y_c
    tsc = _schur_chunk_cal(ts, rb, wb, nhw)
    nc_ch = ts // tsc
    npad_r = ((n_r + rb + 7) // 8) * 8
    npad_c = ((n_c + wb + 7) // 8) * 8
    zr = pt_table_to_kernel(z, nhg)
    ts_spec = lambda: pl.BlockSpec((1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    y_r, y_c = pl.pallas_call(
        partial(_schur_up_cal_kernel, rb, wb, nhw, nhg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt, nc_ch),
            in_specs=[
                ts_spec(), ts_spec(), ts_spec(),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * nhg, 128), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, tsc),
                             lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, kc, tsc),
                             lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc),
                             lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((npad_r, k), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad_c, kc), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad_r, k), w.dtype),
            jax.ShapeDtypeStruct((npad_c, kc), w.dtype),
        ),
    )(
        r_bases.astype(jnp.int32),
        c_bases.astype(jnp.int32),
        hib.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        cal_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        zr,
        J_r,
        J_c,
        J_p,
    )
    return y_r[:n_r], y_c[:n_c]


# ---------------------------------------------------------------------------
# Fully-fused PCG matvec: down + landmark 3x3 solve + up in ONE kernel.
# Grid (2, nt, nc): phase 0 accumulates the rig/cal tables and the point
# table t = W^T x (VMEM scratch); at the first phase-1 step the landmark
# solve z = H_ll^-1 t runs in place on the resident tables (pure VPU); phase
# 1 subtracts the W z coupling from the same resident outputs. t and z never
# touch HBM, there is no separate chol dispatch, and the (L,3)<->(3*nhg,128)
# layout transforms disappear from the 40-iteration loop. Single-chip only:
# under mesh sharding the t reduction needs a cross-shard collective between
# the phases (problem/rcs.py keeps the two-kernel path there). Replaces the
# per-iteration solve composition of lib/small_thing/Optimizer.cpp:269-331.
# ---------------------------------------------------------------------------


def _pcg_chol_inplace(t_scr, hinv_ref, nhg):
    """z = H_ll^-1 t on the resident (3*nhg, 128) table, in place."""
    t0 = t_scr[pl.ds(0, nhg), :]
    t1 = t_scr[pl.ds(nhg, nhg), :]
    t2 = t_scr[pl.ds(2 * nhg, nhg), :]
    zs = []
    for a in range(3):
        zs.append(hinv_ref[pl.ds((3 * a) * nhg, nhg), :] * t0
                  + hinv_ref[pl.ds((3 * a + 1) * nhg, nhg), :] * t1
                  + hinv_ref[pl.ds((3 * a + 2) * nhg, nhg), :] * t2)
    for a in range(3):
        t_scr[pl.ds(a * nhg, nhg), :] = zs[a]


def _zk_solve(t, hk, nhg):
    """z = H_ll^-1 t on (3*nhg, 128) kernel-layout tables, in XLA (between
    the down-light and up-du kernels): pure slab elementwise ops, no
    relayout of the point tables."""
    ts_ = [jax.lax.slice_in_dim(t, b * nhg, (b + 1) * nhg, axis=0)
           for b in range(3)]
    zs = []
    for a in range(3):
        acc = None
        for b in range(3):
            h = jax.lax.slice_in_dim(hk, (3 * a + b) * nhg,
                                     (3 * a + b + 1) * nhg, axis=0)
            acc = h * ts_[b] if acc is None else acc + h * ts_[b]
        zs.append(acc)
    return jnp.concatenate(zs, axis=0)


# The PCG-loop Schur matvec y = H x - W H_ll^-1 W^T x runs as TWO kernels
# with the per-observation down-pass products wu = w J x staged through HBM
# (a (2, N) f32 round-trip, ~30 us at bench scale) and the landmark solve as
# slab elementwise XLA between them. This leaves 4 full-size MXU selection
# dots per chunk (gather x, point scatter, point gather, combined
# J^T w (u - u2) scatter) — down from 8 when down/solve/up ran as phases of
# one kernel (each phase re-derived u, and each pass scattered separately).
# Selection-dot cost on the MXU is set by the 128-row hardware tile, not by
# the column counts, so the calib-window columns stack into the rig dots for
# free when rb + wb <= 128 (finalize_blocks tiles cal-coupled batches at
# rb=112 for exactly this reason).


def _down_light_kernel(rb, nhw, nhg, win, rbases_ref, hib_ref, rloc_ref,
                       ploc_ref, w_ref, x_ref, jr_ref, jp_ref, t_ref, wu_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        t_ref[:] = jnp.zeros_like(t_ref)

    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
    xt = x_ref[0] if win else x_ref[pl.ds(base, rb), :]  # (rb, k)
    xgT = _SEL_DOT_MV(xt, ohr, ((0,), (0,)))
    Jr = jr_ref[:].astype(xgT.dtype)
    wu = jnp.sum(Jr * xgT[None, :, :], axis=1) * w_ref[0, 0][None, :]
    wu_ref[:] = wu.astype(wu_ref.dtype)
    ohhi = _oh_t(hi, nhw).astype(wu.dtype)
    contrib_p = jnp.sum(jp_ref[:].astype(wu.dtype) * wu[:, None, :], axis=0)
    MT = jnp.concatenate(
        [ohhi * contrib_p[j][None, :] for j in range(3)], axis=0)
    P = _SEL_DOT_MV(MT, ohlo, ((1,), (1,)))
    for j in range(3):
        t_ref[pl.ds(j * nhg + hb, nhw), :] = (
            t_ref[pl.ds(j * nhg + hb, nhw), :]
            + P[j * nhw:(j + 1) * nhw].astype(t_ref.dtype))


def _up_du_kernel(rb, nhw, nhg, win, rbases_ref, hib_ref, rloc_ref, ploc_ref,
                  w_ref, zk_ref, wu_ref, jr_ref, jp_ref, y_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    if win:
        # windowed: the tile's (rb, k) HBM partial accumulates over the
        # chunk dim only (block index is constant in c -> stays in VMEM)
        @pl.when(c == 0)
        def _():
            y_ref[0] = jnp.zeros_like(y_ref[0])
    else:
        @pl.when((i == 0) & (c == 0))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)
    ohhi = _oh_t(hi, nhw)  # bool
    Zw = jnp.concatenate(
        [zk_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(3)], axis=0)
    Gt = _SEL_DOT_MV(Zw, ohlo, ((1,), (0,)))  # (3*nhw, tsc)
    Jp = jp_ref[:].astype(w_ref.dtype)
    u2 = jnp.zeros((Jp.shape[0], lo.shape[0]), Jp.dtype)
    for j in range(3):
        zg_j = jnp.sum(
            jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
        u2 = u2 + Jp[:, j, :] * zg_j.astype(Jp.dtype)[None, :]
    du = wu_ref[:] - u2 * w_ref[0, 0][None, :]  # w (u - u2)
    contrib = jnp.sum(jr_ref[:].astype(du.dtype) * du[:, None, :], axis=0)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
    part = _SEL_DOT_MV(ohr, contrib, ((1,), (1,)))
    if win:
        y_ref[0] = y_ref[0] + part.astype(y_ref.dtype)
    else:
        y_ref[pl.ds(base, rb), :] = (y_ref[pl.ds(base, rb), :]
                                     + part.astype(y_ref.dtype))


def seg_schur_pcg(J_r, J_p, w, rig_local, pt_local, hib, x_table, hinv,
                  r_bases, n_pts, nt, ts, rb, nhw, nhg):
    """y (n_rows, k) = seg_rig[ J_r^T w J_r x ] - W H_ll^-1 W^T x for one
    rig-only visual batch (the reference per-iteration solve composition,
    lib/small_thing/Optimizer.cpp:269-331); see the module comment above
    for the two-kernel structure."""
    d, k, _ = J_r.shape
    n_rows = x_table.shape[0]
    if not use_pallas(w):
        y1, t = seg_schur_down(J_r, J_p, w, rig_local, pt_local, hib,
                               x_table, r_bases, n_pts, nt, ts, rb, nhw, nhg)
        z = jnp.einsum("nij,nj->ni", hinv, t)
        y2 = seg_schur_up(J_r, J_p, w, rig_local, pt_local, hib, z, r_bases,
                          nt, ts, rb, nhw, nhg, n_rows)
        return y1 - y2
    tsc = _schur_chunk(ts, rb, nhw)
    nc = ts // tsc
    xp, npad = _table_pad(x_table, rb)
    win = not _rig_resident(npad, w.dtype)
    hk = pt_table_to_kernel(hinv.reshape(-1, 9), nhg)  # (9*nhg, 128)
    loc_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, tsc), lambda i, c, b, h: (i, 0, c), memory_space=pltpu.VMEM)
    jr_spec = pl.BlockSpec((d, k, tsc),
                           lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    jp_spec = pl.BlockSpec((d, 3, tsc),
                           lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    wu_spec = pl.BlockSpec((d, tsc),
                           lambda i, c, b, h: (0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((3 * nhg, 128), lambda i, c, b, h: (0, 0),
                            memory_space=pltpu.VMEM)
    if win:
        rows = _rows_from_bases(r_bases, nt, rb)
        x_arg = gather_tiles(x_table, rows, nt, rb)  # (nt, rb, k)
        x_spec = pl.BlockSpec((1, rb, k), lambda i, c, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((1, rb, k), lambda i, c, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((nt, rb, k), w.dtype)
    else:
        x_arg = xp
        x_spec = pl.BlockSpec((npad, k), lambda i, c, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((npad, k), lambda i, c, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((npad, k), w.dtype)
    scalars = (r_bases.astype(jnp.int32), hib.astype(jnp.int32))
    locs = (rig_local.reshape(nt, 1, ts).astype(jnp.int32),
            pt_local.reshape(nt, 1, ts).astype(jnp.int32),
            w.reshape(nt, 1, ts))
    t, wu = pl.pallas_call(
        partial(_down_light_kernel, rb, nhw, nhg, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, nc),
            in_specs=[loc_spec(), loc_spec(), loc_spec(), x_spec,
                      jr_spec, jp_spec],
            out_specs=(tab_spec, wu_spec),
        ),
        out_shape=(jax.ShapeDtypeStruct((3 * nhg, 128), w.dtype),
                   jax.ShapeDtypeStruct((d, nt * ts), w.dtype)),
    )(*scalars, *locs, x_arg, J_r, J_p)
    zk = _zk_solve(t, hk, nhg)
    y = pl.pallas_call(
        partial(_up_du_kernel, rb, nhw, nhg, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, nc),
            in_specs=[loc_spec(), loc_spec(), loc_spec(),
                      tab_spec, wu_spec, jr_spec, jp_spec],
            out_specs=y_spec,
        ),
        out_shape=y_shape,
    )(*scalars, *locs, zk, wu, J_r, J_p)
    if win:
        return scatter_partials(y, rows, n_rows, rb)
    return y[:n_rows]


def _down_light_cal_kernel(rb, wb, nhw, nhg, rbases_ref, cbases_ref, hib_ref,
                           rloc_ref, cloc_ref, ploc_ref, w_ref, xr_ref,
                           xc_ref, jr_ref, jc_ref, jp_ref, t_ref, wu_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    cb = pl.multiple_of(cbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        t_ref[:] = jnp.zeros_like(t_ref)

    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)
    k, kc = jr_ref.shape[1], jc_ref.shape[1]
    if rb + wb <= 128:
        # stacked block-diag gather: ONE 128-row selection dot for both
        # tables; cal columns first (kc sublane-aligned via the J_cal pad in
        # rcs._vis_batches) so both xg slices start 8-aligned
        ohrc = jnp.concatenate(
            [_oh_t(rloc_ref[0, 0], rb), _oh_t(cloc_ref[0, 0], wb)],
            axis=0).astype(jnp.bfloat16)
        xr = xr_ref[pl.ds(base, rb), :]
        xc = xc_ref[pl.ds(cb, wb), :]
        xt = jnp.concatenate([
            jnp.concatenate([jnp.zeros((rb, kc), xr.dtype), xr], axis=1),
            jnp.concatenate([xc, jnp.zeros((wb, k), xc.dtype)], axis=1),
        ], axis=0)
        xg = _SEL_DOT_MV(xt, ohrc, ((0,), (0,)))  # (kc+k, tsc)
        xg_c = jax.lax.slice_in_dim(xg, 0, kc, axis=0)
        xg_r = jax.lax.slice_in_dim(xg, kc, kc + k, axis=0)
    else:
        ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
        ohc = _oh_t(cloc_ref[0, 0], wb).astype(jnp.bfloat16)
        xg_r = _SEL_DOT_MV(xr_ref[pl.ds(base, rb), :], ohr, ((0,), (0,)))
        xg_c = _SEL_DOT_MV(xc_ref[pl.ds(cb, wb), :], ohc, ((0,), (0,)))
    u = (jnp.sum(jr_ref[:].astype(xg_r.dtype) * xg_r[None, :, :], axis=1)
         + jnp.sum(jc_ref[:].astype(xg_c.dtype) * xg_c[None, :, :], axis=1))
    wu = u * w_ref[0, 0][None, :]
    wu_ref[:] = wu.astype(wu_ref.dtype)
    ohhi = _oh_t(hi, nhw).astype(wu.dtype)
    contrib_p = jnp.sum(jp_ref[:].astype(wu.dtype) * wu[:, None, :], axis=0)
    MT = jnp.concatenate(
        [ohhi * contrib_p[j][None, :] for j in range(3)], axis=0)
    P = _SEL_DOT_MV(MT, ohlo, ((1,), (1,)))
    for j in range(3):
        t_ref[pl.ds(j * nhg + hb, nhw), :] = (
            t_ref[pl.ds(j * nhg + hb, nhw), :]
            + P[j * nhw:(j + 1) * nhw].astype(t_ref.dtype))


def _up_du_cal_kernel(rb, wb, nhw, nhg, rbases_ref, cbases_ref, hib_ref,
                      rloc_ref, cloc_ref, ploc_ref, w_ref, zk_ref, wu_ref,
                      jr_ref, jc_ref, jp_ref, yr_ref, yc_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    cb = pl.multiple_of(cbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        yr_ref[:] = jnp.zeros_like(yr_ref)
        yc_ref[:] = jnp.zeros_like(yc_ref)

    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)
    ohhi = _oh_t(hi, nhw)  # bool
    k, kc = jr_ref.shape[1], jc_ref.shape[1]
    Zw = jnp.concatenate(
        [zk_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(3)], axis=0)
    Gt = _SEL_DOT_MV(Zw, ohlo, ((1,), (0,)))
    Jp = jp_ref[:].astype(w_ref.dtype)
    u2 = jnp.zeros((Jp.shape[0], lo.shape[0]), Jp.dtype)
    for j in range(3):
        zg_j = jnp.sum(
            jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
        u2 = u2 + Jp[:, j, :] * zg_j.astype(Jp.dtype)[None, :]
    du = wu_ref[:] - u2 * w_ref[0, 0][None, :]  # w (u - u2)
    contrib_r = jnp.sum(jr_ref[:].astype(du.dtype) * du[:, None, :], axis=0)
    contrib_c = jnp.sum(jc_ref[:].astype(du.dtype) * du[:, None, :], axis=0)
    if rb + wb <= 128:
        ohrc = jnp.concatenate(
            [_oh_t(rloc_ref[0, 0], rb), _oh_t(cloc_ref[0, 0], wb)],
            axis=0).astype(jnp.bfloat16)
        contrib = jnp.concatenate([contrib_c, contrib_r], axis=0)
        part = _SEL_DOT_MV(ohrc, contrib, ((1,), (1,)))  # (rb+wb, kc+k)
        yr_ref[pl.ds(base, rb), :] = (yr_ref[pl.ds(base, rb), :]
                                      + part[:rb, kc:].astype(yr_ref.dtype))
        yc_ref[pl.ds(cb, wb), :] = (yc_ref[pl.ds(cb, wb), :]
                                    + part[rb:, :kc].astype(yc_ref.dtype))
    else:
        ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
        ohc = _oh_t(cloc_ref[0, 0], wb).astype(jnp.bfloat16)
        part_r = _SEL_DOT_MV(ohr, contrib_r, ((1,), (1,)))
        part_c = _SEL_DOT_MV(ohc, contrib_c, ((1,), (1,)))
        yr_ref[pl.ds(base, rb), :] = (yr_ref[pl.ds(base, rb), :]
                                      + part_r.astype(yr_ref.dtype))
        yc_ref[pl.ds(cb, wb), :] = (yc_ref[pl.ds(cb, wb), :]
                                    + part_c.astype(yc_ref.dtype))


def seg_schur_pcg_cal(J_r, J_c, J_p, w, rig_local, cal_local, pt_local, hib,
                      x_r, x_c, hinv, r_bases, c_bases, n_pts, nt, ts, rb,
                      wb, nhw, nhg):
    """(y_r, y_c) = H_batch x - W H_ll^-1 W^T x for one calib-coupled visual
    batch; see the module comment above for the two-kernel structure. J_c
    may carry zero pad columns beyond x_c width (rcs._vis_batches sublane
    alignment); x_c pads to match and y_c pad columns come back zero."""
    d, k, _ = J_r.shape
    kc = J_c.shape[1]
    if x_c.shape[1] < kc:
        x_c = jnp.pad(x_c, ((0, 0), (0, kc - x_c.shape[1])))
    n_r, n_c = x_r.shape[0], x_c.shape[0]
    if not use_pallas(w):
        y_r1, y_c1, t = seg_schur_down_cal(
            J_r, J_c, J_p, w, rig_local, cal_local, pt_local, hib, x_r, x_c,
            r_bases, c_bases, n_pts, nt, ts, rb, wb, nhw, nhg)
        z = jnp.einsum("nij,nj->ni", hinv, t)
        y_r2, y_c2 = seg_schur_up_cal(
            J_r, J_c, J_p, w, rig_local, cal_local, pt_local, hib, z,
            r_bases, c_bases, nt, ts, rb, wb, nhw, nhg, n_r, n_c)
        return y_r1 - y_r2, y_c1 - y_c2
    tsc = _schur_chunk_cal(ts, rb, wb, nhw)
    nc_ch = ts // tsc
    xrp, npad_r = _table_pad(x_r, rb)
    xcp, npad_c = _table_pad(x_c, wb)
    hk = pt_table_to_kernel(hinv.reshape(-1, 9), nhg)
    loc_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),
        memory_space=pltpu.VMEM)
    jr_spec = pl.BlockSpec((d, k, tsc),
                           lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    jc_spec = pl.BlockSpec((d, kc, tsc),
                           lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    jp_spec = pl.BlockSpec((d, 3, tsc),
                           lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    wu_spec = pl.BlockSpec((d, tsc),
                           lambda i, c, b, cb, h: (0, i * (ts // tsc) + c),
                           memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((3 * nhg, 128), lambda i, c, b, cb, h: (0, 0),
                            memory_space=pltpu.VMEM)
    scalars = (r_bases.astype(jnp.int32), c_bases.astype(jnp.int32),
               hib.astype(jnp.int32))
    locs = (rig_local.reshape(nt, 1, ts).astype(jnp.int32),
            cal_local.reshape(nt, 1, ts).astype(jnp.int32),
            pt_local.reshape(nt, 1, ts).astype(jnp.int32),
            w.reshape(nt, 1, ts))
    t, wu = pl.pallas_call(
        partial(_down_light_cal_kernel, rb, wb, nhw, nhg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt, nc_ch),
            in_specs=[loc_spec(), loc_spec(), loc_spec(),
                      pl.BlockSpec((1, 1, tsc),
                                   lambda i, c, b, cb, h: (i, 0, c),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((npad_r, k),
                                   lambda i, c, b, cb, h: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((npad_c, kc),
                                   lambda i, c, b, cb, h: (0, 0),
                                   memory_space=pltpu.VMEM),
                      jr_spec, jc_spec, jp_spec],
            out_specs=(tab_spec, wu_spec),
        ),
        out_shape=(jax.ShapeDtypeStruct((3 * nhg, 128), w.dtype),
                   jax.ShapeDtypeStruct((d, nt * ts), w.dtype)),
    )(*scalars, *locs, xrp, xcp, J_r, J_c, J_p)
    zk = _zk_solve(t, hk, nhg)
    y_r, y_c = pl.pallas_call(
        partial(_up_du_cal_kernel, rb, wb, nhw, nhg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt, nc_ch),
            in_specs=[loc_spec(), loc_spec(), loc_spec(),
                      pl.BlockSpec((1, 1, tsc),
                                   lambda i, c, b, cb, h: (i, 0, c),
                                   memory_space=pltpu.VMEM),
                      tab_spec, wu_spec, jr_spec, jc_spec, jp_spec],
            out_specs=(
                pl.BlockSpec((npad_r, k), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad_c, kc), lambda i, c, b, cb, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((npad_r, k), w.dtype),
                   jax.ShapeDtypeStruct((npad_c, kc), w.dtype)),
    )(*scalars, *locs, zk, wu, J_r, J_c, J_p)
    return y_r[:n_r], y_c[:n_c]



def _tri_pairs_splits(splits):
    """Upper-triangle (a, b) pairs WITHIN each contiguous column split."""
    pairs = []
    off = 0
    for dim in splits:
        pairs += [(off + a, off + b) for a in range(dim) for b in range(a, dim)]
        off += dim
    return pairs


def _assemble_cal_kernel(rb, wb, nhw, nhg, splits, rbases_ref, cbases_ref,
                         hib_ref, rloc_ref, cloc_ref, ploc_ref, w_ref,
                         res_ref, jr_ref, jc_ref, jp_ref, yr_ref, yc_ref,
                         tp_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    cb = pl.multiple_of(cbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    @pl.when((i == 0) & (c == 0))
    def _():
        yr_ref[:] = jnp.zeros_like(yr_ref)
        yc_ref[:] = jnp.zeros_like(yc_ref)
        tp_ref[:] = jnp.zeros_like(tp_ref)

    Jr = jr_ref[:]  # (d, k, tsc)
    Jc = jc_ref[:]  # (d, kc, tsc)
    Jp = jp_ref[:]  # (d, 3, tsc)
    w = w_ref[0, 0]
    d, k, kc = Jr.shape[0], Jr.shape[1], Jc.shape[1]
    tsc = Jr.shape[2]
    wres = res_ref[:] * w[None, :]  # (d, tsc) dense
    # rig side: gradient + diagonal (dense-stacked products — see
    # _assemble_rig_kernel)
    gr = jnp.sum(Jr * wres[:, None, :], axis=0)
    dg = jnp.sum(Jr * Jr, axis=0) * w[None, :]
    C = jnp.concatenate([gr, dg], axis=0)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)
    part = _sel_dot(ohr, C, ((1,), (1,)))
    yr_ref[pl.ds(base, rb), :] = (yr_ref[pl.ds(base, rb), :]
                                  + part.astype(yr_ref.dtype))
    # cal side: gradient + diagonal + per-split FULL self blocks (the
    # lambda-free block-Jacobi blocks of the window variables; full squares
    # reshape for free where triangles would need per-row packing)
    gc = jnp.sum(Jc * wres[:, None, :], axis=0)
    dc = jnp.sum(Jc * Jc, axis=0) * w[None, :]
    sq = []
    off = 0
    for dim in splits:
        Js = Jc[:, off:off + dim, :]
        Bs = sum(Js[dd][:, None, :] * Js[dd][None, :, :]
                 for dd in range(d)) * w[None, None, :]
        sq.append(Bs.reshape(dim * dim, tsc))
        off += dim
    CC = jnp.concatenate([gc, dc] + sq, axis=0)
    ohc = _oh_t(cloc_ref[0, 0], wb).astype(jnp.bfloat16)
    partc = _sel_dot(ohc, CC, ((1,), (1,)))
    yc_ref[pl.ds(cb, wb), :] = (yc_ref[pl.ds(cb, wb), :]
                                + partc.astype(yc_ref.dtype))
    # point side: gradient + symmetric landmark block
    gl = jnp.sum(Jp * wres[:, None, :], axis=0)
    Hf = sum(Jp[dd][:, None, :] * Jp[dd][None, :, :]
             for dd in range(d)) * w[None, None, :]
    Ht = jnp.concatenate(
        [Hf[a][b][None, :] for a, b in _triu_pairs(3)], axis=0)
    X = jnp.concatenate([gl, Ht], axis=0)  # (9, tsc)
    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)
    ohhi = _oh_t(hi, nhw).astype(w.dtype)
    MT = (X[:, None, :] * ohhi[None, :, :]).reshape(9 * nhw, tsc)
    P = _sel_dot(MT, ohlo, ((1,), (1,)))
    for j in range(9):
        tp_ref[pl.ds(j * nhg + hb, nhw), :] = (
            tp_ref[pl.ds(j * nhg + hb, nhw), :]
            + P[j * nhw:(j + 1) * nhw].astype(tp_ref.dtype))


def seg_assemble_cal(J_r, J_c, J_p, res, w, rig_local, cal_local, pt_local,
                     hib, r_bases, c_bases, n_pts, nt, ts, rb, wb, nhw, nhg,
                     n_r, n_c, splits):
    """All lambda-independent assembly of a calib-coupled visual batch in one
    pass over the rig grid:
      g_r, diag_r (n_r, k); g_c, diag_c (n_c, kc);
      blocks_c: per-split self blocks, list of (n_c, d_i, d_i)
        (the window variables' block-Jacobi blocks — no Schur correction,
        matching engine._build_preconditioner which corrects only rig blocks);
      g_l (n_pts, 3); H_ll0 (n_pts, 3, 3)."""
    d, k, _ = J_r.shape
    kc = J_c.shape[1]
    ntri = sum(dim * dim for dim in splits)  # full squares per split
    if not use_pallas(J_r):
        wres = res * w[None, :]
        g_r = seg_mv_scatter_table(J_r, wres, rig_local, r_bases, nt, ts, rb,
                                   n_r)
        dcon = jnp.einsum("dkn,dkn->kn", J_r, J_r * w[None, None, :])
        diag_r = seg_reduce_table(dcon, rig_local, r_bases, nt, ts, rb, n_r)
        g_c = seg_mv_scatter_table(J_c, wres, cal_local, c_bases, nt, ts, wb,
                                   n_c)
        dconc = jnp.einsum("dkn,dkn->kn", J_c, J_c * w[None, None, :])
        diag_c = seg_reduce_table(dconc, cal_local, c_bases, nt, ts, wb, n_c)
        sqs = []
        off = 0
        for dim in splits:
            Js = J_c[:, off:off + dim, :]
            sqs.append(jnp.einsum("dan,dbn->abn", Js * w[None, None, :],
                                  Js).reshape(dim * dim, -1))
            off += dim
        tric = jnp.concatenate(sqs, axis=0)
        tri_red = seg_reduce_table(tric, cal_local, c_bases, nt, ts, wb, n_c)
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        gl_c = jnp.einsum("dbn,dn->nb", J_p, wres)
        Hc = jnp.einsum("dan,dbn->nab", J_p * w[None, None, :], J_p)
        buf = jnp.zeros((nhg * 128, 12), J_r.dtype)
        buf = buf.at[rows, :3].add(gl_c)
        buf = buf.at[rows, 3:].add(Hc.reshape(-1, 9))
        g_l, H = buf[:n_pts, :3], buf[:n_pts, 3:].reshape(n_pts, 3, 3)
    else:
        # the dense per-split (dim, dim, tsc) f32 temporaries add ~dim^2*tsc*4
        # to the scoped-VMEM live set: halve the chunk vs the matvec kernels
        tsc = max(256, _schur_chunk_cal(ts, rb, wb, nhw) // 2)
        nc_ch = ts // tsc
        npad_r = ((n_r + rb + 7) // 8) * 8
        npad_c = ((n_c + wb + 7) // 8) * 8
        ts_spec = lambda: pl.BlockSpec(  # noqa: E731
            (1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),
            memory_space=pltpu.VMEM)
        y, yc, t = pl.pallas_call(
            partial(_assemble_cal_kernel, rb, wb, nhw, nhg, tuple(splits)),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nt, nc_ch),
                in_specs=[
                    ts_spec(), ts_spec(), ts_spec(),
                    pl.BlockSpec((1, 1, tsc), lambda i, c, b, cb, h: (i, 0, c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, tsc), lambda i, c, b, cb, h: (0, i * (ts // tsc) + c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, k, tsc),
                                 lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, kc, tsc),
                                 lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, 3, tsc),
                                 lambda i, c, b, cb, h: (0, 0, i * (ts // tsc) + c),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((npad_r, 2 * k), lambda i, c, b, cb, h: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((npad_c, 2 * kc + ntri),
                                 lambda i, c, b, cb, h: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9 * nhg, 128), lambda i, c, b, cb, h: (0, 0),
                                 memory_space=pltpu.VMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((npad_r, 2 * k), J_r.dtype),
                jax.ShapeDtypeStruct((npad_c, 2 * kc + ntri), J_r.dtype),
                jax.ShapeDtypeStruct((9 * nhg, 128), J_r.dtype),
            ),
        )(
            r_bases.astype(jnp.int32),
            c_bases.astype(jnp.int32),
            hib.astype(jnp.int32),
            rig_local.reshape(nt, 1, ts).astype(jnp.int32),
            cal_local.reshape(nt, 1, ts).astype(jnp.int32),
            pt_local.reshape(nt, 1, ts).astype(jnp.int32),
            w.reshape(nt, 1, ts),
            res,
            J_r,
            J_c,
            J_p,
        )
        g_r, diag_r = y[:n_r, :k], y[:n_r, k:]
        g_c, diag_c = yc[:n_c, :kc], yc[:n_c, kc:2 * kc]
        tri_red = yc[:n_c, 2 * kc:]  # (n_c, ntri)
        pt = pt_table_from_kernel(t, n_pts, D=9)
        g_l = pt[:, :3]
        tri3 = pt[:, 3:]
        import numpy as _np
        tri_idx = _np.zeros((3, 3), _np.int32)
        for m, (a, b) in enumerate(_triu_pairs(3)):
            tri_idx[a, b] = tri_idx[b, a] = m
        H = tri3[:, tri_idx.reshape(-1)].reshape(n_pts, 3, 3)

    # unpack per-split full squares (n_c, ntri) into blocks
    blocks_c = []
    pos = 0
    for dim in splits:
        blocks_c.append(
            tri_red[:, pos:pos + dim * dim].reshape(-1, dim, dim))
        pos += dim * dim
    return g_r, diag_r, g_c, diag_c, blocks_c, g_l, H


def _precond_rig_kernel(rb, nhw, nhg, win, rbases_ref, hib_ref, rloc_ref,
                        ploc_ref, w_ref, h_ref, jr_ref, jp_ref, y_ref):
    i, c = pl.program_id(0), pl.program_id(1)
    base = pl.multiple_of(rbases_ref[i], 8)
    hb = pl.multiple_of(hib_ref[i], 8)

    if win:
        @pl.when(c == 0)
        def _():
            y_ref[0] = jnp.zeros_like(y_ref[0])
    else:
        @pl.when((i == 0) & (c == 0))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

    # gather the 9 H_ll^-1 entries per observation from the resident table
    hi, lo = _hi_lo(ploc_ref[0, 0])
    ohlo = _oh_t(lo, 128).astype(jnp.bfloat16)  # (128, tsc)
    ohhi = _oh_t(hi, nhw)  # (nhw, tsc) bool
    Hw = jnp.concatenate(
        [h_ref[pl.ds(j * nhg + hb, nhw), :] for j in range(9)], axis=0)
    Gt = _sel_dot(Hw, ohlo, ((1,), (0,)))  # (9*nhw, tsc)
    Jr = jr_ref[:]  # (d, k, tsc)
    Jp = jp_ref[:]  # (d, 3, tsc)
    w = w_ref[0, 0].astype(Jr.dtype)
    k, d = Jr.shape[1], Jr.shape[0]
    tsc = Jr.shape[2]
    # per-obs H_ll^-1 (3, 3, tsc), selected on the VPU
    H = jnp.stack([
        jnp.sum(jnp.where(ohhi, Gt[j * nhw:(j + 1) * nhw, :], 0.0), axis=0)
        for j in range(9)], axis=0).reshape(3, 3, tsc).astype(Jr.dtype)
    Jw = Jr * w[None, None, :]
    # DENSE stacked outer products: per-scalar (1, tsc) rows occupy one
    # sublane (1/8 of the VPU); (k, k, tsc) broadcasts run full-width.
    # d summed by explicit unroll (d == 2).
    A = sum(Jw[dd][:, None, :] * Jp[dd][None, :, :] for dd in range(d))
    C = sum(A[:, cc][:, None, :] * H[cc][None, :, :] for cc in range(3))
    B = sum(Jw[dd][:, None, :] * Jr[dd][None, :, :] for dd in range(d))
    corr = sum(C[:, cc][:, None, :] * A[:, cc][None, :, :]
               for cc in range(3))
    E = (B - corr).reshape(k * k, tsc)  # full square (host symmetrizes)
    ohr = _oh_t(rloc_ref[0, 0], rb).astype(jnp.bfloat16)  # (rb, tsc)
    part = _sel_dot(ohr, E, ((1,), (1,)))  # (rb, k*k)
    if win:
        y_ref[0] = y_ref[0] + part.astype(y_ref.dtype)
    else:
        y_ref[pl.ds(base, rb), :] = (y_ref[pl.ds(base, rb), :]
                                     + part.astype(y_ref.dtype))


def seg_precond_rig(J_r, J_p, w, rig_local, pt_local, hib, hinv, r_bases,
                    nt, ts, rb, nhw, nhg, n_rows):
    """(n_rows, k, k) rig-block preconditioner contributions
        sum_n  w J J^T  -  (J^T w J_p) H_inv (J^T w J_p)^T
    fused with the per-observation H_ll^-1 gather (hinv (n_pts, 3, 3) held
    VMEM-resident) — the lambda-dependent Schur self-correction of the
    block-Jacobi preconditioner without materializing (k, k, N) in HBM."""
    d, k, _ = J_r.shape
    if not use_pallas(J_r):
        rows = _to_pt_rows(pt_local, hib, nt, ts)
        hp = jnp.pad(hinv.reshape(-1, 9), ((0, nhg * 128 - hinv.shape[0]),
                                           (0, 0)))
        Hn = hp[rows].reshape(-1, 3, 3)  # (N, 3, 3)
        Jw = J_r * w[None, None, :]
        A = jnp.einsum("dan,dbn->abn", Jw, J_p)  # (k, 3, N)
        corr = jnp.einsum("abn,nbc,dcn->adn", A, Hn, A)
        B = jnp.einsum("dan,dbn->abn", Jw, J_r)
        E = (B - corr).reshape(k * k, -1)
        red = seg_reduce_table(E, rig_local, r_bases, nt, ts, rb, n_rows)
        return red.reshape(n_rows, k, k)
    tsc = _schur_chunk(ts, rb, nhw)
    nc = ts // tsc
    npad = ((n_rows + rb + 7) // 8) * 8
    # bf16 H_ll^-1 table (and callers pass bf16 J): the blocks feed the
    # block-Jacobi preconditioner only, so the selection dots run 1-split —
    # the LowerPrecSolvePrecond trade (reference Preconditioner.h:163).
    # engine._precond_inv carries the matching definiteness safeguard
    # (escalating diagonal bump, Preconditioner.h:186-219).
    hk = pt_table_to_kernel(hinv.reshape(-1, 9), nhg).astype(jnp.bfloat16)
    ntri = k * k
    win = not _rig_resident(npad, w.dtype)
    if win:
        y_spec = pl.BlockSpec((1, rb, ntri), lambda i, c, b, h: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((nt, rb, ntri), w.dtype)
    else:
        y_spec = pl.BlockSpec((npad, ntri), lambda i, c, b, h: (0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((npad, ntri), w.dtype)
    y = pl.pallas_call(
        partial(_precond_rig_kernel, rb, nhw, nhg, win),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt, nc),
            in_specs=[
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tsc), lambda i, c, b, h: (i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * nhg, 128), lambda i, c, b, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k, tsc),
                             lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3, tsc),
                             lambda i, c, b, h: (0, 0, i * (ts // tsc) + c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=y_spec,
        ),
        out_shape=y_shape,
    )(
        r_bases.astype(jnp.int32),
        hib.astype(jnp.int32),
        rig_local.reshape(nt, 1, ts).astype(jnp.int32),
        pt_local.reshape(nt, 1, ts).astype(jnp.int32),
        w.reshape(nt, 1, ts),
        hk,
        J_r,
        J_p,
    )
    if win:
        y = scatter_partials(y, _rows_from_bases(r_bases, nt, rb), n_rows, rb)
    else:
        y = y[:n_rows]
    M = y.reshape(n_rows, k, k)
    # exact symmetry (CG needs a symmetric preconditioner; the dense corr
    # accumulation can differ in the last ulp between (a,b) and (b,a))
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


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
