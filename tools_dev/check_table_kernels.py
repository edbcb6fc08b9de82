"""Dev check: table-resident Pallas segment kernels vs their XLA fallbacks.

Runs on the real TPU (the fallbacks are exact one-hot matmuls, so outputs
must agree to f32 reduction-order noise). Usage:
  python tools_dev/check_table_kernels.py
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from visual_inertial_bundle_adjustment_tpu.ops import segments as seg


def make_plan(rng, n_rows, n_obs, rb, ts):
    """Random sorted keys + ragged tile plan with 8-aligned bases
    (mirrors rcs._tile_plan)."""
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
        local[t * ts : t * ts + (e - s)] = keys[s:e] - bases[t]
        w[t * ts : t * ts + (e - s)] = rng.random(e - s) + 0.1
    return (jnp.asarray(local), jnp.asarray(w),
            jnp.asarray(np.asarray(bases, np.int32)), nt)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    d, k = 2, 12
    n_rows, n_obs, rb, ts = 1200, 200_000, 128, 4096
    local, w, bases, nt = make_plan(rng, n_rows, n_obs, rb, ts)
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

    def cmp(name, a, b, tol=1e-5):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-30
        err = np.abs(a - b).max() / scale
        print(f"  {name:28s} rel-err {err:.2e}  {'OK' if err < tol else 'FAIL'}")
        assert err < tol, name

    print(f"plan: nt={nt} npad={npad} n_rows={n_rows}")

    (wu_t, y_t), (wu_r, y_r) = run(
        lambda J, w, x: seg.seg_mv_fused_table(J, w, x, local, bases, nt, ts, rb),
        J, w, x)
    cmp("seg_mv_fused_table.wu", wu_t, wu_r)
    cmp("seg_mv_fused_table.y", y_t, y_r)

    g_t, g_r = run(
        lambda J, x: seg.seg_mv_gather_table(J, x, local, bases, nt, ts, rb),
        J, x)
    cmp("seg_mv_gather_table", g_t, g_r)

    s_t, s_r = run(
        lambda J, u: seg.seg_mv_scatter_table(J, u, local, bases, nt, ts, rb,
                                              n_rows), J, u)
    cmp("seg_mv_scatter_table", s_t, s_r)

    r_t, r_r = run(
        lambda c: seg.seg_reduce_table(c, local, bases, nt, ts, rb, n_rows), c)
    cmp("seg_reduce_table", r_t, r_r)

    # single-pass Schur kernels (rig grid, bounded point windows, resident
    # point table): point ids correlated with rig ids so windows are bounded
    pt_keys = np.minimum(
        (np.asarray(local) + np.repeat(np.asarray(bases), ts)) * 2,
        3 * n_rows - 1).astype(np.int64)
    n_pts = int(pt_keys.max()) + 1
    base2 = []
    for t in range(nt):
        seg_keys = pt_keys[t * ts : (t + 1) * ts][np.asarray(w)[t * ts : (t + 1) * ts] > 0]
        base2.append((int(seg_keys.min()) & ~1023) if len(seg_keys) else 0)
    base2 = np.asarray(base2, np.int64)
    span = max(int((pt_keys[t * ts : (t + 1) * ts].max()) - base2[t]) + 1
               for t in range(nt))
    nhw = ((-(-span // 128)) + 7) // 8 * 8
    hib = (base2 >> 7).astype(np.int32)
    nhg = ((max(-(-n_pts // 128), int(hib.max()) + nhw)) + 7) // 8 * 8
    print(f"schur plan: n_pts={n_pts} nhw={nhw} nhg={nhg}")
    ploc = (pt_keys - np.repeat(base2, ts)).astype(np.int32)
    ploc[np.asarray(w) <= 0] = 0
    ploc_j = jnp.asarray(ploc)
    hib_j = jnp.asarray(hib)
    Jp = jnp.asarray(rng.standard_normal((d, 3, npad)), jnp.float32)
    zz = jnp.asarray(rng.standard_normal((n_pts, 3)), jnp.float32)

    (yd_t, tp_t), (yd_r, tp_r) = run(
        lambda J, Jp, w, x: seg.seg_schur_down(
            J, Jp, w, local, ploc_j, hib_j, x, bases, n_pts, nt, ts, rb,
            nhw, nhg),
        J, Jp, w, x)
    cmp("seg_schur_down.y", yd_t, yd_r, tol=2e-6)
    cmp("seg_schur_down.t", tp_t, tp_r, tol=2e-6)

    yu_t, yu_r = run(
        lambda J, Jp, w, z: seg.seg_schur_up(
            J, Jp, w, local, ploc_j, hib_j, z, bases, nt, ts, rb, nhw, nhg,
            n_rows),
        J, Jp, w, zz)
    cmp("seg_schur_up", yu_t, yu_r, tol=2e-6)

    # fused per-lambda preconditioner kernel
    Hs = rng.standard_normal((n_pts, 3, 3)).astype(np.float32)
    Hs = jnp.asarray(Hs + np.swapaxes(Hs, 1, 2))  # symmetric like H_ll^-1
    pr_t, pr_r = run(
        lambda J, Jp, w, H: seg.seg_precond_rig(
            J, Jp, w, local, ploc_j, hib_j, H, bases, nt, ts, rb, nhw, nhg,
            n_rows),
        J, Jp, w, Hs)
    # the Pallas path rounds the H_ll^-1 table to bf16 (preconditioner-
    # only blocks, the LowerPrecSolvePrecond trade — ops/segments.py
    # seg_precond_rig); vs the f32-exact fallback the bound is bf16-level
    cmp("seg_precond_rig", pr_t, pr_r, tol=3e-2)

    # fused assembly kernel
    resv = jnp.asarray(rng.standard_normal((d, npad)), jnp.float32)
    (ga_t, da_t, gla_t, Ha_t), (ga_r, da_r, gla_r, Ha_r) = run(
        lambda J, Jp, res, w: seg.seg_assemble_rig(
            J, Jp, res, w, local, ploc_j, hib_j, bases, n_pts, nt, ts, rb,
            nhw, nhg, n_rows),
        J, Jp, resv, w)
    cmp("seg_assemble_rig.g_r", ga_t, ga_r, tol=2e-6)
    cmp("seg_assemble_rig.diag", da_t, da_r, tol=2e-6)
    cmp("seg_assemble_rig.g_l", gla_t, gla_r, tol=2e-6)
    cmp("seg_assemble_rig.H", Ha_t, Ha_r, tol=2e-6)
    wres_d = np.asarray(resv) * np.asarray(w)[None, :]
    keys_d = (np.asarray(local) + np.repeat(np.asarray(bases), ts)).astype(np.int64)
    ga_d = np.zeros((n_rows, k)); da_d = np.zeros((n_rows, k))
    np.add.at(ga_d, keys_d, np.einsum("dkn,dn->nk", np.asarray(J), wres_d))
    np.add.at(da_d, keys_d, np.einsum("dkn,dkn->nk", np.asarray(J),
                                      np.asarray(J) * np.asarray(w)[None, None, :]))
    gla_d = np.zeros((n_pts, 3)); Ha_d = np.zeros((n_pts, 3, 3))
    np.add.at(gla_d, pt_keys, np.einsum("dbn,dn->nb", np.asarray(Jp), wres_d))
    np.add.at(Ha_d, pt_keys, np.einsum("dan,dbn->nab",
                                       np.asarray(Jp) * np.asarray(w)[None, None, :],
                                       np.asarray(Jp)))
    cmp("assemble.g_r vs dense", ga_t, ga_d)
    cmp("assemble.diag vs dense", da_t, da_d)
    cmp("assemble.g_l vs dense", gla_t, gla_d)
    cmp("assemble.H vs dense", Ha_t, Ha_d)

    # dense cross-checks of the Schur kernels
    keys_dense = (np.asarray(local) +
                  np.repeat(np.asarray(bases), ts)).astype(np.int64)
    xg_d = np.asarray(x)[keys_dense]
    wu_d = np.einsum("dkn,nk->dn", np.asarray(J), xg_d) * np.asarray(w)[None, :]
    y_d = np.zeros((n_rows, k), np.float64)
    np.add.at(y_d, keys_dense, np.einsum("dkn,dn->kn", np.asarray(J), wu_d).T)
    cmp("schur_down.y vs dense", yd_t, y_d.astype(np.float32))
    tp_d = np.zeros((n_pts, 3), np.float64)
    np.add.at(tp_d, pt_keys, np.einsum("dkn,dn->kn", np.asarray(Jp), wu_d).T)
    cmp("schur_down.t vs dense", tp_t, tp_d)
    zg_d = np.asarray(zz)[pt_keys]
    wu2_d = np.einsum("dkn,nk->dn", np.asarray(Jp), zg_d) * np.asarray(w)[None, :]
    yu_d = np.zeros((n_rows, k), np.float64)
    np.add.at(yu_d, keys_dense, np.einsum("dkn,dn->kn", np.asarray(J), wu2_d).T)
    cmp("schur_up vs dense", yu_t, yu_d.astype(np.float32))
    Jw_d = np.asarray(J) * np.asarray(w)[None, None, :]
    A_d = np.einsum("dan,dbn->abn", Jw_d, np.asarray(Jp))
    Hn_d = np.asarray(Hs)[pt_keys]
    E_d = (np.einsum("dan,dbn->abn", Jw_d, np.asarray(J))
           - np.einsum("abn,nbc,dcn->adn", A_d, Hn_d, A_d))
    pr_d = np.zeros((n_rows, k, k), np.float64)
    np.add.at(pr_d, keys_dense, np.moveaxis(E_d, -1, 0))
    cmp("precond_rig vs dense", pr_t, pr_d, tol=3e-2)  # bf16 H table

    # dense cross-check of the fused kernel against plain segment ops
    keys_full = np.zeros(npad, np.int64)
    keys_full = (np.asarray(local) +
                 np.repeat(np.asarray(bases), ts)).astype(np.int64)
    xg = np.asarray(x)[keys_full]
    uu = np.einsum("dkn,nk->dn", np.asarray(J), xg) * np.asarray(w)[None, :]
    contrib = np.einsum("dkn,dn->kn", np.asarray(J), uu)
    y_dense = np.zeros((n_rows, k), np.float64)
    np.add.at(y_dense, keys_full, contrib.T)
    cmp("fused.wu vs dense", wu_t, uu)
    cmp("fused.y vs dense", y_t, y_dense.astype(np.float32))

    # windowed (per-tile HBM partial) mode of the rig-grid kernels — the
    # >14k-rig capacity path (BENCH_r04 scoped-VMEM OOM fix): forced on at
    # this small shape, must match the resident mode to reduction-order noise
    saved = seg.RIG_RESIDENT_MAX_BYTES
    try:
        seg.RIG_RESIDENT_MAX_BYTES = 0
        (gaw, daw, glaw, Haw) = jax.jit(
            lambda J, Jp, res, w: seg.seg_assemble_rig(
                J, Jp, res, w, local, ploc_j, hib_j, bases, n_pts, nt, ts,
                rb, nhw, nhg, n_rows))(J, Jp, resv, w)
        cmp("assemble.g_r windowed", gaw, ga_t, tol=2e-5)
        cmp("assemble.diag windowed", daw, da_t, tol=2e-5)
        cmp("assemble.g_l windowed", glaw, gla_t, tol=2e-5)
        cmp("assemble.H windowed", Haw, Ha_t, tol=2e-5)
        yw = jax.jit(lambda J, Jp, w, x, H: seg.seg_schur_pcg(
            J, Jp, w, local, ploc_j, hib_j, x, H, bases, n_pts, nt, ts, rb,
            nhw, nhg))(J, Jp, w, x, Hs)
        ynr = jax.jit(lambda J, Jp, w, x, H: seg.seg_schur_pcg(
            J, Jp, w, local, ploc_j, hib_j, x, H, bases, n_pts, nt, ts, rb,
            nhw, nhg))
        seg.RIG_RESIDENT_MAX_BYTES = saved
        cmp("schur_pcg windowed", yw, ynr(J, Jp, w, x, Hs), tol=2e-5)
        seg.RIG_RESIDENT_MAX_BYTES = 0
        prw = jax.jit(lambda J, Jp, w, H: seg.seg_precond_rig(
            J, Jp, w, local, ploc_j, hib_j, H, bases, nt, ts, rb, nhw, nhg,
            n_rows))(J, Jp, w, Hs)
        cmp("precond_rig windowed", prw, pr_t, tol=2e-5)
    finally:
        seg.RIG_RESIDENT_MAX_BYTES = saved
    print("all ok")


if __name__ == "__main__":
    main()
