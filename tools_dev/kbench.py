"""Standalone kernel benchmarks at the full-sensor bench scale (synthetic
data, no session build): chained-marginal timing of the Schur matvec /
assemble / preconditioner kernels and parameter sweeps (chunk size, splits).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools_dev/kbench.py [which]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from visual_inertial_bundle_adjustment_tpu.ops import segments as seg

# full-sensor bench shape
NT, TS, RB, WB, NHW, NHG = 427, 4096, 128, 16, 16, 312
D, K, KC = 2, 9, 23
N_R, N_C, N_PTS = 6000, 244, 39000


def mkdata(seed=0):
    rng = np.random.default_rng(seed)
    N = NT * TS
    rig_local = rng.integers(0, RB - 8, N).astype(np.int32)
    cal_local = rng.integers(0, WB - 1, N).astype(np.int32)
    pt_local = rng.integers(0, NHW * 128, N).astype(np.int32)
    hib = (np.clip(rng.integers(0, max(NHG - NHW, 1), NT), 0, NHG - NHW)
           & ~7).astype(np.int32)
    r_bases = (rng.integers(0, N_R - RB, NT) & ~7).astype(np.int32)
    c_bases = (rng.integers(0, max(N_C - WB, 1), NT) & ~7).astype(np.int32)
    w = rng.random(N).astype(np.float32)
    J_r = rng.standard_normal((D, K, N)).astype(np.float32).astype(jnp.bfloat16)
    J_c = rng.standard_normal((D, KC, N)).astype(np.float32).astype(jnp.bfloat16)
    J_p = rng.standard_normal((D, 3, N)).astype(np.float32).astype(jnp.bfloat16)
    x_r = rng.standard_normal((N_R, K)).astype(np.float32)
    x_c = rng.standard_normal((N_C, KC)).astype(np.float32)
    hinv = np.tile(np.eye(3, dtype=np.float32), (N_PTS, 1, 1))
    res = rng.standard_normal((D, N)).astype(np.float32)
    put = lambda a: jax.device_put(jnp.asarray(a))  # noqa: E731
    return {k: put(v) for k, v in dict(
        rig_local=rig_local, cal_local=cal_local, pt_local=pt_local, hib=hib,
        r_bases=r_bases, c_bases=c_bases, w=w, J_r=J_r, J_c=J_c, J_p=J_p,
        x_r=x_r, x_c=x_c, hinv=hinv, res=res).items()}


def marginal(make, k1=1, k2=21, n=3, tag="", args=()):
    """Marginal per-kernel-call device time: k in-jit chained calls, timed
    end-to-end with a SCALAR FETCH (float()) per repetition.

    Through the axon tunnel `jax.block_until_ready` does not wait for remote
    execution, and identical execution requests are served from a cache —
    so (a) every timing repetition must force a sync via an actual value
    fetch, and (b) the in-jit loop must chain data dependencies so the k
    calls cannot collapse. The k2-k1 marginal removes the per-call RPC
    round-trip (~40 ms) that would otherwise swamp the kernel time."""
    f1, f2 = jax.jit(make(k1)), jax.jit(make(k2))

    def t(f):
        # each repetition gets a DISTINCT seed scalar: identical execution
        # requests would be served from the tunnel cache, not the device
        _ = float(f(*args, jnp.float32(0.5)))
        _ = float(f(*args, jnp.float32(0.75)))
        t0 = time.time()
        for _i in range(n):
            _ = float(f(*args, jnp.float32(1.0 + 0.001 * _i)))
        return (time.time() - t0) / n
    t1, t2 = t(f1), t(f2)
    m = (t2 - t1) / (k2 - k1)
    print(f"  {tag:46s} {m * 1e3:9.3f} ms (c{k1}={t1*1e3:.2f}, c{k2}={t2*1e3:.2f})", flush=True)
    return m


def bench_matvec(d):
    def down(k):
        def f(d, s):
            acc = 0.0
            xr = d["x_r"] * s
            for i in range(k):
                y_r, y_c, t = seg.seg_schur_down_cal(
                    d["J_r"], d["J_c"], d["J_p"], d["w"], d["rig_local"],
                    d["cal_local"], d["pt_local"], d["hib"], xr * (1 + 1e-6 * i),
                    d["x_c"], d["r_bases"], d["c_bases"], N_PTS, NT, TS, RB,
                    WB, NHW, NHG)
                acc = acc + y_r[0, 0] + t[0, 0]
            return acc
        return f
    marginal(down, tag="seg_schur_down_cal", args=(d,))

    def up(k):
        def f(d, s):
            acc = 0.0
            z = jnp.full((N_PTS, 3), s, jnp.float32)
            for i in range(k):
                y_r, y_c = seg.seg_schur_up_cal(
                    d["J_r"], d["J_c"], d["J_p"], d["w"], d["rig_local"],
                    d["cal_local"], d["pt_local"], d["hib"], z * (1 + 1e-6 * i),
                    d["r_bases"], d["c_bases"], NT, TS, RB, WB, NHW, NHG,
                    N_R, N_C)
                acc = acc + y_r[0, 0] + y_c[0, 0]
            return acc
        return f
    marginal(up, tag="seg_schur_up_cal", args=(d,))

    def fused(k):
        def f(d, s):
            acc = 0.0
            xr = d["x_r"] * s
            for i in range(k):
                y_r, y_c = seg.seg_schur_pcg_cal(
                    d["J_r"], d["J_c"], d["J_p"], d["w"], d["rig_local"],
                    d["cal_local"], d["pt_local"], d["hib"], xr * (1 + 1e-6 * i),
                    d["x_c"], d["hinv"], d["r_bases"], d["c_bases"], N_PTS,
                    NT, TS, RB, WB, NHW, NHG)
                acc = acc + y_r[0, 0] + y_c[0, 0]
            return acc
        return f
    marginal(fused, tag="seg_schur_pcg_cal (fused)", args=(d,))


def bench_precond(d):
    def pre(k):
        def f(d, s):
            acc = 0.0
            for i in range(k):
                B = seg.seg_precond_rig(
                    d["J_r"], d["J_p"], d["w"] * (s + 1e-6 * i),
                    d["rig_local"], d["pt_local"], d["hib"], d["hinv"],
                    d["r_bases"], NT, TS, RB, NHW, NHG, N_R)
                acc = acc + B[0, 0, 0]
            return acc
        return f
    marginal(pre, tag="seg_precond_rig", args=(d,))


def bench_assemble(d):
    def asm(k):
        def f(d, s):
            acc = 0.0
            for i in range(k):
                out = seg.seg_assemble_cal(
                    d["J_r"], d["J_c"], d["J_p"], d["res"],
                    d["w"] * (s + 1e-6 * i), d["rig_local"], d["cal_local"],
                    d["pt_local"], d["hib"], d["r_bases"], d["c_bases"],
                    N_PTS, NT, TS, RB, WB, NHW, NHG, N_R, N_C, (6, 17))
                acc = acc + out[0][0, 0]
            return acc
        return f
    marginal(asm, tag="seg_assemble_cal", args=(d,))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    d = mkdata()
    if which in ("all", "matvec"):
        bench_matvec(d)
    if which in ("all", "precond"):
        bench_precond(d)
    if which in ("all", "assemble"):
        bench_assemble(d)


if __name__ == "__main__":
    main()
