"""Compile-and-run probe for the capacity scales on the real TPU.

The reference's whole point of the direct->PCG solver switch
(viba/common/Settings.cpp:296-320, Constants.h:15) is that >20k-rig
sessions WORK; BENCH_r04 showed our one-jit LM iteration compile-OOMing
the 16 MiB scoped-VMEM stack at 21.6k rigs (grid-resident rig tables in
ops/segments.py). This probe builds a capacity-shaped problem and runs
TWO chained one-jit iterations on the chip — it exercises compile AND
execute of every kernel in the full k_iter program at the given scale.

Usage: python tools_dev/capacity_compile_probe.py [duration] [kf_hz] [points]
Defaults to the bench PCG-switch shape (1800 s x 12 Hz = 21.6k rigs).
"""

import sys
import time


def main():
    sys.path.insert(0, ".")
    import bench

    dur = float(sys.argv[1]) if len(sys.argv) > 1 else bench.PCGSW_DURATION
    hz = float(sys.argv[2]) if len(sys.argv) > 2 else bench.PCGSW_KEYFRAME_HZ
    pts = int(sys.argv[3]) if len(sys.argv) > 3 else bench.PCGSW_POINTS
    t0 = time.time()
    problem = bench.build_capacity_problem(dur, hz, pts)
    n_rigs = int(problem.variables.pose_q.shape[0])
    print(f"[probe] built {n_rigs} rigs in {time.time() - t0:.0f}s",
          flush=True)
    t0 = time.time()
    ips, cost = bench.timed_iterations(problem, 2)
    print(f"[probe] OK {n_rigs} rigs: {ips:.3f} iters/s (cost {cost:.4e}); "
          f"compile+run {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
