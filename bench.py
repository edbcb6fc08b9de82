"""Benchmark: LM iterations/sec of the full VI-BA step on real hardware.

Prints a JSON line {"metric", "value", "unit", "vs_baseline", "extra"}
INCREMENTALLY — re-emitted with the fields measured so far after EVERY
stage, so the last line on stdout always carries the maximal information
and a driver timeout cannot erase already-measured numbers (BENCH_r04
recorded nothing because the single final print sat behind ~15 min of CPU
baselines). CPU baselines are cached in bench_cpu_cache.json (committed;
keyed by the workload signature) and only re-measured on a cache miss or
VIBA_BENCH_REFRESH_CPU=1; a global deadline (VIBA_BENCH_BUDGET_SEC,
default 1500 s) skips optional stages rather than overrunning.

Two configs, both timed as one full LM iteration (linearize -> assemble ->
40-iteration PCG Schur solve -> retract -> comparable cost — the reference's
per-iteration work, Optimizer.cpp:768-1106, at its default PCG budget):

  1. headline — 2-minute session, 10 Hz keyframes, IMU bias estimation
     (BASELINE config-1/2 shape); `value` + `vs_baseline`.
  2. extra.full_sensor_iters_per_sec — BASELINE config-3/4 shape: 10-minute
     session through the FULL session pipeline (files -> SessionAdapter),
     rolling-shutter camera with readout + time-offset estimation, dual IMU,
     ALL calibration groups random-walking over 5 s windows with factory
     priors and omega priors.

Landmark tracks carry a finite lifetime (TRACK_LIFETIME) as on real
recordings — whole-session tracks would make the reduced camera system
unrealistically dense and distort both the TPU timing and the baselines.

vs_baseline: speedup vs the REFERENCE-FORMULATION direct solver on the host
CPU (assembled sparse Hessian + landmark Schur + SuperLU,
tools_dev/cpu_reference_baseline.py — the algorithm class of the reference's
direct mode, since ark_vi_ba itself cannot be built here). The same-algorithm
CPU number is also reported. See BASELINE.md for how to read the ratios.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

DURATION = 120.0
KEYFRAME_HZ = 10.0
NUM_POINTS = 20000
TRACK_LIFETIME = 10.0  # real feature tracks live seconds; whole-session
# tracks would make the reduced camera system unrealistically dense
TIMED_ITERS = 10
CPU_TIMED_ITERS = 2
FULL_DURATION = 600.0
FULL_POINTS = 60000
FULL_TIMED_ITERS = 5


# --- problem-build cache ----------------------------------------------------
# The four synthetic problem builds (host-side numpy: observation
# generation, triangulation, preintegration) cost ~12 min of the driver's
# bench budget and are deterministic in the workload constants. Built
# problems are pickled (host arrays) into a per-machine cache dir; a cache
# hit restores in seconds. Keyed by the workload parameters — delete
# /tmp/viba_bench_problems (or set VIBA_BENCH_PROBLEM_CACHE=0) after
# changing builder/pipeline code if stale shapes are suspected.

_PROBLEM_CACHE_DIR = os.environ.get("VIBA_BENCH_PROBLEM_CACHE_DIR",
                                    "/tmp/viba_bench_problems")


def _problem_cache(key, build):
    import pickle

    import jax
    import numpy as np

    if os.environ.get("VIBA_BENCH_PROBLEM_CACHE", "1") == "0":
        return build()

    def to_host(tree):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "shape") else a, tree)

    path = os.path.join(_PROBLEM_CACHE_DIR, key + ".pkl")
    try:
        with open(path, "rb") as f:
            state = pickle.load(f)
        from visual_inertial_bundle_adjustment_tpu.problem.optimizer import (
            Problem,
        )

        # committed device placement, like the build paths (_put_default):
        # jit executable keys depend on the committed bit
        problem = Problem(jax.device_put(state["variables"]),
                          jax.device_put(state["masks"]))
        problem.cfgs = list(state["cfgs"])
        problem.datas = [jax.device_put(d) for d in state["datas"]]
        _note(f"problem '{key}' from cache ({path})")
        return problem
    except FileNotFoundError:
        pass
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"problem cache read failed ({key}): {e}\n")
    problem = build()
    try:
        os.makedirs(_PROBLEM_CACHE_DIR, exist_ok=True)
        state = {
            "variables": to_host(problem.variables),
            "masks": to_host(problem.masks),
            "cfgs": list(problem.cfgs),
            "datas": [to_host(d) for d in problem.datas],
        }
        blob = pickle.dumps(state, -1)
        with open(path + ".tmp", "wb") as f:
            f.write(blob)
        os.replace(path + ".tmp", path)
        _note(f"problem '{key}' cached ({len(blob) // 2**20} MB)")
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"problem cache write failed ({key}): {e}\n")
    return problem


def build_problem():
    def _build():
        from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
            BuildOptions,
            build_synthetic_problem,
        )
        from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import (
            SyntheticSession,
        )

        s = SyntheticSession(
            duration=DURATION, keyframe_hz=KEYFRAME_HZ, gyro_hz=800.0,
            accel_hz=800.0, num_points=NUM_POINTS, seed=17, pixel_noise=0.3,
            track_lifetime_sec=TRACK_LIFETIME,
        )
        return build_synthetic_problem(
            s,
            BuildOptions(
                init_pose_noise=0.005, init_point_noise=0.03,
                init_vel_noise=0.03, estimate_imu_calib=True,
                imu_calib_options=dict(accelBias=True, gyroBias=True),
            ),
        )

    return _problem_cache(
        f"bias_{DURATION:g}_{KEYFRAME_HZ:g}_{NUM_POINTS}_{TRACK_LIFETIME:g}",
        _build)


def build_full_sensor_problem(tmpdir):
    """BASELINE config-3/4 shape via the full session pipeline."""

    def _build():
        from visual_inertial_bundle_adjustment_tpu.pipeline import (
            session_data as sio,
        )
        from visual_inertial_bundle_adjustment_tpu.pipeline.adapter import (
            AdapterOptions,
            SessionAdapter,
        )
        from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import (
            SyntheticSession,
        )
        from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic_io import (
            write_session_dir,
        )

        s = SyntheticSession(
            duration=FULL_DURATION, keyframe_hz=KEYFRAME_HZ, gyro_hz=800.0,
            accel_hz=800.0, num_points=FULL_POINTS, seed=23, pixel_noise=0.3,
            track_lifetime_sec=TRACK_LIFETIME,
        )
        write_session_dir(s, tmpdir, num_imus=2, readout_time_sec=0.03,
                          seed=23)
        sd = sio.load_session(tmpdir)
        adapter = SessionAdapter(
            sd,
            AdapterOptions(estimate_readout=True,
                           estimate_cam_time_offset=True),
            log=lambda *a: None,
        )
        return adapter.build()

    return _problem_cache(
        f"full_{FULL_DURATION:g}_{KEYFRAME_HZ:g}_{FULL_POINTS}_"
        f"{TRACK_LIFETIME:g}", _build)


CAP_DURATION = 1800.0  # 30-minute capacity config (reference README.md:10-11)
CAP_KEYFRAME_HZ = 10.0  # reference keyframe density: 18k rigs over 30 min
CAP_POINTS = 60000
CAP_TIMED_ITERS = 3
# >20k-rig shape: crosses the reference's auto solver switch
# (Settings.cpp:296-320 / Constants.h:15 — PCG with Gauss-Seidel
# preconditioning above 20000 rigs instead of the direct mode)
PCGSW_DURATION = 1800.0
PCGSW_KEYFRAME_HZ = 12.0  # 21.6k rigs
PCGSW_POINTS = 60000


def build_capacity_problem(duration=None, keyframe_hz=None, points=None):
    """Config-5 shape: 30 minutes at reference keyframe density (10 Hz ->
    18k rigs), 360 calibration windows, finite-lifetime tracks, IMU calib
    random-walking — the capacity claim of the reference (README.md:10-11)
    on ONE chip."""
    duration = duration or CAP_DURATION
    keyframe_hz = keyframe_hz or CAP_KEYFRAME_HZ
    points = points or CAP_POINTS

    def _build():
        from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
            BuildOptions,
            build_synthetic_problem,
        )
        from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import (
            SyntheticSession,
        )

        s = SyntheticSession(
            duration=duration, keyframe_hz=keyframe_hz, gyro_hz=150.0,
            accel_hz=150.0, num_points=points, seed=31,
            pixel_noise=0.3, track_lifetime_sec=12.0,
        )
        return build_synthetic_problem(
            s,
            BuildOptions(
                init_pose_noise=0.005, init_point_noise=0.03,
                init_vel_noise=0.03, estimate_imu_calib=True,
                imu_calib_options=dict(accelBias=True, gyroBias=True),
            ),
        )

    return _problem_cache(
        f"cap_{duration:g}_{keyframe_hz:g}_{points}", _build)


def _device_peak_hbm_gb():
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        for key in ("peak_bytes_in_use", "bytes_in_use"):
            if stats and key in stats:
                return round(stats[key] / 2**30, 3)
    except Exception:  # noqa: BLE001
        pass
    try:
        # tunneled devices expose no memory_stats: report live array bytes
        # (a floor on residency, not a true peak)
        dev = jax.devices()[0]
        live = sum(
            x.nbytes for x in jax.live_arrays()
            if any(d == dev for d in getattr(x, "devices", lambda: [])()))
        if live:
            return round(live / 2**30, 3)
    except Exception:  # noqa: BLE001
        pass
    return None


def run_capacity():
    try:
        _note("building 30-min capacity problem...")
        problem = build_capacity_problem()
        n_obs = sum(
            int(d["rig"].shape[0]) for c, d in zip(problem.cfgs, problem.datas)
            if c.kind in ("visual", "rs_visual"))
        _note(f"capacity: {int(problem.variables.pose_q.shape[0])} rigs, "
              f"{n_obs} obs; timing...")
        ips, _ = timed_iterations(problem, CAP_TIMED_ITERS)
        hbm = _device_peak_hbm_gb()
        _note(f"capacity 30-min: {ips:.3f} iters/s, peak HBM {hbm} GB")
        return ips, hbm, problem
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"capacity config failed: {e}\n")
        return None, None, None


COV_COLS = 12  # one full rig block of covariance columns (rot+vel+pos+omega)


def run_capacity_covariance(problem):
    """Covariance columns THROUGH THE BLOCKED ENGINE at the capacity scale
    (round-3 VERDICT ask #4's measured half): one linearization+assembly,
    then one rig's 12 tangent columns of H^-1 solved against the single-pass
    Schur kernels — the analog of the reference's factor-once/solve-many
    covariance path (Optimizer.cpp:574-604)."""
    if problem is None:
        return None
    try:
        import jax

        from visual_inertial_bundle_adjustment_tpu.problem import (
            covariance as cov,
        )

        _note(f"capacity covariance: preparing blocked system...")
        with cov.with_gauge_prior(problem):
            system = cov.prepare_system(problem, lam=1e-6)
            assert cov.system_is_blocked(system), "expected the blocked path"
            mid = int(problem.variables.pose_q.shape[0]) // 2
            entries = [("rig", mid, d) for d in range(COV_COLS)]
            # compile + warm on a 1-column solve, then time the full block
            warm = cov.solve_columns(problem, entries[:1], system=system,
                                     pcg_iters=200, pcg_tol=1e-8)
            jax.block_until_ready(warm)
            t0 = time.time()
            cols = cov.solve_columns(problem, entries, system=system,
                                     pcg_iters=200, pcg_tol=1e-8)
            jax.block_until_ready(cols)
            cps = COV_COLS / (time.time() - t0)
        _note(f"capacity covariance: {cps:.3f} cols/s")
        return cps
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"capacity covariance failed: {e}\n")
        return None


def run_pcg_switch():
    """>20k rigs: the scale where the reference's pickSolverType switches to
    Gauss-Seidel-preconditioned PCG (Settings.cpp:296-320). Asserts our
    pick_solver makes the same choice and times the iteration in that mode."""
    from visual_inertial_bundle_adjustment_tpu.problem.optimizer import (
        LMSettings,
        pick_solver,
    )

    # the solver-switch parity assertion must fail LOUDLY (a regression here
    # is a correctness bug, not a bench hiccup) — only the timing below is
    # allowed to degrade to null
    n_rigs_expect = int(PCGSW_DURATION * PCGSW_KEYFRAME_HZ)
    st = pick_solver(LMSettings(), n_rigs_expect, "auto")
    assert not st.direct_mode and st.preconditioner == "gauss_seidel", (
        n_rigs_expect, st.direct_mode, st.preconditioner)
    try:
        _note("building >20k-rig PCG-switch problem...")
        problem = build_capacity_problem(
            PCGSW_DURATION, PCGSW_KEYFRAME_HZ, PCGSW_POINTS)
        n_rigs = int(problem.variables.pose_q.shape[0])
        assert n_rigs == n_rigs_expect, (n_rigs, n_rigs_expect)
        _note(f"pcg-switch: {n_rigs} rigs -> auto solver = "
              f"pcg/{st.preconditioner}; timing...")
        ips, _ = timed_iterations(problem, CAP_TIMED_ITERS,
                                  pcg_iters=st.pcg_max_iterations)
        _note(f"pcg-switch {n_rigs} rigs: {ips:.3f} iters/s")
        return ips, n_rigs
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"pcg-switch config failed: {e}\n")
        return None, None


def timed_iterations(problem, n_iters, pcg_iters=40):
    import jax
    import jax.numpy as jnp

    from visual_inertial_bundle_adjustment_tpu.problem.structure import t_scale

    (k_lin, k_solve, k_resolve, k_cost, k_grad, k_retract,
     k_assemble, k_step) = problem._build()
    datas = tuple(problem.datas)
    v, masks = problem.variables, problem.masks
    dtype = v.points.dtype
    lam = jnp.asarray(1e-4, dtype)
    k_iter = getattr(problem, "_k_iter", None)
    k_carry = getattr(problem, "_k_carry", None)

    if k_carry is not None:
        # carry chain — the path optimize() takes on the accept fast path:
        # each call solves from the carried (lg, asm), retracts, and
        # linearizes+assembles at v_new for the NEXT link; comparable cost
        # is bookkeeping over the two linearizations (no res-only pass).
        # The bigger fused program can hit compile limits at capacity
        # scales where k_iter still fits — degrade exactly like optimize()
        try:
            lg0 = k_lin(datas, v, masks, None)
            asm0 = k_assemble(datas, lg0, v, masks)

            def one_iter(state):
                v1, lg1, asm1 = state
                out, lg2, asm2 = k_carry(datas, lg1, asm1, v1, masks, lam,
                                         pcg_iters, 1e-10)
                return (out[7], lg2, asm2), out[9]

            state0 = (v, lg0, asm0)
            s2, stats = one_iter(state0)  # compiles the carry program
        except Exception as e:  # noqa: BLE001
            from visual_inertial_bundle_adjustment_tpu.problem.optimizer import (
                _is_compile_failure,
            )

            if not _is_compile_failure(e):
                raise
            _note(f"carry iteration failed to compile ({type(e).__name__});"
                  " falling back to k_iter")
            k_carry = None
    if k_carry is not None:
        pass  # one_iter/state0 set above
    elif k_iter is not None:
        # whole LM iteration in ONE jit call (one tunnel round-trip)
        def one_iter(v):
            _, _, out = k_iter(datas, v, masks, None, lam, pcg_iters, 1e-10)
            return out[7], out[9]

        state0 = v
    else:
        def one_iter(v):
            lg = k_lin(datas, v, masks, None)
            asm = k_assemble(datas, lg, v, masks)
            out = k_step(asm, datas, lg, v, masks, lam, pcg_iters, 1e-10)
            v2, stats = out[7], out[9]
            return v2, stats

        state0 = v

    # warmup/compile — TWO chained calls: the first compiles at the
    # fresh-variables signature, the second at the jit-output signature the
    # chained loop actually runs on (layouts differ; a single warmup leaves
    # a ~40 s remote recompile INSIDE the timed window — this was the
    # source of the bogus 0.085 iters/s full-sensor number in BENCH_r02).
    # Syncs are SCALAR FETCHES, not block_until_ready: through the axon
    # tunnel block_until_ready returns at enqueue, so a chained loop short
    # enough to fit the dispatch queue would otherwise time pure dispatch
    # (observed: a fantasy 262 it/s at the full-sensor shape). float() of
    # the last iteration's cost depends on the whole chain -> real sync;
    # its single ~50 ms RPC amortizes across the iterations.
    s2, stats = one_iter(state0)
    s2, stats = one_iter(s2)
    float(stats.cost)
    t0 = time.time()
    for _ in range(n_iters):
        s2, stats = one_iter(s2)
    cost = float(stats.cost)  # sync: depends on every chained iteration
    dt = (time.time() - t0) / n_iters
    return 1.0 / dt, cost


def _note(msg):
    sys.stderr.write(f"[bench {time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def run_device():
    _note("building bias-only problem...")
    problem = build_problem()
    _note("timing bias-only iterations...")
    ips, cost = timed_iterations(problem, TIMED_ITERS)
    _note(f"bias-only: {ips:.3f} iters/s")
    return ips


def _cpu_subprocess(code, tag):
    env = dict(os.environ)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith(tag):
                return float(line.split()[1])
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"cpu baseline failed: {e}\n")
    return None


def run_cpu_subprocess():
    """Same algorithm (Schur + PCG, JAX) on the host CPU."""
    return _cpu_subprocess(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        "ips, _ = bench.timed_iterations(bench.build_problem(), bench.CPU_TIMED_ITERS)\n"
        "print('CPU_IPS', ips)\n",
        "CPU_IPS",
    )


def run_cpu_reference():
    """REFERENCE-formulation iteration on the host CPU: assembled block-
    sparse Hessian, landmark Schur elimination, sparse DIRECT factor+solve
    (scipy SuperLU) — the algorithm class of the reference's BaSpaCho direct
    mode (Optimizer.cpp:166-331), since the reference binary itself cannot
    be built here (empty submodules). See tools_dev/cpu_reference_baseline.py
    and BASELINE.md for how to interpret the ratio."""
    return _cpu_subprocess(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        "from tools_dev import cpu_reference_baseline as ref\n"
        "ips, parts = ref.timed_reference_iterations(bench.build_problem(), n_iters=2)\n"
        "print('REF_IPS', ips)\n"
        "print('parts', parts)\n",
        "REF_IPS",
    )


def run_full_sensor():
    try:
        _note("building full-sensor 10-min problem...")
        with tempfile.TemporaryDirectory() as tmp:
            problem = build_full_sensor_problem(tmp)
        _note("timing full-sensor iterations...")
        ips, _ = timed_iterations(problem, FULL_TIMED_ITERS)
        _note(f"full-sensor: {ips:.3f} iters/s")
        return ips, problem
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"full-sensor config failed: {e}\n")
        return None, None


def run_full_sensor_cpu(problem):
    """Same algorithm, same problem, host CPU backend — the full-sensor
    counterpart of cpu_same_algorithm (VERDICT r2 item 2: a CPU ratio must
    exist for the full-sensor config, not just the easy workload). Reuses
    the already-built problem by moving its arrays to the CPU device
    in-process. Disable with VIBA_BENCH_FULL_CPU=0 (adds ~10 min: one CPU
    compile + one ~2-minute iteration)."""
    if problem is None or os.environ.get("VIBA_BENCH_FULL_CPU", "1") == "0":
        return None
    try:
        import jax

        cpu = jax.local_devices(backend="cpu")[0]
        if jax.devices()[0] == cpu:
            return None  # already a CPU run; the ratio is 1 by construction
        _note("timing full-sensor on host CPU (same algorithm)...")
        from visual_inertial_bundle_adjustment_tpu.ops import segments as seg

        put = lambda t: jax.device_put(jax.device_get(t), cpu)  # noqa: E731
        problem.datas = [put(d) for d in problem.datas]
        problem.variables = put(problem.variables)
        problem.masks = put(problem.masks)
        problem._jits = None
        seg.FORCE_XLA = True  # Pallas kernels cannot trace for CPU execution
        try:
            with jax.default_device(cpu):
                ips, _ = timed_iterations(problem, 1)
        finally:
            seg.FORCE_XLA = False
        _note(f"full-sensor CPU: {ips:.4f} iters/s")
        return ips
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"full-sensor CPU baseline failed: {e}\n")
        return None


# --- CPU-baseline cache -----------------------------------------------------
# The CPU baselines take ~15 min and measure slowly-changing quantities (the
# same-algorithm/reference-formulation iteration on the HOST, not the TPU
# code under test). They are cached keyed by the workload signature so the
# driver run spends its budget on the TPU numbers (VERDICT r4 ask #1).

_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_cpu_cache.json")


def _workload_signature():
    return {
        "duration": DURATION, "keyframe_hz": KEYFRAME_HZ,
        "num_points": NUM_POINTS, "track_lifetime": TRACK_LIFETIME,
        "cpu_timed_iters": CPU_TIMED_ITERS,
        "full_duration": FULL_DURATION, "full_points": FULL_POINTS,
    }


def _load_cpu_cache():
    if os.environ.get("VIBA_BENCH_REFRESH_CPU") == "1":
        return None
    try:
        with open(_CACHE_PATH) as f:
            cache = json.load(f)
        if cache.get("signature") == _workload_signature():
            _note(f"CPU baselines from cache ({_CACHE_PATH}, recorded "
                  f"{cache.get('recorded_at')})")
            return cache
        _note("CPU cache signature mismatch; will re-measure")
    except FileNotFoundError:
        pass
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"cpu cache unreadable: {e}\n")
    return None


def _save_cpu_cache(vals):
    try:
        vals = dict(vals)
        vals["signature"] = _workload_signature()
        vals["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(_CACHE_PATH, "w") as f:
            json.dump(vals, f, indent=1)
            f.write("\n")
        _note(f"CPU baselines cached to {_CACHE_PATH}")
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"cpu cache write failed: {e}\n")


def main():
    t_start = time.time()
    budget = float(os.environ.get("VIBA_BENCH_BUDGET_SEC", "1500"))
    r = {}

    def left():
        return budget - (time.time() - t_start)

    def emit():
        ips = r.get("ips")
        ref_ips = r.get("ref_ips")
        cpu_ips = r.get("cpu_ips")
        full_ips = r.get("full_ips")
        full_cpu_ips = r.get("full_cpu_ips")
        vs = (ips / ref_ips if ips and ref_ips
              else (ips / cpu_ips if ips and cpu_ips else None))
        rnd = lambda x, n=4: round(x, n) if x else None  # noqa: E731
        print(json.dumps({
            "metric": "lm_iterations_per_sec_2min_session",
            "value": rnd(ips),
            "unit": "iters/s",
            "vs_baseline": round(vs, 3) if vs else None,
            "extra": {
                "full_sensor_10min_iters_per_sec": rnd(full_ips),
                "capacity_30min_iters_per_sec": rnd(r.get("cap_ips")),
                "capacity_30min_peak_hbm_gb": r.get("cap_hbm"),
                "capacity_covariance_cols_per_sec": rnd(r.get("cov_cps")),
                "pcg_switch_iters_per_sec": rnd(r.get("sw_ips")),
                "pcg_switch_num_rigs": r.get("sw_rigs"),
                "full_sensor_cpu_same_algorithm_iters_per_sec": (
                    rnd(full_cpu_ips, 5)),
                "full_sensor_vs_cpu": (
                    round(full_ips / full_cpu_ips, 1)
                    if full_ips and full_cpu_ips else None),
                "cpu_reference_direct_iters_per_sec": rnd(ref_ips),
                "cpu_same_algorithm_iters_per_sec": rnd(cpu_ips),
                "cpu_baselines_cached": r.get("cached", False),
            },
        }), flush=True)

    # CPU baselines resolve first when cached: every emitted line then
    # already carries vs_baseline
    cache = _load_cpu_cache()
    if cache:
        r["ref_ips"] = cache.get("cpu_reference_direct_iters_per_sec")
        r["cpu_ips"] = cache.get("cpu_same_algorithm_iters_per_sec")
        r["full_cpu_ips"] = cache.get(
            "full_sensor_cpu_same_algorithm_iters_per_sec")
        r["cached"] = True

    # --- TPU stages (the numbers under test), most important first ---
    r["ips"] = run_device()
    emit()
    full_ips, full_problem = run_full_sensor()
    r["full_ips"] = full_ips
    emit()
    cap_ips, cap_hbm, cap_problem = run_capacity()
    r["cap_ips"], r["cap_hbm"] = cap_ips, cap_hbm
    emit()
    r["cov_cps"] = run_capacity_covariance(cap_problem)
    del cap_problem
    emit()
    sw_ips, sw_rigs = run_pcg_switch()
    r["sw_ips"], r["sw_rigs"] = sw_ips, sw_rigs
    emit()

    # --- CPU baselines (skipped when cached; each respects the deadline) ---
    if not cache:
        fresh = {}
        if left() > 360:
            _note("running CPU reference-direct baseline...")
            r["ref_ips"] = fresh["cpu_reference_direct_iters_per_sec"] = (
                run_cpu_reference())
            emit()
        else:
            _note(f"skipping CPU reference baseline ({left():.0f}s left)")
        if left() > 300:
            _note("running CPU same-algorithm baseline...")
            r["cpu_ips"] = fresh["cpu_same_algorithm_iters_per_sec"] = (
                run_cpu_subprocess())
            emit()
        else:
            _note(f"skipping CPU same-algorithm baseline ({left():.0f}s left)")
        if left() > 660:
            r["full_cpu_ips"] = fresh[
                "full_sensor_cpu_same_algorithm_iters_per_sec"] = (
                run_full_sensor_cpu(full_problem))
            emit()
        else:
            _note(f"skipping full-sensor CPU baseline ({left():.0f}s left)")
        if fresh.get("cpu_reference_direct_iters_per_sec") and fresh.get(
                "cpu_same_algorithm_iters_per_sec"):
            _save_cpu_cache(fresh)
    del full_problem
    emit()
    _note(f"bench done in {time.time() - t_start:.0f}s")


if __name__ == "__main__":
    main()
