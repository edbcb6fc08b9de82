"""Monitoring subsystem (utils/monitoring.py): per-iteration capture,
background runner, JSONL + HTML sinks — the reference GUI's data-flow parity
(gui/MonitoringState.h)."""

import json
import pathlib

import numpy as np
import pytest

from visual_inertial_bundle_adjustment_tpu.pipeline.builder import (
    BuildOptions,
    build_synthetic_problem,
)
from visual_inertial_bundle_adjustment_tpu.pipeline.synthetic import SyntheticSession
from visual_inertial_bundle_adjustment_tpu.problem.optimizer import LMSettings, optimize
from visual_inertial_bundle_adjustment_tpu.utils import monitoring


def _problem():
    s = SyntheticSession(duration=4.0, keyframe_hz=5.0, gyro_hz=200.0,
                         accel_hz=200.0, num_points=40, seed=11, pixel_noise=0.2)
    return build_synthetic_problem(
        s, BuildOptions(init_pose_noise=0.01, init_point_noise=0.04,
                        init_vel_noise=0.04))


@pytest.mark.slow
def test_monitor_captures_iterations(tmp_path: pathlib.Path):
    problem = _problem()
    mon = monitoring.Monitor(snapshot_every=2, jsonl_path=str(tmp_path / "m.jsonl"))
    mon.set_calib_layout(num_cams=1, num_imus=1)
    mon.set_problem_stats(rigs=int(problem.variables.pose_t.shape[0]),
                          points=int(problem.variables.points.shape[0]))
    settings = LMSettings(max_iterations=5,
                          iteration_callback=mon.make_callback(problem))
    summary = optimize(problem, settings)
    mon.finish(summary)

    assert len(mon.iterations) >= 2
    it = mon.iterations[0]
    assert it.cost > 0 and it.damping > 0
    # snapshots captured on the scheduled iterations
    snaps = [d for d in mon.iterations if d.trajectory is not None]
    assert snaps and snaps[0].points is not None
    assert snaps[0].residual_percentiles  # per-class percentiles present
    # costs decrease overall
    assert mon.iterations[-1].cost < mon.iterations[0].prev_cost

    # JSONL sink wrote one line per iteration
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert len(lines) == len(mon.iterations)
    assert "pcg_iters" in lines[0]

    # HTML dashboard renders with curves + trajectory panels
    out = monitoring.render_html(mon, str(tmp_path / "dash.html"))
    html = open(out).read()
    assert "cost (log10)" in html and "polyline" in html
    assert "top view" in html
    # problem stats header + per-window calibration curves
    # (gui/MonitoringState.h:47-61 parity)
    assert "rigs:" in html
    snaps_c = [d for d in mon.iterations if d.calib_curves]
    if snaps_c:  # tables may be empty when all calib is constant
        assert any(k.startswith(("imu", "cam")) for k in snaps_c[0].calib_curves)
        assert "calib:" in html


def test_live_html_refresh(tmp_path: pathlib.Path):
    """The dashboard artifact is rewritten DURING the run (reference GUI is
    a live view, gui/MonitoringState.h:20-100): publishing iterations with
    html_every=2 must update the file contents as iterations stream in."""
    mon = monitoring.Monitor(snapshot_every=0,
                             html_path=str(tmp_path / "live.html"),
                             html_every=2)
    sizes = []
    for i in range(1, 7):
        mon.publish(monitoring.IterationData(
            iteration=i, cost=100.0 / i, prev_cost=100.0 / max(i - 1, 1),
            damping=1e-4))
        if i % 2 == 0:
            assert (tmp_path / "live.html").exists()
            sizes.append((tmp_path / "live.html").stat().st_size)
    # each refresh adds points to the cost polyline => content grows
    assert len(sizes) == 3 and sizes[0] < sizes[-1]
    mon.finish(None)
    assert "cost (log10)" in (tmp_path / "live.html").read_text()


@pytest.mark.slow
def test_background_runner():
    problem = _problem()
    mon = monitoring.Monitor(snapshot_every=0)
    t = monitoring.optimize_in_background(
        problem, LMSettings(max_iterations=3), mon)
    t.join(timeout=600)
    assert not t.is_alive()
    assert mon.done and mon.summary is not None
    assert mon.summary.final_cost <= mon.summary.initial_cost
