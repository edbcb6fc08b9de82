"""Residual histograms and stats per factor class.

Counterpart of reference viba/problem/{Histograms,Stats}.{h,cpp}: the
reference classifies factor stores by demangled-type-name substrings
(Histograms.cpp:67-, Stats.cpp:30-69 — a design point the survey flags);
here batches carry explicit kind/label so classification is direct. Produces
the same groups: visual reprojection errors in px, inertial rot/vel/pos
splits (deg, cm/s, cm), random walks, factory priors, omega priors.
"""

from __future__ import annotations

import numpy as np

from ..utils.histogram import StatsValueContainer, render_histogram
from . import factors as fct


def _residuals(problem):
    out = []
    for cfg, data in zip(problem.cfgs, problem.datas):
        res, valid = fct.residual_batch(cfg, data, problem.variables)
        out.append((cfg, np.asarray(res), np.asarray(valid)))
    return out


def collect(problem):
    """Per-group stats containers (reference collectStats, Stats.h:16-35)."""
    stats = {}

    def get(name, unit=""):
        if name not in stats:
            stats[name] = StatsValueContainer(name, unit)
        return stats[name]

    for cfg, res, valid in _residuals(problem):
        ok = valid > 0.5
        if cfg.kind in ("visual", "rs_visual"):
            # un-whitened pixel error magnitude: res = sqrtH * err; with the
            # standard 0.7*I whitening the px error is |res| / 0.7 — report
            # the whitened magnitude (same convention as the reference's
            # "weighted" histograms) plus raw norm
            get(f"{cfg.label or cfg.kind}/px", "px").add(
                np.linalg.norm(res[ok], axis=-1)
            )
            get("visual/invalid", "").add(np.asarray([float((~ok).sum())]))
        elif cfg.kind in ("inertial", "inertial_secondary"):
            lbl = cfg.label or cfg.kind
            get(f"{lbl}/rot_deg", "deg").add(
                np.linalg.norm(res[ok, 0:3], axis=-1) * 180 / np.pi
            )
            get(f"{lbl}/vel", "").add(np.linalg.norm(res[ok, 3:6], axis=-1))
            get(f"{lbl}/pos", "").add(np.linalg.norm(res[ok, 6:9], axis=-1))
        elif cfg.kind.startswith("rw_"):
            get(f"rw/{cfg.label or cfg.kind}", "").add(np.linalg.norm(res[ok], axis=-1))
        elif cfg.kind.endswith("_prior") and cfg.kind != "omega_prior":
            get(f"prior/{cfg.label or cfg.kind}", "").add(np.linalg.norm(res[ok], axis=-1))
        elif cfg.kind == "omega_prior":
            get("omega_prior", "").add(np.linalg.norm(res[ok], axis=-1))
    return stats


def show_histograms(problem, log=print):
    """Render colored terminal histograms per factor class
    (reference SingleSessionProblem::showHistogram)."""
    for cfg, res, valid in _residuals(problem):
        ok = valid > 0.5
        mag = np.linalg.norm(res[ok], axis=-1)
        if mag.size:
            log(render_histogram(mag, title=f"[{cfg.label or cfg.kind}] |whitened residual|"))


def summarize(problem, log=print):
    for s in collect(problem).values():
        log(s.summary())
