"""Calibration evaluation vs factory values.

Counterpart of reference viba/single_session/EvalCalibration.cpp:15-154:
per-window extrinsics rotation/translation errors, per-component intrinsics
deltas, and a dense grid of projection offsets at several distances, reported
as percentile summaries.
"""

from __future__ import annotations

import numpy as np

from ..models import imu as imu_model
from ..ops import camera as cam_ops
from ..utils.histogram import StatsValueContainer

EVAL_DISTANCES = [0.3, 0.5, 1.0, 2.0, 5.0, 10.0]  # meters (reference uses 6)
GRID = 12  # projection-offset grid resolution per axis


def compare_calibration_vs_factory(adapter, log=print):
    """Print percentile stats of optimized-vs-factory calibration deltas."""
    import jax.numpy as jnp

    from . import session_data as sio

    sd = adapter.sd
    v = adapter.problem.variables
    nC, nI, W = adapter.num_cams, adapter.num_imus, adapter.num_windows
    stats = {}

    def get(name, unit=""):
        if name not in stats:
            stats[name] = StatsValueContainer(name, unit)
        return stats[name]

    # camera extrinsics errors
    for ci in range(nC):
        fci = adapter.cam_to_factory[ci]
        fq, ft = adapter._T_cam_bodyImu(sd.factory, fci)
        for w in range(W):
            row = w * nC + ci
            q = np.asarray(v.cam_extr_q[row])
            t = np.asarray(v.cam_extr_t[row])
            dq = sio._q_mul(q, sio._q_conj(fq))
            ang = 2 * np.arccos(np.clip(abs(dq[0]), -1, 1))
            get(f"cam{ci}/extr_rot", " deg").add([np.rad2deg(ang)])
            get(f"cam{ci}/extr_pos", " mm").add([np.linalg.norm(t - ft) * 1e3])

    # camera intrinsics deltas + projection-offset grid
    for ci in range(nC):
        fci = adapter.cam_to_factory[ci]
        ref = adapter._cam_param_vec(sd.factory, fci)
        kind = adapter.camera_kind(ci)
        n = cam_ops.NUM_MODEL_PARAMS[kind]
        Wd, Hd = sd.online[0].cameras[ci].image_size
        for w in range(W):
            row = w * nC + ci
            est = np.asarray(v.cam_intr[row])
            get(f"cam{ci}/intr_delta", "").add(np.abs(est[:n] - ref[:n]))
            # projection offsets over a pixel grid unprojected at distances
            us = np.linspace(10, Wd - 10, GRID)
            vs = np.linspace(10, Hd - 10, GRID)
            uu, vv = np.meshgrid(us, vs)
            uv = jnp.asarray(np.stack([uu.reshape(-1), vv.reshape(-1)], -1))
            rays = cam_ops.unproject(kind, jnp.asarray(ref[:n]), uv)
            for dist in EVAL_DISTANCES:
                pts = rays * dist
                uv_est, ok = cam_ops.project(kind, jnp.asarray(est[:n]), pts)
                off = np.linalg.norm(np.asarray(uv_est - uv), axis=-1)
                get(f"cam{ci}/proj_offset@{dist}m", " px").add(off[np.asarray(ok)])

    # imu calibration deltas
    for ii in range(nI):
        fii = adapter.imu_to_factory[ii]
        ref = sd.factory.imus[fii].calib23
        for w in range(W):
            cal = np.asarray(v.imu_calib[w * nI + ii])
            d = np.asarray(imu_model.calib_boxminus(jnp.asarray(cal), jnp.asarray(ref)))
            get(f"imu{ii}/gyro_bias", " rad/s").add(np.abs(d[imu_model.GYRO_BIAS]))
            get(f"imu{ii}/accel_bias", " m/s2").add(np.abs(d[imu_model.ACCEL_BIAS]))
            get(f"imu{ii}/scale", "").add(
                np.abs(np.concatenate([d[imu_model.GYRO_SCALE], d[imu_model.ACCEL_SCALE]]))
            )
            get(f"imu{ii}/time_offsets", " s").add(np.abs(d[21:23]))

    for s in stats.values():
        log(s.summary())
    return stats
