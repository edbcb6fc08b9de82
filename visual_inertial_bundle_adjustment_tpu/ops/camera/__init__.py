"""Camera models with a unified padded-parameter interface.

Counterpart of reference interfaces/ark/camera_model/CameraModelParam.h:14-150:
each camera's intrinsics live in a fixed MAX_PARAMS=17 vector
(model params padded to 15, then readout time at slot 15, time offset at slot
16 — the reference's "+2" slots), with a static `kind` selecting the
projection function per factor batch. Disabled/unused parameter slots are
masked out of the optimization by the problem layer.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fisheye624, pinhole

KIND_LINEAR = 0
KIND_FISHEYE624 = 1

MAX_MODEL_PARAMS = 15
READOUT = 15  # readout time (s), rolling shutter
TIME_OFFSET = 16  # time offset device->camera (s)
MAX_PARAMS = 17

NUM_MODEL_PARAMS = {KIND_LINEAR: pinhole.NUM_PARAMS, KIND_FISHEYE624: fisheye624.NUM_PARAMS}


def project(kind: int, params, point):
    """Dispatch on static kind. params (..., >=15), point (..., 3)."""
    if kind == KIND_LINEAR:
        return pinhole.project(params[..., : pinhole.NUM_PARAMS], point)
    if kind == KIND_FISHEYE624:
        return fisheye624.project(params[..., : fisheye624.NUM_PARAMS], point)
    raise ValueError(f"unknown camera kind {kind}")


def unproject(kind: int, params, uv):
    if kind == KIND_LINEAR:
        return pinhole.unproject(params[..., : pinhole.NUM_PARAMS], uv)
    if kind == KIND_FISHEYE624:
        return fisheye624.unproject(params[..., : fisheye624.NUM_PARAMS], uv)
    raise ValueError(f"unknown camera kind {kind}")


def pad_params(model_params, readout=0.0, time_offset=0.0):
    """Pack model params + readout + time offset into a MAX_PARAMS vector."""
    model_params = jnp.asarray(model_params)
    out = jnp.zeros(model_params.shape[:-1] + (MAX_PARAMS,), model_params.dtype)
    out = out.at[..., : model_params.shape[-1]].set(model_params)
    out = out.at[..., READOUT].set(readout)
    out = out.at[..., TIME_OFFSET].set(time_offset)
    return out
