"""Linear (pinhole) camera model: params [fx, fy, cx, cy].

Counterpart of projectaria's Linear projection (used for undistorted /
rectified streams). Same (uv, valid) interface as fisheye624."""

from __future__ import annotations

import jax.numpy as jnp

NUM_PARAMS = 4
MIN_Z = 1e-6


def project(params, point):
    x, y, z = point[..., 0], point[..., 1], point[..., 2]
    z_safe = jnp.where(jnp.abs(z) < MIN_Z, MIN_Z, z)
    u = params[..., 0] * x / z_safe + params[..., 2]
    v = params[..., 1] * y / z_safe + params[..., 3]
    return jnp.stack([u, v], axis=-1), z >= MIN_Z


def unproject(params, uv):
    x = (uv[..., 0] - params[..., 2]) / params[..., 0]
    y = (uv[..., 1] - params[..., 3]) / params[..., 1]
    ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
