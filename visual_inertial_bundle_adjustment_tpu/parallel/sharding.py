"""Multi-chip distribution: factor batches sharded over a device mesh.

TPU-native replacement for the reference's shared-memory parallelism
(dispenso parallel_for over factor chunks + IEEE-magic-NaN scatter locks,
lib/small_thing/Factor.h:668-734, AtomicOps.h:21-112): factor batches are
sharded over the mesh axis 'kf' (keyframe blocks — batches are built
time-sorted so shards are contiguous trajectory spans), variable tables are
replicated, and XLA GSPMD turns every factor->variable scatter-add into a
partial-sum + all-reduce over ICI. The whole LM step (linearize + Schur +
PCG + retract) jits over the mesh unchanged — the engine's gather/einsum/
scatter structure partitions along the factor axis with no code changes.

Landmark Schur stays correct under sharding because H_ll/W^T x segment-sums
reduce over the factor axis (psum) before the batched 3x3 solves, which
shard over landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "kf") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def _pad_batch(data: dict, n_pad: int):
    """Pad a factor batch with zero-weight rows (whitening matrices are zero,
    so padded rows contribute exactly nothing to cost/grad/Hessian)."""
    if n_pad == 0:
        return data
    out = {}
    for k, a in data.items():
        if not hasattr(a, "ndim") or a.ndim == 0:
            out[k] = a
            continue
        pad_row = jnp.zeros_like(a[:1])
        if k == "_pad":
            pad_row = jnp.ones_like(a[:1])  # mesh-padding rows are pads too
        elif k in ("sqrt_h", "sqrt_info", "sqrt_w"):
            pass  # zero weight
        elif k in ("prev_rig", "next_rig", "rig", "point", "intr", "extr", "bias",
                   "calib", "prev", "next", "idx", "prev_extr", "next_extr", "rs_row"):
            pad_row = jnp.zeros_like(a[:1])  # index 0 (harmless, weight is 0)
        else:
            pad_row = jnp.broadcast_to(a[:1], (1,) + a.shape[1:])
        out[k] = jnp.concatenate([a, jnp.broadcast_to(pad_row, (n_pad,) + a.shape[1:])], 0)
    return out


def shard_problem(problem, mesh: Mesh, axis: str = "kf"):
    """Place batches sharded over the mesh, variables/masks replicated."""
    n = mesh.devices.size
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    import dataclasses as _dc

    new_datas = []
    new_cfgs = []
    for cfg, data in zip(problem.cfgs, problem.datas):
        # drop layout-plan keys (ELL, block grids, point permutations — their
        # lengths differ from the factor axis); keep _pad, it shards with it
        data = {k: a for k, a in data.items() if not k.startswith("_") or k == "_pad"}
        if getattr(cfg, "block_info", None):
            cfg = _dc.replace(cfg, block_info=None)
        new_cfgs.append(cfg)
        size = next(a.shape[0] for a in data.values() if hasattr(a, "ndim") and a.ndim >= 1)
        n_pad = (-size) % n
        data = _pad_batch(data, n_pad)
        placed = {}
        for k, a in data.items():
            if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == size + n_pad:
                placed[k] = jax.device_put(a, sharded)
            else:
                placed[k] = jax.device_put(a, replicated) if hasattr(a, "ndim") else a
        new_datas.append(placed)
    problem.datas = new_datas
    problem.cfgs = new_cfgs
    problem.variables = jax.device_put(problem.variables, replicated)
    problem.masks = jax.device_put(problem.masks, replicated)
    problem.use_transpose_plans = False  # scatter+psum shards; ELL would all-gather
    problem.use_blocked_engine = False  # factor axis shards; grids don't
    problem._jits = None
    return problem
