"""Robust losses on squared errors, as (value, derivative) jets.

Port of the semantics of reference lib/small_thing/SoftLoss.h:1-211: each loss
maps the squared whitened error s = ||e||^2 to (rho(s), rho'(s)); the optimizer
uses rho(s) in the cost and reweights gradient/Hessian blocks by rho'(s)
(IRLS-style; no second-order Triggs correction — matching reference
Factor.h:543-661).

Here a loss is a (kind, a, k) triple so that a single factor batch can carry
heterogeneous per-factor losses as arrays; `loss_jet2` is branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp

TRIVIAL = 0
L1 = 1
HUBER = 2
HUBER_CUTOFF = 3
CAUCHY = 4


def loss_jet2(kind, a, k, s):
    """Return (rho(s), rho'(s)) for each element; kind/a/k broadcast against s.

    kind: int array; a: width parameter; k: cutoff (only HUBER_CUTOFF).
    """
    s_safe = jnp.maximum(s, 1e-30)
    r = jnp.sqrt(s_safe)
    b = a * a
    k2 = k * k
    h = 2.0 * a * k - b

    # trivial
    v_triv, d_triv = s, jnp.ones_like(s)
    # l1
    v_l1, d_l1 = r, 0.5 / r
    # huber
    in_quad = s <= b
    v_hub = jnp.where(in_quad, s, 2.0 * a * r - b)
    d_hub = jnp.where(in_quad, 1.0, a / r)
    # huber with cutoff
    past_cut = s > k2
    v_hc = jnp.where(past_cut, h, v_hub)
    d_hc = jnp.where(past_cut, 0.0, d_hub)
    # cauchy
    sum_ = 1.0 + s / jnp.maximum(b, 1e-30)
    v_cau = b * jnp.log(sum_)
    d_cau = 1.0 / sum_

    kind = jnp.asarray(kind)
    v = jnp.select(
        [kind == TRIVIAL, kind == L1, kind == HUBER, kind == HUBER_CUTOFF, kind == CAUCHY],
        [v_triv, v_l1, v_hub, v_hc, v_cau],
    )
    d = jnp.select(
        [kind == TRIVIAL, kind == L1, kind == HUBER, kind == HUBER_CUTOFF, kind == CAUCHY],
        [d_triv, d_l1, d_hub, d_hc, d_cau],
    )
    return v, d
