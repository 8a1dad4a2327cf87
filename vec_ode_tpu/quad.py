"""Quadrature utilities.

Completes the reference's private ``quad`` module, which ships only an empty
``trapezoid()``, a ``Quadrature`` trait sketch and an empty ``TrapezoidQuad``
struct (``/root/reference/src/quad/mod.rs:3-17``) — the quadrature actually
used by the reference is just the Gauss-Legendre node constants in ``dat``
(dat/mod.rs:4). Here the module is real: node/weight tables, function
quadrature, and the operator-averaging helpers the exponential integrators
build on.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Gauss-Legendre nodes/weights on [0, 1], by point count.
_GL_01 = {
    1: (np.array([0.5]), np.array([1.0])),
    2: (
        np.array([0.5 - 0.5 / math.sqrt(3.0), 0.5 + 0.5 / math.sqrt(3.0)]),
        np.array([0.5, 0.5]),
    ),
    3: (
        np.array([
            0.5 - 0.5 * math.sqrt(3.0 / 5.0), 0.5,
            0.5 + 0.5 * math.sqrt(3.0 / 5.0),
        ]),
        np.array([5.0 / 18.0, 4.0 / 9.0, 5.0 / 18.0]),
    ),
    4: (
        np.array([
            0.5 - 0.5 * math.sqrt(3.0 / 7.0 + 2.0 / 7.0 * math.sqrt(6.0 / 5.0)),
            0.5 - 0.5 * math.sqrt(3.0 / 7.0 - 2.0 / 7.0 * math.sqrt(6.0 / 5.0)),
            0.5 + 0.5 * math.sqrt(3.0 / 7.0 - 2.0 / 7.0 * math.sqrt(6.0 / 5.0)),
            0.5 + 0.5 * math.sqrt(3.0 / 7.0 + 2.0 / 7.0 * math.sqrt(6.0 / 5.0)),
        ]),
        np.array([
            (18.0 - math.sqrt(30.0)) / 72.0,
            (18.0 + math.sqrt(30.0)) / 72.0,
            (18.0 + math.sqrt(30.0)) / 72.0,
            (18.0 - math.sqrt(30.0)) / 72.0,
        ]),
    ),
    5: (
        np.array([
            0.5 - 0.5 / 3.0 * math.sqrt(5.0 + 2.0 * math.sqrt(10.0 / 7.0)),
            0.5 - 0.5 / 3.0 * math.sqrt(5.0 - 2.0 * math.sqrt(10.0 / 7.0)),
            0.5,
            0.5 + 0.5 / 3.0 * math.sqrt(5.0 - 2.0 * math.sqrt(10.0 / 7.0)),
            0.5 + 0.5 / 3.0 * math.sqrt(5.0 + 2.0 * math.sqrt(10.0 / 7.0)),
        ]),
        np.array([
            (322.0 - 13.0 * math.sqrt(70.0)) / 1800.0,
            (322.0 + 13.0 * math.sqrt(70.0)) / 1800.0,
            128.0 / 450.0,
            (322.0 + 13.0 * math.sqrt(70.0)) / 1800.0,
            (322.0 - 13.0 * math.sqrt(70.0)) / 1800.0,
        ]),
    ),
}


def gauss_legendre(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(nodes, weights) of the n-point Gauss-Legendre rule on [0, 1]."""
    if n not in _GL_01:
        raise ValueError(f"gauss_legendre: unsupported point count {n}")
    return _GL_01[n]


def fixed_quad(f: Callable, a, b, n: int = 2):
    """∫_a^b f(t) dt by n-point Gauss-Legendre. f maps a scalar time to an
    arbitrary pytree; node evaluations are one vmapped batch."""
    c, w = gauss_legendre(n)
    a = jnp.asarray(a)
    span = jnp.asarray(b) - a
    ts = jnp.stack([a + float(ci) * span for ci in c])
    vals = jax.vmap(f)(ts)

    def comb(leaf):
        ws = jnp.asarray(w, leaf.dtype).reshape(
            (n,) + (1,) * (leaf.ndim - 1)
        )
        return jnp.sum(ws * leaf, axis=0) * span.astype(leaf.dtype)

    return jax.tree_util.tree_map(comb, vals)


def trapezoid(f: Callable, a, b, n: int = 64):
    """Composite trapezoid rule with n panels (the rule the reference's
    ``TrapezoidQuad`` stub intended)."""
    a = jnp.asarray(a)
    span = jnp.asarray(b) - a
    ts = a + span * jnp.linspace(0.0, 1.0, n + 1)
    vals = jax.vmap(f)(ts)

    def comb(leaf):
        h = (span / n).astype(leaf.dtype)
        return h * (
            0.5 * leaf[0] + jnp.sum(leaf[1:-1], axis=0) + 0.5 * leaf[-1]
        )

    return jax.tree_util.tree_map(comb, vals)


def averaged_operator(op_fn: Callable, t, dt, n: int = 2):
    """(1/dt) ∫_t^{t+dt} A(s) ds by Gauss-Legendre — the first-order-Magnus
    averaged operator (what the reference's GL nodes exist for)."""
    c, w = gauss_legendre(n)
    ts = jnp.stack([t + float(ci) * dt for ci in c])
    vals = jax.vmap(op_fn)(ts)

    def comb(leaf):
        ws = jnp.asarray(w, leaf.dtype).reshape(
            (n,) + (1,) * (leaf.ndim - 1)
        )
        return jnp.sum(ws * leaf, axis=0)

    return jax.tree_util.tree_map(comb, vals)
