"""Nonlinear ODE model family (BASELINE.md config 2): Van der Pol,
Lotka-Volterra, and a stiff-ish Brusselator for controller stress tests."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VanDerPol:
    """x'' - mu (1 - x^2) x' + x = 0 as a first-order system y=(x, v)."""

    mu: float = 1.0

    def rhs(self, t, y):
        x, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [v, self.mu * (1.0 - x * x) * v - x], axis=-1
        )


@dataclasses.dataclass(frozen=True)
class LotkaVolterra:
    """Predator-prey: u' = a u - b u v, v' = -c v + d u v. Conserved quantity
    V = d u - c ln u + b v - a ln v for invariant-drift tests."""

    a: float = 1.5
    b: float = 1.0
    c: float = 3.0
    d: float = 1.0

    def rhs(self, t, y):
        u, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [self.a * u - self.b * u * v, -self.c * v + self.d * u * v],
            axis=-1,
        )

    def invariant(self, y):
        u, v = y[..., 0], y[..., 1]
        return (
            self.d * u - self.c * jnp.log(u)
            + self.b * v - self.a * jnp.log(v)
        )


@dataclasses.dataclass(frozen=True)
class Brusselator:
    """u' = A + u^2 v - (B+1) u, v' = B u - u^2 v."""

    A: float = 1.0
    B: float = 3.0

    def rhs(self, t, y):
        u, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [
                self.A + u * u * v - (self.B + 1.0) * u,
                self.B * u - u * u * v,
            ],
            axis=-1,
        )
