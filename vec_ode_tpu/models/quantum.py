"""Quantum model family: time-dependent Schrödinger problems
dψ/dt = -i H(t) ψ — the exponential integrators' raison d'être
(BASELINE.md configs 3 and 4).

Landau-Zener has a closed-form asymptotic transition probability
P = exp(-2 pi Δ² / (4 v)) for golden tests; the driven dense Hamiltonian is
the 64-dim benchmark operator.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LandauZener:
    """2-level avoided crossing: H(t) = (v t) σ_z / 2 + (Δ/2) σ_x.

    Asymptotic transition probability (diabatic basis, sweep -T -> +T):
    P_LZ = exp(-pi Δ² / (2 v)).
    """

    v: float = 1.0      # sweep rate
    delta: float = 0.5  # gap

    def hamiltonian(self, t):
        sz = jnp.asarray([[0.5, 0.0], [0.0, -0.5]], jnp.complex128)
        sx = jnp.asarray([[0.0, 0.5], [0.5, 0.0]], jnp.complex128)
        td = jnp.asarray(t).astype(jnp.float64)
        return (self.v * td).astype(jnp.complex128) * sz + self.delta * sx

    def op(self, t):
        """A(t) = -i H(t): the anti-Hermitian generator."""
        return -1j * self.hamiltonian(t)

    @property
    def p_transition(self) -> float:
        return math.exp(-math.pi * self.delta**2 / (2.0 * self.v))


@dataclasses.dataclass(frozen=True)
class DrivenDense:
    """Driven dense Hamiltonian H(t) = H0 + cos(w t) V, d-dimensional —
    the 64-dim complex benchmark operator (BASELINE config 4)."""

    H0: jnp.ndarray
    V: jnp.ndarray
    w: float = 1.0

    @staticmethod
    def make(d: int = 64, seed: int = 0, w: float = 1.0,
             dtype=jnp.complex128):
        rng = np.random.default_rng(seed)
        M = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        H0 = jnp.asarray((M + M.conj().T) / (2 * math.sqrt(d)), dtype)
        N = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        V = jnp.asarray((N + N.conj().T) / (2 * math.sqrt(d)), dtype)
        return DrivenDense(H0=H0, V=V, w=w)

    def hamiltonian(self, t):
        td = jnp.asarray(t).astype(jnp.float64)
        c = jnp.cos(self.w * td).astype(self.H0.dtype)
        return self.H0 + c * self.V

    def op(self, t):
        return -1j * self.hamiltonian(t)

    def rhs(self, t, psi):
        return self.op(t) @ psi
