"""Concrete exponential-split leaves.

The reference ships *no* leaf ``ExponentialSplit`` implementations — dense
expm / matvec are left to downstream users (SURVEY.md §1). These are the
leaves the framework supplies so the exponential solvers are usable:

  * :class:`DenseSplit` — L is a dense (..., d, d) matrix; exp is a batched
    Padé-13 scaling-and-squaring expm; apply is a (batched) matvec.
  * :class:`DiagonalSplit` — L is the diagonal (..., d); everything is
    elementwise (exact, cheapest).
  * :class:`AntiHermitianSplit` — L = -i*H*dt with H Hermitian (Schrödinger
    propagation); exp via eigendecomposition, exactly unitary up to eigh
    accuracy. TPU note: jnp.linalg.eigh lowers to a QDWH-eig composed of
    MXU-friendly matmuls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.expm import expm
from .protocol import ExponentialSplit


@dataclasses.dataclass(frozen=True)
class DenseSplit(ExponentialSplit):
    """Dense-matrix operator leaf. L: (..., d, d). U: (..., d, d)."""

    max_squarings: int = 16

    def exp(self, L):
        return expm(L, max_squarings=self.max_squarings)

    def map_exp(self, U, x):
        return jnp.einsum("...ij,...j->...i", U, x)

    def commutator(self, La, Lb):
        return La @ Lb - Lb @ La


@dataclasses.dataclass(frozen=True)
class DiagonalSplit(ExponentialSplit):
    """Diagonal operator leaf. L: (..., d) diagonal entries. U: (..., d)."""

    def exp(self, L):
        return jnp.exp(L)

    def map_exp(self, U, x):
        return U * x

    def commutator(self, La, Lb):
        return jnp.zeros_like(La)


@dataclasses.dataclass(frozen=True)
class AntiHermitianSplit(ExponentialSplit):
    """Anti-Hermitian operator leaf (L† = -L), e.g. L = -i*dt*H(t).

    exp(L) = V diag(e^{i w}) V† where i*L = V diag(w) V† is Hermitian —
    exactly unitary, the natural choice for Schrödinger/Magnus steps where
    norm conservation matters more than raw expm speed.
    """

    def exp(self, L):
        H = 1j * L  # Hermitian
        w, V = jnp.linalg.eigh(H)
        phase = jnp.exp(-1j * w.astype(L.dtype))
        return jnp.einsum(
            "...ik,...k,...jk->...ij", V, phase, jnp.conj(V)
        )

    def map_exp(self, U, x):
        return jnp.einsum("...ij,...j->...i", U, x)

    def commutator(self, La, Lb):
        return La @ Lb - Lb @ La
