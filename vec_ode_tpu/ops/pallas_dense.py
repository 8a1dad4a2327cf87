"""Pallas-fused per-trajectory dense-operator exponential chains.

The GENERIC exponential-integrator contract — the reference's black-box
operator callback ``Fun: FnMut(&[T]) -> Vec<L>`` (magnus.rs:32, cfm.rs:54)
— gives every trajectory its OWN dense operator samples A_b(t_i); nothing
is shared across the batch, so the shared-basis machinery of
``ops/pallas_expmv.py`` does not apply. This module is its per-trajectory
counterpart: ONE kernel per driver iteration computes, for each trajectory
b in a tile,

    y[b]   = e^{W[b][0][R0-1]} ... e^{W[b][0][0]} x[b]          (main chain)
    err[b] = || e^{W[b][1][...]} x[b] - y[b] ||_2               (C == 2)

where the per-trajectory exponent matrices W are built IN-KERNEL by a
``chain_builder`` callback from the raw operator samples (so Magnus-4's
per-step commutator runs as two per-trajectory (D, D) MXU matmuls inside
the kernel, and CFM's row lincombs cost VPU only).

Why this shape (measured on the target v5e through the axon tunnel):

  * XLA-issued ops inside a driver loop pay ~90 us EACH per iteration; the
    old generic path (batched expm via ops/expm.py = ~15 dispatches/iter)
    was overhead-bound at ~1.8 ms/iter. One fused kernel collapses that.
  * Per-trajectory (128, 128) @ (128, 128) matmuls issued from a fori loop
    inside one kernel pipeline at ~11 TF/s f32-HIGHEST — the same class of
    rate XLA reaches on batched GEMMs — so the kernel loses nothing on the
    unavoidable propagator FLOPs.
  * A per-trajectory matvec CANNOT ride the MXU efficiently (no operand
    reuse; a (1, 128) @ (128, 128) "tiny" matmul measures 275 ns — only
    ~27%% cheaper than a full (128, 128)^2 one), and in-kernel VPU
    throughput measures ~0.3 TF/s. So EVERY chain materializes its
    propagators (Paterson-Stockmeyer Taylor, MXU matmuls); per-trajectory
    vectors only pay 4 tiny matmuls total (one-hot gather of x, two
    propagator applications, one-hot scatter of y).

FLOP floor note (honest roofline): an adaptive Magnus-4 step on B=256
trajectories of d=64 complex (D=128 embedded) costs 12 per-trajectory
(128, 128)^2 matmuls (2 commutator + 2 x 5-matmul PS propagators) = 12.9
GFLOP per iteration. Even at the chip's ~33 TF/s f32-HIGHEST ceiling that
bounds the truly-generic contract at ~650K steps/s on one chip with ZERO
overhead; at the measured 11-16 TF/s GEMM rates the realistic ceiling is
~250-350K. Operators with ANY linear structure should use
exp/modulated.py (or exp.auto_modulated, which detects the structure from
the black-box callback automatically) — the shared-basis kernels escape
this floor entirely.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.prec import HIGHEST

# Paterson-Stockmeyer Taylor propagators, both 5 matmuls (A2/A3/A4 powers
# + block combinations): degree 8 for f32 (|e^t - T_8| <= 2.5e-9 at
# |t| <= 0.35), degree 12 for f64 (2.4e-18 at 0.25). Same (m, theta)
# family as exp/modulated.py's action path.
_PS8_THETA = 0.35
_FACT = [1.0 / math.factorial(k) for k in range(13)]


def _mm(a, b, precision):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=a.dtype, precision=precision,
    )


def _taylor_ps(As, ident, m, precision, mm=None):
    """T_m(As) via Paterson-Stockmeyer over A^1..A^4 blocks: 5 matmuls for
    m in {8, 12}."""
    if m not in (8, 12):
        raise ValueError(f"PS propagator supports m in {{8, 12}}, got {m}")
    if mm is None:
        mm = lambda a, b: _mm(a, b, precision)
    c = _FACT
    A2 = mm(As, As)
    A3 = mm(A2, As)
    A4 = mm(A3, As)

    def block(j):
        return (c[4 * j] * ident + c[4 * j + 1] * As
                + c[4 * j + 2] * A2 + c[4 * j + 3] * A3)

    if m == 8:
        B1 = block(1) + c[8] * A4
        return block(0) + mm(A4, B1)
    acc = block(2) + c[12] * A4          # B2 + A4*B3 (B3 = c12*I only)
    acc = block(1) + mm(A4, acc)
    return block(0) + mm(A4, acc)


def _exp_scale(A, theta, max_squarings, dtype):
    """Per-exponent scaling: 1-norm -> (As = A * 2^-s, s). NaN-safe (a
    diverged lane keeps s finite; its NaNs still reach the output so the
    controller rejects it)."""
    nrm = jnp.max(jnp.sum(jnp.abs(A), axis=0))
    nrm = jnp.where(jnp.isnan(nrm), 0.0, nrm)
    s = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(nrm / theta, 1.0))),
        0, max_squarings,
    ).astype(jnp.int32)
    scale = jnp.asarray(2.0, dtype) ** (-s.astype(dtype))
    return A * scale, s


def _expm_ps(A, ident, m, theta, max_squarings, precision):
    """Per-trajectory e^A: scale -> PS-m -> square s times."""
    As, s = _exp_scale(A, theta, max_squarings, A.dtype)
    P = _taylor_ps(As, ident, m, precision)
    return jax.lax.fori_loop(
        0, s, lambda _, Pc: _mm(Pc, Pc, precision), P)


def fused_dense_chain_apply(
    scalar_inputs: Sequence[jax.Array],   # each (B, w_i) per-traj scalars
    node_ops: jax.Array,                  # (B * n_nodes * D, D) traj-major
    x_parts: Sequence[jax.Array],         # 1 (real) or 2 (re, im) of (B, d)
    chain_builder: Callable,              # (mats, scalars) -> [C][R_c] (D,D)
    *,
    n_nodes: int,
    m: int = 8,
    theta: float = _PS8_THETA,
    max_squarings: int = 16,
    tile: int = 0,
    precision=HIGHEST,
    interpret: bool = False,
):
    """One fused generic-exponential step application.

    ``chain_builder(mats, scalars)`` runs per trajectory INSIDE the kernel:
    ``mats`` is the list of ``n_nodes`` (D, D) operator samples, ``scalars``
    a list matching ``scalar_inputs`` where each (B, w) input becomes a
    list of w python-indexable scalar values for this trajectory. It
    returns the chain structure: a list of C in {1, 2} chains, each a list
    of exponent matrices applied left-to-right (x <- e^W x). Chain 0 is
    the advance; chain 1 (optional) is the embedded comparison whose
    distance to chain 0 is the returned per-trajectory error norm.

    Returns (y_parts tuple matching x_parts, err_norm (B,) — zeros when
    C == 1).
    """
    n_state = len(x_parts)
    B, d = x_parts[0].shape
    D = n_state * d
    dtype = x_parts[0].dtype
    if node_ops.shape != (B * n_nodes * D, D):
        raise ValueError(
            f"node_ops must be ({B * n_nodes * D}, {D}) trajectory-major, "
            f"got {node_ops.shape}")
    if D % 128 != 0:
        raise ValueError(f"widened dim {D} must be a multiple of 128")
    if tile <= 0:
        # bound the per-tile operand block to ~4MB of VMEM; do NOT clamp
        # UP — a huge n_nodes*D^2 must shrink the tile, not blow VMEM
        tile = min(64, (4 << 20) // (n_nodes * D * D * 4))
    while tile > 0 and B % tile != 0:
        tile //= 2
    if tile < 1:
        raise ValueError(
            f"batch {B} admits no kernel tile for n_nodes={n_nodes}, "
            f"D={D} within the VMEM budget — use the XLA executor")
    n_in = len(scalar_inputs)

    def kernel(*refs):
        in_refs = refs[:n_in]
        ops_ref = refs[n_in]
        x_refs = refs[n_in + 1: n_in + 1 + n_state]
        y_refs = refs[n_in + 1 + n_state: n_in + 1 + 2 * n_state]
        e_ref = refs[n_in + 1 + 2 * n_state]

        x = (
            x_refs[0][:]
            if n_state == 1
            else jnp.concatenate([r[:] for r in x_refs], axis=1)
        )
        # the one-hot GATHER below is a matmul (0 * NaN = NaN): sanitize
        # the state block so one lane's NaN cannot leak into every gather.
        # The driver never accepts a NaN state (NaN error norms reject),
        # so zeroing here only affects already-poisoned lanes, whose
        # outputs are re-poisoned by their own NaN operators anyway.
        x = jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)
        ident = jnp.eye(D, dtype=dtype)

        def body(b, carry):
            y_acc, e_acc = carry
            oh_row = (
                jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) == b
            ).astype(dtype)                                   # (1, tile)
            oh_col = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) == b
            ).astype(dtype)                                   # (tile, 1)
            mats = [
                ops_ref[pl.ds((b * n_nodes + q) * D, D), :]
                for q in range(n_nodes)
            ]
            scalars = [
                [jnp.sum(oh_col * r[:, w:w + 1]) for w in range(r.shape[1])]
                for r in in_refs
            ]
            chains = chain_builder(mats, scalars)
            v = jax.lax.dot_general(
                oh_row, x, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=precision,
            )                                                 # (1, D)

            # main chain: materialized propagators (MXU (D,D) matmuls)
            y_row = v
            for W in chains[0]:
                P = _expm_ps(W, ident, m, theta, max_squarings,
                             precision)
                # rows: y_i = sum_j P[i, j] v_j -> v @ P^T
                y_row = jax.lax.dot_general(
                    y_row, P, (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype, precision=precision,
                )
            # scatter via SELECT, not one-hot multiply: a NaN y_row (this
            # lane's operator diverged) must reach only THIS lane —
            # 0 * NaN = NaN would poison every other row
            y_acc = jnp.where(oh_col > 0.5, y_row, y_acc)

            if len(chains) > 1:
                e_row = v
                for W in chains[1]:
                    P1 = _expm_ps(W, ident, m, theta, max_squarings,
                                  precision)
                    e_row = jax.lax.dot_general(
                        e_row, P1, (((1,), (1,)), ((), ())),
                        preferred_element_type=dtype, precision=precision,
                    )
                dv = e_row - y_row
                e_val = jnp.sqrt(jnp.sum(dv * dv))
                e_acc = jnp.where(oh_col > 0.5, e_val, e_acc)
            return (y_acc, e_acc)

        y_tile, e_tile = jax.lax.fori_loop(
            0, tile, body,
            (jnp.zeros((tile, D), dtype), jnp.zeros((tile, 1), dtype)),
        )
        for i, yr in enumerate(y_refs):
            yr[:] = y_tile[:, i * d:(i + 1) * d]
        e_ref[:] = e_tile

    def vec_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            *[vec_spec(a.shape[1]) for a in scalar_inputs],
            pl.BlockSpec((tile * n_nodes * D, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[vec_spec(d)] * n_state,
        ],
        out_specs=[
            *[vec_spec(d)] * n_state,
            vec_spec(1),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct((B, d), dtype) for _ in range(n_state)],
            jax.ShapeDtypeStruct((B, 1), dtype),
        ],
        interpret=interpret,
    )(
        *[a.astype(dtype) for a in scalar_inputs],
        node_ops.astype(dtype),
        *x_parts,
    )
    return tuple(outs[:n_state]), outs[n_state].reshape(B)


def dense_chains_xla(chains, xw, *, m=8, theta=_PS8_THETA,
                     max_squarings=16, precision=HIGHEST):
    """Pure-XLA reference of the fused kernel's math for parity tests and
    the CPU fallback: same per-exponential scaling + PS-8 + squaring, on
    batched (..., D, D) exponent stacks.

    chains: list of C lists of (..., D, D) exponent arrays (applied
    left-to-right); xw: (..., D). Returns (y, err_norm or None). Scaling
    is batch-global per exponent (uniform control flow), vs the kernel's
    per-trajectory counts — results agree to ~dtype eps either way."""
    dtype = xw.dtype

    def expm_apply(W, v):
        nrm = jnp.max(jnp.sum(jnp.abs(W), axis=-2), axis=-1)
        nrm = jnp.max(jnp.where(jnp.isnan(nrm), 0.0, nrm))
        s = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(nrm / theta, 1.0))),
            0, max_squarings,
        ).astype(jnp.int32)
        As = W * (jnp.asarray(2.0, dtype) ** (-s.astype(dtype)))
        ident = jnp.broadcast_to(jnp.eye(W.shape[-1], dtype=dtype), W.shape)
        mm = lambda a, b: jnp.matmul(a, b, precision=precision)
        P = _taylor_ps(As, ident, m, precision, mm=mm)
        P = jax.lax.while_loop(
            lambda ci: ci[0] < s,
            lambda ci: (ci[0] + 1, mm(ci[1], ci[1])),
            (jnp.zeros((), jnp.int32), P),
        )[1]
        return jnp.einsum("...ij,...j->...i", P, v, precision=precision)

    y = xw
    for W in chains[0]:
        y = expm_apply(W, y)
    if len(chains) < 2:
        return y, None
    e = xw
    for W in chains[1]:
        e = expm_apply(W, e)
    d = e - y
    return y, jnp.sqrt(jnp.sum(d * d, axis=-1))
