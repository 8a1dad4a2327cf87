"""Pallas-fused chain-exponential action for modulated operators.

Computes, for each trajectory b and chain c:

    y[b, c] = e^{A(rows[b,c,R-1])} ... e^{A(rows[b,c,1])} e^{A(rows[b,c,0])} x[b]
    A(row)  = sum_k row[k] * basis[k]

entirely inside ONE kernel: the K shared basis matrices stay resident in
VMEM and every Taylor term is an in-kernel (TILE, D) @ (D, D) MXU
contraction. This is the exponential-integrator counterpart of
``ops/pallas_rk.py``. On the target backend, XLA-issued ops pay a large
per-dispatch cost while in-kernel MXU/VPU work runs at full rate (measured:
the same Taylor chain is ~20x faster inside one kernel than as XLA
einsums), so EVERYTHING moves inside:

  * the stepper's coefficient-row construction — a ``cols_builder``
    callback assembles the (c, r, k) coefficient columns from raw inputs
    (quadrature samples g(t_i), dt) with static stepper constants, so
    Magnus w1/w2 and CFM alpha-contractions cost zero XLA dispatches;
  * the scaling decision — each TILE computes its own 1-norm bound
    max_b sum_k |c_k| ||M_k||_1 and its own squaring count s (a per-tile
    ``fori_loop`` trip count; scaling is per-operator math, so per-tile
    uniformity is enough for correct control flow);
  * the real-pair widening — complex states arrive as separate re/im
    blocks and are concatenated in VMEM;
  * the embedded error norm — ||chain1 - chain0||_2 per trajectory.

Semantics (C chains, R sequential exponentials per chain):
  * Magnus-4 adaptive: C=2 (order-4 Ω and order-2 Ω1 both acting on x), R=1.
  * CFM: C=2 (main chain, embedded error chain), R=s rows; the shorter error
    chain is padded with ZERO rows (e^0 = I exactly, any pass count).
  * fixed-step/midpoint: C=1.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.prec import HIGHEST


def _row_matmul(x, M):
    """(TILE, D) x (D, D) -> (TILE, D), rows y_i = M @ x_i (i.e. x @ M^T),
    full-precision MXU accumulation."""
    return jax.lax.dot_general(
        x, M,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=HIGHEST,
    )


def _make_kernel(C: int, R: int, K: int, m: int, theta: float,
                 max_squarings: int, n_state: int, n_inputs: int,
                 cols_builder: Callable, compute_err: bool,
                 wnorm=None, err_action=None):
    """``wnorm=(w_row, post, kind)`` (lc.WeightedNorm.kernel_parts): the
    embedded error norm becomes post * ||w_row * dv|| with kind "l2" or
    "max". post/kind are Python literals; a non-None w_row arrives as an
    extra (1, D) kernel INPUT after the basis (Pallas rejects captured
    non-scalar constants)."""
    has_wrow = wnorm is not None and wnorm[0] is not None

    def kernel(*refs):
        in_refs = refs[:n_inputs]
        x_refs = refs[n_inputs:n_inputs + n_state]
        basis_ref = refs[n_inputs + n_state]
        off = n_inputs + n_state + 1
        w_ref = refs[off] if has_wrow else None
        off += int(has_wrow)
        y_refs = refs[off:off + n_state]
        e_ref = refs[off + n_state]

        x = (
            x_refs[0][:]
            if n_state == 1
            else jnp.concatenate([r[:] for r in x_refs], axis=1)
        )
        d = x.shape[1] // n_state

        # stepper coefficient rows, built in-kernel from raw inputs:
        # cols[c][r][k] is a (TILE, 1) column
        cols = cols_builder(in_refs)

        # per-ROW scaling: each chain row gets its own squaring count from
        # its own tile-max bound sum_k |c_k| ||M_k||_1 (a long row no
        # longer inflates every other row's pass count — VERDICT r3 #7).
        # (2-D ops only: Mosaic rejects >2-D reshapes/reductions here.)
        norms = [
            jnp.max(jnp.sum(jnp.abs(basis_ref[k]), axis=0))  # scalar
            for k in range(K)
        ]

        def row_scale(c, r):
            b = None
            for k in range(K):
                col = jnp.abs(cols[c][r][k]) * norms[k]
                b = col if b is None else b + col
            # diverged (NaN) lanes: keep s finite; NaNs still reach
            # the output so the controller rejects those lanes
            mxr = jnp.max(jnp.where(jnp.isnan(b), 0.0, b))
            s = jnp.clip(
                jnp.ceil(jnp.log2(jnp.maximum(mxr / theta, 1.0))),
                0, max_squarings,
            ).astype(jnp.int32)
            return (jnp.asarray(2.0, x.dtype) ** (-s.astype(x.dtype)),
                    jnp.left_shift(jnp.ones((), jnp.int32), s))

        outs = []
        for c in range(C):
            v = x
            for r in range(R):
                if cols[c][r] is None:
                    continue   # declared-identity row (e^0 = I): skip
                scale, n_pass = row_scale(c, r)
                cs = [cols[c][r][k] * scale for k in range(K)]

                def taylor_pass(_, v, cs=cs):
                    acc = v
                    term = v
                    for kk in range(1, m + 1):
                        w = None
                        for k in range(K):
                            mv = _row_matmul(term, basis_ref[k])
                            w = cs[k] * mv if w is None else w + cs[k] * mv
                        term = w * (1.0 / kk)
                        acc = acc + term
                    return acc

                v = jax.lax.fori_loop(0, n_pass, taylor_pass, v)
            outs.append(v)

        for i, yr in enumerate(y_refs):
            yr[:] = outs[0][:, i * d:(i + 1) * d]
        if compute_err:
            if err_action is not None:
                # fast_error: dv = (sum_k c_k M_k) y as ONE set of basis
                # contractions on the advanced state (a None column
                # skips its term) instead of a second Taylor chain
                ecols = err_action(in_refs)
                dv = None
                for k in range(K):
                    ck = ecols[k]
                    if ck is None:
                        continue
                    term = ck * _row_matmul(outs[0], basis_ref[k])
                    dv = term if dv is None else dv + term
            else:
                dv = outs[1] - outs[0]
            if wnorm is None:
                e_ref[:] = jnp.sqrt(jnp.sum(dv * dv, axis=1, keepdims=True))
            else:
                _, post, kind = wnorm
                if has_wrow:
                    dv = dv * w_ref[:]
                if kind == "max":
                    en = jnp.max(jnp.abs(dv), axis=1, keepdims=True)
                else:
                    en = jnp.sqrt(jnp.sum(dv * dv, axis=1, keepdims=True))
                e_ref[:] = en if post == 1.0 else en * post
        else:
            e_ref[:] = jnp.zeros_like(e_ref)

    return kernel


def fused_chain_apply(
    inputs: Sequence[jax.Array],   # each (B, w_i) raw stepper inputs
    x_parts: Sequence[jax.Array],  # 1 (real) or 2 (re, im) arrays of (B, d)
    basis: jax.Array,              # (K, D, D) shared working basis
    cols_builder: Callable,        # in-kernel row construction (see module)
    *,
    C: int,
    R: int,
    m: int,
    theta: float,
    max_squarings: int = 16,
    tile: int = 256,
    interpret: bool = False,
    wnorm=None,
    err_action=None,
):
    """One fused stepper-exponential application.

    Returns (y_parts tuple matching x_parts, err_norm (B,) — zeros when
    C == 1). ``wnorm``: declared error norm, see ``_make_kernel``."""
    n_state = len(x_parts)
    B, d = x_parts[0].shape
    D = n_state * d
    K = basis.shape[0]
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    if D % 128 != 0:
        raise ValueError(f"widened dim {D} must be a multiple of 128")
    dtype = x_parts[0].dtype
    kernel = _make_kernel(C, R, K, m, float(theta), max_squarings,
                          n_state, len(inputs), cols_builder,
                          compute_err=C >= 2 or err_action is not None,
                          wnorm=wnorm, err_action=err_action)
    has_wrow = wnorm is not None and wnorm[0] is not None

    def vec_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            *[vec_spec(a.shape[1]) for a in inputs],
            *[vec_spec(d)] * n_state,
            pl.BlockSpec((K, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, D), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)] if has_wrow else []),
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
        *[a.astype(dtype) for a in inputs],
        *x_parts,
        basis.astype(dtype),
        *([jnp.asarray(wnorm[0], dtype)] if has_wrow else []),
    )
    return tuple(outs[:n_state]), outs[n_state].reshape(B)


def chain_expmv_pallas(
    chains: jax.Array,             # (B, C, R, K) UNscaled coefficient rows
    x_parts: Sequence[jax.Array],
    basis: jax.Array,
    *,
    m: int,
    theta: float,
    max_squarings: int = 16,
    tile: int = 256,
    interpret: bool = False,
):
    """Fused chain apply from PREBUILT coefficient rows (generic entry;
    steppers with fixed row structure use fused_chain_apply + a
    cols_builder to avoid materializing chains in XLA at all)."""
    B, C, R, K = chains.shape

    def cols_builder(in_refs):
        (ch_ref,) = in_refs
        return [
            [
                [
                    ch_ref[:, (c * R + r) * K + k:(c * R + r) * K + k + 1]
                    for k in range(K)
                ]
                for r in range(R)
            ]
            for c in range(C)
        ]

    return fused_chain_apply(
        [chains.reshape(B, C * R * K)], x_parts, basis, cols_builder,
        C=C, R=R, m=m, theta=theta, max_squarings=max_squarings,
        tile=tile, interpret=interpret,
    )


def chain_expmv_xla(cs, n_pass, xw, basis, *, m: int = 12, wnorm=None):
    """Pure-XLA reference of the fused kernel (CPU / odd shapes / scalar
    states). cs: (..., C, R, K) PRE-scaled rows; xw: (..., D); n_pass: the
    uniform pass count; returns (y0, err_norm or None). ``wnorm``: declared
    error norm (see ``_make_kernel``) — identical semantics here."""
    C, R, K = cs.shape[-3:]
    batch = jnp.broadcast_shapes(cs.shape[:-3], xw.shape[:-1])
    vs = jnp.broadcast_to(xw[..., None, :], batch + (C, xw.shape[-1]))
    cs = jnp.broadcast_to(cs.astype(xw.dtype), batch + cs.shape[-3:])

    def apply_round(vs, csr):
        # csr: (..., C, K) — all C lanes advance one exponential together
        def taylor_pass(v):
            acc = v
            term = v
            for kk in range(1, m + 1):
                t1 = jnp.einsum("kij,...cj->...cki", basis, term,
                                precision=HIGHEST)
                term = jnp.einsum("...ck,...cki->...ci", csr, t1,
                                  precision=HIGHEST) / kk
                acc = acc + term
            return acc

        def body(carry):
            i, v = carry
            return i + 1, taylor_pass(v)

        _, out = jax.lax.while_loop(
            lambda c: c[0] < n_pass, body,
            (jnp.zeros((), jnp.int32), vs),
        )
        return out

    for r in range(R):
        vs = apply_round(vs, cs[..., :, r, :])
    y0 = vs[..., 0, :]
    if C < 2:
        return y0, None
    d = vs[..., 1, :] - y0
    from ..lc import apply_weighted_norm

    return y0, apply_weighted_norm(d, wnorm)


def _tmatmul(x, M):
    """(TILE, D) x (D, D) -> rows y_i = M^T @ x_i (i.e. x @ M)."""
    return jax.lax.dot_general(
        x, M,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=HIGHEST,
    )


def _adjoint_row_scaling(cols, basis_ref, K, theta, max_squarings, dtype):
    """Per-tile scaling for one reverse row, bound from the |c|-weighted
    basis norms ONLY: the Fréchet series is LINEAR in the direction V
    (each term carries exactly one V factor), so its truncation and
    convergence are governed by ||A_s|| alone — the one-hot direction
    needs scaling for consistency (2^{-s} V) but contributes nothing to
    the required pass count. Returns (scaled cols, scale, n_pass)."""
    norms = [jnp.max(jnp.sum(jnp.abs(basis_ref[k]), axis=0))
             for k in range(K)]
    b = None
    for k in range(K):
        col = jnp.abs(cols[k]) * norms[k]
        b = col if b is None else b + col
    scale, n_pass = _global_scaling(b, theta, max_squarings, dtype)
    return [cols[k] * scale for k in range(K)], scale, n_pass


def _adjoint_row_chains(cs, scale, n_pass, basis_ref, K, m, xv, av):
    """The three chains of one reverse adjoint row (shared by the
    single-step and persistent-sweep kernels):

        x_n  = e^{-A} xv               A = sum_k cs_k W_k (pre-scaled)
        a_n  = e^{A^T} av              (transposed matvecs, no W^T copy)
        us_k = D_{W_k} e^{A} x_n       (cbar_k = <av, us_k>)

    The Fréchet directions use the block-triangular recurrence: for the
    augmented vector (u_k; w), one Taylor term is u_k' = (A u_k + W_k w)/j
    with the w-chain w' = (A w)/j SHARED across all K directions —
    (K² + 2K) D-wide matvecs per term instead of the (2D)-embedding's 8K².
    """

    def A_mv(v, sgn):
        w = None
        for k in range(K):
            mv = _row_matmul(v, basis_ref[k])
            w = cs[k] * mv if w is None else w + cs[k] * mv
        return sgn * w

    def AT_mv(v):
        w = None
        for k in range(K):
            mv = _tmatmul(v, basis_ref[k])
            w = cs[k] * mv if w is None else w + cs[k] * mv
        return w

    def pass_xn(_, v):
        acc = v
        term = v
        for j in range(1, m + 1):
            term = A_mv(term, -1.0) * (1.0 / j)
            acc = acc + term
        return acc

    x_n = jax.lax.fori_loop(0, n_pass, pass_xn, xv)

    def pass_an(_, v):
        acc = v
        term = v
        for j in range(1, m + 1):
            term = AT_mv(term) * (1.0 / j)
            acc = acc + term
        return acc

    a_n = jax.lax.fori_loop(0, n_pass, pass_an, av)

    def pass_fre(_, uw):
        us, w = uw[:K], uw[K]
        acc_w, term_w = w, w
        acc_us = list(us)
        term_us = list(us)
        for j in range(1, m + 1):
            inv = 1.0 / j
            new_us = [
                (A_mv(term_us[k], 1.0)
                 + scale * _row_matmul(term_w, basis_ref[k])) * inv
                for k in range(K)
            ]
            term_w = A_mv(term_w, 1.0) * inv
            acc_w = acc_w + term_w
            for k in range(K):
                acc_us[k] = acc_us[k] + new_us[k]
            term_us = new_us
        return tuple(acc_us) + (acc_w,)

    zero = jnp.zeros_like(x_n)
    uw = jax.lax.fori_loop(
        0, n_pass, pass_fre, tuple(zero for _ in range(K)) + (x_n,))
    return x_n, a_n, uw[:K]


def adjoint_bwd_pallas(
    c: jax.Array,                  # (B, K) per-lane exponent coefficients
    x_next: jax.Array,             # (B, D)
    a_next: jax.Array,             # (B, D)
    basis: jax.Array,              # (K, D, D) working basis W
    *,
    m: int,
    theta: float,
    max_squarings: int = 16,
    tile: int = 256,
    interpret: bool = False,
):
    """ONE fused reverse step of the reversible adjoint (diff.py):

        x_n  = e^{-A} x_next             A = sum_k c_k W_k
        a_n  = e^{A^T} a_next            (transposed matvecs, no W^T copy)
        cbar_k = <a_next, D_{W_k} e^{A} x_n>   for every k

    The Fréchet directions use the block-triangular recurrence instead of
    the (2D)-wide augmented embedding the XLA path runs: for the augmented
    vector (u_k; w), one Taylor term is u_k' = (A u_k + W_k w)/j with the
    w-chain w' = (A w)/j SHARED across all K directions — (K² + 2K) D-wide
    matvecs per term instead of the embedding's 8K², and one kernel launch
    instead of three (the per-dispatch cost dominates small batches on
    this backend). Exact same math, verified bitwise-close in tests.

    Returns (x_n, a_n, cbar) with cbar (B, K).
    """
    B, D = x_next.shape
    K = basis.shape[0]
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    if D % 128 != 0:
        raise ValueError(f"dim {D} must be a multiple of 128")
    dtype = x_next.dtype

    def kernel(c_ref, x_ref, a_ref, basis_ref, xn_ref, an_ref, cb_ref):
        a = a_ref[:]
        cols = [c_ref[:, k:k + 1] for k in range(K)]
        cs, scale, n_pass = _adjoint_row_scaling(
            cols, basis_ref, K, theta, max_squarings, dtype)
        x_n, a_n, us = _adjoint_row_chains(
            cs, scale, n_pass, basis_ref, K, m, x_ref[:], a)
        xn_ref[:] = x_n
        an_ref[:] = a_n
        cb_ref[:] = jnp.concatenate(
            [jnp.sum(a * us[k], axis=1, keepdims=True) for k in range(K)],
            axis=1,
        )

    def vec_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    xn, an, cb = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            vec_spec(K), vec_spec(D), vec_spec(D),
            pl.BlockSpec((K, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[vec_spec(D), vec_spec(D), vec_spec(K)],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), dtype),
            jax.ShapeDtypeStruct((B, D), dtype),
            jax.ShapeDtypeStruct((B, K), dtype),
        ],
        interpret=interpret,
    )(c.astype(dtype), x_next, a_next, basis.astype(dtype))
    return xn, an, cb


def _global_scaling(call_abs_bound, theta, max_squarings, dtype):
    """Shared squaring count for a whole sweep: bound over ALL rows (the
    fixed-step rows share dt, so their norms are near-uniform and a global
    s wastes at most one pass on outlier rows)."""
    mx = jnp.max(jnp.where(jnp.isnan(call_abs_bound), 0.0, call_abs_bound))
    s = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(mx / theta, 1.0))),
        0, max_squarings,
    ).astype(jnp.int32)
    scale = jnp.asarray(2.0, dtype) ** (-s.astype(dtype))
    n_pass = jnp.left_shift(jnp.ones((), jnp.int32), s)
    return scale, n_pass


def adjoint_sweep_fwd_pallas(
    c_all: jax.Array,              # (R, K) per-step exponent coefficients
    x: jax.Array,                  # (B, D)
    basis: jax.Array,              # (K, D, D)
    *,
    m: int,
    theta: float,
    max_squarings: int = 16,
    tile: int = 256,
    interpret: bool = False,
):
    """PERSISTENT forward sweep: all R sequential exponentials of a
    fixed-step modulated solve in ONE kernel launch (the per-step scan
    pays ~a dispatch per row; at B=256 that dominates device time). Rows
    are read from the VMEM-resident (R, K) table with one-hot selects —
    no dynamic indexing (see ops/pallas_loop.py for the pattern)."""
    B, D = x.shape
    R, K = c_all.shape
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    if D % 128 != 0:
        raise ValueError(f"dim {D} must be a multiple of 128")
    dtype = x.dtype

    def kernel(c_ref, x_ref, basis_ref, y_ref):
        xv = x_ref[:]
        norms = [jnp.max(jnp.sum(jnp.abs(basis_ref[k]), axis=0))
                 for k in range(K)]
        b = None
        for k in range(K):
            col = jnp.abs(c_ref[:, k:k + 1]) * norms[k]
            b = col if b is None else b + col
        scale, n_pass = _global_scaling(b, theta, max_squarings, dtype)
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

        def row_step(r, v):
            oh = (rows == r).astype(dtype)
            cs = [jnp.sum(oh * c_ref[:, k:k + 1]) * scale for k in range(K)]

            def tp(_, v):
                acc = v
                term = v
                for j in range(1, m + 1):
                    w = None
                    for k in range(K):
                        mv = _row_matmul(term, basis_ref[k])
                        w = cs[k] * mv if w is None else w + cs[k] * mv
                    term = w * (1.0 / j)
                    acc = acc + term
                return acc

            return jax.lax.fori_loop(0, n_pass, tp, v)

        y_ref[:] = jax.lax.fori_loop(0, R, row_step, xv)

    def vec_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((R, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec(D),
            pl.BlockSpec((K, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=vec_spec(D),
        out_shape=jax.ShapeDtypeStruct((B, D), dtype),
        interpret=interpret,
    )(c_all.astype(dtype), x, basis.astype(dtype))


def adjoint_sweep_bwd_pallas(
    c_all: jax.Array,              # (R, K)
    x_final: jax.Array,            # (B, D)
    a_final: jax.Array,            # (B, D)
    basis: jax.Array,              # (K, D, D)
    *,
    m: int,
    theta: float,
    max_squarings: int = 16,
    tile: int = 256,
    interpret: bool = False,
):
    """PERSISTENT backward sweep: the entire reverse adjoint (trajectory
    reconstruction, transposed cotangent transport, shared-chain Fréchet
    inner products for every row) in ONE launch. Returns
    (a0 (B, D), cbar (n_tiles, R, K)) — sum cbar over axis 0, then one
    vectorized vjp of the coefficient formulas recovers theta/t0/tf
    cotangents for ALL steps at once (diff.py)."""
    B, D = x_final.shape
    R, K = c_all.shape
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    if D % 128 != 0:
        raise ValueError(f"dim {D} must be a multiple of 128")
    dtype = x_final.dtype
    n_tiles = B // tile

    def kernel(c_ref, x_ref, a_ref, basis_ref, a0_ref, cb_ref):
        norms = [jnp.max(jnp.sum(jnp.abs(basis_ref[k]), axis=0))
                 for k in range(K)]
        b = None
        for k in range(K):
            col = jnp.abs(c_ref[:, k:k + 1]) * norms[k]
            b = col if b is None else b + col
        scale, n_pass = _global_scaling(b, theta, max_squarings, dtype)
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

        def row_step(i, carry):
            xv, av, cb = carry
            r = R - 1 - i
            oh = (rows == r).astype(dtype)          # (R, 1)
            cs = [jnp.sum(oh * c_ref[:, k:k + 1]) * scale for k in range(K)]
            x_n, a_n, us = _adjoint_row_chains(
                cs, scale, n_pass, basis_ref, K, m, xv, av)
            cbrow = jnp.concatenate(
                [jnp.sum(av * us[k])[None, None] for k in range(K)],
                axis=1,
            )                                        # (1, K)
            cb = cb + oh * cbrow                     # outer-product scatter
            return (x_n, a_n, cb)

        cb0 = jnp.zeros((R, K), dtype)
        x0, a0, cb = jax.lax.fori_loop(
            0, R, row_step, (x_ref[:], a_ref[:], cb0))
        a0_ref[:] = a0
        cb_ref[0] = cb

    def vec_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    a0, cb = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((R, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec(D), vec_spec(D),
            pl.BlockSpec((K, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            vec_spec(D),
            pl.BlockSpec((1, R, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), dtype),
            jax.ShapeDtypeStruct((n_tiles, R, K), dtype),
        ],
        interpret=interpret,
    )(c_all.astype(dtype), x_final, a_final, basis.astype(dtype))
    return a0, cb
