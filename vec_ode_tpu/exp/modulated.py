"""Modulated-operator fast path: A(t) = sum_k f_k(t) * M_k.

The reference's exponential solvers treat the operator as a black box
sampled at quadrature nodes (``Fun: FnMut(&[T]) -> Vec<L>``, magnus.rs:32,
cfm.rs:54): every step materializes dense per-step operators and
exponentiates them. On TPU that cost model is wrong for the dominant use
case — driven Hamiltonians H(t) = H0 + f(t) V — because per-trajectory
batched (d, d) expm/matvec work is HBM-bound while *shared-matrix* x
*batched-vector* contractions ride the MXU (the same observation behind the
fused RK benchmark kernel, ops/pallas_rk.py).

This module exploits the linear structure the reference's API erases:

  * :class:`ModulatedOperator` — K shared basis matrices M_k (real-pair
    complex or plain real) + a scalar coefficient function c(t) -> (K,).
  * Magnus/CFM steps become COEFFICIENT arithmetic: every exponent the
    stepper needs (Magnus Ω and its order-2 part, each CFM row) is a linear
    combination of the basis — for Magnus-4 extended with the precomputed
    commutators [M_j, M_k] (computed once at stepper construction, NOT per
    step: [A(t1), A(t2)] = sum_{j<k} (g1_j g2_k - g1_k g2_j) [M_j, M_k]).
  * The propagator is never materialized: e^Ω x is evaluated by a
    scaling-and-Taylor action (:func:`modulated_exp_apply`) whose inner
    operation is ONE shared (D, K*D) matmul per Taylor term — under vmap
    over an ensemble this is a (B*L, D) @ (D, K*D) MXU contraction with no
    per-trajectory matrices anywhere.

Cost per Magnus-4 step at d=64, K=2 (driven Hamiltonian): ~m=12 GEMMs of
(2B, 128) @ (128, 3*128) vs the generic path's two batched (B, 128, 128)
expm (~8 batched matmuls of B 128x128 blocks) + a per-step commutator —
about an order of magnitude less arithmetic AND it stays MXU-shaped.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import Cplx, cmatmul, embed
from ..ops.pallas_expmv import chain_expmv_xla, fused_chain_apply
from ..utils.prec import HIGHEST
from .magnus import _B2, _C_MID, _SUB_LEN, _SUB_OFF

Pytree = Any

# Taylor-action (degree, theta) per dtype: smallest degree whose remainder
# |e^t - T_m(t)| at |t| <= theta sits well under dtype eps (f32: m=8 gives
# 2.3e-10 at 0.35; f64: m=12 gives 2.4e-18 at 0.25). Lower degree = fewer
# MXU passes per exponential — the kernel is compute-bound on TPU.
_TAYLOR_CFG = {32: (8, 0.35), 64: (12, 0.25)}


def _taylor_params(dtype, m=None, theta=None):
    """Resolve (m, theta) for a dtype; an explicit m gets a theta making the
    truncation error ~eps for that degree."""
    import math

    bits = jnp.finfo(dtype).bits
    m_def, theta_def = _TAYLOR_CFG[bits]
    if m is None:
        m = m_def
    if theta is None:
        if m == m_def:
            theta = theta_def
        else:
            eps = 2.0 ** (-(23 if bits == 32 else 52))
            lo, hi = 1e-6, 10.0
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                r = sum(mid ** k / math.factorial(k)
                        for k in range(m + 1, m + 30))
                lo, hi = (mid, hi) if r < 0.25 * eps else (lo, mid)
            theta = lo
    return m, theta


def _real_basis(basis) -> jax.Array:
    """(K, D, D) real working basis: ring-embed a Cplx basis, pass real
    through."""
    if isinstance(basis, Cplx):
        return embed(basis)
    return jnp.asarray(basis)


def _widen(x, is_cplx: bool) -> jax.Array:
    if is_cplx:
        return jnp.concatenate([x.re, x.im], axis=-1)
    return x


def _unwiden(xw, is_cplx: bool):
    if is_cplx:
        d = xw.shape[-1] // 2
        return Cplx(xw[..., :d], xw[..., d:])
    return xw


@dataclasses.dataclass(frozen=True)
class ModulatedOperator:
    """A(t) = sum_k coeff_fn(t)[k] * basis[k].

    basis: Cplx of (K, d, d) (real-pair complex) or a real (K, d, d) array.
    coeff_fn: scalar t -> (K,) REAL coefficients (traced; complex structure
    belongs inside the basis matrices, e.g. M = -i*H).
    """

    basis: Any
    coeff_fn: Callable
    # optional kernel-compatible view of coeff_fn: t_col (TILE, 1) ->
    # list of K (TILE, 1) columns built from elementwise jnp ops ONLY.
    # Enables the fully-fused integrator loop (ops/pallas_loop.py), where
    # quadrature sampling happens inside the kernel.
    coeff_cols_fn: Optional[Callable] = None

    @property
    def is_cplx(self) -> bool:
        return isinstance(self.basis, Cplx)

    @property
    def n_terms(self) -> int:
        return jax.tree_util.tree_leaves(self.basis)[0].shape[0]

    def assemble(self, t):
        """Dense A(t) — the generic-path / test view of this operator."""
        c = self.coeff_fn(t)
        if self.is_cplx:
            return Cplx(
                jnp.einsum("k,kij->ij", c, self.basis.re, precision=HIGHEST),
                jnp.einsum("k,kij->ij", c, self.basis.im, precision=HIGHEST),
            )
        return jnp.einsum("k,kij->ij", c, self.basis, precision=HIGHEST)

    def commutator_extension(self):
        """(extended_basis, pair_indices): basis followed by the P=K(K-1)/2
        commutators C_{jk} = [M_j, M_k] (j<k). Concrete arrays — call at
        stepper construction, outside jit."""
        K = self.n_terms
        pairs = [(j, k) for j in range(K) for k in range(j + 1, K)]
        if self.is_cplx:
            def take(i):
                return Cplx(self.basis.re[i], self.basis.im[i])

            comms = [
                cmatmul(take(j), take(k)) - cmatmul(take(k), take(j))
                for (j, k) in pairs
            ]
            ext = Cplx(
                jnp.concatenate(
                    [self.basis.re] + [c.re[None] for c in comms]
                ),
                jnp.concatenate(
                    [self.basis.im] + [c.im[None] for c in comms]
                ),
            )
        else:
            from ..utils.prec import mm

            comms = [
                mm(self.basis[j], self.basis[k])
                - mm(self.basis[k], self.basis[j])
                for (j, k) in pairs
            ]
            ext = jnp.concatenate(
                [jnp.asarray(self.basis)] + [c[None] for c in comms]
            )
        return ext, pairs


def modulated_exp_apply(
    basis_w: jax.Array,
    coeffs: jax.Array,
    xw: jax.Array,
    *,
    m: Optional[int] = None,
    max_squarings: int = 16,
    theta: Optional[float] = None,
) -> jax.Array:
    """y = exp(sum_k coeffs[..., k] * basis_w[k]) @ xw, without materializing
    the exponent or its propagator.

    basis_w: (K, D, D) shared real working basis.
    coeffs:  (..., K) real; xw: (..., D). Batch dims broadcast elementwise.

    Scaling-and-Taylor on the ACTION: uniform squaring count s from the
    1-norm bound sum_k |c_k| ||M_k||_1 (max over the batch — same
    batch-uniform discipline as ops.expm), then 2^s sequential applications
    of the degree-m Taylor polynomial, each Taylor term one shared
    (..., D) x (K, D, D) contraction that XLA lowers to a single
    (prod(batch), D) @ (D, K*D) matmul.
    """
    dtype = xw.dtype
    m, theta = _taylor_params(dtype, m, theta)
    norms = jnp.max(jnp.sum(jnp.abs(basis_w), axis=-2), axis=-1)   # (K,)
    cs, n_pass = _scale_chains(
        coeffs[..., None, None, :].astype(dtype), norms, dtype,
        max_squarings, theta,
    )
    y, _ = chain_expmv_xla(cs, n_pass, xw, basis_w.astype(dtype), m=m)
    return y


def _scale_chains(chains, norms, dtype, max_squarings, theta=None):
    """Uniform scaling for chain coefficients (..., C, R, K): the squaring
    count s comes from the GLOBAL max of the 1-norm bound sum_k |c_k|
    ||M_k||_1 (batch-uniform control flow, as in ops.expm); returns
    (chains / 2^s, n_pass = 2^s)."""
    if theta is None:
        theta = _taylor_params(dtype)[1]
    bound = jnp.sum(jnp.abs(chains) * norms.astype(dtype), axis=-1)
    mx = jnp.max(bound)
    # NaN coefficients (diverged lanes): keep s finite; the NaNs still
    # propagate into the result so the controller rejects those lanes.
    mx = jnp.where(jnp.isfinite(mx), mx, theta)
    s = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(mx / theta, 1.0))), 0, max_squarings
    ).astype(jnp.int32)
    cs = chains * jnp.asarray(2.0, dtype) ** (-s.astype(dtype))
    return cs, jnp.left_shift(jnp.ones((), jnp.int32), s)


def _pick_tile(b: int, cap: int = 256) -> int:
    t = min(cap, b)
    while t > 0 and b % t != 0:
        t //= 2
    return t


def _pallas_ready(op: ModulatedOperator, x, tile=256):
    """(ok, parts, tile): batched 2-D state with lane-aligned widened dim."""
    parts = (x.re, x.im) if op.is_cplx else (x,)
    if parts[0].ndim != 2:
        return False, parts, 0
    D = sum(p.shape[-1] for p in parts)
    if D % 128 != 0:
        return False, parts, 0
    t_eff = _pick_tile(parts[0].shape[0], tile)
    return t_eff >= 8, parts, t_eff


def _fused_result(op, y_parts, e, adaptive):
    y = Cplx(*y_parts) if op.is_cplx else y_parts[0]
    return y, (e if adaptive else None)


def _stepper_wnorm(stepper, parts, group: int = 1):
    """(w_row, post, kind) of the stepper's declared ``norm``
    (lc.WeightedNorm) over the kernels' widened-real layout, a
    widened-vector CALLABLE for a traced norm (lc.TracedNorm — callers
    must gate Pallas kernels off with ``callable(wn)`` and apply it on
    the XLA path), or None. Raises for weights the batched tiers cannot
    lay out (the vmapped tier with a plain ``error_norm=`` callable
    handles those)."""
    wn = getattr(stepper, "norm", None)
    if wn is None:
        return None
    from ..lc import TracedNorm

    if isinstance(wn, TracedNorm):
        if group > 1:
            raise ValueError(
                "traced error norms cannot execute on the lane-packed "
                "layout (callers gate the fused loop off first)")
        is_cplx = stepper.op.is_cplx

        def _traced_exec(dv):
            err = _unwiden(dv, is_cplx)
            if dv.ndim == 1:
                return wn(err)
            return wn.batched(err)

        return _traced_exec
    if not hasattr(wn, "kernel_parts"):
        raise TypeError(
            "norm= must be a DECLARED lc.WeightedNorm (batched steppers "
            "execute it in-kernel); opaque callables go through "
            "error_norm= on a non-batched stepper"
        )
    kp = wn.kernel_parts(parts[0].shape[-1], len(parts), group=group)
    if kp is None:
        raise ValueError(
            "WeightedNorm.weights must be a single per-(complex-)component "
            f"array of length {parts[0].shape[-1]} for the batched/fused "
            "tiers; pass the norm as error_norm= on a non-batched stepper "
            "for arbitrary pytree weights"
        )
    return kp


def _apply_chains(op: ModulatedOperator, basis_w, norms, chains, x, *,
                  m, max_squarings, wnorm=None):
    """Run the chain-exponential action (ops/pallas_expmv.py's XLA
    reference path) on state x — the FALLBACK the steppers use when the
    fused kernel (fused_chain_apply, taken upstream in each step_fn) is
    ineligible.

    chains: (..., C, R, K) coefficient rows; chain 0 is the advance result,
    chain 1 (if present) the embedded comparison whose distance to chain 0
    is returned as the per-trajectory error norm. Works for scalar AND
    natively-batched (t, x, dt).
    """
    parts = (x.re, x.im) if op.is_cplx else (x,)
    dtype = parts[0].dtype
    m, theta = _taylor_params(dtype, m)
    xw = _widen(x, op.is_cplx)
    cs, n_pass = _scale_chains(chains.astype(dtype), norms, dtype,
                               max_squarings, theta)
    y, e = chain_expmv_xla(cs, n_pass, xw, basis_w.astype(dtype), m=m,
                           wnorm=wnorm)
    return _unwiden(y, op.is_cplx), e


def _ineligible(reason: str):
    """Record a fused-loop eligibility failure (opt-in warning via
    config.warn_on_fallback) and return None so the caller falls back."""
    from .. import config

    config._warn_fallback(reason)
    return None


def _fused_dense_interp(op, t_grid, td, dtd, dense_xw):
    """Evaluate the cubic Hermite interpolants from the fused kernel's raw
    dense recordings (ops/pallas_loop._make_loop_kernel ``dense_n``).

    ``td``/``dtd``: (B, n_dense) crossing-step entry time / dt (+inf / 0
    when the slot was never crossed); ``dense_xw``: 2*n_dense widened
    (B, D) endpoint states ordered [x0_j, x1_j]. Endpoint slopes are
    recomputed HERE as A(t)x — the same math as
    dense.solve_linear_dense's slope closure — so the kernel carries no
    derivative registers. Unrecorded slots yield zeros (the XLA dense
    driver's never-crossed convention).

    All n_dense slots evaluate in ONE fused batch
    (dense.hermite_from_endpoints): on this backend every XLA op costs
    ~90 us to dispatch, so a per-slot Python loop (~20 ops x n slots)
    would eat the kernel's dense-output win in post-processing (measured:
    parity with the XLA dense driver instead of the expected multiple)."""
    from ..dense import hermite_from_endpoints

    basis_w = _real_basis(op.basis)
    is_cplx = op.is_cplx
    n = td.shape[1]

    def slope(t, xw):
        # coeff_fn contract: (M,) times -> (M, K) rows (the same shape
        # polymorphism _batched_dense_fallback's slope relies on)
        c = jnp.asarray(op.coeff_fn(t))
        return jnp.einsum("bk,kij,bj->bi", c, basis_w, xw,
                          precision=HIGHEST)

    yw = hermite_from_endpoints(
        t_grid[1:1 + n], td, dtd,
        jnp.stack(dense_xw[0::2], axis=0),          # (n, B, D)
        jnp.stack(dense_xw[1::2], axis=0), slope)
    return [_unwiden(yw[j], is_cplx) for j in range(n)]


def _fused_loop_run(stepper, step_cols_fn, C, R, y0, t_grid, h0, ctl,
                    adaptive, chunk=8, persistent=None, event_cfg=None,
                    err_cols_fn=None, dense=False):
    """Shared fused-integrator-loop harness (ops/pallas_loop.py): runs the
    ENTIRE adaptive loop on-chip — by default as ONE persistent kernel
    launch per solve (in-kernel while loop; ``persistent=False`` falls back
    to chunked launches of ``chunk`` iterations) — and builds a
    driver-compatible Solution. Returns None when the configuration is not
    kernel-eligible (the caller falls back to the XLA driver; each gate
    names its rule for config.warn_on_fallback)."""
    from ..driver import Solution
    from ..ops.pallas_loop import fused_loop_integrate, make_chain_step_builder

    op = stepper.op
    on_tpu = jax.default_backend() == "tpu" or stepper.interpret
    if not (stepper.use_pallas and on_tpu):
        return None   # not a fallback: pallas disabled or non-TPU backend
    if op.coeff_cols_fn is None:
        # structural, not a per-call misconfiguration (e.g. auto_modulated
        # operators project through the user's op_fn, which cannot run
        # in-kernel): the per-STEP fused kernel still engages, so no
        # fallback warning — the path tag records what ran
        return None
    # interior saves live in in-kernel registers; PERSISTENT mode windows
    # large grids over 32-segment launches (pallas_loop._windowed_
    # persistent, VERDICT r4 #5) so VMEM stays constant — the cap is now
    # only a compile-time/scan-length bound. Chunked mode round-trips
    # saves as XLA loop-carry buffers every chunk (~90us per buffer per
    # iteration on this backend) -> keep its tight cap.
    grid_cap = 1026 if (persistent is None or persistent) else 10
    n_dense = 0
    if dense:
        # IN-KERNEL DENSE OUTPUT (dense.py semantics): the kernel
        # integrates the bare [t0, tf] FREE-RUNNING (interior times never
        # truncate dt) and the step CROSSING each interior time records
        # its raw interpolation data (entry/exit state + (t, dt)); the
        # cubic Hermite is evaluated HERE in XLA afterwards — the endpoint
        # slopes A(t)x are recomputable post-hoc, so no VPU interpolation
        # runs in the hot loop. The reference perturbs h at every save
        # (ode.rs:165-176); this path perturbs neither h nor throughput.
        if not (persistent is None or persistent):
            return _ineligible(
                "dense output rides the persistent single-launch fused "
                "mode only (chunked launches would round-trip the "
                "endpoint registers every chunk)")
        n_dense = int(t_grid.shape[0]) - 2
        if n_dense > 16:
            return _ineligible(
                f"{n_dense} dense save times > 16 (each slot keeps two "
                "live (tile, D) endpoint registers in VMEM)")
        if n_dense <= 0:
            dense = False   # bare [t0, tf]: plain solve, nothing to fill
    if not dense and t_grid.shape[0] > grid_cap:
        return _ineligible(
            f"save grid has {t_grid.shape[0]} points > {grid_cap} "
            "(interior saves live in kernel carry buffers)")
    parts = (y0.re, y0.im) if op.is_cplx else (y0,)
    if parts[0].ndim != 2:
        return _ineligible(
            f"state ndim {parts[0].ndim} != 2 (need a (B, d) batch)")
    D = sum(p.shape[-1] for p in parts)
    if t_grid.dtype != parts[0].dtype:
        return _ineligible(
            f"time dtype {t_grid.dtype} != state dtype {parts[0].dtype}")
    B = parts[0].shape[0]
    G = 1
    if D % 128 != 0:
        # LANE-PACKING: a small widened dim (D | 128) packs G = 128/D
        # trajectories into each kernel row over a block-diagonal
        # kron(I_G, M_k) basis — the reference's bread-and-butter regime
        # (2-level Landau-Zener sweeps, dat config 3) runs D=4, 3% lane
        # occupancy unpacked. Every per-trajectory scalar (t, h, status,
        # error norm, counters) lives in its own group COLUMN of the
        # carry blocks (ops/pallas_loop.py:_make_loop_kernel group mode),
        # so adaptive control, per-trajectory h0 and divergent grid
        # hitting all keep exact per-trajectory semantics. NaN states are
        # contained group-wise (make_chain_step_builder); only transient
        # mid-chain overflow can leak — as spurious (conservative)
        # rejections to the row's other groups.
        if 128 % D != 0:
            return _ineligible(
                f"widened state dim {D} divides neither 128 nor is a "
                "multiple of it")
        G = 128 // D
        if B % G != 0:
            return _ineligible(
                f"batch {B} is not a multiple of the packing group {G} "
                f"(= 128/{D})")
    Bp = B // G
    # persistent LOOP kernels crash the TPU runtime at tile=256 with >=64
    # grid cells (CLAUDE.md); tile=256 below that regime measures ~9%
    # faster, so cap to 128 only where 256 would enter it
    t_eff = _pick_tile(Bp)
    if t_eff == 256 and Bp // 256 >= 64:
        t_eff = _pick_tile(Bp, cap=128)
    # >8 live (tile, D) state registers at tile=256 is an untested VMEM
    # regime (each interior save is one register through the whole
    # in-kernel loop; each dense slot is TWO — its step endpoints):
    # cap the tile to bound the footprint
    if (t_grid.shape[0] > 10 if not dense else 2 * n_dense > 8):
        t_eff = min(t_eff, 128)
        while t_eff > 0 and Bp % t_eff != 0:
            t_eff //= 2
    if t_eff < 8:
        return _ineligible(
            f"batch {B}" + (f" (packed rows {Bp})" if G > 1 else "")
            + " gives a kernel tile < 8")

    basis_w = (
        stepper._ext_basis_w
        if hasattr(stepper, "_ext_basis_w")
        else _real_basis(op.basis)
    )
    if G > 1:
        # block-diagonal working basis kron(I_G, M_k): exp(kron(I, M)) =
        # kron(I, exp(M)) and the Taylor action is a plain matmul, so each
        # packed trajectory evolves EXACTLY as unpacked (zero cross terms)
        eye_g = jnp.eye(G, dtype=basis_w.dtype)
        basis_k = jnp.einsum("gh,kij->kgihj", eye_g, basis_w).reshape(
            basis_w.shape[0], G * D, G * D
        )
        xw0 = jnp.concatenate(parts, axis=1)          # (B, D) widened
        kparts = (xw0.reshape(Bp, G * D),)
    else:
        basis_k = basis_w
        kparts = parts
    wnorm = None
    if getattr(stepper, "norm", None) is not None:
        from ..lc import TracedNorm

        if isinstance(stepper.norm, TracedNorm):
            return _ineligible(
                "traced (opaque-callable) error norm cannot run inside "
                "the fused loop kernel; the batched XLA driver applies it")
        if ctl.scaled_error:
            raise ValueError(
                "scaled_error and a declared WeightedNorm are mutually "
                "exclusive (both redefine the controller's error measure)"
            )
        wnorm = _stepper_wnorm(stepper, parts, group=G)
        if wnorm[2] == "max" and G > 1:
            return _ineligible(
                "max-kind WeightedNorm with lane packing (a segment max "
                "cannot ride the one-hot reduction matmul); the XLA "
                "driver applies it instead")
    ev_spec = None
    if event_cfg is not None:
        ev_spec = event_cfg.kernel_spec(parts[0].shape[-1], len(parts),
                                        dtype=parts[0].dtype)
        if ev_spec is None:
            return _ineligible(
                "events= with untraceable callables cannot run in-kernel; "
                "declare events.LinearObservable / QuadraticObservable "
                "or pass plain-jnp callables for the fused loop (an "
                "untraceable g(t, x) cannot run under jit on the XLA "
                "tier either)")
        if ev_spec.n > 8:
            return _ineligible(
                f"{ev_spec.n} events > 8 (found-bits budget of the "
                "in-kernel event state)")
        if ev_spec.n * ev_spec.k > 32:
            return _ineligible(
                f"{ev_spec.n} events x max_crossings={ev_spec.k} > 32 "
                "located-time slots (float-carry column budget of the "
                "in-kernel event state)")
        if ev_spec.any_traced and G > 1:
            return _ineligible(
                "traced event callables with lane packing (unpacking a "
                "packed row in-kernel needs a 3-D reshape Mosaic "
                "rejects); the XLA driver runs them instead")
    m, theta = _taylor_params(parts[0].dtype, stepper.m)
    builder = make_chain_step_builder(
        C, R, basis_w.shape[0], m, float(theta), stepper.max_squarings,
        step_cols_fn,
        scaled=(ctl.atol, ctl.rtol) if ctl.scaled_error else None,
        group=G, wnorm=wnorm, err_action=err_cols_fn,
    )
    consts = [basis_k.reshape(-1, basis_k.shape[-1])]
    if wnorm is not None and wnorm[0] is not None:
        # declared per-component weights ride as a (1, G*D) const input
        # (Pallas rejects captured non-scalar constants)
        consts.append(jnp.asarray(wnorm[0], parts[0].dtype))
    k_grid = jnp.stack([t_grid[0], t_grid[-1]]) if dense else t_grid
    out = fused_loop_integrate(
        # the chain builder takes the basis stacked row-wise (K*D, D):
        # one (TILE, D) @ (D, K*D) MXU contraction per Taylor term
        k_grid, kparts, h0, consts,
        builder,
        adaptive=adaptive, ctl=ctl, chunk=chunk,
        persistent=(persistent is None or persistent), tile=t_eff,
        interpret=stepper.interpret, group=G, events=ev_spec,
        dense_times=(t_grid[1:-1] if dense else None),
    )
    fs, ist, xparts, saves, ev_y = out[:5]
    dense_x = out[5] if dense else ()
    n_grid = t_grid.shape[0]
    n_grid_k = k_grid.shape[0]
    from ..ops.pallas_loop import N_F, N_I
    n_ev = 0 if ev_spec is None else ev_spec.n
    n_k = ev_spec.k if n_ev else 1
    base_d = N_F + (n_ev * (n_k + 2) + 1 if n_ev else 0)
    n_f_eff = base_d + 2 * n_dense
    if G > 1:
        # unpack rows -> trajectories (quantity-major carry blocks:
        # trajectory b = row b//G, group column b%G)
        d_half = parts[0].shape[-1]

        def unpack(buf):
            xw = buf.reshape(B, D)
            if op.is_cplx:
                return (xw[:, :d_half], xw[:, d_half:])
            return (xw,)

        xparts = unpack(xparts[0])
        saves = tuple(p for g in range(n_grid_k - 2)
                      for p in unpack(saves[g]))
        ev_y = tuple(p for e in range(len(ev_y))
                     for p in unpack(ev_y[e]))
        dense_xw = tuple(b.reshape(B, D) for b in dense_x)
        fs = jnp.stack(
            [fs[:, q * G:(q + 1) * G].reshape(B) for q in range(n_f_eff)],
            axis=1)
        ist = jnp.stack(
            [ist[:, q * G:(q + 1) * G].reshape(B) for q in range(N_I)],
            axis=1)
    else:
        n_ps0 = len(parts)
        dense_xw = tuple(
            jnp.concatenate(dense_x[b * n_ps0:(b + 1) * n_ps0], axis=-1)
            if n_ps0 > 1 else dense_x[b]
            for b in range(2 * n_dense)
        )
    x_final = Cplx(*xparts) if op.is_cplx else xparts[0]
    n_ps = len(parts)
    if dense:
        interior = _fused_dense_interp(
            op, t_grid, fs[:, base_d:base_d + n_dense],
            fs[:, base_d + n_dense:base_d + 2 * n_dense], dense_xw)
    else:
        interior = [
            Cplx(*saves[g * n_ps:(g + 1) * n_ps]) if op.is_cplx
            else saves[g]
            for g in range(n_grid - 2)
        ]
    reached = ist[:, 0] >= n_grid_k

    def sel_end(xf, x0z):
        m_ = reached.reshape(reached.shape + (1,) * (xf.ndim - 1))
        return jnp.where(m_, xf, jnp.zeros_like(x0z))

    ys = jax.tree_util.tree_map(
        lambda x0l, *rest: jnp.stack(
            [x0l, *rest[:-1], sel_end(rest[-1], x0l)], axis=1
        ),
        y0, *interior, x_final,
    )
    event_t = event_found = event_y = event_t_k = event_count = None
    if n_ev:
        # extra float-carry columns: [g_prev xE | t_ev xE*K | count xE |
        # h_entry] after N_F; found bits in int column 7
        # (pallas_loop._make_loop_kernel layout)
        event_t_k = fs[:, N_F + n_ev:N_F + n_ev * (n_k + 1)].reshape(
            B, n_ev, n_k)
        event_t = event_t_k[:, :, 0]
        event_count = fs[
            :, N_F + n_ev * (n_k + 1):N_F + n_ev * (n_k + 2)
        ].astype(jnp.int32)
        bits = ist[:, 7]
        event_found = jnp.stack(
            [((bits >> e) & 1) == 1 for e in range(n_ev)], axis=1)
        if ev_spec.record_y:
            n_ps = len(parts)
            event_y = jax.tree_util.tree_map(
                lambda *evs: jnp.stack(evs, axis=1),
                *[Cplx(*ev_y[e * n_ps:(e + 1) * n_ps]) if op.is_cplx
                  else ev_y[e] for e in range(n_ev)],
            )
    return Solution(
        ts=jnp.broadcast_to(t_grid, (B,) + t_grid.shape),
        ys=ys,
        t_final=fs[:, 0],
        y_final=x_final,
        status=ist[:, 1],
        n_accept=ist[:, 3],
        n_reject=ist[:, 4],
        n_iters=ist[:, 5],
        h_final=fs[:, 1],
        event_t=event_t,
        event_found=event_found,
        event_y=event_y,
        event_t_k=event_t_k,
        event_count=event_count,
        path=("pallas-loop-persistent"
              if (persistent is None or persistent)
              else "pallas-loop-chunked") + ("-packed" if G > 1 else "")
        + ("-dense" if dense else ""),
    )


def _modulated_step_path(self, y0) -> str:
    """Static execution-path tag for the per-STEP stepper under the XLA
    driver (Solution.path annotation; the whole-loop kernel reports its own
    tag from fused_loop_solve)."""
    if self.use_pallas and (jax.default_backend() == "tpu"
                            or self.interpret):
        ok, _, _ = _pallas_ready(self.op, y0)
        if ok:
            return "xla-driver+pallas-step"
    return "xla-driver"


@dataclasses.dataclass(frozen=True)
class MidpointModulated:
    """Exponential midpoint (Magnus-2) on a modulated operator: the
    propagator action e^{dt A(t+dt/2)} x via shared-basis Taylor — no dense
    operator, no expm (cf. magnus.rs:10-26 for the generic semantics)."""

    op: ModulatedOperator
    m: Optional[int] = None          # Taylor degree; None = dtype default
    max_squarings: int = 16
    use_pallas: bool = True
    interpret: bool = False

    nfev_per_step: int = 1
    # step math is pure trailing-axis broadcasting, so the same step_fn
    # serves scalar solves AND the batched-carry ensemble driver (which
    # avoids the vmapped driver's higher per-iteration overhead)
    is_batched = True
    # err comes back as a per-trajectory NORM (computed in-kernel), not an
    # error vector — the driver applies error_norm=identity (the same
    # convention as ops.pallas_rk.FusedModulatedLinearRK)
    error_norm = staticmethod(lambda e: e)
    prefers_packed_carry = True   # many-GEMM loop body: packed carry wins
    step_path = _modulated_step_path

    def make_step_fn(self, op_fn=None):
        basis_w = _real_basis(self.op.basis)
        norms = jnp.max(jnp.sum(jnp.abs(basis_w), axis=-2), axis=-1)
        use_pallas = self.use_pallas and (
            jax.default_backend() == "tpu" or self.interpret
        )

        K0 = self.op.n_terms

        def cols_builder(in_refs):
            g_ref, dt_ref = in_refs
            dt = dt_ref[:]
            return [[[dt * g_ref[:, k:k + 1] for k in range(K0)]]]

        def step_fn(t, x, dt):
            g = self.op.coeff_fn(t + 0.5 * dt)               # (..., K)
            dt1 = jnp.asarray(dt)[..., None]
            if use_pallas:
                ok, parts, t_eff = _pallas_ready(self.op, x)
                if ok:
                    B = parts[0].shape[0]
                    taylor_m, theta = _taylor_params(parts[0].dtype, self.m)
                    y_parts, _ = fused_chain_apply(
                        [g, jnp.broadcast_to(dt1, (B, 1))],
                        parts, basis_w, cols_builder,
                        C=1, R=1, m=taylor_m, theta=theta,
                        max_squarings=self.max_squarings,
                        tile=t_eff, interpret=self.interpret,
                    )
                    return _fused_result(self.op, y_parts, None, False)
            chains = (dt1 * g)[..., None, None, :]
            xf, _ = _apply_chains(
                self.op, basis_w, norms, chains, x,
                m=self.m, max_squarings=self.max_squarings,
            )
            return xf, None

        return step_fn


    def _step_cols_fn(self):
        cc = self.op.coeff_cols_fn

        def step_cols(t, dt):
            g = cc(t + 0.5 * dt)
            return [[[dt * g[k] for k in range(self.op.n_terms)]]]

        return step_cols

    def fused_loop_solve(self, y0, t_grid, h0, *, ctl, adaptive,
                         chunk: int = 8, persistent=None, events=None,
                         dense: bool = False):
        """Whole-loop on-chip integration (ops/pallas_loop.py); None if the
        config is not kernel-eligible. Midpoint has no error estimate, so
        adaptive requests fall back (the driver raises the proper error).
        ``dense``: interior grid times become free-running interpolated
        saves recorded in-kernel (dense.py semantics)."""
        if adaptive:
            return None
        return _fused_loop_run(
            self, self._step_cols_fn(), 1, 1, y0, t_grid, h0, ctl,
            adaptive=False, chunk=chunk, persistent=persistent,
            event_cfg=events, dense=dense,
        )


@dataclasses.dataclass(frozen=True)
class MagnusModulated4:
    """Magnus-4 on a modulated operator (generic semantics: magnus.rs:28-83,
    with the error norm wired correctly as in exp/magnus.py).

    The per-step commutator [A(t1), A(t2)] collapses onto the PRECOMPUTED
    commutator basis [M_j, M_k]; the order-4 and order-2 propagator actions
    run as two coefficient lanes of one shared-basis Taylor apply."""

    op: ModulatedOperator
    adaptive: bool = True
    m: Optional[int] = None          # Taylor degree; None = dtype default
    max_squarings: int = 16
    use_pallas: bool = True
    interpret: bool = False
    # declared error norm (lc.WeightedNorm) — executed natively on every
    # tier incl. the fused loop kernel (reference NormFn, cfm.rs:131-155)
    norm: Optional[Any] = None
    # estimate the error as w2*xf (leading term of the order-2/4 gap; ONE
    # basis contraction on the advanced state) instead of propagating the
    # order-2 comparison chain: nearly halves the per-step Taylor work.
    # Same semantics as exp/magnus.py Magnus4(fast_error=True) — exact
    # f64 parity with it; opt-in (different error CONSTANT than the pair)
    fast_error: bool = False

    nfev_per_step: int = 2
    is_batched = True     # see MidpointModulated
    error_norm = staticmethod(lambda e: e)
    prefers_packed_carry = True
    step_path = _modulated_step_path

    def __post_init__(self):
        ext, pairs = self.op.commutator_extension()
        object.__setattr__(self, "_ext_basis_w", _real_basis(ext))
        object.__setattr__(self, "_pairs", pairs)

    def make_step_fn(self, op_fn=None):
        basis_w = self._ext_basis_w
        pairs = self._pairs
        norms = jnp.max(jnp.sum(jnp.abs(basis_w), axis=-2), axis=-1)
        use_pallas = self.use_pallas and (
            jax.default_backend() == "tpu" or self.interpret
        )

        K0 = self.op.n_terms
        adaptive = self.adaptive
        fast_err = adaptive and self.fast_error

        def _w2_cols(g1c, g2c, dt):
            return [
                (_B2 * dt * dt) * (
                    g1c[:, j:j + 1] * g2c[:, k2:k2 + 1]
                    - g1c[:, k2:k2 + 1] * g2c[:, j:j + 1]
                )
                for (j, k2) in pairs
            ]

        def cols_builder(in_refs):
            # all Magnus-4 coefficient arithmetic on (TILE, 1) columns —
            # zero XLA dispatches for w1 / the commutator weights / chains
            g1_ref, g2_ref, dt_ref = in_refs
            dt = dt_ref[:]
            w1 = [
                0.5 * dt * (g1_ref[:, k:k + 1] + g2_ref[:, k:k + 1])
                for k in range(K0)
            ]
            w2 = _w2_cols(g1_ref[:], g2_ref[:], dt)
            main = w1 + w2
            if not adaptive or fast_err:
                return [[main]]
            low = w1 + [jnp.zeros_like(dt) for _ in pairs]
            return [[main], [low]]

        def err_action(in_refs):
            # fast_error: dv = w2 * xf — only the commutator columns
            # contribute (None skips the K0 basis terms)
            g1_ref, g2_ref, dt_ref = in_refs
            return ([None] * K0
                    + _w2_cols(g1_ref[:], g2_ref[:], dt_ref[:]))

        def step_fn(t, x, dt):
            dt1 = jnp.asarray(dt)[..., None]                 # (..., 1)
            t_mid = t + 0.5 * dt
            g1 = self.op.coeff_fn(t_mid - _C_MID * dt)       # (..., K)
            g2 = self.op.coeff_fn(t_mid + _C_MID * dt)

            if use_pallas:
                ok, parts, t_eff = _pallas_ready(self.op, x)
                wn_k = _stepper_wnorm(self, parts) if ok else None
                # a traced (opaque-callable) norm cannot run in-kernel:
                # fall through to the XLA step, which applies it
                if ok and not callable(wn_k):
                    B = parts[0].shape[0]
                    taylor_m, theta = _taylor_params(parts[0].dtype, self.m)
                    y_parts, e = fused_chain_apply(
                        [g1, g2, jnp.broadcast_to(dt1, (B, 1))],
                        parts, basis_w, cols_builder,
                        C=1 if (fast_err or not adaptive) else 2, R=1,
                        m=taylor_m, theta=theta,
                        max_squarings=self.max_squarings,
                        tile=t_eff, interpret=self.interpret,
                        wnorm=wn_k,
                        err_action=err_action if fast_err else None,
                    )
                    return _fused_result(self.op, y_parts, e, adaptive)

            w1 = 0.5 * dt1 * (g1 + g2)                       # (..., K)
            if pairs:
                j = np.array([p[0] for p in pairs])
                k = np.array([p[1] for p in pairs])
                w2 = (_B2 * dt1 * dt1) * (
                    g1[..., j] * g2[..., k] - g1[..., k] * g2[..., j]
                )                                            # (..., P)
            else:
                w2 = jnp.zeros(w1.shape[:-1] + (0,), w1.dtype)
            main = jnp.concatenate([w1, w2], axis=-1)        # (..., K + P)
            if not adaptive or fast_err:
                chains = main[..., None, None, :]            # (..., 1, 1, K')
            else:
                low = jnp.concatenate([w1, jnp.zeros_like(w2)], axis=-1)
                chains = jnp.stack([main, low], axis=-2)[..., :, None, :]
            wn = _stepper_wnorm(
                self, (x.re, x.im) if self.op.is_cplx else (x,))
            xf, e = _apply_chains(
                self.op, basis_w, norms, chains, x,
                m=self.m, max_squarings=self.max_squarings,
                # C=1 under fast_err: the pair error (and its norm) is
                # not computed there — the estimate below owns the norm
                wnorm=None if fast_err else wn,
            )
            if fast_err:
                # dv = w2*xf over the commutator sub-basis (magnus.py
                # fast_error semantics, exact f64 parity)
                from ..lc import apply_weighted_norm

                xw = _widen(xf, self.op.is_cplx)
                comm_w = basis_w[K0:].astype(xw.dtype)
                mv = jnp.einsum("kij,...j->...ki", comm_w, xw,
                                precision=HIGHEST)
                dv = jnp.einsum("...k,...ki->...i", w2.astype(xw.dtype),
                                mv, precision=HIGHEST)
                e = apply_weighted_norm(dv, wn)
            return xf, e

        return step_fn


    def _step_cols_fn(self):
        cc = self.op.coeff_cols_fn
        pairs = self._pairs
        K0 = self.op.n_terms
        adaptive = self.adaptive

        fast_err = adaptive and self.fast_error

        def step_cols(t, dt):
            tm = t + 0.5 * dt
            g1 = cc(tm - _C_MID * dt)
            g2 = cc(tm + _C_MID * dt)
            w1 = [0.5 * dt * (g1[k] + g2[k]) for k in range(K0)]
            w2 = [
                (_B2 * dt * dt) * (g1[j] * g2[k2] - g1[k2] * g2[j])
                for (j, k2) in pairs
            ]
            main = w1 + w2
            if not adaptive or fast_err:
                return [[main]]
            return [[main], [w1 + [jnp.zeros_like(dt) for _ in pairs]]]

        return step_cols

    def _err_cols_fn(self):
        """fast_error action columns for the loop kernel: w2 over the
        commutator sub-basis (None skips the K0 basis terms)."""
        cc = self.op.coeff_cols_fn
        pairs = self._pairs
        K0 = self.op.n_terms

        def err_cols(t, dt):
            tm = t + 0.5 * dt
            g1 = cc(tm - _C_MID * dt)
            g2 = cc(tm + _C_MID * dt)
            return [None] * K0 + [
                (_B2 * dt * dt) * (g1[j] * g2[k2] - g1[k2] * g2[j])
                for (j, k2) in pairs
            ]

        return err_cols

    def fused_loop_solve(self, y0, t_grid, h0, *, ctl, adaptive,
                         chunk: int = 8, persistent=None, events=None,
                         dense: bool = False):
        """Whole-loop on-chip integration (ops/pallas_loop.py); None if the
        config is not kernel-eligible. ``events``: an EventConfig of
        declared observables runs IN-KERNEL (events.py). ``dense``:
        interior grid times become free-running interpolated saves
        recorded in-kernel (dense.py semantics)."""
        if adaptive != self.adaptive:
            return None
        fast_err = self.adaptive and self.fast_error
        return _fused_loop_run(
            self, self._step_cols_fn(),
            1 if (fast_err or not self.adaptive) else 2, 1,
            y0, t_grid, h0, ctl, adaptive=adaptive, chunk=chunk,
            persistent=persistent, event_cfg=events,
            err_cols_fn=self._err_cols_fn() if fast_err else None,
            dense=dense,
        )


@dataclasses.dataclass(frozen=True)
class MagnusModulated6:
    """Magnus-6 (Yoshida triple-jump of the symmetric Magnus-4 step, see
    exp/magnus.py:magnus6_step) on a modulated operator. The three
    sub-interval exponents and the embedded full-interval Magnus-4
    comparison all collapse onto the shared commutator-extended basis:
    main chain = 3 coefficient rows, error chain = [full-M4 row, 0, 0]
    (e^0 = I exactly), one fused kernel per step — and the whole driver
    loop on-chip via fused_loop_solve. No order-6 scheme exists anywhere
    in the reference."""

    op: ModulatedOperator
    adaptive: bool = True
    m: Optional[int] = None          # Taylor degree; None = dtype default
    max_squarings: int = 16
    use_pallas: bool = True
    interpret: bool = False
    norm: Optional[Any] = None   # declared WeightedNorm, see MagnusModulated4

    is_batched = True     # see MidpointModulated
    error_norm = staticmethod(lambda e: e)
    prefers_packed_carry = True
    step_path = _modulated_step_path

    @property
    def nfev_per_step(self) -> int:
        # 3 sub-intervals x 2 GL nodes, plus the 2 full-interval comparison
        # nodes only in adaptive mode
        return 8 if self.adaptive else 6

    def __post_init__(self):
        ext, pairs = self.op.commutator_extension()
        object.__setattr__(self, "_ext_basis_w", _real_basis(ext))
        object.__setattr__(self, "_pairs", pairs)

    def _node_times(self, t, dt):
        """8 GL2 sample times: (sub0_a, sub0_b, sub1_a, sub1_b, sub2_a,
        sub2_b[, full_a, full_b])."""
        ts = []
        for off, ln in zip(_SUB_OFF, _SUB_LEN):
            tm = t + (off + 0.5 * ln) * dt
            ts += [tm - _C_MID * ln * dt, tm + _C_MID * ln * dt]
        if self.adaptive:
            tm = t + 0.5 * dt
            ts += [tm - _C_MID * dt, tm + _C_MID * dt]
        return ts

    def make_step_fn(self, op_fn=None):
        basis_w = self._ext_basis_w
        pairs = self._pairs
        norms = jnp.max(jnp.sum(jnp.abs(basis_w), axis=-2), axis=-1)
        use_pallas = self.use_pallas and (
            jax.default_backend() == "tpu" or self.interpret
        )

        K0 = self.op.n_terms
        adaptive = self.adaptive
        n_nodes = 8 if adaptive else 6

        def cols_builder(in_refs):
            g_refs = in_refs[:n_nodes]
            dt = in_refs[n_nodes][:]

            def m4_row(ga, gb, dts):
                w1 = [0.5 * dts * (ga[:, k:k + 1] + gb[:, k:k + 1])
                      for k in range(K0)]
                w2 = [
                    (_B2 * dts * dts) * (
                        ga[:, j:j + 1] * gb[:, k2:k2 + 1]
                        - ga[:, k2:k2 + 1] * gb[:, j:j + 1]
                    )
                    for (j, k2) in pairs
                ]
                return w1 + w2

            main = [
                m4_row(g_refs[2 * i], g_refs[2 * i + 1],
                       float(_SUB_LEN[i]) * dt)
                for i in range(3)
            ]
            if not adaptive:
                return [main]
            # error chain = [full-interval M4 row, I, I]: the identity
            # rows are DECLARED as None so the kernel skips their Taylor
            # passes entirely (2 of 6 row-actions saved per step)
            err = [m4_row(g_refs[6], g_refs[7], dt), None, None]
            return [main, err]

        def step_fn(t, x, dt):
            dt1 = jnp.asarray(dt)[..., None]                 # (..., 1)
            gs = [self.op.coeff_fn(tn) for tn in self._node_times(t, dt)]

            if use_pallas:
                ok, parts, t_eff = _pallas_ready(self.op, x)
                wn_k = _stepper_wnorm(self, parts) if ok else None
                # traced norms fall through to the XLA step (see MM4)
                if ok and not callable(wn_k):
                    B = parts[0].shape[0]
                    taylor_m, theta = _taylor_params(parts[0].dtype, self.m)
                    y_parts, e = fused_chain_apply(
                        [*gs, jnp.broadcast_to(dt1, (B, 1))],
                        parts, basis_w, cols_builder,
                        C=2 if adaptive else 1, R=3,
                        m=taylor_m, theta=theta,
                        max_squarings=self.max_squarings,
                        tile=t_eff, interpret=self.interpret,
                        wnorm=wn_k,
                    )
                    return _fused_result(self.op, y_parts, e, adaptive)

            def m4_row(ga, gb, dts):
                w1 = 0.5 * dts * (ga + gb)                   # (..., K)
                if pairs:
                    j = np.array([p[0] for p in pairs])
                    k = np.array([p[1] for p in pairs])
                    w2 = (_B2 * dts * dts) * (
                        ga[..., j] * gb[..., k] - ga[..., k] * gb[..., j]
                    )
                else:
                    w2 = jnp.zeros(w1.shape[:-1] + (0,), w1.dtype)
                return jnp.concatenate([w1, w2], axis=-1)    # (..., K + P)

            main = jnp.stack(
                [m4_row(gs[2 * i], gs[2 * i + 1], float(_SUB_LEN[i]) * dt1)
                 for i in range(3)], axis=-2)                # (..., 3, K')
            if not adaptive:
                chains = main[..., None, :, :]               # (..., 1, 3, K')
            else:
                full = m4_row(gs[6], gs[7], dt1)
                err = jnp.concatenate(
                    [full[..., None, :],
                     jnp.zeros(full.shape[:-1] + (2, full.shape[-1]),
                               full.dtype)], axis=-2)        # (..., 3, K')
                chains = jnp.stack([main, err], axis=-3)     # (..., 2, 3, K')
            return _apply_chains(
                self.op, basis_w, norms, chains, x,
                m=self.m, max_squarings=self.max_squarings,
                wnorm=_stepper_wnorm(
                    self, (x.re, x.im) if self.op.is_cplx else (x,)),
            )

        return step_fn

    def _step_cols_fn(self):
        cc = self.op.coeff_cols_fn
        pairs = self._pairs
        K0 = self.op.n_terms
        adaptive = self.adaptive

        def step_cols(t, dt):
            def m4_row(ga, gb, dts):
                w1 = [0.5 * dts * (ga[k] + gb[k]) for k in range(K0)]
                w2 = [
                    (_B2 * dts * dts) * (ga[j] * gb[k2] - ga[k2] * gb[j])
                    for (j, k2) in pairs
                ]
                return w1 + w2

            subs = []
            for off, ln in zip(_SUB_OFF, _SUB_LEN):
                tm = t + (off + 0.5 * ln) * dt
                ga = cc(tm - _C_MID * ln * dt)
                gb = cc(tm + _C_MID * ln * dt)
                subs.append(m4_row(ga, gb, float(ln) * dt))
            if not adaptive:
                return [subs]
            tm = t + 0.5 * dt
            full = m4_row(cc(tm - _C_MID * dt), cc(tm + _C_MID * dt), dt)
            # None rows = declared identities, skipped in-kernel
            return [subs, [full, None, None]]

        return step_cols

    def fused_loop_solve(self, y0, t_grid, h0, *, ctl, adaptive,
                         chunk: int = 8, persistent=None, events=None,
                         dense: bool = False):
        """Whole-loop on-chip integration (ops/pallas_loop.py); None if the
        config is not kernel-eligible. ``events``/``dense``: see
        MagnusModulated4."""
        if adaptive != self.adaptive:
            return None
        return _fused_loop_run(
            self, self._step_cols_fn(), 2 if self.adaptive else 1, 3,
            y0, t_grid, h0, ctl, adaptive=adaptive, chunk=chunk,
            persistent=persistent, event_cfg=events, dense=dense,
        )


@dataclasses.dataclass(frozen=True)
class CFMModulated:
    """Commutator-free Magnus on a modulated operator (generic semantics:
    cfm_general, cfm.rs:43-100). Each exponential's operator is a pure basis
    lincomb: rho_i = dt * sum_j alpha[i, j] * c(t + c_j dt) — no dense
    operator assembly, no expm.

    Applications within one chain are sequential (x_i = e^{rho_i} x_{i-1}),
    but the main and error chains both start from x, so round r applies the
    available lanes of both chains in ONE shared Taylor call."""

    op: ModulatedOperator
    alpha: tuple
    c: tuple
    alpha_err: Optional[tuple] = None
    m: Optional[int] = None          # Taylor degree; None = dtype default
    max_squarings: int = 16
    use_pallas: bool = True
    interpret: bool = False
    norm: Optional[Any] = None   # declared WeightedNorm, see MagnusModulated4

    is_batched = True     # see MidpointModulated
    error_norm = staticmethod(lambda e: e)
    prefers_packed_carry = True
    step_path = _modulated_step_path

    @property
    def nfev_per_step(self) -> int:
        return len(self.c)

    def make_step_fn(self, op_fn=None):
        basis_w = _real_basis(self.op.basis)
        alpha = np.asarray(self.alpha)
        c_nodes = np.asarray(self.c)
        alpha_err = (
            None if self.alpha_err is None else np.asarray(self.alpha_err)
        )
        n_main = alpha.shape[0]
        n_err = 0 if alpha_err is None else alpha_err.shape[0]

        if n_err > n_main:
            raise ValueError(
                "error chain longer than the main chain is unsupported "
                f"({n_err} > {n_main})"
            )
        norms = jnp.max(jnp.sum(jnp.abs(basis_w), axis=-2), axis=-1)
        use_pallas = self.use_pallas and (
            jax.default_backend() == "tpu" or self.interpret
        )

        K0 = self.op.n_terms
        J = len(c_nodes)
        adaptive = alpha_err is not None

        def cols_builder(in_refs):
            # rho[i][k] = dt * sum_j alpha[i, j] g_j[k], alpha static floats
            # unrolled — zero XLA dispatches for the row contraction
            g_refs = in_refs[:J]
            dt_ref = in_refs[J]
            dt = dt_ref[:]

            def rows_for(mat, n_rows):
                rows = []
                for i in range(n_rows):
                    row = []
                    for k in range(K0):
                        acc = None
                        for jn in range(J):
                            if mat[i, jn] == 0.0:
                                continue
                            term = float(mat[i, jn]) * g_refs[jn][:, k:k + 1]
                            acc = term if acc is None else acc + term
                        row.append(dt * acc)
                    rows.append(row)
                return rows

            main = rows_for(alpha, n_main)
            if not adaptive:
                return [main]
            err_rows = rows_for(alpha_err, n_err)
            zero_row = [jnp.zeros_like(dt) for _ in range(K0)]
            err_rows += [zero_row] * (n_main - n_err)
            return [main, err_rows]

        def step_fn(t, x, dt):
            dt1 = jnp.asarray(dt)[..., None]                 # (..., 1)
            gs = [self.op.coeff_fn(t + float(cj) * dt) for cj in c_nodes]

            if use_pallas:
                ok, parts, t_eff = _pallas_ready(self.op, x)
                wn_k = _stepper_wnorm(self, parts) if ok else None
                # traced norms fall through to the XLA step (see MM4)
                if ok and not callable(wn_k):
                    B = parts[0].shape[0]
                    taylor_m, theta = _taylor_params(parts[0].dtype, self.m)
                    y_parts, e = fused_chain_apply(
                        [*gs, jnp.broadcast_to(dt1, (B, 1))],
                        parts, basis_w, cols_builder,
                        C=2 if adaptive else 1, R=n_main,
                        m=taylor_m, theta=theta,
                        max_squarings=self.max_squarings,
                        tile=t_eff, interpret=self.interpret,
                        wnorm=wn_k,
                    )
                    return _fused_result(self.op, y_parts, e, adaptive)

            g = jnp.stack(gs, axis=-2)                       # (..., J, K)
            # HIGHEST: these coefficients become exponents; default-precision
            # bf16 passes would poison the embedded error estimates
            rho = dt1[..., None] * jnp.einsum(
                "sj,...jk->...sk", jnp.asarray(alpha, g.dtype), g,
                precision=HIGHEST,
            )                                               # (..., s, K)
            if alpha_err is None:
                chains = rho[..., None, :, :]                # (..., 1, s, K)
            else:
                rho_err = dt1[..., None] * jnp.einsum(
                    "sj,...jk->...sk", jnp.asarray(alpha_err, g.dtype), g,
                    precision=HIGHEST,
                )                                           # (..., s_err, K)
                # pad the error chain with ZERO rows (e^0 = I exactly) so
                # both chains run the same number of rounds in one kernel
                pad = jnp.zeros(
                    rho_err.shape[:-2] + (n_main - n_err, rho_err.shape[-1]),
                    rho_err.dtype,
                )
                chains = jnp.stack(
                    [rho, jnp.concatenate([rho_err, pad], axis=-2)], axis=-3
                )                                           # (..., 2, s, K)
            return _apply_chains(
                self.op, basis_w, norms, chains, x,
                m=self.m, max_squarings=self.max_squarings,
                wnorm=_stepper_wnorm(
                    self, (x.re, x.im) if self.op.is_cplx else (x,)),
            )

        return step_fn


    def _step_cols_fn(self):
        cc = self.op.coeff_cols_fn
        alpha = np.asarray(self.alpha)
        alpha_err = (
            None if self.alpha_err is None else np.asarray(self.alpha_err)
        )
        c_nodes = np.asarray(self.c)
        K0 = self.op.n_terms
        J = len(c_nodes)
        n_main = alpha.shape[0]
        n_err = 0 if alpha_err is None else alpha_err.shape[0]

        def step_cols(t, dt):
            gs = [cc(t + float(cj) * dt) for cj in c_nodes]

            def rows_for(mat, n_rows):
                rows = []
                for i in range(n_rows):
                    row = []
                    for k in range(K0):
                        acc = None
                        for jn in range(J):
                            if mat[i, jn] == 0.0:
                                continue
                            term = float(mat[i, jn]) * gs[jn][k]
                            acc = term if acc is None else acc + term
                        row.append(dt * acc)
                    rows.append(row)
                return rows

            main = rows_for(alpha, n_main)
            if alpha_err is None:
                return [main]
            err_rows = rows_for(alpha_err, n_err)
            zero_row = [jnp.zeros_like(dt) for _ in range(K0)]
            err_rows += [zero_row] * (n_main - n_err)
            return [main, err_rows]

        return step_cols

    def fused_loop_solve(self, y0, t_grid, h0, *, ctl, adaptive,
                         chunk: int = 8, persistent=None, events=None,
                         dense: bool = False):
        """Whole-loop on-chip integration (ops/pallas_loop.py); None if the
        config is not kernel-eligible. ``events``/``dense``: see
        MagnusModulated4."""
        has_err = self.alpha_err is not None
        if adaptive != has_err:
            return None
        return _fused_loop_run(
            self, self._step_cols_fn(), 2 if has_err else 1,
            np.asarray(self.alpha).shape[0],
            y0, t_grid, h0, ctl, adaptive=adaptive, chunk=chunk,
            persistent=persistent, event_cfg=events, dense=dense,
        )


def CFM4Modulated(op: ModulatedOperator, *, adaptive: bool = True,
                  m: Optional[int] = None, max_squarings: int = 16,
                  use_pallas: bool = True,
                  interpret: bool = False,
                  norm: Optional[Any] = None) -> CFMModulated:
    """The reference ExpCFMSolver configuration (cfm.rs:131-162) on the
    modulated fast path: order 4/2 pair on 2-node Gauss-Legendre.
    ``norm``: a declared lc.WeightedNorm — the reference's user NormFn
    (cfm.rs:131-155), executed natively on every tier."""
    from .. import tableaus as tb

    return CFMModulated(
        op=op,
        alpha=tuple(map(tuple, tb.CFM_R4_J2_GL)),
        c=tuple(tb.C_GAUSS_LEGENDRE_4),
        alpha_err=tuple(map(tuple, tb.CFM_R2_J1_GL)) if adaptive else None,
        m=m,
        max_squarings=max_squarings,
        use_pallas=use_pallas,
        interpret=interpret,
        norm=norm,
    )
