"""Pallas-fused Runge-Kutta step for modulated-linear ensembles.

The flagship workload (BASELINE config 5) is an ensemble of independent
trajectories of dx/dt = (A0 + u(t) A1) x with SHARED matrices A0, A1 and a
per-trajectory scalar modulation u(t) (e.g. a driven Hamiltonian
H(t) = H0 + cos(wt) V in real-pair representation). The generic driver
expresses one RK step as ~50 XLA ops (6 matmuls + dozens of elementwise
kernels), each a full HBM round-trip at 16k x 128.

This kernel fuses the ENTIRE embedded RK step — all stage evaluations, stage
linear combinations, the advance combination, the embedded error vector and
its per-trajectory norm — into one Pallas kernel:

  * grid over trajectory tiles (TILE rows); each tile's state and all 6
    stage registers live in VMEM (~1.2 MB at TILE=256, d=64);
  * stage evaluations are (TILE, 2d) @ (2d, 2d) MXU contractions against the
    shared embedded matrices with full f32 precision;
  * the per-trajectory error norm is reduced in-kernel, so the driver's
    controller consumes a (B,) vector with no extra HBM pass.

The same math is available as a pure-XLA batched step (``use_pallas=False``)
for CPU or non-aligned dimensions; the Pallas path requires 2d to be a
multiple of 128 (the TPU lane width).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tableaus import RKF45, ButcherTableau
from ..utils.prec import HIGHEST


def _row_matmul(x, M):
    """(TILE, 2d) @ M^T with full-precision MXU accumulation in x's dtype."""
    return jax.lax.dot_general(
        x, M,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=HIGHEST,
    )


def _make_kernel(tab: ButcherTableau, u_fn: Callable, advance_lower: bool,
                 wnorm=None):
    """``wnorm=(w_row, post, kind)`` (lc.WeightedNorm.kernel_parts): the
    per-trajectory error norm becomes post * ||w_row * err|| with kind
    "l2" or "max"; a non-None w_row arrives as an extra (1, 2d) kernel
    input after M1 (Pallas rejects captured non-scalar constants)."""
    s = tab.stages
    a = tab.a
    b = tab.b
    db = None if tab.b_err is None else (tab.b - tab.b_err)
    c = tab.c
    has_wrow = wnorm is not None and wnorm[0] is not None

    def kernel(t_ref, dt_ref, x_ref, m0_ref, m1_ref, *rest):
        if has_wrow:
            w_ref, ox_ref, oe_ref = rest
        else:
            ox_ref, oe_ref = rest
        t = t_ref[:]          # (TILE, 1)
        dt = dt_ref[:]        # (TILE, 1)
        xw = x_ref[:]         # (TILE, 2d)
        # both operator actions in ONE wider contraction: the 6-stage
        # dependency chain then sits on 6 serial matmuls instead of 12
        # (the stage-latency bound, VERDICT r3 #6; same shared-matmul
        # shape as make_chain_step_builder's (D, K*D) basis stack)
        D = x_ref.shape[-1]
        # _row_matmul contracts with M's axis 1 (x @ M^T), so the two
        # operators stack along axis 0 and come back as column blocks
        M01 = jnp.concatenate([m0_ref[:], m1_ref[:]], axis=0)  # (2D, D)

        def f(ti, xi):
            u = u_fn(ti)      # (TILE, 1) per-trajectory modulation
            mv = _row_matmul(xi, M01)
            return mv[:, :D] + u * mv[:, D:]

        K = [None] * s
        K[0] = f(t, xw)
        for i in range(1, s):
            ti = t + float(c[i]) * dt
            acc = None
            for j in range(i):
                if a[i, j] == 0.0:
                    continue
                term = float(a[i, j]) * K[j]
                acc = term if acc is None else acc + term
            xi = xw if acc is None else xw + dt * acc
            K[i] = f(ti, xi)

        xb_acc = None
        for j in range(s):
            if b[j] == 0.0:
                continue
            term = float(b[j]) * K[j]
            xb_acc = term if xb_acc is None else xb_acc + term
        x_b = xw + dt * xb_acc

        if db is None:
            ox_ref[:] = x_b
            oe_ref[:] = jnp.zeros_like(t)
            return
        err_acc = None
        for j in range(s):
            if db[j] == 0.0:
                continue
            term = float(db[j]) * K[j]
            err_acc = term if err_acc is None else err_acc + term
        err = dt * err_acc
        ox_ref[:] = (x_b - err) if advance_lower else x_b
        if wnorm is None:
            oe_ref[:] = jnp.sqrt(jnp.sum(err * err, axis=1, keepdims=True))
        else:
            _, post, kind = wnorm
            if has_wrow:
                err = err * w_ref[:]
            if kind == "max":
                en = jnp.max(jnp.abs(err), axis=1, keepdims=True)
            else:
                en = jnp.sqrt(jnp.sum(err * err, axis=1, keepdims=True))
            oe_ref[:] = en if post == 1.0 else en * post

    return kernel


def fused_rk_step(
    t: jax.Array,        # (B,)
    dt: jax.Array,       # (B,)
    xw: jax.Array,       # (B, 2d) widened real-pair state [re | im]
    M0: jax.Array,       # (2d, 2d) embedded base operator
    M1: jax.Array,       # (2d, 2d) embedded modulated operator
    *,
    u_fn: Callable,
    tab: ButcherTableau = RKF45,
    advance_lower: bool = True,
    tile: int = 256,
    interpret: bool = False,
    wnorm=None,
):
    """One fused RK step over the whole ensemble.

    Returns (xw_next (B, 2d), err_norm (B,)). ``wnorm``: declared error
    norm, see ``_make_kernel``.
    """
    B, twod = xw.shape
    if B % tile != 0:
        raise ValueError(f"batch {B} must be a multiple of tile {tile}")
    if twod % 128 != 0:
        raise ValueError(
            f"widened dim {twod} must be a multiple of 128 (TPU lanes); "
            "use the XLA fallback for other sizes"
        )
    kernel = _make_kernel(tab, u_fn, advance_lower, wnorm=wnorm)
    has_wrow = wnorm is not None and wnorm[0] is not None
    grid = (B // tile,)
    t2 = t.reshape(B, 1)
    dt2 = dt.reshape(B, 1)

    ox, oe = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, twod), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twod, twod), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twod, twod), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, twod), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)] if has_wrow else []),
        ],
        out_specs=[
            pl.BlockSpec((tile, twod), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, twod), xw.dtype),
            jax.ShapeDtypeStruct((B, 1), xw.dtype),
        ],
        interpret=interpret,
    )(t2, dt2, xw, M0, M1,
      *([jnp.asarray(wnorm[0], xw.dtype)] if has_wrow else []))
    return ox, oe.reshape(B)


def xla_rk_step(t, dt, xw, M0, M1, *, u_fn, tab=RKF45, advance_lower=True,
                wnorm=None):
    """Pure-XLA batched reference of the fused step (CPU / odd shapes).
    ``wnorm``: declared error norm (see ``_make_kernel``), identical
    semantics here."""
    s = tab.stages
    dtc = dt[:, None]
    tc = t[:, None]

    def f(ti, xi):
        u = u_fn(ti)
        return _row_matmul(xi, M0) + u * _row_matmul(xi, M1)

    K = [None] * s
    K[0] = f(tc, xw)
    for i in range(1, s):
        ti = tc + float(tab.c[i]) * dtc
        acc = None
        for j in range(i):
            if tab.a[i, j] == 0.0:
                continue
            term = float(tab.a[i, j]) * K[j]
            acc = term if acc is None else acc + term
        xi = xw if acc is None else xw + dtc * acc
        K[i] = f(ti, xi)
    x_b = xw + dtc * sum(float(tab.b[j]) * K[j] for j in range(s)
                         if tab.b[j] != 0.0)
    if tab.b_err is None:
        return x_b, None
    db = tab.b - tab.b_err
    err = dtc * sum(float(db[j]) * K[j] for j in range(s) if db[j] != 0.0)
    x_next = (x_b - err) if advance_lower else x_b
    from ..lc import apply_weighted_norm

    return x_next, apply_weighted_norm(err, wnorm, axis=1)


@dataclasses.dataclass(frozen=True)
class FusedModulatedLinearRK:
    """Natively-batched stepper for dx/dt = (A0 + u(t) A1) x over Cplx pairs.

    Plugs into the batched driver (``is_batched=True``): states are Cplx
    (B, d) pairs widened to (B, 2d) internally, the step returns the
    per-trajectory error norm directly (``error_norm`` = identity).
    """

    M0: jax.Array               # (2d, 2d) embedded -i*H0 (or A0)
    M1: jax.Array               # (2d, 2d) embedded -i*V (or A1)
    u_fn: Callable              # (TILE, 1) time block -> modulation
    tableau: ButcherTableau = RKF45
    advance_lower: bool = True
    tile: int = 256
    use_pallas: bool = True
    # loop-kernel stage interleave (opt-in experiment, VERDICT r3 #6):
    # split each tile into N independent row blocks whose stage chains
    # issue alternately, letting the MXU overlap dependency stalls.
    # Bitwise-identical results; measure before adopting as default.
    stage_interleave: int = 1
    # declared error norm (lc.WeightedNorm) — executed natively on the
    # per-step kernel, the XLA step and the fused loop kernel (reference
    # NormFn, cfm.rs:131-155)
    norm: Optional[object] = None

    is_batched = True
    error_norm = staticmethod(lambda e: e)

    def _wnorm(self, d: int, group: int = 1):
        """(w_row, post, kind) of the declared ``norm`` over the widened
        [re | im] layout (lc.WeightedNorm.kernel_parts), or None. Raises
        for weights the batched layout cannot express."""
        if self.norm is None:
            return None
        if not hasattr(self.norm, "kernel_parts"):
            raise TypeError(
                "norm= must be a DECLARED lc.WeightedNorm (this batched "
                "stepper executes it in-kernel)")
        kp = self.norm.kernel_parts(d, 2, group=group)
        if kp is None:
            raise ValueError(
                "WeightedNorm.weights must be a single per-(complex-)"
                f"component array of length {d} for this batched stepper"
            )
        return kp

    @property
    def nfev_per_step(self) -> int:
        return self.tableau.stages

    @staticmethod
    def from_driven_dense(model, dtype=jnp.float32, **kw):
        """Build from a models.quantum.DrivenDense (H(t) = H0 + cos(wt) V).

        The embedded matrices are kept as HOST numpy constants: they get
        baked into the jitted program at trace time, avoiding device reads
        through the (flaky) tunnel when jit captures closure constants."""

        def embed_np(re, im):
            return np.block([[re, -im], [im, re]])

        np_dtype = np.dtype(jnp.zeros((), dtype).dtype.name)
        H0r, H0i = model.H0.real.astype(np_dtype), model.H0.imag.astype(np_dtype)
        Vr, Vi = model.V.real.astype(np_dtype), model.V.imag.astype(np_dtype)
        # -i H = (Hi, -Hr) as a (re, im) pair
        M0 = embed_np(H0i, -H0r)
        M1 = embed_np(Vi, -Vr)
        w = float(model.w)
        return FusedModulatedLinearRK(
            M0=M0, M1=M1, u_fn=lambda t: jnp.cos(w * t), **kw
        )

    def fused_loop_solve(self, y0, t_grid, h0, *, ctl, adaptive,
                         chunk: int = 8, persistent=None, events=None,
                         dense: bool = False):
        """Whole-loop on-chip integration (ops/pallas_loop.py): the entire
        adaptive RK driver — stages, embedded error, controller, counters —
        runs on-chip, by default as ONE persistent kernel launch per solve
        (``persistent=False``: chunked launches of ``chunk`` iterations).
        Supports the full controller surface in-kernel (reference I
        controller, opt-in PI, scaled_error, strict_end_test). Returns None
        when the config is not kernel-eligible (large interior grids,
        lane-misaligned shapes, B above the loop/per-step crossover) so the
        caller falls back to the XLA driver + per-step kernel. ``dense``:
        interior grid times become free-running interpolated saves recorded
        in-kernel (dense.py semantics; see exp/modulated._fused_loop_run)
        with Hermite endpoint slopes f = (M0 + u(t) M1) x."""
        from ..driver import Solution
        from ..ops.cplx import Cplx
        from .pallas_loop import fused_loop_integrate, make_rk_step_builder

        from ..exp.modulated import _ineligible

        if not (self.use_pallas and jax.default_backend() == "tpu"):
            return None   # not a fallback: pallas disabled or non-TPU
        if not adaptive or self.tableau.b_err is None:
            return None   # fixed-step: the per-step kernel path is used
        if y0.re.ndim != 2:
            return None   # scalar solve: not this stepper's contract
        B, d = y0.re.shape
        # would the fallback land on the FAST per-step kernel (only
        # 15-20% slower than the loop kernel) or on the ~10x-slower XLA
        # stepper? Only the latter deserves a fallback warning.
        step_kernel_ok = (B % self.tile == 0) and ((2 * d) % 128 == 0)
        warn = (lambda r: None) if step_kernel_ok else _ineligible
        # persistent mode holds interior saves in-kernel, windowing large
        # grids over 32-segment launches (pallas_loop._windowed_persistent)
        # so VMEM stays constant; chunked mode round-trips saves as XLA
        # carry buffers and keeps its tight cap
        grid_cap = 1026 if (persistent is None or persistent) else 10
        n_dense = 0
        if dense:
            # in-kernel dense output (exp/modulated._fused_loop_run has
            # the discipline writeup): free-running controller, crossing
            # steps record endpoints in-kernel, Hermite evaluated after
            if not (persistent is None or persistent):
                return warn(
                    "dense output rides the persistent single-launch "
                    "fused mode only (chunked launches would round-trip "
                    "the endpoint registers every chunk)")
            n_dense = int(t_grid.shape[0]) - 2
            if n_dense > 16:
                return warn(
                    f"{n_dense} dense save times > 16 (each slot keeps "
                    "two live (tile, D) endpoint registers in VMEM)")
            if n_dense <= 0:
                dense = False   # bare [t0, tf]: plain solve
        if not dense and t_grid.shape[0] > grid_cap:
            return warn(
                f"save grid has {t_grid.shape[0]} points > {grid_cap} "
                "(interior saves live in kernel carry buffers)")
        Dw = 2 * d
        G = 1
        if Dw % 128 != 0:
            # lane packing (exp/modulated.py:_fused_loop_run discipline):
            # small widened dims pack G = 128/Dw trajectories per row over
            # block-diagonal M0/M1; per-trajectory control lives in the
            # packed carry columns (pallas_loop group mode)
            if 128 % Dw == 0 and B % (128 // Dw) == 0:
                G = 128 // Dw
            else:
                return warn(
                    f"widened dim {Dw} not a multiple of 128 lanes and "
                    f"not packable (needs Dw | 128 and G | batch)")
        # measured crossover: above ~2k trajectories the per-step kernel
        # (tile 256, XLA-pipelined) is ~15-20% faster — UNPACKED only (the
        # packed small-dim case has no per-step-kernel fallback)
        if G == 1 and B > 2048:
            return None
        Bp = B // G
        # loop-kernel tile caps at 128: tile=256 at 64+ grid cells crashes
        # the TPU runtime (empirically; the per-step kernel is fine at 256 —
        # the loop kernel holds more live state per cell)
        loop_tile = min(128, Bp)
        while loop_tile > 0 and Bp % loop_tile != 0:
            loop_tile //= 2
        if loop_tile < 8:
            return warn(f"batch {B} gives a loop tile < 8")
        if t_grid.dtype != y0.re.dtype:
            return warn(
                f"time dtype {t_grid.dtype} != state dtype {y0.re.dtype}")
        wnorm = None
        if self.norm is not None:
            if ctl.scaled_error:
                raise ValueError(
                    "scaled_error and a declared WeightedNorm are "
                    "mutually exclusive")
            wnorm = self._wnorm(d, group=G)
            if wnorm[2] == "max" and G > 1:
                return warn(
                    "max-kind WeightedNorm with lane packing (a segment "
                    "max cannot ride the one-hot reduction matmul)")
        ev_spec = None
        if events is not None:
            ev_spec = events.kernel_spec(d, 2, dtype=y0.re.dtype)
            if ev_spec is None:
                return warn(
                    "events= with untraceable callables cannot run "
                    "in-kernel; declare events.LinearObservable / "
                    "QuadraticObservable or pass plain-jnp callables")
            if ev_spec.n > 8:
                return warn(f"{ev_spec.n} events > 8 (found-bits budget)")
            if ev_spec.n * ev_spec.k > 32:
                return warn(
                    f"{ev_spec.n} events x max_crossings={ev_spec.k} > 32 "
                    "located-time slots (float-carry column budget)")
            if ev_spec.any_traced and G > 1:
                return warn(
                    "traced event callables with lane packing (in-kernel "
                    "unpacking needs a 3-D reshape Mosaic rejects)")

        builder = make_rk_step_builder(
            self.tableau, self.u_fn, self.advance_lower,
            scaled=(ctl.atol, ctl.rtol) if ctl.scaled_error else None,
            group=G, wnorm=wnorm, interleave=self.stage_interleave,
        )
        if G > 1:
            eye_g = np.eye(G)
            M0 = jnp.asarray(np.kron(eye_g, np.asarray(self.M0)),
                             y0.re.dtype)
            M1 = jnp.asarray(np.kron(eye_g, np.asarray(self.M1)),
                             y0.re.dtype)
            xw0 = jnp.concatenate([y0.re, y0.im], axis=1)
            kparts = (xw0.reshape(Bp, G * Dw),)
        else:
            M0 = jnp.asarray(self.M0, y0.re.dtype)
            M1 = jnp.asarray(self.M1, y0.re.dtype)
            kparts = (y0.re, y0.im)
        consts = [M0, M1]
        if wnorm is not None and wnorm[0] is not None:
            consts.append(jnp.asarray(wnorm[0], y0.re.dtype))
        k_grid = jnp.stack([t_grid[0], t_grid[-1]]) if dense else t_grid
        out = fused_loop_integrate(
            k_grid, kparts, h0, consts, builder,
            adaptive=True, ctl=ctl, chunk=chunk,
            persistent=(persistent is None or persistent), tile=loop_tile,
            group=G, events=ev_spec,
            dense_times=(t_grid[1:-1] if dense else None),
        )
        fs, ist, parts, saves, ev_y = out[:5]
        dense_x = out[5] if dense else ()
        n_grid = t_grid.shape[0]
        n_grid_k = k_grid.shape[0]
        from .pallas_loop import N_F, N_I
        n_ev = 0 if ev_spec is None else ev_spec.n
        n_k = ev_spec.k if n_ev else 1
        base_d = N_F + (n_ev * (n_k + 2) + 1 if n_ev else 0)
        n_f_eff = base_d + 2 * n_dense
        if G > 1:
            def unpack(buf):
                xw = buf.reshape(B, Dw)
                return (xw[:, :d], xw[:, d:])

            parts = unpack(parts[0])
            saves = tuple(p for g in range(n_grid_k - 2)
                          for p in unpack(saves[g]))
            ev_y = tuple(p for e in range(len(ev_y))
                         for p in unpack(ev_y[e]))
            dense_xw = tuple(b.reshape(B, Dw) for b in dense_x)
            fs = jnp.stack(
                [fs[:, q * G:(q + 1) * G].reshape(B)
                 for q in range(n_f_eff)], axis=1)
            ist = jnp.stack(
                [ist[:, q * G:(q + 1) * G].reshape(B)
                 for q in range(N_I)], axis=1)
        else:
            # G==1 state parts are (re, im): concat each endpoint buffer
            # pair back to the widened row ([x0 | x1] per slot order)
            dense_xw = tuple(
                jnp.concatenate(dense_x[b * 2:(b + 1) * 2], axis=1)
                for b in range(2 * n_dense)
            )
        x_final = Cplx(*parts)
        if dense:
            from ..dense import hermite_from_endpoints

            M0w = jnp.asarray(self.M0, y0.re.dtype)
            M1w = jnp.asarray(self.M1, y0.re.dtype)
            u_fn = self.u_fn

            def slope(t, xw):
                u = jnp.asarray(u_fn(t)).reshape(-1, 1)
                return (
                    jnp.einsum("bj,ij->bi", xw, M0w, precision=HIGHEST)
                    + u * jnp.einsum("bj,ij->bi", xw, M1w,
                                     precision=HIGHEST)
                )

            yw = hermite_from_endpoints(
                t_grid[1:-1], fs[:, base_d:base_d + n_dense],
                fs[:, base_d + n_dense:base_d + 2 * n_dense],
                jnp.stack(dense_xw[0::2], axis=0),
                jnp.stack(dense_xw[1::2], axis=0), slope)
            interior = [Cplx(yw[j][:, :d], yw[j][:, d:])
                        for j in range(n_dense)]
        else:
            interior = [Cplx(saves[2 * g], saves[2 * g + 1])
                        for g in range(n_grid - 2)]
        reached = ist[:, 0] >= n_grid_k

        def sel_end(xf):
            m_ = reached.reshape(reached.shape + (1,) * (xf.ndim - 1))
            return jnp.where(m_, xf, jnp.zeros_like(xf))

        ys = jax.tree_util.tree_map(
            lambda x0l, *rest: jnp.stack(
                [x0l, *rest[:-1], sel_end(rest[-1])], axis=1
            ),
            y0, *interior, x_final,
        )
        event_t = event_found = event_y = event_t_k = event_count = None
        if n_ev:
            # float-column layout: [g_prev xE | t_ev xE*K | count xE |
            # h_entry] after N_F (pallas_loop._make_loop_kernel)
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
                event_y = jax.tree_util.tree_map(
                    lambda *evs: jnp.stack(evs, axis=1),
                    *[Cplx(ev_y[2 * e], ev_y[2 * e + 1])
                      for e in range(n_ev)],
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
                  else "pallas-loop-chunked") + ("-packed" if G > 1
                                                 else "")
            + ("-dense" if dense else ""),
        )

    def hermite_slope(self, t, x):
        """Endpoint slope f(t, x) = (M0 + u(t) M1) x for dense-output
        Hermite interpolation (parallel.ensemble._batched_dense_fallback
        uses this when the fused loop is not eligible); Cplx in/out over
        the widened real embed."""
        from ..ops.cplx import Cplx

        xw = jnp.concatenate([x.re, x.im], axis=-1)
        M0w = jnp.asarray(self.M0, xw.dtype)
        M1w = jnp.asarray(self.M1, xw.dtype)
        u = jnp.asarray(self.u_fn(t))[..., None]
        fw = (jnp.einsum("...j,ij->...i", xw, M0w, precision=HIGHEST)
              + u * jnp.einsum("...j,ij->...i", xw, M1w,
                               precision=HIGHEST))
        d = x.re.shape[-1]
        return Cplx(fw[..., :d], fw[..., d:])

    def step_path(self, y0) -> str:
        """Static execution-path tag of the per-STEP stepper under the XLA
        driver (Solution.path annotation)."""
        d = y0.re.shape[-1]
        if (self.use_pallas and jax.default_backend() == "tpu"
                and y0.re.ndim == 2 and y0.re.shape[0] % self.tile == 0
                and (2 * d) % 128 == 0):
            return "xla-driver+pallas-step"
        return "xla-driver"

    def make_step_fn(self, rhs=None):
        if rhs is not None:
            raise ValueError(
                "FusedModulatedLinearRK embeds its own RHS; pass rhs=None"
            )
        use_pallas = self.use_pallas and jax.default_backend() == "tpu"
        interpret = False

        has_err = self.tableau.b_err is not None

        def step_fn(t, x, dt):
            from ..ops.cplx import Cplx

            d = x.re.shape[-1]
            xw = jnp.concatenate([x.re, x.im], axis=-1)
            if use_pallas and xw.shape[0] % self.tile == 0 and (
                (2 * d) % 128 == 0
            ):
                ox, oe = fused_rk_step(
                    t, dt, xw, self.M0, self.M1,
                    u_fn=self.u_fn, tab=self.tableau,
                    advance_lower=self.advance_lower,
                    tile=self.tile, interpret=interpret,
                    wnorm=self._wnorm(d),
                )
            else:
                ox, oe = xla_rk_step(
                    t, dt, xw, self.M0, self.M1,
                    u_fn=self.u_fn, tab=self.tableau,
                    advance_lower=self.advance_lower,
                    wnorm=self._wnorm(d),
                )
            # no embedded pair -> no error estimate: return None so the
            # adaptive driver raises instead of silently accepting on a
            # zero-valued estimate (matches rk.rk_step)
            return Cplx(ox[..., :d], ox[..., d:]), (oe if has_err else None)

        return step_fn
