"""Fused adaptive-integrator loop kernel.

The step kernels (ops/pallas_expmv.py, ops/pallas_rk.py) moved the stepper
math on-chip, but each driver iteration still pays the XLA orchestration
tax (per-dispatch cost on the target backend: the controller + masking +
bookkeeping of ``driver.step_once`` costs ~10 small dispatches per
iteration — several times the stepper itself). This module moves the WHOLE
loop body on-chip: one kernel invocation advances every trajectory by
``chunk`` driver iterations — stepper, embedded error norm, accept/reject
controller, step-size update, grid/end handling and all counters — so the
per-iteration XLA cost collapses to (4 carry buffers + 1 launch) / chunk.
In PERSISTENT mode (``chunk=None`` / ``fused_loop_integrate(persistent=
True)``, the default in the steppers) the kernel instead loops in-kernel
until every lane of its tile has finished: the whole solve is ONE launch,
and each grid tile stops at ITS OWN last running lane rather than the
global maximum (measured on-TPU: bit-identical to chunked, ~equal at one
tile, ~5-7% faster at 16+ tiles from the per-tile early exit).

Faithful port of ``driver.step_once`` for small save grids (the default
[t0, tf] plus up to a handful of interior save_at times, hit exactly and
recorded in-kernel; large grids use the XLA driver), with the
reference controller semantics (ode.rs:311-334: f = rtol/||err||, accept
iff f > 1, new_h = clip(alpha * f^(1/order), min_factor, max_factor) * h
clipped to [min_dt, max_dt]) and the driver's status/event bookkeeping.
The controller extensions run in-kernel too: opt-in PI (Gustafsson)
control (controller.py:109-135), ``scaled_error`` norms (scaling happens
in the step builders, which hold the error VECTOR), and the reference's
``strict_end_test``.

Carry layout (per trajectory): floats [t, h, prev_h, err_norm, t_lo] in
one (B, 5) buffer (t_lo = compensated-time residual word,
driver.comp_time_advance); int32 [tgt_idx, status, last_event, n_accept,
n_reject, n_iters, reject_streak] in one (B, 8) buffer; the state as 1
(real) or 2 (re, im) (B, d) buffers.

The STEPPER is injected as ``step_builder(const_refs) -> step(t_col,
dt_col, x_wide) -> (y_wide, err_norm_col)`` built over the kernel-resident
constant inputs (shared basis matrices, embedded operators, ...) — the
same loop scaffolding serves the modulated exponential integrators
(exp/modulated.py) and the fused modulated-linear RK stepper
(ops/pallas_rk.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_expmv import _row_matmul

# driver status / event codes (must mirror vec_ode_tpu.driver)
_RUNNING, _DONE, _ERR_MAX_STEPS, _ERR_STALLED, _ERR_BAD_GRID = 0, 1, 2, 3, 4
_DONE_EVENT = 5
_EVT_NONE, _EVT_STEP, _EVT_CHKPT, _EVT_REJECT, _EVT_END = 0, 1, 2, 3, 4

N_F = 5   # float carry columns: t, h, prev_h, err_norm, t_lo (the residual
          # word of the compensated time pair — driver.comp_time_advance)
N_I = 8   # int carry columns: tgt, status, event, n_acc, n_rej, n_it, streak


def _make_loop_kernel(
    step_builder: Callable,
    n_state: int,
    n_const: int,
    chunk,
    adaptive: bool,
    ctl,
    n_grid: int = 2,
    group: int = 1,
    events=None,
    dense_n: int = 0,
):
    """chunk: int -> advance every lane by ``chunk`` iterations (the caller
    loops over chunks in XLA); None -> PERSISTENT kernel: an in-kernel
    while_loop runs until every lane in the tile has left RUNNING (bounded
    by ``ctl.max_steps``, which forces ERR_MAX_STEPS) — the whole solve is
    ONE kernel launch.

    ``group=G > 1``: LANE-PACKED mode (exp/modulated.py:_fused_loop_run)
    — each kernel row carries G independent trajectories of widened dim
    D = row_width/G over a block-diagonal basis, and every per-trajectory
    scalar (t, h, status, ...) widens from a (TILE, 1) column to a
    (TILE, G) block (carry buffers are (B, N_F*G) / (B, N_I*G), laid out
    quantity-major). All controller/grid/status arithmetic is elementwise,
    so per-COLUMN semantics are identical to the unpacked kernel; only
    state-width updates need the mask expanded from (TILE, G) to
    (TILE, G*D) (exact 0/1 one-hot matmul). Requires n_state == 1 (the
    harness pre-widens re|im into one buffer before packing).

    ``events``: an events.KernelEvents — IN-KERNEL event detection
    (VERDICT r3 #2). Declared linear/quadratic observables evaluate as one
    weighted row-reduction per step; crossings run the exact
    regula-falsi-as-step-control discipline of events.event_step (veto +
    bracket shrink + locate at dt <= t_tol), reusing the kernel's
    controller columns. Per-event scalars (g_prev, the K = events.k
    located-time slots of EventConfig.max_crossings, a float crossing
    counter) and the shared h_entry ride EXTRA float-carry columns after
    t_lo, ordered [g_prev xE | t_ev xE*K | count xE | h_entry] (so N_F
    widens to N_F + E*(K+2) + 1); found/searching bits pack into int
    column 7 (spare). Located states (record_y, FIRST crossing only) live
    in per-event state registers like the interior saves.

    ``dense_n``: IN-KERNEL DENSE OUTPUT (dense.py semantics, VERDICT r4
    #4): n interior save TIMES that never truncate dt — the controller
    runs free (requires n_grid == 2) and the step that CROSSES each time
    records its raw interpolation data: entry state / exit state into 2
    per-slot state registers and (t_entry, dt) into 2*dense_n extra
    float-carry columns (appended AFTER the event block). The caller
    evaluates the cubic Hermite from the recorded endpoints in XLA after
    the kernel returns (the endpoint slopes A(t)x are recomputable there,
    so no VPU interpolation runs in the hot loop). Crossing test matches
    dense._dense_step exactly: adv & (t_g > t + tol) & (t_g <= t_new +
    tol), tol = 4 eps max(1, |t_g|). Unrecorded slots keep t_entry =
    +inf."""
    rtol = float(ctl.rtol)
    alpha = float(ctl.alpha)
    inv_order = 1.0 / float(ctl.order)
    min_f, max_f = float(ctl.min_factor), float(ctl.max_factor)
    min_dt, max_dt = float(ctl.min_dt), float(ctl.max_dt)
    max_steps = int(ctl.max_steps)
    max_streak = int(ctl.max_reject_streak)
    pi = bool(ctl.pi)
    comp = bool(ctl.time_compensated)
    k_i = 0.7 / float(ctl.pi_order)
    k_p = 0.4 / float(ctl.pi_order)
    inv_pi_order = 1.0 / float(ctl.pi_order)
    strict_end = bool(ctl.strict_end_test)

    # interior save slots (t_grid[1:-1]) are recorded in-kernel; slot 0
    # (= x0) and the final slot (= x at DONE) are reconstructed by the host
    n_save = max(n_grid - 2, 0)
    gw = int(group)
    if gw > 1 and n_state != 1:
        raise ValueError("lane-packed loop kernel needs a single pre-"
                         f"widened state buffer, got n_state={n_state}")
    n_ev = 0 if events is None else int(events.n)
    if n_ev and gw > 1 and events.any_traced:
        raise ValueError(
            "traced event callables cannot run on the lane-packed layout "
            "(callers must gate group > 1 off to the XLA driver)")
    has_evy = n_ev > 0 and events.record_y
    n_evy = n_ev * n_state if has_evy else 0
    # float carry widens by per-event g_prev columns, K located-time slots
    # per event (EventConfig.max_crossings), a per-event crossing counter
    # (float — exact integers well past max_steps), and the shared
    # pre-search h_entry column
    n_k = int(getattr(events, "k", 1)) if n_ev else 1
    base_d = N_F + (n_ev * (n_k + 2) + 1 if n_ev else 0)
    n_f_eff = base_d + 2 * dense_n
    if dense_n and n_grid != 2:
        raise ValueError(
            "in-kernel dense output is free-running: the kernel grid must "
            f"be [t0, tf] (got {n_grid} points)")

    def kernel(*refs):
        tg_ref, fs_ref, is_ref = refs[:3]
        x_refs = refs[3:3 + n_state]
        ysin_refs = refs[3 + n_state:3 + n_state + n_save * n_state]
        base = 3 + n_state + n_save * n_state
        evyin_refs = refs[base:base + n_evy]
        base += n_evy
        xdin_refs = refs[base:base + 2 * dense_n * n_state]
        base += 2 * dense_n * n_state
        const_refs = refs[base:base + n_const]
        base += n_const
        evrows_ref = refs[base] if n_ev else None
        base += int(n_ev > 0)
        dts_ref = refs[base] if dense_n else None
        base += int(dense_n > 0)
        ofs_ref = refs[base]
        ois_ref = refs[base + 1]
        oy_refs = refs[base + 2:base + 2 + n_state]
        oys_refs = refs[base + 2 + n_state:
                        base + 2 + n_state + n_save * n_state]
        base_o = base + 2 + n_state + n_save * n_state
        oevy_refs = refs[base_o:base_o + n_evy]
        oxd_refs = refs[base_o + n_evy:]

        dtype = fs_ref.dtype
        eps = float(jnp.finfo(dtype).eps)
        tf = tg_ref[0, n_grid - 1]

        x = (
            x_refs[0][:]
            if n_state == 1
            else jnp.concatenate([r[:] for r in x_refs], axis=1)
        )
        d = x.shape[1] // n_state
        saves = [
            (
                ysin_refs[g][:]
                if n_state == 1
                else jnp.concatenate(
                    [ysin_refs[g * n_state + i][:] for i in range(n_state)],
                    axis=1,
                )
            )
            for g in range(n_save)
        ]

        def _dpart(g):
            return (
                xdin_refs[g * n_state][:]
                if n_state == 1
                else jnp.concatenate(
                    [xdin_refs[g * n_state + i][:] for i in range(n_state)],
                    axis=1,
                )
            )

        dx0_init = [_dpart(2 * j) for j in range(dense_n)]
        dx1_init = [_dpart(2 * j + 1) for j in range(dense_n)]

        step = step_builder(const_refs)

        if gw > 1:
            # per-trajectory (TILE, gw) masks widen to the (TILE, gw*Dg)
            # state via an exact 0/1 one-hot expansion matmul (lane l
            # belongs to trajectory column l // Dg)
            Dg = x.shape[1] // gw
            rr = jax.lax.broadcasted_iota(jnp.int32, (gw, gw * Dg), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (gw, gw * Dg), 1)
            E = (cc // Dg == rr).astype(dtype)

            def wide(mask_b):
                return jax.lax.dot_general(
                    mask_b.astype(dtype), E,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                ) > 0.5

            def reduce_vals(v):
                # (TILE, gw*Dg) -> (TILE, gw) per-group sums. Sanitize
                # first: the one-hot contraction would leak a NaN group
                # into every other group's sum (0*NaN=NaN); a NaN
                # trajectory's own g is then finite garbage, but its
                # accept is already vetoed by the NaN error norm, so no
                # crossing can fire from it. HIGHEST: value-carrying
                # one-hot matmuls truncate at the bf16 default.
                v = jnp.where(jnp.isfinite(v), v, jnp.zeros_like(v))
                return jax.lax.dot_general(
                    v, E, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )

            def expandv(v):
                # continuous (TILE, gw) -> (TILE, gw*Dg) column expansion
                return jax.lax.dot_general(
                    v, E, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
        else:
            def wide(mask_b):
                return mask_b   # (TILE, 1) broadcasts against (TILE, d)

            def reduce_vals(v):
                return jnp.sum(v, axis=1, keepdims=True)

            def expandv(v):
                return v        # (TILE, 1) broadcasts

        def iteration(carry):
            (t, h, prev_h, err_prev, t_lo, xv, tgt, status, event, n_acc,
             n_rej, n_it, streak, saves, evc, dnc) = carry
            if dense_n:
                td, dtd, dx0, dx1 = dnc
                td, dtd = list(td), list(dtd)
                dx0, dx1 = list(dx0), list(dx1)
            if n_ev:
                (g_prev, t_ev, count, found, searching, h_entry,
                 y_ev) = evc
                # t_ev is FLAT: slot s of event e lives at index e*K + s
                g_prev, t_ev = list(g_prev), list(t_ev)
                count = list(count)
                # found/searching travel the while carry as int32 0/1:
                # Mosaic cannot relayout i1 (mask) vectors whose vpad
                # offset differs between the scf.yield and the loop-entry
                # block argument (the inits are column slices of is_ref),
                # so bool carries fail to legalize on real TPU; i32
                # carries at arbitrary offsets are supported (the control
                # columns already do this).
                found = [f != 0 for f in found]
                searching = searching != 0
                y_ev = list(y_ev)
            running = status == _RUNNING
            # chk_t = t_grid[min(tgt, n_grid-1)], static select over the
            # (small) grid — Mosaic has no per-lane SMEM gather
            chk_t = jnp.full_like(t, tf)
            for g in range(n_grid - 1):
                chk_t = jnp.where(tgt == g, tg_ref[0, g], chk_t)
            # end test: controller.end_tolerance (strict = the reference's
            # unscaled approx::relative_eq(rem, 0), ode.rs:389-393)
            if strict_end:
                tol = jnp.full_like(chk_t, eps)
            else:
                tol = 4.0 * eps * jnp.maximum(1.0, jnp.abs(chk_t))
            # compensated remaining time (t_lo stays zeros when
            # ctl.time_compensated is off — the subtraction is a no-op)
            rem = (chk_t - t) - t_lo
            at_grid = jnp.abs(rem) <= tol
            past_end = tgt >= n_grid - 1
            is_end = running & at_grid & past_end
            is_chk = running & at_grid & ~past_end
            bad = running & ~at_grid & (rem < 0)
            stepping = running & ~at_grid & ~bad
            dt = jnp.where(stepping, jnp.minimum(h, rem), 0.0)

            y, err = step(t, dt, xv)

            if adaptive:
                measure = err
                f = rtol / measure
                # f^p via jnp.power — Mosaic's pow lowering is BITWISE-
                # identical to XLA's (measured on v5e: 0/8192 bits differ),
                # while exp(log(f)*p) diverges from XLA's pow in ~50% of
                # entries by up to ~300 ulp — enough to flip marginal
                # accepts and shift packed counters by +-1 vs
                # driver.step_once (VERDICT r4 #6). Expression tree and
                # multiplication ORDER mirror controller.controller_update
                # exactly. Edge cases match the old exp/log convention:
                # pow(0,p)=0, pow(inf,p)=inf, NaN handled by bad_f below.
                fp_i = alpha * jnp.power(f, inv_order)
                if pi:
                    # Gustafsson PI (controller.controller_update):
                    # alpha * f^kI * (f/f_prev)^kP, I-term after rejects
                    f_prev = rtol / err_prev
                    f_prev = jnp.where(
                        jnp.isfinite(f_prev) & (f_prev > 0.0), f_prev, f
                    )
                    ratio = jnp.clip(f / f_prev, 1e-8, 1e8)
                    ratio = jnp.where(jnp.isnan(ratio), 1.0, ratio)
                    fp_pi = alpha * jnp.power(f, k_i) * jnp.power(ratio, k_p)
                    # post-reject I-term uses the METHOD exponent
                    # (1/pi_order), matching controller.controller_update
                    fp_rej = alpha * jnp.power(f, inv_pi_order)
                    fp = jnp.where(streak > 0, fp_rej, fp_pi)
                else:
                    fp = fp_i
                fp = jnp.clip(fp, min_f, max_f)
                bad_f = jnp.isnan(f)
                fp = jnp.where(bad_f, min_f, fp)
                new_h = jnp.clip(fp * h, min_dt, max_dt)
                accept = jnp.logical_not(bad_f) & (f > 1.0)
            else:
                measure = err_prev
                new_h, accept = h, jnp.ones_like(stepping)

            # ---- in-kernel event detection (events.event_step, inlined
            # with declared-observable g evaluation) ----------------------
            if n_ev:
                g_next, thetas, active, crossed_l = [], [], [], []
                theta_min = None
                for e in range(n_ev):
                    if events.kinds[e] == "traced":
                        # traced opaque callable, vmapped over the tile
                        # rows (unpacked only — callers gate G > 1 off);
                        # evaluated at the TRIAL point (t + dt, y), the
                        # same contract as events.event_step
                        gn = events.traced[e](t + dt, y)
                    else:
                        row = evrows_ref[e:e + 1, :]
                        src = y if events.kinds[e] == "lin" else y * y
                        gn = reduce_vals(src * row) - events.offsets[e]
                    gp = g_prev[e]
                    rising = (gp < 0) & (gn >= 0)
                    falling = (gp > 0) & (gn <= 0)
                    de = events.dirs[e]
                    crossed = (rising if de > 0 else
                               (falling if de < 0 else rising | falling))
                    # only the first K crossings are bracket-located;
                    # beyond that the event is counted-only (count is a
                    # float column holding exact small integers)
                    act = (crossed & stepping & accept
                           & (count[e] < float(n_k)))
                    crossed_l.append(crossed)
                    denom = gp - gn
                    th = gp / jnp.where(denom == 0.0,
                                        jnp.ones_like(denom), denom)
                    th = jnp.clip(th, 0.0, 1.0)
                    tha = jnp.where(act, th, 1.0)
                    theta_min = (tha if theta_min is None
                                 else jnp.minimum(theta_min, tha))
                    g_next.append(gn)
                    thetas.append(th)
                    active.append(act)
                any_active = active[0]
                for a in active[1:]:
                    any_active = any_active | a
                if events.t_tol is not None:
                    tol_ev = jnp.full_like(t, float(events.t_tol))
                else:
                    tol_ev = 64.0 * eps * jnp.maximum(1.0, jnp.abs(t))
                tight = dt <= tol_ev
                locate = any_active & tight
                search = any_active & ~tight
                # search lanes veto the advance and retry with the shrunk
                # regula-falsi bracket (>= 10% geometric shrink)
                accept = accept & ~search
                h_override = jnp.maximum(
                    jnp.clip(theta_min, 0.1, 0.9) * dt, 0.25 * tol_ev
                )
                entering = search & ~searching
                h_entry = jnp.where(entering, dt, h_entry)
                restore_h = locate & searching
                searching = (searching | search) & ~locate
                terminal_hit = None
                for e in range(n_ev):
                    rec = active[e] & locate
                    t_loc = t + thetas[e] * dt
                    # slot select over the K static slots (events.event_step
                    # one-hot, unrolled): slot s records the (s+1)-th
                    # crossing
                    for s in range(n_k):
                        t_ev[e * n_k + s] = jnp.where(
                            rec & (count[e] == float(s)), t_loc,
                            t_ev[e * n_k + s],
                        )
                    found[e] = found[e] | rec
                    term_n = events.terminal[e]
                    if term_n:
                        # terminal=n stops at the n-th crossing (validated
                        # n <= K, so the n-th is a located one)
                        hit = rec & (count[e] + 1.0 >= float(term_n))
                        terminal_hit = (hit if terminal_hit is None
                                        else terminal_hit | hit)
                    if has_evy:
                        # the state register holds the FIRST crossing only
                        y_ev[e] = jnp.where(
                            wide(rec & (count[e] == 0.0)),
                            xv + expandv(thetas[e]) * (y - xv),
                            y_ev[e],
                        )
                adv_ev = stepping & accept
                for e in range(n_ev):
                    g_prev[e] = jnp.where(adv_ev, g_next[e], g_prev[e])
                    # one count per matching sign change the state actually
                    # advances across (search iterations veto adv, so a
                    # located crossing counts exactly once — at its locate
                    # step; an exhausted event counts at each accepted step
                    # spanning a crossing) — events.event_step `counted`
                    count[e] = count[e] + jnp.where(
                        crossed_l[e] & adv_ev, 1.0, 0.0)

            adv = stepping & accept
            rej = stepping & ~accept
            # event-search iterations are NOT numerical rejections
            true_rej = rej & ~search if n_ev else rej

            if dense_n:
                # free-running dense saves (dense._dense_step crossing
                # test): t_new is the POST-advance time — the compensated
                # hi word when ctl.time_compensated (hi_ = s_ + lo_; the
                # later renormalization changes only the residual word)
                if comp:
                    s_ = t + dt
                    bp = s_ - t
                    e_lo = (t - (s_ - bp)) + (dt - bp)
                    t_new = s_ + (t_lo + e_lo)
                else:
                    t_new = t + dt
                for j in range(dense_n):
                    tgj = dts_ref[0, j]
                    tolj = 4.0 * eps * jnp.maximum(1.0, jnp.abs(tgj))
                    crossed = adv & (tgj > t + tolj) & (tgj <= t_new + tolj)
                    dx0[j] = jnp.where(wide(crossed), xv, dx0[j])
                    dx1[j] = jnp.where(wide(crossed), y, dx1[j])
                    td[j] = jnp.where(crossed, t, td[j])
                    dtd[j] = jnp.where(crossed, dt, dtd[j])

            # record interior save slots at their grid-hit iterations
            # (state.x at the Chkpt emission point, as in driver.step_once)
            saves = [
                jnp.where(wide(at_grid & running & (tgt == g + 1)),
                          xv, saves[g])
                for g in range(n_save)
            ]

            if comp:
                # driver.comp_time_advance, inlined verbatim (TwoSum +
                # Fast2Sum renormalization) to keep the kernel bit-pinned
                # to step_once
                s_ = t + dt
                bp = s_ - t
                e_lo = (t - (s_ - bp)) + (dt - bp)
                lo_ = t_lo + e_lo
                hi_ = s_ + lo_
                lo_ = lo_ - (hi_ - s_)
                t = jnp.where(adv, hi_, t)
                t_lo = jnp.where(adv, lo_, t_lo)
            else:
                t = jnp.where(adv, t + dt, t)
            xv = jnp.where(wide(adv), y, xv)
            if adaptive:
                prev_h = jnp.where(stepping, h, prev_h)
                h = jnp.where(stepping, new_h, h)
            h = jnp.where(at_grid & running, prev_h, h)
            if n_ev:
                # bracket search overrides the controller's h; a completed
                # search restores the pre-search step (driver.step_once's
                # eo.search / eo.restore_h splice)
                h = jnp.where(search, h_override, h)
                h = jnp.where(restore_h, h_entry, h)
                prev_h = jnp.where(restore_h, h_entry, prev_h)
            tgt = tgt + (at_grid & running).astype(jnp.int32)

            status = jnp.where(is_end, _DONE, status)
            status = jnp.where(bad, _ERR_BAD_GRID, status)
            n_it = n_it + running.astype(jnp.int32)
            status = jnp.where(
                (status == _RUNNING) & (n_it >= max_steps),
                _ERR_MAX_STEPS, status,
            )
            if n_ev and terminal_hit is not None:
                status = jnp.where(terminal_hit, _DONE_EVENT, status)
            streak = jnp.where(
                true_rej, streak + 1, jnp.where(adv, 0, streak)
            ).astype(jnp.int32)
            if max_streak > 0:
                status = jnp.where(
                    (status == _RUNNING) & (streak >= max_streak),
                    _ERR_STALLED, status,
                )
            event = jnp.where(
                is_end, _EVT_END,
                jnp.where(
                    is_chk, _EVT_CHKPT,
                    jnp.where(rej, _EVT_REJECT,
                              jnp.where(adv, _EVT_STEP, _EVT_NONE)),
                ),
            ).astype(jnp.int32)
            err_prev = jnp.where(stepping, measure, err_prev)
            n_acc = n_acc + adv.astype(jnp.int32)
            n_rej = n_rej + true_rej.astype(jnp.int32)
            evc_out = (
                (tuple(g_prev), tuple(t_ev), tuple(count),
                 tuple(f.astype(jnp.int32) for f in found),
                 searching.astype(jnp.int32),
                 h_entry, tuple(y_ev)) if n_ev else ()
            )
            dnc_out = (
                (tuple(td), tuple(dtd), tuple(dx0), tuple(dx1))
                if dense_n else ()
            )
            return (t, h, prev_h, err_prev, t_lo, xv, tgt, status, event,
                    n_acc, n_rej, n_it, streak, saves, evc_out, dnc_out)

        def fcol(i):
            return fs_ref[:, i * gw:(i + 1) * gw]

        if dense_n:
            dnc0 = (
                tuple(fcol(base_d + j) for j in range(dense_n)),
                tuple(fcol(base_d + dense_n + j) for j in range(dense_n)),
                tuple(dx0_init),
                tuple(dx1_init),
            )
        else:
            dnc0 = ()
        if n_ev:
            bits = is_ref[:, (N_I - 1) * gw:N_I * gw]
            # float-column layout: [g_prev xE | t_ev xE*K | count xE |
            # h_entry] after the N_F controller columns
            evc0 = (
                tuple(fcol(N_F + e) for e in range(n_ev)),
                tuple(fcol(N_F + n_ev + i) for i in range(n_ev * n_k)),
                tuple(fcol(N_F + n_ev * (n_k + 1) + e)
                      for e in range(n_ev)),
                tuple((bits >> e) & 1 for e in range(n_ev)),
                (bits >> 15) & 1,
                fcol(N_F + n_ev * (n_k + 2)),
                tuple(
                    (evyin_refs[e][:] if n_state == 1
                     else jnp.concatenate(
                         [evyin_refs[e * n_state + i][:]
                          for i in range(n_state)], axis=1))
                    for e in range(n_ev)
                ) if has_evy else (),
            )
        else:
            evc0 = ()
        carry = (
            *[fs_ref[:, i * gw:(i + 1) * gw] for i in range(N_F)],
            x,
            *[is_ref[:, i * gw:(i + 1) * gw] for i in range(N_I - 1)],
            saves,
            evc0,
            dnc0,
        )
        if chunk is None:
            # persistent: loop in-kernel until the tile's last lane leaves
            # RUNNING (int32 max rather than jnp.any — Mosaic-safe scalar
            # reduction); max_steps forces every lane out in bounded time
            def still_running(carry):
                status = carry[7]
                return jnp.max(
                    jnp.where(status == _RUNNING, 1, 0).astype(jnp.int32)
                ) > 0

            carry = jax.lax.while_loop(still_running, iteration, carry)
        else:
            carry = jax.lax.fori_loop(
                0, chunk, lambda _, c: iteration(c), carry
            )
        (t, h, prev_h, err_prev, t_lo, xv, tgt, status, event, n_acc,
         n_rej, n_it, streak, saves, evc, dnc) = carry

        fcols = [t, h, prev_h, err_prev, t_lo]
        bits_out = jnp.zeros_like(tgt)
        if n_ev:
            (g_prev, t_ev, count, found, searching, h_entry, y_ev) = evc
            fcols += [*g_prev, *t_ev, *count, h_entry]
            for e in range(n_ev):
                bits_out = bits_out | (found[e].astype(jnp.int32) << e)
            bits_out = bits_out | (searching.astype(jnp.int32) << 15)
        if dense_n:
            td, dtd, dx0, dx1 = dnc
            fcols += [*td, *dtd]
        ofs_ref[:] = jnp.concatenate(fcols, axis=1)
        ois_ref[:] = jnp.concatenate(
            [tgt, status, event, n_acc, n_rej, n_it, streak, bits_out],
            axis=1,
        )
        for i, yr in enumerate(oy_refs):
            yr[:] = xv[:, i * d:(i + 1) * d]
        for g in range(n_save):
            for i in range(n_state):
                oys_refs[g * n_state + i][:] = saves[g][:, i * d:(i + 1) * d]
        if has_evy:
            for e in range(n_ev):
                for i in range(n_state):
                    oevy_refs[e * n_state + i][:] = (
                        y_ev[e][:, i * d:(i + 1) * d]
                    )
        for j in range(dense_n):
            for i in range(n_state):
                oxd_refs[(2 * j) * n_state + i][:] = (
                    dx0[j][:, i * d:(i + 1) * d])
                oxd_refs[(2 * j + 1) * n_state + i][:] = (
                    dx1[j][:, i * d:(i + 1) * d])

    return kernel


def _segment_sum_cols(v, group: int):
    """(TILE, G*Dg) -> (TILE, G) per-group lane-segment sums via column
    slices — BITWISE-identical to the XLA tier's ``jnp.sum`` over each
    trajectory's D components (the same values, same contiguous order,
    same f32 VPU reduction). The one-hot reduction matmul
    (``_row_matmul(v, E)``) is NOT: its HIGHEST (3-pass bf16-split) MXU
    accumulation rounds differently in the last ulp — measured on v5e,
    ~15% of entries differ by 1 ulp from the f32 sum.

    DIAGNOSTIC ONLY — deliberately NOT wired into the packed error norm.
    Both packed norm sites were switched to this helper and measured
    (r5): the ±1 adaptive-counter flips vs driver.step_once did NOT
    close, because the dominant divergence is upstream — the in-kernel
    streaming Taylor chain (one (TILE,D)@(D,K*D) contraction per term,
    tile-max squaring count at `row_scale`) and the XLA tier's
    Paterson-Stockmeyer expm (ops/expm.py) are *different polynomial
    evaluation schemes* for the same e^{dt·A}, each chosen for its
    hardware tier; their ~1e-6-relative f32 disagreement in y AND err
    flips marginal accepts (f = rtol/err ≈ 1.0) regardless of how the
    norm reduces. Meanwhile the G-slice concat costs real lanes: the
    packed LZ (G=64) adaptive row dropped 46.8M → 19.3M steps/s chained
    with this helper on the hot path. Kept for parity diagnosis; the
    hot path keeps the matmul reduction. See tests/test_lane_packing.py
    (bound regression test) and BENCH.md r5."""
    Dg = v.shape[1] // group
    return jnp.concatenate(
        [jnp.sum(v[:, g * Dg:(g + 1) * Dg], axis=1, keepdims=True)
         for g in range(group)], axis=1)


def make_chain_step_builder(C: int, R: int, K: int, m: int, theta: float,
                            max_squarings: int, step_cols_fn: Callable,
                            scaled=None, group: int = 1, wnorm=None,
                            err_action=None):
    """Step builder for modulated-operator exponential steppers: the chain
    coefficient rows come from ``step_cols_fn(t_col, dt_col)`` (quadrature
    sampling in-kernel) and the propagator action runs as a per-tile-scaled
    Taylor chain over the shared basis (const input 0: the K basis
    matrices stacked row-wise as one (K*D, D) block).

    ``scaled=(atol, rtol)`` switches the error norm to the controller's
    ``scaled_error`` mode (controller.error_measure): per-component
    err/(atol + rtol*max(|x|, |x_next|)), L2-normed, times rtol.

    ``group=G > 1`` (lane-packed rows, see ``_make_loop_kernel``): t/dt and
    the coefficient columns are (TILE, G); each coefficient expands to the
    (TILE, G*D) state width through an exact one-hot matmul, the error norm
    reduces group-wise, and non-finite states are CONTAINED — a group whose
    entry state has a NaN/Inf lane is zeroed for the matmul chains (so the
    block-diagonal contraction cannot leak its NaN into neighbor groups via
    0*NaN) and poisoned back to NaN on exit, reproducing the unpacked
    kernel's NaN-rejects-then-stalls semantics per trajectory. Non-finites
    CREATED mid-chain (transient overflow on a trial step) still leak as
    spurious rejections to the row's other groups — conservative: state is
    never corrupted, the neighbors just retry at a smaller h.

    ``wnorm=(w_row, post, kind)`` (lc.WeightedNorm.kernel_parts, w_row
    already group-tiled): declared error norm — dv scales by the w_row,
    reduces by "l2" (group-wise supported) or "max" (group=1 only;
    the caller gates packed configs), then multiplies by post. Mutually
    exclusive with ``scaled``. A non-None w_row arrives as const input 1
    (a (1, G*D) row — Pallas rejects captured non-scalar constants); the
    caller appends it to the const_inputs list."""
    has_wrow = wnorm is not None and wnorm[0] is not None

    def builder(const_refs):
        # const input 0 is the K working-basis matrices STACKED row-wise as
        # ONE (K*D, D) block: each Taylor term then needs a single
        # (TILE, D) @ (D, K*D) MXU contraction instead of K serial
        # (TILE, D) @ (D, D) ones — the same shared-matmul shape as the
        # XLA chain action (exp/modulated.py:modulated_exp_apply), and a
        # ~2-3x serial-latency cut for the small-tile lane-packed regime
        if has_wrow:
            bigm_ref, wrow_ref = const_refs
        else:
            (bigm_ref,) = const_refs
        D = bigm_ref.shape[-1]

        def basis_k_rows(k):
            return bigm_ref[k * D:(k + 1) * D, :]

        norms = [
            jnp.max(jnp.sum(jnp.abs(basis_k_rows(k)), axis=0))
            for k in range(K)
        ]
        if group > 1:
            Dg = D // group
            rr = jax.lax.broadcasted_iota(
                jnp.int32, (group, group * Dg), 0)
            cc = jax.lax.broadcasted_iota(
                jnp.int32, (group, group * Dg), 1)
            E = (cc // Dg == rr).astype(bigm_ref.dtype)

            def expand(a):                  # (TILE, G) -> (TILE, G*D)
                # HIGHEST: the default f32 matmul runs bf16 MXU passes on
                # this backend, which would truncate the expanded
                # coefficients to ~1e-3 (utils/prec.py)
                return jax.lax.dot_general(
                    a, E, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=a.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )

            def reduce_g(aw):               # (TILE, G*D) -> (TILE, G) sums
                return _row_matmul(aw, E)

        def step(t, dt, xv):
            dtype = xv.dtype
            if group > 1:
                finite = jnp.isfinite(xv)
                bad = reduce_g(
                    jnp.logical_not(finite).astype(dtype)) > 0.5
                xv = jnp.where(finite, xv, 0.0)
            cols = step_cols_fn(t, dt)

            def row_scale(c, r):
                # per-ROW squaring count from the row's own tile-max norm
                # bound: a long row (e.g. the Yoshida middle substep of
                # Magnus-6, |w2| ~ 1.7) no longer inflates every other
                # row's Taylor pass count (VERDICT r3 #7)
                b = None
                for k in range(K):
                    col = jnp.abs(cols[c][r][k]) * norms[k]
                    b = col if b is None else b + col
                mxr = jnp.max(jnp.where(jnp.isnan(b), 0.0, b))
                s = jnp.clip(
                    jnp.ceil(jnp.log2(jnp.maximum(mxr / theta, 1.0))),
                    0, max_squarings,
                ).astype(jnp.int32)
                return (jnp.asarray(2.0, dtype) ** (-s.astype(dtype)),
                        jnp.left_shift(jnp.ones((), jnp.int32), s))

            def prep_cs(c, r, scale):
                cs = [cols[c][r][k] * scale for k in range(K)]
                if group > 1:
                    cs = [expand(ck.astype(dtype)) for ck in cs]
                return cs

            def taylor_chain(v, cs, n_pass):
                def taylor_pass(_, v):
                    acc = v
                    term = v
                    for kk in range(1, m + 1):
                        # ONE (rows, D) @ (D, K*D) contraction; the K
                        # per-basis actions come back as column blocks
                        mv_all = _row_matmul(term, bigm_ref[:])
                        w = None
                        for k in range(K):
                            mv = mv_all[:, k * D:(k + 1) * D]
                            w = (
                                cs[k] * mv
                                if w is None
                                else w + cs[k] * mv
                            )
                        term = w * (1.0 / kk)
                        acc = acc + term
                    return acc

                return jax.lax.fori_loop(
                    0, n_pass, lambda i, v: taylor_pass(i, v), v)

            # NOTE (measured r3): row-stacking the C=2 chains through one
            # (2*TILE, D) @ (D, K*D) matmul per Taylor term is bitwise-
            # identical and NO FASTER on device (both forms measure
            # 43-45 ms on the 1024-sweep adaptive LZ solve in the same
            # tunnel session; an apparent 32-vs-43 ms gap across sessions
            # was tunnel variance) — so the chains run back to back in
            # the simpler sequential form. Mosaic also cannot row-concat
            # the unpacked (TILE, 1) coefficient columns at all
            # ("result/input offset mismatch on non-concat dimension").
            outs = []
            for c in range(C):
                v = xv
                for r in range(R):
                    if cols[c][r] is None:
                        continue   # declared-identity row (e^0 = I): skip
                    scale, n_pass = row_scale(c, r)
                    v = taylor_chain(v, prep_cs(c, r, scale), n_pass)
                outs.append(v)
            if C >= 2 or err_action is not None:
                if err_action is not None:
                    # fast_error: dv = (sum_k c_k M_k) y — the leading
                    # term of the embedded gap as ONE basis contraction
                    # on the advanced state instead of a second full
                    # Taylor chain (exp/magnus.py fast_error semantics).
                    # A None coefficient column skips its basis term.
                    ecols = err_action(t, dt)
                    mv_all = _row_matmul(outs[0], bigm_ref[:])
                    dv = None
                    for k in range(K):
                        ck = ecols[k]
                        if ck is None:
                            continue
                        ckx = (expand(ck.astype(dtype)) if group > 1
                               else ck)
                        term = ckx * mv_all[:, k * D:(k + 1) * D]
                        dv = term if dv is None else dv + term
                else:
                    dv = outs[1] - outs[0]
                if scaled is not None:
                    atol_s, rtol_s = scaled
                    sc = atol_s + rtol_s * jnp.maximum(
                        jnp.abs(xv), jnp.abs(outs[0])
                    )
                    dv = dv / sc
                if has_wrow:
                    dv = dv * wrow_ref[:]
                if wnorm is not None and wnorm[2] == "max":
                    # group=1 only (gated upstream: a segment max cannot
                    # ride the one-hot reduction matmul)
                    en = jnp.max(jnp.abs(dv), axis=1, keepdims=True)
                elif group > 1:
                    # sanitize before the one-hot reduction (0*NaN=NaN
                    # would leak a group's overflow into every other
                    # group's sum): a non-finite squared error becomes a
                    # huge finite one — same reject, right group
                    dv2 = dv * dv
                    dv2 = jnp.where(jnp.isfinite(dv2), dv2,
                                    jnp.asarray(1e30, dtype))
                    en = jnp.sqrt(reduce_g(dv2))
                else:
                    en = jnp.sqrt(jnp.sum(dv * dv, axis=1, keepdims=True))
                if scaled is not None:
                    en = en * scaled[1]
                if wnorm is not None and wnorm[1] != 1.0:
                    en = en * wnorm[1]
            else:
                en = jnp.zeros((xv.shape[0], group), dtype)
            y = outs[0]
            if group > 1:
                badw = expand(bad.astype(dtype)) > 0.5
                y = jnp.where(badw, jnp.asarray(jnp.nan, dtype), y)
                en = jnp.where(bad, jnp.asarray(jnp.nan, dtype), en)
            return y, en

        return step

    return builder


def make_rk_step_builder(tab, u_fn: Callable, advance_lower: bool,
                         scaled=None, group: int = 1, wnorm=None,
                         interleave: int = 1):
    """Step builder for the modulated-linear RK stepper: dx/dt =
    (M0 + u(t) M1) x with shared embedded matrices (const inputs 0, 1) and
    a kernel-compatible per-trajectory modulation u(t) — the in-loop twin
    of ops/pallas_rk._make_kernel. ``scaled``: see
    ``make_chain_step_builder``. ``group=G > 1``: lane-packed rows over
    block-diagonal M0/M1 — per-group u(t)/dt columns expand to the state
    width through the exact one-hot matmul, the error norm reduces
    group-wise, and non-finite entry states are contained exactly as in
    ``make_chain_step_builder``. ``wnorm``: see
    ``make_chain_step_builder`` — a non-None w_row arrives as const
    input 2."""
    s = tab.stages
    a = tab.a
    b = tab.b
    db = None if tab.b_err is None else (tab.b - tab.b_err)
    c = tab.c
    has_wrow = wnorm is not None and wnorm[0] is not None

    def builder(const_refs):
        if has_wrow:
            m0_ref, m1_ref, wrow_ref = const_refs
        else:
            m0_ref, m1_ref = const_refs
        if group > 1:
            Dg = m0_ref.shape[-1] // group
            rr = jax.lax.broadcasted_iota(
                jnp.int32, (group, group * Dg), 0)
            cc = jax.lax.broadcasted_iota(
                jnp.int32, (group, group * Dg), 1)
            E = (cc // Dg == rr).astype(m0_ref.dtype)

            def expand(arr):
                # HIGHEST: default f32 matmuls run bf16 passes here
                return jax.lax.dot_general(
                    arr, E, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=arr.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )

            def reduce_g(aw):
                return _row_matmul(aw, E)
        else:
            def expand(arr):
                return arr          # (TILE, 1) broadcasts

        # both operator actions in ONE wider contraction (6 serial matmuls
        # per step instead of 12 on the stage dependency chain — VERDICT
        # r3 #6; same trick as the chain builder's row-stacked basis)
        # (_row_matmul contracts with M's axis 1 = x @ M^T: stack along
        # axis 0, actions come back as column blocks)
        Dw = m0_ref.shape[-1]
        M01 = jnp.concatenate([m0_ref[:], m1_ref[:]], axis=0)

        def f(ti, xi):
            u = expand(u_fn(ti))                # (TILE, 1) or (TILE, G*D)
            mv = _row_matmul(xi, M01)
            return mv[:, :Dw] + u * mv[:, Dw:]

        def step(t, dt, xw):
            dtype = xw.dtype
            if group > 1:
                finite = jnp.isfinite(xw)
                bad = reduce_g(
                    jnp.logical_not(finite).astype(dtype)) > 0.5
                xw = jnp.where(finite, xw, 0.0)
            dt_e = expand(dt)
            if interleave > 1 and group == 1 \
                    and xw.shape[0] % interleave == 0:
                # split the tile into `interleave` independent row blocks
                # and issue their stage chains alternately: each block's
                # stage-i matmul can overlap the others' dependency
                # stalls (opt-in experiment for the stage-latency bound;
                # identical contractions, so results are bitwise equal)
                rows = xw.shape[0] // interleave
                bl = [slice(bb * rows, (bb + 1) * rows)
                      for bb in range(interleave)]
                Kb = [[None] * s for _ in bl]
                for bb, sl in enumerate(bl):
                    Kb[bb][0] = f(t[sl], xw[sl])
                for i in range(1, s):
                    for bb, sl in enumerate(bl):
                        ti = t[sl] + float(c[i]) * dt[sl]
                        acc = None
                        for j in range(i):
                            if a[i, j] == 0.0:
                                continue
                            term = float(a[i, j]) * Kb[bb][j]
                            acc = term if acc is None else acc + term
                        xi = (xw[sl] if acc is None
                              else xw[sl] + dt_e[sl] * acc)
                        Kb[bb][i] = f(ti, xi)
                K = [jnp.concatenate([Kb[bb][i] for bb in range(len(bl))])
                     for i in range(s)]
            else:
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
                    xi = xw if acc is None else xw + dt_e * acc
                    K[i] = f(ti, xi)

            xb_acc = None
            for j in range(s):
                if b[j] == 0.0:
                    continue
                term = float(b[j]) * K[j]
                xb_acc = term if xb_acc is None else xb_acc + term
            x_b = xw + dt_e * xb_acc

            if db is None:
                if group > 1:
                    badw = expand(bad.astype(dtype)) > 0.5
                    x_b = jnp.where(badw, jnp.asarray(jnp.nan, dtype),
                                    x_b)
                return x_b, jnp.zeros((xw.shape[0], group), xw.dtype)
            err_acc = None
            for j in range(s):
                if db[j] == 0.0:
                    continue
                term = float(db[j]) * K[j]
                err_acc = term if err_acc is None else err_acc + term
            err = dt_e * err_acc
            x_next = (x_b - err) if advance_lower else x_b
            if scaled is not None:
                atol_s, rtol_s = scaled
                sc = atol_s + rtol_s * jnp.maximum(
                    jnp.abs(xw), jnp.abs(x_next)
                )
                err = err / sc
            if has_wrow:
                err = err * wrow_ref[:]
            if wnorm is not None and wnorm[2] == "max":
                en = jnp.max(jnp.abs(err), axis=1, keepdims=True)
            elif group > 1:
                err2 = err * err
                err2 = jnp.where(jnp.isfinite(err2), err2,
                                 jnp.asarray(1e30, dtype))
                en = jnp.sqrt(reduce_g(err2))
            else:
                en = jnp.sqrt(jnp.sum(err * err, axis=1, keepdims=True))
            if scaled is not None:
                en = en * scaled[1]
            if wnorm is not None and wnorm[1] != 1.0:
                en = en * wnorm[1]
            if group > 1:
                badw = expand(bad.astype(dtype)) > 0.5
                x_next = jnp.where(badw, jnp.asarray(jnp.nan, dtype),
                                   x_next)
                en = jnp.where(bad, jnp.asarray(jnp.nan, dtype), en)
            return x_next, en

        return step

    return builder


def fused_loop_chunk(
    t_grid2: jax.Array,            # (n_grid,) save grid, [t0, ..., tf]
    fs: jax.Array,                 # (B, N_F_eff) float carry
    ist: jax.Array,                # (B, N_I) int32 carry
    x_parts: Sequence[jax.Array],  # 1 or 2 (B, d) state buffers
    saves: Sequence[jax.Array],    # (n_grid-2)*n_state interior save bufs
    const_inputs: Sequence[jax.Array],
    step_builder: Callable,
    *,
    chunk,
    adaptive: bool,
    ctl,
    tile: int = 128,
    interpret: bool = False,
    group: int = 1,
    events=None,
    ev_y: Sequence[jax.Array] = (),
    dense_times=None,
    dense_x: Sequence[jax.Array] = (),
):
    """Advance every trajectory by ``chunk`` driver iterations in ONE kernel
    (``chunk=None``: to COMPLETION — persistent kernel, see
    ``_make_loop_kernel``).

    ``group=G``: lane-packed rows (see ``_make_loop_kernel``); the float /
    int carry buffers are (B, N_F_eff*G) / (B, N_I*G), quantity-major.

    ``events``: events.KernelEvents for IN-KERNEL event detection; the
    float carry then carries N_F_eff = N_F + E*(K+2) + 1 quantities
    (K = events.k located-time slots per event), and ``ev_y`` holds
    E*n_state located-state buffers (record_y).

    ``dense_times``: (n_dense,) interior DENSE-output times (free-running,
    never truncating dt; see ``_make_loop_kernel``); the float carry then
    appends 2*n_dense (t_entry, dt) columns and ``dense_x`` holds the
    2*n_dense*n_state crossing-endpoint state buffers, ordered per slot
    [x0 parts | x1 parts].

    Returns (fs, ist, x_parts, saves, ev_y, dense_x) updated."""
    n_state = len(x_parts)
    B, d = x_parts[0].shape
    if tile <= 0 or B % tile != 0:
        # grid=(B//tile,) would silently leave lanes >= (B//tile)*tile
        # UNWRITTEN (garbage statuses can hang the outer while loop)
        raise ValueError(
            f"batch {B} must be a positive multiple of tile {tile}"
        )
    dtype = x_parts[0].dtype
    n_grid = t_grid2.shape[0]
    n_ev = 0 if events is None else int(events.n)
    n_dense = 0 if dense_times is None else int(dense_times.shape[0])
    n_f_eff = (N_F + (n_ev * (int(events.k) + 2) + 1 if n_ev else 0)
               + 2 * n_dense)
    kernel = _make_loop_kernel(
        step_builder, n_state, len(const_inputs), chunk, adaptive, ctl,
        n_grid=n_grid, group=group, events=events, dense_n=n_dense,
    )

    def vec_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    n_save_bufs = len(saves)
    n_evy = len(ev_y)
    n_dense_bufs = len(dense_x)
    if n_dense_bufs != 2 * n_dense * n_state:
        raise ValueError(
            f"dense_x holds {n_dense_bufs} buffers, expected "
            f"{2 * n_dense * n_state} (2 endpoints x {n_dense} slots x "
            f"{n_state} state parts)")
    ev_inputs = []
    if n_ev:
        ev_inputs.append(
            jnp.asarray(events.tiled_rows(group), dtype)  # (E, G*D)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((1, n_grid), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vec_spec(n_f_eff * group),
            vec_spec(N_I * group),
            *[vec_spec(d)] * (n_state + n_save_bufs + n_evy + n_dense_bufs),
            *[const_spec(a) for a in const_inputs],
            *[const_spec(a) for a in ev_inputs],
            *([pl.BlockSpec((1, n_dense), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)] if n_dense else []),
        ],
        out_specs=[
            vec_spec(n_f_eff * group),
            vec_spec(N_I * group),
            *[vec_spec(d)] * (n_state + n_save_bufs + n_evy + n_dense_bufs),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_f_eff * group), dtype),
            jax.ShapeDtypeStruct((B, N_I * group), jnp.int32),
            *[jax.ShapeDtypeStruct((B, d), dtype)
              for _ in range(n_state + n_save_bufs + n_evy + n_dense_bufs)],
        ],
        interpret=interpret,
    )(
        t_grid2.reshape(1, n_grid).astype(dtype),
        fs, ist, *x_parts, *saves, *ev_y, *dense_x,
        *[a.astype(dtype) for a in const_inputs],
        *ev_inputs,
        *([dense_times.reshape(1, n_dense).astype(dtype)]
          if n_dense else []),
    )
    base = 2 + n_state + n_save_bufs
    return (outs[0], outs[1], tuple(outs[2:2 + n_state]),
            tuple(outs[2 + n_state:base]),
            tuple(outs[base:base + n_evy]),
            tuple(outs[base + n_evy:]))


_WINDOW_SEGS = 32   # grid segments per persistent launch in windowed mode
                    # (local grids of 33 points = 31 interior save registers
                    # + the window-end state, the same VMEM budget as the
                    # single-launch 34-point cap this mode supersedes)


def _splice_window(ist, group):
    """Carry surgery between windowed persistent launches: re-arm DONE
    lanes (their DONE marked the WINDOW end, not tf) and point every lane
    at local grid index 1. Index 0 — the window's start point — was already
    processed as the previous window's end (one ``is_end`` iteration there
    replaces the monolithic loop's ``is_chk`` iteration at the same grid
    time, so n_iters/n_accept/h stay bit-pinned to ``driver.step_once``);
    re-targeting it would burn a duplicate checkpoint iteration. Error
    statuses (ERR_*, DONE_EVENT) pass through frozen."""
    gw = group
    tgt = jnp.ones((ist.shape[0], gw), jnp.int32)
    status = ist[:, gw:2 * gw]
    status = jnp.where(status == _DONE, _RUNNING, status)
    return jnp.concatenate([tgt, status, ist[:, 2 * gw:]], axis=1)


def _windowed_persistent(t_grid, fs, ist, y0_parts, const_inputs,
                         step_builder, *, adaptive, ctl, tile, interpret,
                         group, events, ev_y):
    """Large save grids on the persistent kernel (VERDICT r4 #5): a
    ``lax.scan`` over ``_WINDOW_SEGS``-segment grid windows, each ONE
    persistent launch running its tile to the window end, with the float/
    int/state carries spliced across windows (``_splice_window``). Interior
    saves stay in-kernel VMEM registers per window — VMEM cost is constant
    in the grid size — and launch count is ceil(n_seg/32) instead of the
    XLA driver's ~10 dispatches per ITERATION, so a 256-point grid costs a
    handful of launches rather than falling off the kernel tier entirely.

    The int carry's grid cursor is LOCAL per window; a global cursor is
    reconstructed outside the kernel (lanes frozen in an earlier window
    keep their recorded global cursor) so callers' ``tgt >= n_grid``
    reached-tf test keeps working. Iteration/counter/step-size sequences
    are bit-identical to the monolithic single-launch kernel (window-end
    ``is_end`` iterations stand in one-for-one for the monolithic
    ``is_chk`` iterations at the same grid times).

    Returns the ``fused_loop_integrate`` contract: (fs, ist, parts,
    saves, ev_y) with saves ordered grid-major over ALL n_grid-2 interior
    points."""
    import numpy as np

    W = _WINDOW_SEGS
    n_grid = t_grid.shape[0]
    n_seg = n_grid - 1
    n_full, rem = divmod(n_seg, W)
    # the FINAL window runs outside the scan (its output must keep DONE
    # statuses un-spliced); it takes the remainder segments, or a full
    # window when the grid divides evenly
    n_scan = n_full if rem else n_full - 1
    last_off = n_scan * W
    gw = group
    parts = tuple(y0_parts)
    n_ps = len(parts)
    saves0_w = tuple(jnp.zeros_like(p) for _ in range(W - 1) for p in parts)

    # (n_scan, W+1) stacked local grids: window w covers global segments
    # [w*W, (w+1)*W], sharing its end point with window w+1's start
    idx = np.arange(n_scan)[:, None] * W + np.arange(W + 1)[None, :]
    grids = t_grid[idx]

    def body(carry, g_local):
        fs, ist, parts, ev_y, g_tgt, off = carry
        entry_running = ist[:, gw:2 * gw] == _RUNNING
        fs, ist, parts, saves, ev_y, _ = fused_loop_chunk(
            g_local, fs, ist, parts, saves0_w, const_inputs, step_builder,
            chunk=None, adaptive=adaptive, ctl=ctl, tile=tile,
            interpret=interpret, group=group, events=events, ev_y=ev_y)
        # local cursor k <-> global off + k for lanes that ran this window;
        # lanes frozen in an earlier window keep their recorded cursor
        g_tgt = jnp.where(entry_running, off + ist[:, :gw], g_tgt)
        ist = _splice_window(ist, gw)
        return (fs, ist, parts, ev_y, g_tgt, off + W), (saves, parts)

    carry0 = (fs, ist, parts, ev_y, ist[:, :gw],
              jnp.zeros((), jnp.int32))
    (fs, ist, parts, ev_y, g_tgt, _), (saves_st, xend_st) = jax.lax.scan(
        body, carry0, grids)

    last_pts = n_grid - last_off
    g_final = jax.lax.slice_in_dim(t_grid, last_off, n_grid)
    saves0_f = tuple(jnp.zeros_like(p)
                     for _ in range(last_pts - 2) for p in parts)
    entry_running = ist[:, gw:2 * gw] == _RUNNING
    fs, ist, parts, saves_f, ev_y, _ = fused_loop_chunk(
        g_final, fs, ist, parts, saves0_f, const_inputs, step_builder,
        chunk=None, adaptive=adaptive, ctl=ctl, tile=tile,
        interpret=interpret, group=group, events=events, ev_y=ev_y)
    g_tgt = jnp.where(entry_running, last_off + ist[:, :gw], g_tgt)
    ist = jnp.concatenate([g_tgt, ist[:, gw:]], axis=1)

    # global interior saves, grid-major: window w's W-1 in-register saves,
    # then its end state (global grid index (w+1)*W), then the final
    # window's own interior saves
    saves_all = []
    for w in range(n_scan):
        for g in range(W - 1):
            for i in range(n_ps):
                saves_all.append(saves_st[g * n_ps + i][w])
        for i in range(n_ps):
            saves_all.append(xend_st[i][w])
    saves_all.extend(saves_f)
    return fs, ist, parts, tuple(saves_all), ev_y


def fused_loop_integrate(
    t_grid: jax.Array,             # (n_grid,) save grid [t0, ..., tf]
    y0_parts: Sequence[jax.Array],
    h0,
    const_inputs: Sequence[jax.Array],
    step_builder: Callable,
    *,
    adaptive: bool,
    ctl,
    chunk: int = 8,
    persistent: bool = False,
    tile: int = 128,
    interpret: bool = False,
    group: int = 1,
    events=None,
    dense_times=None,
):
    """Full integration over [t_grid[0], t_grid[-1]]: an XLA while loop of
    fused chunks, or — with ``persistent=True`` — ONE kernel launch whose
    in-kernel while loop runs each tile to completion (no XLA loop at all;
    the per-solve launch cost drops from n_iters/chunk launches to 1).
    Interior grid times are hit exactly and recorded in-kernel either way.

    ``group=G``: lane-packed rows — ``y0_parts`` is ONE pre-packed
    (B_rows, G*D) buffer and per-trajectory ``h0`` (of G*B_rows entries,
    row-major trajectory order) packs into the G-wide carry blocks.

    ``events``: events.KernelEvents — in-kernel event detection; g(t0,x0)
    initializes host-side (one cheap XLA reduction), located times/states
    come back in the extra float-carry columns / ``ev_y`` buffers.

    ``dense_times``: (n_dense,) interior DENSE-output times (persistent
    single-launch only; ``t_grid`` must be the bare [t0, tf]): the
    controller runs free and each slot records its crossing step's raw
    interpolation data (see ``_make_loop_kernel``); the return grows a
    6th element with the 2*n_dense*n_state endpoint buffers.

    Returns (fs, ist, x_parts, saves, ev_y[, dense_x]) final carries; the
    caller builds the Solution (ys = [x0, *saves, x_final]) — see
    exp/modulated.py."""
    B = y0_parts[0].shape[0]
    dtype = y0_parts[0].dtype
    n_grid = t_grid.shape[0]
    t0 = jnp.asarray(t_grid[0], dtype)

    def col_block(v):
        a = jnp.asarray(v, dtype)
        if a.ndim == 0 or a.size == 1:
            return jnp.broadcast_to(a.reshape(()), (B, group))
        return a.reshape(B, group)

    n_ev = 0 if events is None else int(events.n)
    evcols = []
    ev_y0 = ()
    if n_ev:
        import numpy as np

        xw = (y0_parts[0] if len(y0_parts) == 1
              else jnp.concatenate(y0_parts, axis=1))
        Dw = xw.shape[1] // group
        x3 = xw.reshape(B, group, Dw)
        rows = np.asarray(events.rows)
        for e in range(n_ev):
            if events.kinds[e] == "traced":
                # traced events run unpacked (group == 1): one host-side
                # block evaluation of g(t0, x0) over the (B, D) batch
                evcols.append(events.traced[e](
                    jnp.full((B, 1), t0, dtype), xw))
                continue
            row = jnp.asarray(rows[e], dtype)
            src = x3 if events.kinds[e] == "lin" else x3 * x3
            evcols.append((src * row).sum(-1) - events.offsets[e])
        # t_ev: K located-time slots per event, inf until reached
        evcols += ([jnp.full((B, group), jnp.inf, dtype)]
                   * (n_ev * int(events.k)))
        # count: per-event crossing counter (float column, exact ints)
        evcols += [jnp.zeros((B, group), dtype)] * n_ev
        evcols.append(jnp.zeros((B, group), dtype))              # h_entry
        if events.record_y:
            ev_y0 = tuple(
                jnp.zeros_like(p) for _ in range(n_ev) for p in y0_parts
            )

    n_dense = 0 if dense_times is None else int(dense_times.shape[0])
    dcols = []
    dense_x0 = ()
    if n_dense:
        if not persistent or n_grid != 2:
            raise ValueError(
                "dense_times needs the persistent single-launch mode with "
                f"a bare [t0, tf] grid (persistent={persistent}, "
                f"n_grid={n_grid})")
        # t_entry = +inf marks an unrecorded slot; dt = 0
        dcols = ([jnp.full((B, group), jnp.inf, dtype)] * n_dense
                 + [jnp.zeros((B, group), dtype)] * n_dense)
        dense_x0 = tuple(
            jnp.zeros_like(p) for _ in range(2 * n_dense) for p in y0_parts
        )

    fs = jnp.concatenate(
        [col_block(t0), col_block(h0), col_block(h0),
         jnp.zeros((B, group), dtype),          # err_norm
         jnp.zeros((B, group), dtype),          # t_lo (compensated time)
         *evcols, *dcols],
        axis=1,
    )
    ist = jnp.zeros((B, N_I * group), jnp.int32)
    if n_dense:
        # dense mode is pinned to dense._dense_step, which has NO t0
        # bookkeeping iteration: start the grid cursor past t0 so the
        # kernel doesn't burn its first iteration consuming the t0 grid
        # point (n_iters/max_steps accounting would differ by one)
        ist = ist.at[:, :group].set(1)
    saves0 = tuple(
        jnp.zeros_like(p) for _ in range(n_grid - 2) for p in y0_parts
    )

    if persistent:
        if n_grid > _WINDOW_SEGS + 2:
            # large grids: windowed persistent launches (constant VMEM,
            # ceil(n_seg/32) launches) — bit-pinned to the single launch
            return _windowed_persistent(
                t_grid, fs, ist, tuple(y0_parts), const_inputs,
                step_builder, adaptive=adaptive, ctl=ctl, tile=tile,
                interpret=interpret, group=group, events=events,
                ev_y=ev_y0,
            )
        out = fused_loop_chunk(
            t_grid, fs, ist, tuple(y0_parts), saves0, const_inputs,
            step_builder, chunk=None, adaptive=adaptive, ctl=ctl,
            tile=tile, interpret=interpret, group=group,
            events=events, ev_y=ev_y0,
            dense_times=dense_times, dense_x=dense_x0,
        )
        return out if n_dense else out[:5]

    def cond(carry):
        ist = carry[1]
        return jnp.any(
            ist[:, group:2 * group] == _RUNNING
        )

    def body(carry):
        fs, ist, parts, saves, ev_y = carry
        return fused_loop_chunk(
            t_grid, fs, ist, parts, saves, const_inputs, step_builder,
            chunk=chunk, adaptive=adaptive, ctl=ctl, tile=tile,
            interpret=interpret, group=group, events=events, ev_y=ev_y,
        )[:5]

    fs, ist, parts, saves, ev_y = jax.lax.while_loop(
        cond, body, (fs, ist, tuple(y0_parts), saves0, ev_y0)
    )
    return fs, ist, parts, saves, ev_y
