"""Process-wide framework configuration flags.

The reference has no config system beyond builder methods (SURVEY.md §5
"config/flags"); solver-level knobs live in :class:`~vec_ode_tpu.controller.
StepControl` and the stepper dataclasses. The flags here control DIAGNOSTIC
behavior only — they never change numerics.
"""

from __future__ import annotations

# When True, a batched TPU solve that was ELIGIBLE-LOOKING for a fused
# Pallas loop kernel but fell back to the (~10x slower) XLA driver emits a
# warnings.warn naming the eligibility rule that failed (see
# exp/modulated.py fused_loop_solve and Solution.path). Off by default:
# CPU test runs fall back by design.
warn_on_fallback: bool = False


def _warn_fallback(reason: str) -> None:
    if not warn_on_fallback:
        return
    import warnings

    warnings.warn(
        "vec_ode_tpu: batched solve fell back to the XLA driver "
        f"({reason}); the fused Pallas loop path is ~10x faster on TPU. "
        "See Solution.path and the eligibility rules in "
        "exp/modulated.py:fused_loop_solve.",
        stacklevel=3,
    )
