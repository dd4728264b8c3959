"""NaN/Inf debugging hooks (SURVEY.md section 5 "race detection/sanitizers"
row: JAX is functional, so the analogue of the reference's runtime invariant
checks - e.g. the storage-type assertion at 2d_admm.lua:958 - is non-finite
detection on phase boundaries plus jax's op-level nan debugging).

Two layers:
 * enable_nan_debug(): turns on jax_debug_nans, which re-runs the first
   offending primitive un-jitted and raises with its source location -
   op-level localization for the host-stepped drivers.
 * check_finite(phase, **arrays): host-side phase-boundary check used by the
   outer optimization loop when ProblemConfig.debug_nans is set; raises
   NonFiniteError naming the phase and array so a silent NaN inside the
   jitted ADMM loop surfaces as "phase X produced non-finite Y" instead of
   an unexplained failed step.
"""
from __future__ import annotations

import jax.numpy as jnp


class NonFiniteError(RuntimeError):
    """A phase of the optimization loop produced a non-finite array."""

    def __init__(self, phase: str, name: str):
        super().__init__(
            f"non-finite values detected in phase '{phase}' (array '{name}'); "
            "run with jax_debug_nans for op-level localization"
        )
        self.phase = phase
        self.name = name


def enable_nan_debug() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)


def check_finite(phase: str, **arrays) -> None:
    """Raise NonFiniteError naming the first non-finite array, if any."""
    for name, a in arrays.items():
        if a is None:
            continue
        if not bool(jnp.all(jnp.isfinite(jnp.asarray(a)))):
            raise NonFiniteError(phase, name)
