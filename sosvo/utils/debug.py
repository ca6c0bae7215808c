"""Numerical sanitizers (SURVEY.md section 5.2).

JAX's functional model confines data races to host code, so the "sanitizer"
story here is numeric: NaN/Inf surfacing with checkify (works under jit,
unlike jax_debug_nans which disables fusion), plus a strict context for
tests that flips the global debug flags.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
from jax.experimental import checkify


# Trace-time switch consulted by the hand-unrolled small solvers
# (geometry/essential._chol9, align._chol4): checkify's per-op float
# instrumentation interacts pathologically with their ~10^2-10^3 scalar ops
# inside a large jaxpr (measured: ransac_essential compiles in seconds plain
# but >9 MINUTES under checkify with the unrolled Cholesky, vs ~20 s with the
# library kernel). Under the sanitizer the solvers fall back to the library
# kernels -- mathematically the same factorization, compact jaxpr; the
# unrolled/library equivalence is separately tested in tests/test_geometry.py.
UNROLLED_SOLVERS = True


@contextlib.contextmanager
def library_solvers():
    """Context: trace with library (non-unrolled) small-matrix solvers."""
    global UNROLLED_SOLVERS
    UNROLLED_SOLVERS = False
    try:
        yield
    finally:
        UNROLLED_SOLVERS = True


def checked(fn: Callable) -> Callable:
    """Wrap a jittable fn so NaN/Inf and OOB indexing raise with location.

    Usage:
        err, out = checked(step)(rig_cfg_closed_state, obs)
        err.throw()   # raises with the failing primitive's source line
    """
    ck = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapped(*args, **kwargs):
        with library_solvers():
            return ck(*args, **kwargs)

    return wrapped


@contextlib.contextmanager
def strict_numerics():
    """Context: raise on NaNs produced by any op (host-visible, slower)."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
