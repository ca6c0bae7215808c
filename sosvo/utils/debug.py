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


def checked(fn: Callable) -> Callable:
    """Wrap a jittable fn so NaN/Inf and OOB indexing raise with location.

    Usage:
        err, out = checked(step)(rig_cfg_closed_state, obs)
        err.throw()   # raises with the failing primitive's source line
    """
    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)


@contextlib.contextmanager
def strict_numerics():
    """Context: raise on NaNs produced by any op (host-visible, slower)."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
