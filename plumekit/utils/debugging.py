"""Numerics guards (SURVEY.md §5 sanitizers row: the reference has none;
plumekit relies on JAX purity plus ``checkify`` for NaN/OOB under a flag).
"""

from __future__ import annotations

from typing import Callable


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap a jittable function with ``jax.experimental.checkify`` so NaN
    production and out-of-bounds indexing raise instead of propagating.

    Returns a callable with the same signature that raises
    ``checkify.JaxRuntimeError`` on the first violation. Intended for
    debugging runs (it adds error-state plumbing); production paths call the
    raw function.
    """
    import jax
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    checked_fn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
