"""JAX API compatibility shims shared across the parallel call sites.

One home for the ``shard_map`` import guard (stable ``jax.shard_map`` since
jax 0.6; the experimental module spells ``check_vma`` as ``check_rep``) so
the three consumers — halo exchange, batch identify, pod-slice batch
inference — cannot drift apart when the API moves again.
"""

from __future__ import annotations

try:  # jax >= 0.6 stable API
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, **kwargs):
        # the experimental API spells check_vma as check_rep
        if "check_vma" in kwargs:
            kwargs["check_rep"] = kwargs.pop("check_vma")
        return _shard_map_exp(f, **kwargs)


__all__ = ["shard_map"]
