"""Device meshes and sharding helpers (SURVEY.md §2.2).

Axes: ``data`` for batch (DP), ``y``/``x`` for the raster spatial plane —
the project's context-parallel analogue (no sequences here; the long
dimension is the 1200² granule plane, SURVEY.md §5 "long-context" row).
Collectives are XLA's, riding ICI inside a slice; ``jax.distributed`` extends
the same mesh across DCN for multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plumekit.config.train import MeshConfig

AXES = ("data", "y", "x")


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: join the jax.distributed cluster so one mesh
    spans hosts (ICI inside a slice, DCN across; SURVEY.md §2.2 comm-backend
    row). No-op when env provides no cluster (single host)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        import os

        env_cluster = any(
            os.environ.get(v)
            for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                      "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES",
                      "MEGASCALE_COORDINATOR_ADDRESS"))
        if coordinator is not None or env_cluster:
            # a requested OR env-configured cluster join that fails must
            # not silently degrade to single-host (each host would train
            # its own model and fight over the same checkpoint dir)
            raise
        pass  # env provides no cluster / already initialised


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, y, x) mesh. Without a config, all local devices go on
    ``data``."""
    devices = list(devices) if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=len(devices))
    if cfg.n_devices > len(devices):
        raise ValueError(
            f"mesh needs {cfg.n_devices} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: cfg.n_devices]).reshape(cfg.shape)
    return Mesh(arr, AXES)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh, batch_axis: bool = False) -> NamedSharding:
    """(H, W)- or (B, H, W, C)-style spatial sharding over (y, x)."""
    if batch_axis:
        return NamedSharding(mesh, P("data", "y", "x", None))
    return NamedSharding(mesh, P("y", "x"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
