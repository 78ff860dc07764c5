"""Runtime / mesh construction — SURVEY.md L0 + P3.

The distributed backend is XLA collectives over ICI (within a slice) and
DCN (across slices), expressed through ``jax.sharding.Mesh`` +
``shard_map`` — no NCCL/MPI/Gloo (SURVEY.md §5.8). Axis names:

  'data'  — batch sharding for data-parallel SGD (P1): sparse delta
            all-gather, replicated factor tables.
  'model' — row-sharded factor tables (P2): DSGD ring over ICI
            (``ppermute`` of item blocks), the TP/EP analog for MF.

Multi-host bring-up uses ``jax.distributed.initialize`` (no-op single
host). On CPU test platforms, ``XLA_FLAGS=--xla_force_host_platform_
device_count=N`` provides virtual devices (tests/conftest.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "distributed_init", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up. Safe no-op when single-process (the common
    single-host case and all tests); in a multi-host deployment the three
    arguments come from the launcher environment."""
    if num_processes is None:
        num_processes = int(os.environ.get("MFX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data: int = 1, model: int = 1, devices=None
) -> Mesh:
    """A ('data', 'model') mesh over the first data*model devices.

    Device order follows jax.devices(), which enumerates ICI-adjacent
    devices contiguously, so the 'model' ring (the inner, fastest-varying
    axis) rides neighboring ICI links."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(
            f"mesh {data}x{model} needs {n} devices, have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the minibatch (last) dimension over the data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))
