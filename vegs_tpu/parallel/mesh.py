"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1D data-parallel mesh over the first n_devices devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, (
            f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bootstrap: `jax.distributed.initialize` (auto-detected on
    TPU pods; explicit args for manual launches). Returns the global device
    count. After this, make_mesh() spans the whole slice and the same
    shard_map step scales across hosts — collectives ride ICI within a slice
    and DCN across slices, all scheduled by XLA (SURVEY.md §2.5/§5.8 plan)."""
    if jax.process_count() == 1 and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    elif jax.process_count() == 1:
        try:
            jax.distributed.initialize()  # TPU pod auto-detection
        except Exception:
            pass  # single-process run
    return len(jax.devices())
