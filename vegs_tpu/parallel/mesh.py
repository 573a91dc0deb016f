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
