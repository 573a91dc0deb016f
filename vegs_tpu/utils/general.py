"""General helpers (reference /root/reference/utils/general_utils.py)."""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def safe_state(silent: bool = False, seed: int = 0):
    """Deterministic seeding + timestamped stdout (reference 131-152).

    XLA is deterministic by default on TPU, so unlike the reference there is
    no cudnn toggle; jax randomness is explicit via keys."""
    random.seed(seed)
    np.random.seed(seed)

    class _F:
        def __init__(self, wrapped):
            self.wrapped = wrapped

        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                ts = datetime.now().strftime("%d/%m %H:%M:%S")
                x = x.replace("\n", f" [{ts}]\n")
            self.wrapped.write(x)

        def flush(self):
            self.wrapped.flush()

    sys.stdout = _F(sys.stdout)


def check_objects_in_frame(bboxes: dict, frame) -> bool:
    """Whether the frame has any annotated dynamic objects
    (reference general_utils.py:154-160)."""
    return int(frame) in bboxes and len(bboxes[int(frame)]) > 0
