"""Numerical-health auditing (the TPU answer to the reference's always-on
torch.autograd.set_detect_anomaly, SURVEY §5.2).

XLA on TPU is deterministic, so instead of an anomaly-detecting autograd we
provide: (a) a checkify wrapper that instruments any jitted function with NaN
checks and reports the first failing primitive, and (b) a pytree finite-ness
audit for states/checkpoints.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, errors=checkify.float_checks) -> Callable:
    """Wrap `fn` so every NaN/inf produced inside raises with the offending
    primitive's location. Usage:

        step = debug.checked(train_step)
        out = step(...)   # raises checkify.JaxRuntimeError on first NaN
    """
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side audit: raise listing every non-finite leaf in a pytree."""
    import numpy as np

    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} non-finite")
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}:\n  " + "\n  ".join(bad))


def nan_guard(tree):
    """Device-side: replace NaNs with zeros across a pytree (the reference's
    box-delta NaN zeroing generalized, train.py:198-205)."""
    return jax.tree.map(
        lambda x: jnp.nan_to_num(x, nan=0.0)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)
