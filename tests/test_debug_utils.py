"""Numerical auditing utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vegs_tpu.utils import debug


def test_checked_raises_on_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = debug.checked(jax.jit(bad))
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))


def test_assert_all_finite():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    debug.assert_all_finite(good)
    bad = {"a": jnp.asarray([1.0, np.nan])}
    with pytest.raises(FloatingPointError):
        debug.assert_all_finite(bad)


def test_nan_guard():
    t = {"x": jnp.asarray([1.0, np.nan]), "i": jnp.asarray([1, 2])}
    out = debug.nan_guard(t)
    np.testing.assert_allclose(np.asarray(out["x"]), [1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(out["i"]), [1, 2])
