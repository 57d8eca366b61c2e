"""Utility coverage: NaN tooling and multi-host helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from diff_sal_tpu.parallel.multihost import (
    initialize,
    is_main_process,
    main_print,
    process_info,
)
from diff_sal_tpu.utils.debug import check_finite, nan_guard, tree_norms


def test_check_finite_passes_and_raises():
    check_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError) as e:
        check_finite({"a": jnp.asarray([1.0, np.nan])}, "bad")
    assert "bad" in str(e.value) and "nan=1" in str(e.value)


def test_tree_norms():
    out = tree_norms({"x": {"w": jnp.asarray([3.0, 4.0])}, "y": jnp.zeros(2)})
    np.testing.assert_allclose(out["x"], 5.0, rtol=1e-6)
    np.testing.assert_allclose(out["y"], 0.0)


def test_nan_guard_scope():
    import jax

    before = jax.config.jax_debug_nans
    with nan_guard(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before
    with nan_guard(False):
        assert jax.config.jax_debug_nans == before


def test_multihost_single_process():
    initialize()  # no-op single host
    assert is_main_process()
    main_print("hello from rank 0")  # must not raise
    info = process_info()
    assert info["process_count"] == 1 and info["global_devices"] >= 1
