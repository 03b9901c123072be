"""Pallas kernel semantics tests (interpret mode on the CPU mesh)."""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.ring.sum import masked_sigma


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    n = 5 * 2048 * 2
    num = rng.normal(size=(4, n)).astype(np.float32)
    codes = rng.integers(0, 8, size=(2, n)).astype(np.int32)
    w = (rng.random(n) > 0.3).astype(np.float32)
    schema = FeatureSchema(num_cols=4,
                           cat_keys=(tuple(range(8)), tuple(range(8))))
    return num, codes, w, schema


def test_sigma_pallas_interpret(data):
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_padded,
    )
    num, codes, w, schema = data
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_padded(num, codes, w, schema=schema))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-2)
    assert got[0, 0] == w.sum()


def test_sigma_pallas_fast_interpret(data):
    """Split-precision kernel: binary-mask semantics equal to the f32 path
    within f32-accumulation tolerance."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_fast_padded,
    )
    num, codes, w, schema = data
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast_padded(num, codes, w,
                                                  schema=schema))
    # counts exact
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_array_equal(got[0, 5:], ref[0, 5:])  # lin_cat counts
    # x-involving sums within split tolerance
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)


def test_sigma_pallas_fast_odd_sizes():
    """Non-multiple row count + 1 numeric + 3 cat columns (different pack)."""
    from duckdb_imputation_tpu.ring.kernels.sigma_pallas import (
        sigma_pallas_fast_padded,
    )
    rng = np.random.default_rng(6)
    n = 12_345
    num = rng.normal(size=(1, n)).astype(np.float32)
    codes = rng.integers(0, 3, size=(3, n)).astype(np.int32)
    w = (rng.random(n) > 0.5).astype(np.float32)
    schema = FeatureSchema(num_cols=1, cat_keys=((0, 1, 2),) * 3)
    ref = np.asarray(masked_sigma(num, codes, w, schema=schema))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sigma_pallas_fast_padded(num, codes, w,
                                                  schema=schema))
    assert got[0, 0] == ref[0, 0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.3)
