"""Factorized-join learning + factorized MICE (the reference's
factorized_imputation_* driver intent, imputation/include/
factorized_imputation_flight.h / retailer.h; join plan README.md:163-174)."""
import jax
import numpy as np
import pytest

from duckdb_imputation_tpu.table import from_numpy
from duckdb_imputation_tpu.mice import init_fill, run_mice_factorized
from duckdb_imputation_tpu.mice.partition import observed_weights
from duckdb_imputation_tpu.ring.sum import sum_to_triple, sum_to_triple_grouped
from duckdb_imputation_tpu.ring.triple import factorized_join_sum


@pytest.fixture(scope="module")
def star():
    """A small star schema: fact(key, x1, x2, c1) -> dim(key, z, g).
    The fact table's x1 depends mostly on the dimension attribute z, so
    imputing x1 well REQUIRES the join."""
    rng = np.random.default_rng(11)
    keys = 32
    dim_z = rng.normal(size=keys).astype(np.float32) * 3.0
    dim_g = rng.integers(0, 4, keys).astype(np.int64)
    n = 2000
    fk = rng.integers(0, keys, n)
    x2 = rng.normal(size=n).astype(np.float32)
    c1 = rng.integers(0, 3, n).astype(np.int64)
    x1 = (2.0 * dim_z[fk] + 0.3 * x2
          + rng.normal(size=n).astype(np.float32) * 0.1).astype(np.float32)
    num_null = np.zeros((n, 2), bool)
    miss = rng.choice(n, n // 5, replace=False)
    num_null[miss, 0] = True
    fact = from_numpy(np.stack([x1, x2], 1), c1[:, None], num_null,
                      np.zeros((n, 1), bool))
    dim = from_numpy(dim_z[:, None], dim_g[:, None])
    return fact, fk, dim, x1, miss


def test_factorized_train_triple_equals_materialized_join(star):
    """The per-column training triple computed factorized (grouped fact
    aggregate x precomputed dim aggregate, contracted over keys) equals the
    plain masked aggregate over the physically materialized join."""
    fact, fk, dim, _, _ = star
    fact = init_fill(fact)
    fs, ds = fact.schema, dim.schema
    keys = dim.n_rows
    w = observed_weights(fact, "num", 0)

    fact_g = sum_to_triple_grouped(fact.num_data, fact.cat_codes,
                                   fk, schema=fs, num_groups=keys,
                                   weights=w)
    dim_g = sum_to_triple_grouped(dim.num_data, dim.cat_codes,
                                  np.arange(keys), schema=ds,
                                  num_groups=keys)
    fused = factorized_join_sum(fact_g, dim_g)

    # materialized join: dim key is unique, so it's a row-wise gather
    jn = np.concatenate([np.asarray(fact.num_data),
                         np.asarray(dim.num_data)[:, fk]], 0)
    jc = np.concatenate([np.asarray(fact.cat_codes),
                         np.asarray(dim.cat_codes)[:, fk]], 0)
    joined = sum_to_triple(jn, jc, w, schema=fs.concat(ds))
    for lhs, rhs in zip(jax.tree.leaves(fused), jax.tree.leaves(joined)):
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-4, atol=1e-2)


def test_mice_factorized_beats_fact_only(star):
    """End to end: x1 is driven by the dimension attribute, so factorized
    MICE (training over the join) must reconstruct it far better than both
    mean fill and fact-only MICE."""
    from duckdb_imputation_tpu.mice import run_mice_baseline
    fact, fk, dim, x1_true, miss = star

    out = run_mice_factorized(fact, fk, dim, iters=2, linreg_iters=300,
                              noise=False)
    fact_only = run_mice_baseline(fact, iters=2, linreg_iters=300,
                                  noise=False)
    filled = init_fill(fact)

    def rmse(t):
        return float(np.sqrt(np.mean(
            (np.asarray(t.num_data)[0, miss] - x1_true[miss]) ** 2)))

    r_fact, r_mean, r_fz = rmse(fact_only), rmse(filled), rmse(out)
    assert r_fz < 0.5 * r_mean, (r_fz, r_mean)
    assert r_fz < 0.5 * r_fact, (r_fz, r_fact)
