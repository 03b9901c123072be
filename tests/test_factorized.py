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


def test_star_join_triple_equals_materialized_two_dims():
    """Two-dimension star join (different FKs — beyond what chained
    multiply_triple can express): the star-factorized triple equals the
    masked aggregate over the physically materialized join."""
    from duckdb_imputation_tpu.ring.star import star_join_triple, star_schema
    from duckdb_imputation_tpu.schema import FeatureSchema

    rng = np.random.default_rng(21)
    k1, k2, n = 7, 5, 500
    d1_num = rng.normal(size=(1, k1)).astype(np.float32)
    d1_cat = rng.integers(0, 3, size=(1, k1)).astype(np.int32)
    d2_num = rng.normal(size=(2, k2)).astype(np.float32)
    xf = rng.normal(size=(2, n)).astype(np.float32)
    cf = rng.integers(0, 4, size=(1, n)).astype(np.int32)
    ka = rng.integers(0, k1, n).astype(np.int32)
    kb = rng.integers(0, k2, n).astype(np.int32)
    w = rng.integers(0, 2, n).astype(np.float32)

    fs = FeatureSchema(num_cols=2, cat_keys=(tuple(range(4)),))
    d1s = FeatureSchema(num_cols=1, cat_keys=(tuple(range(3)),))
    d2s = FeatureSchema(num_cols=2)

    fused = star_join_triple(
        xf, cf, w, keys=(ka, kb),
        dims=((d1_num, d1_cat), (d2_num, None)),
        fact_schema=fs, dim_schemas=(d1s, d2s))

    # materialized: unique dim keys -> row-wise gathers
    jn = np.concatenate([xf, d1_num[:, ka], d2_num[:, kb]], 0)
    jc = np.concatenate([cf, d1_cat[:, ka]], 0)
    js = star_schema(fs, [d1s, d2s])
    mat = sum_to_triple(jn, jc, w, schema=js)
    for lhs, rhs in zip(jax.tree.leaves(fused), jax.tree.leaves(mat)):
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-5, atol=1e-3)


def test_star_join_single_dim_matches_factorized_join_sum():
    """With one dimension the star path coincides with the two-table
    fused factorized join (unique dim keys)."""
    from duckdb_imputation_tpu.ring.star import star_join_triple
    from duckdb_imputation_tpu.schema import FeatureSchema

    rng = np.random.default_rng(4)
    keys, n = 6, 300
    dz = rng.normal(size=(1, keys)).astype(np.float32)
    xf = rng.normal(size=(1, n)).astype(np.float32)
    ka = rng.integers(0, keys, n).astype(np.int32)
    fs = FeatureSchema(num_cols=1)
    ds = FeatureSchema(num_cols=1)

    fused = star_join_triple(xf, None, None, keys=(ka,), dims=((dz, None),),
                             fact_schema=fs, dim_schemas=(ds,))
    fg = sum_to_triple_grouped(xf, None, ka, schema=fs, num_groups=keys)
    dg = sum_to_triple_grouped(dz, None, np.arange(keys), schema=ds,
                               num_groups=keys)
    two = factorized_join_sum(fg, dg)
    for lhs, rhs in zip(jax.tree.leaves(fused), jax.tree.leaves(two)):
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=1e-5, atol=1e-3)


def test_mice_star_two_dims():
    """Star MICE with two dimension tables (different FKs): imputation of a
    fact column driven by BOTH dimensions reconstructs it; fact-only and
    single-dim MICE cannot."""
    from duckdb_imputation_tpu.mice import run_mice_star

    rng = np.random.default_rng(13)
    k1, k2, n = 16, 12, 3000
    z1 = (rng.normal(size=k1) * 2).astype(np.float32)
    z2 = (rng.normal(size=k2) * 2).astype(np.float32)
    dim1 = from_numpy(z1[:, None], rng.integers(0, 3, k1)[:, None])
    dim2 = from_numpy(z2[:, None], None)
    ka = rng.integers(0, k1, n)
    kb = rng.integers(0, k2, n)
    x2 = rng.normal(size=n).astype(np.float32)
    x1 = (1.2 * z1[ka] - 0.8 * z2[kb] + 0.3 * x2).astype(np.float32)
    nn = np.zeros((n, 2), bool)
    miss = rng.choice(n, n // 4, replace=False)
    nn[miss, 0] = True
    fact = from_numpy(np.stack([x1, x2], 1),
                      rng.integers(0, 2, n)[:, None], nn,
                      np.zeros((n, 1), bool))

    out = run_mice_star(fact, [ka, kb], [dim1, dim2], iters=2,
                        linreg_iters=300, noise=False)
    filled = init_fill(fact)

    def rmse(t):
        return float(np.sqrt(np.mean(
            (np.asarray(t.num_data)[0, miss] - x1[miss]) ** 2)))
    r_star, r_mean = rmse(out), rmse(filled)
    assert r_star < 0.1 * r_mean, (r_star, r_mean)


def test_dangling_fk_raises(star):
    """A fact FK with no matching dimension row must be a hard error, not a
    silent gather of the wrong dim row (the -1 in row_of_key would wrap to
    the LAST row)."""
    fact, fk, dim, _, _ = star
    # dim_key skips key 0 entirely -> every fact row with fk==0 dangles
    dim_key = np.arange(dim.n_rows, dtype=np.int64) + 1
    bad_fk = fk.copy()
    bad_fk[0] = 0
    with pytest.raises(ValueError, match="dangling"):
        run_mice_factorized(fact, bad_fk, dim, dim_key=dim_key, iters=1,
                            linreg_iters=50, noise=False)


def test_dangling_fk_raises_star(star):
    from duckdb_imputation_tpu.mice import run_mice_star
    fact, fk, dim, _, _ = star
    dim_key = np.arange(dim.n_rows, dtype=np.int64) + 1
    bad_fk = fk.copy()
    bad_fk[0] = 0
    with pytest.raises(ValueError, match="dangling"):
        run_mice_star(fact, [bad_fk], [dim], dim_keys=[dim_key], iters=1,
                      linreg_iters=50, noise=False)
