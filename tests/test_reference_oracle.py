"""End-to-end MICE parity against the pure-numpy reference oracle
(tests/reference_oracle.py — an independent f64 transliteration of
imputation_base.cpp + regression.cpp + lda.cpp + utils.cpp).

Three tiers:
  1. sigma assembly: dict-scatter (oracle, build_sigma_matrix semantics)
     == dense-gather (models/sigma.py) — exact;
  2. trainers, iteration-for-iteration on the SAME sigma: GD params at
     rtol 1e-10 for several max_iters; LDA coef/intercepts;
  3. the whole MICE trajectory: per-train-call params and the final
     imputed table, (a) with shared triples (isolates driver/trainer
     semantics) and (b) fully independent (pins accumulation precision).
"""
import numpy as np
import pytest
from sklearn.datasets import load_iris

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.mice import run_mice_baseline
import duckdb_imputation_tpu.mice.baseline as baseline_mod
from duckdb_imputation_tpu.models import lda_train, linreg_train
from duckdb_imputation_tpu.models.linear_regression import (LinregParams,
                                                            _gd_train)
from duckdb_imputation_tpu.models.sigma import build_sigma
from duckdb_imputation_tpu.ring.serialize import triple_to_dict
from duckdb_imputation_tpu.ring.sum import sum_to_triple
from duckdb_imputation_tpu.table import from_numpy

from reference_oracle import (build_sigma_from_dict, oracle_lda_train,
                              oracle_linreg_gd, oracle_linreg_train,
                              oracle_mice_baseline)


@pytest.fixture(scope="module")
def iris_mcar():
    """iris + 20% MCAR nulls in 2 numeric cols and the (0/1/2) target."""
    x, y = load_iris(return_X_y=True)
    rng = np.random.default_rng(42)
    num = x.astype(np.float32)
    cat = y.astype(np.int64)[:, None]
    n = len(y)
    nn = np.zeros((n, 4), bool)
    cn = np.zeros((n, 1), bool)
    nn[rng.choice(n, n // 5, replace=False), 0] = True
    nn[rng.choice(n, n // 5, replace=False), 2] = True
    cn[rng.choice(n, n // 5, replace=False), 0] = True
    return num, cat, nn, cn


@pytest.fixture(scope="module")
def iris_triple(iris_mcar):
    """One masked triple (the first categorical-column aggregate of the
    MICE loop) shared by the trainer-parity tests, plus its dict form."""
    num, cat, nn, cn = iris_mcar
    t = from_numpy(num, cat, nn, cn)
    from duckdb_imputation_tpu.mice.partition import init_fill
    t = init_fill(t)
    w = (~cn[:, 0]).astype(np.float32)
    tri = sum_to_triple(t.num_data, t.cat_codes, w, schema=t.schema)
    return t, tri, triple_to_dict(tri, t.schema)


def test_sigma_from_dict_matches_build_sigma(iris_triple):
    t, tri, tri_dict = iris_triple
    ours, _ = build_sigma(tri, t.schema)
    oracle, _ = build_sigma_from_dict(tri_dict)
    np.testing.assert_array_equal(ours, oracle)
    ours_ex, _ = build_sigma(tri, t.schema, exclude_cat=0)
    oracle_ex, _ = build_sigma_from_dict(tri_dict, exclude_cat=0)
    np.testing.assert_array_equal(ours_ex, oracle_ex)


def test_gd_iteration_parity(iris_triple):
    """Iteration-for-iteration GD equality on the same f64 sigma: same
    trajectory after 2, 5, 50 and converged iterations (rtol 1e-10)."""
    t, tri, _ = iris_triple
    sigma, _ = build_sigma(tri, t.schema)
    for iters in (2, 5, 50, 10000):
        ours = _gd_train(sigma.copy(), 1, 0.001, 0.0, iters)
        oracle = oracle_linreg_gd(sigma.copy(), 1, 0.001, 0.0, iters)
        np.testing.assert_allclose(ours, oracle, rtol=1e-10, atol=1e-14)


def test_gd_with_ridge_parity(iris_triple):
    t, tri, _ = iris_triple
    sigma, _ = build_sigma(tri, t.schema)
    for lam in (0.1, 1.0):
        ours = _gd_train(sigma.copy(), 2, 0.001, lam, 500)
        oracle = oracle_linreg_gd(sigma.copy(), 2, 0.001, lam, 500)
        np.testing.assert_allclose(ours, oracle, rtol=1e-10, atol=1e-14)


def test_linreg_train_param_parity(iris_triple):
    """Flat f32 parameter vector == oracle coeff (label dropped) + std."""
    t, tri, tri_dict = iris_triple
    params = linreg_train(tri, t.schema, label=0, max_iters=10000,
                          compute_variance=True)
    coeff, std = oracle_linreg_train(tri_dict, 0, max_iters=10000)
    dec = LinregParams.decode(params, t.schema.num_cols - 1,
                              normalize=False, has_variance=True)
    oracle_flat = np.concatenate([[coeff[0]], np.delete(coeff[1:5], 0),
                                  coeff[5:]])
    ours_flat = np.concatenate([[dec.intercept], dec.num_coef, dec.cat_coef])
    np.testing.assert_allclose(ours_flat, oracle_flat.astype(np.float32),
                               rtol=2e-6)
    assert abs(dec.noise_std - std) < 2e-6 * (abs(std) + 1)


def test_lda_train_param_parity(iris_triple):
    t, tri, tri_dict = iris_triple
    params = np.asarray(lda_train(tri, t.schema, label=0, shrinkage=0.001),
                        np.float64)
    w, intercept, labels, _ = oracle_lda_train(tri_dict, 0, 0.001)
    n_classes, m = w.shape[1], w.shape[0]
    # layout (lda.cpp:335-386): [n_classes, size_idxs(=0: label is the only
    # cat), labels, coef class-major, intercepts]
    assert int(params[0]) == n_classes
    assert int(params[1]) == 0
    np.testing.assert_array_equal(params[2:2 + n_classes], labels)
    coef = params[2 + n_classes:2 + n_classes + m * n_classes]
    np.testing.assert_allclose(coef, w.T.flatten().astype(np.float32),
                               rtol=2e-5, atol=1e-6)
    icpt = params[2 + n_classes + m * n_classes:
                  2 + 2 * n_classes + m * n_classes]
    np.testing.assert_allclose(icpt, intercept.astype(np.float32), rtol=2e-6)


def _our_mice_with_param_log(t, iters, monkeypatch):
    log = []
    real_lda, real_lin = baseline_mod.lda_train, baseline_mod.linreg_train

    def lda_wrap(triple, schema, label, **kw):
        p = real_lda(triple, schema, label, **kw)
        log.append(("lda", label, np.asarray(p, np.float64)))
        return p

    def lin_wrap(triple, schema, label, **kw):
        p = real_lin(triple, schema, label, **kw)
        log.append(("linreg", label, np.asarray(p, np.float64)))
        return p

    monkeypatch.setattr(baseline_mod, "lda_train", lda_wrap)
    monkeypatch.setattr(baseline_mod, "linreg_train", lin_wrap)
    out = run_mice_baseline(t, iters=iters, noise=False)
    return out, log


def test_mice_trajectory_parity_shared_triples(iris_mcar, monkeypatch):
    """Oracle MICE fed the package's own triples: every per-column train
    call must produce the same params, and the final tables must agree —
    this pins the DRIVER semantics (column order, masked aggregation,
    write-back including the class-index quirk) independent of
    accumulation precision."""
    num, cat, nn, cn = iris_mcar
    t = from_numpy(num, cat, nn, cn)
    from duckdb_imputation_tpu.mice.partition import init_fill
    schema = init_fill(t).schema

    def triple_fn(num_a, cat_a, w):
        codes = schema.encode(cat_a).T
        tri = sum_to_triple(np.asarray(num_a, np.float32).T, codes,
                            np.asarray(w, np.float32), schema=schema)
        return triple_to_dict(tri, schema)

    # one round for the strict per-call comparison: across rounds the
    # f32-vs-f64 predict rounding of each write-back compounds chaotically
    # (×~10 per train call through the Gram condition number); multi-round
    # agreement is pinned by test_mice_end_to_end_independent instead
    oracle_log = []
    onum, ocat = oracle_mice_baseline(num, cat, nn, cn, iters=1,
                                      param_log=oracle_log,
                                      triple_fn=triple_fn)
    ours, our_log = _our_mice_with_param_log(t, 1, monkeypatch)

    assert len(oracle_log) == len(our_log)
    for (okind, ocol, *op), (kind, col, params) in zip(oracle_log, our_log):
        assert (okind, ocol) == (kind, col)
        if kind == "linreg":
            coeff = op[0]
            dec = LinregParams.decode(params, schema.num_cols - 1,
                                      normalize=False, has_variance=False)
            oracle_flat = np.concatenate(
                [[coeff[0]], np.delete(coeff[1:1 + schema.num_cols], col),
                 coeff[1 + schema.num_cols:]]).astype(np.float32)
            ours_flat = np.concatenate([[dec.intercept], dec.num_coef,
                                        dec.cat_coef])
            # round-2+ params see the f32-vs-f64 predict rounding of the
            # PREVIOUS write-back amplified by the Gram condition number
            np.testing.assert_allclose(ours_flat, oracle_flat, rtol=2e-3,
                                       atol=1e-4)
        else:
            w, icpt = op
            n_classes, m = w.shape[1], w.shape[0]
            coef = params[2 + n_classes:2 + n_classes + m * n_classes]
            np.testing.assert_allclose(
                coef, w.T.flatten().astype(np.float32), rtol=1e-3, atol=1e-4)

    # final tables: categorical EXACT (class index == value for 0/1/2),
    # numeric at f32 write-back precision
    np.testing.assert_array_equal(np.asarray(ours.cat_codes)[0], ocat[:, 0])
    np.testing.assert_allclose(np.asarray(ours.num_data).T, onum,
                               rtol=1e-4, atol=1e-4)


def test_mice_end_to_end_independent(iris_mcar):
    """Fully independent oracle (exact f64 triples, f64 solve/predict) vs
    the package pipeline (f32 device aggregation + f32 predict): the
    trajectories must coincide to accumulation precision."""
    num, cat, nn, cn = iris_mcar
    onum, ocat = oracle_mice_baseline(num, cat, nn, cn, iters=3)
    t = from_numpy(num, cat, nn, cn)
    ours = run_mice_baseline(t, iters=3, noise=False)
    codes = np.asarray(ours.cat_codes)[0]
    agree = (codes == ocat[:, 0]).mean()
    assert agree >= 0.98, agree
    np.testing.assert_allclose(np.asarray(ours.num_data).T, onum,
                               rtol=5e-3, atol=5e-3)
