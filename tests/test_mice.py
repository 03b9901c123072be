"""End-to-end MICE tests — the analogue of the reference's iris demo
(main.cpp:14-81: 20% MCAR nulls into 3 columns, run_MICE_baseline 5 iters)
plus the delta-algebra invariants that tie the three regimes together."""
import numpy as np
import pytest
from sklearn.datasets import load_iris

from duckdb_imputation_tpu.table import from_numpy
from duckdb_imputation_tpu.mice import (
    build_partitions,
    init_fill,
    run_mice_baseline,
    run_mice_high,
    run_mice_low,
)
from duckdb_imputation_tpu.ring import sum_to_triple, triple_sub, triple_add
from duckdb_imputation_tpu.ring.serialize import triple_to_dict
from duckdb_imputation_tpu.mice.partition import observed_weights


@pytest.fixture(scope="module")
def iris_mcar():
    """iris with 20% MCAR nulls in s_length (num 0), p_width (num 3) and
    target (cat 0) — main.cpp:64-71."""
    x, y = load_iris(return_X_y=True)
    rng = np.random.default_rng(42)
    n = len(x)
    num = x.astype(np.float32).copy()
    cat = y[:, None].astype(np.int64).copy()
    num_null = np.zeros_like(num, bool)
    cat_null = np.zeros_like(cat, bool)
    for j in (0, 3):
        idx = rng.choice(n, n // 5, replace=False)
        num_null[idx, j] = True
    idx = rng.choice(n, n // 5, replace=False)
    cat_null[idx, 0] = True
    return num, cat, num_null, cat_null


def _make_table(iris_mcar):
    num, cat, num_null, cat_null = iris_mcar
    return from_numpy(num, cat, num_null, cat_null)


MICE_KW = dict(iters=2, linreg_iters=300, noise=False)


def test_mice_baseline_improves_over_mean_fill(iris_mcar):
    num, cat, num_null, cat_null = iris_mcar
    t = _make_table(iris_mcar)
    filled = init_fill(t)
    out = run_mice_baseline(t, **MICE_KW)

    for j in (0, 3):
        mask = num_null[:, j]
        truth = num[mask, j]
        mean_rmse = np.sqrt(np.mean(
            (np.asarray(filled.num_data)[j, mask] - truth) ** 2))
        mice_rmse = np.sqrt(np.mean(
            (np.asarray(out.num_data)[j, mask] - truth) ** 2))
        assert mice_rmse < mean_rmse * 0.8, (j, mice_rmse, mean_rmse)

    mask = cat_null[:, 0]
    acc = (out.cat_values()[0, mask] == cat[mask, 0]).mean()
    assert acc > 0.8, acc
    # observed cells must be untouched
    np.testing.assert_array_equal(
        np.asarray(out.num_data)[0, ~num_null[:, 0]], num[~num_null[:, 0], 0])


def test_low_and_high_train_triples_match_baseline(iris_mcar):
    """All three regimes train each column on the same logical row set:
    observed(col). low: full − delta(null rows); high: static + delta(dirty
    but observed). Verify the triple algebra yields the baseline scan."""
    t = init_fill(_make_table(iris_mcar))
    parts = build_partitions(t)
    schema = t.schema
    full = sum_to_triple(t.num_data, t.cat_codes, None, schema=schema)
    static = sum_to_triple(
        t.num_data[:, parts.complete_idx],
        t.cat_codes[:, parts.complete_idx], None, schema=schema)

    for kind, col, dirty in (("num", 0, parts.num_dirty_idx[0]),
                             ("cat", 0, parts.cat_dirty_idx[0])):
        w = observed_weights(t, kind, col)
        baseline = sum_to_triple(t.num_data, t.cat_codes, w, schema=schema)

        delta = sum_to_triple(t.num_data[:, dirty], t.cat_codes[:, dirty],
                              None, schema=schema)
        low_train = triple_sub(full, delta)

        mask = (np.asarray(t.num_null)[col] if kind == "num"
                else np.asarray(t.cat_null)[col])
        obs_dirty = np.nonzero((parts.null_counts > 0) & ~mask)[0]
        delta_h = sum_to_triple(t.num_data[:, obs_dirty],
                                t.cat_codes[:, obs_dirty], None,
                                schema=schema)
        high_train = triple_add(static, delta_h)

        for cand in (low_train, high_train):
            np.testing.assert_allclose(np.asarray(cand.quad),
                                       np.asarray(baseline.quad),
                                       rtol=1e-5, atol=1e-2)
            np.testing.assert_allclose(np.asarray(cand.lin_cat),
                                       np.asarray(baseline.lin_cat),
                                       rtol=0, atol=1e-3)
            assert float(cand.n) == float(baseline.n)


def test_mice_low_matches_baseline_imputation(iris_mcar):
    """With noise off, low-regime MICE must produce (nearly) the same imputed
    table as the baseline full-rescan."""
    base = run_mice_baseline(_make_table(iris_mcar), **MICE_KW)
    low = run_mice_low(_make_table(iris_mcar), **MICE_KW)
    np.testing.assert_allclose(np.asarray(low.num_data),
                               np.asarray(base.num_data), rtol=1e-3,
                               atol=1e-2)
    agree = (np.asarray(low.cat_codes) == np.asarray(base.cat_codes)).mean()
    assert agree > 0.99, agree


def test_mice_high_runs(iris_mcar):
    out = run_mice_high(_make_table(iris_mcar), **MICE_KW)
    num, cat, num_null, cat_null = iris_mcar
    mask = num_null[:, 0]
    rmse = np.sqrt(np.mean(
        (np.asarray(out.num_data)[0, mask] - num[mask, 0]) ** 2))
    assert rmse < 0.7, rmse


def test_mice_device_matches_host(iris_mcar):
    """The single-dispatch on-device MICE loop produces the same imputation
    quality as the host baseline driver (f32 vs f64 solvers: compare
    quality, not bitwise)."""
    from duckdb_imputation_tpu.mice.device_round import run_mice_device
    num, cat, num_null, cat_null = iris_mcar
    host = run_mice_baseline(_make_table(iris_mcar), **MICE_KW)
    dev = run_mice_device(_make_table(iris_mcar), iters=2, gd_iters=300)
    for j in (0, 3):
        mask = num_null[:, j]
        rmse_h = np.sqrt(np.mean(
            (np.asarray(host.num_data)[j, mask] - num[mask, j]) ** 2))
        rmse_d = np.sqrt(np.mean(
            (np.asarray(dev.num_data)[j, mask] - num[mask, j]) ** 2))
        assert rmse_d < rmse_h * 1.2 + 0.05, (j, rmse_d, rmse_h)
    mask = cat_null[:, 0]
    acc = (dev.cat_values()[0, mask] == cat[mask, 0]).mean()
    assert acc > 0.8, acc


def test_mice_device_delta_matches_full(iris_mcar):
    """Fused delta loop == fused full-rescan loop (same f32 solvers, same
    training sets via the delta algebra)."""
    from duckdb_imputation_tpu.mice.device_round import (
        run_mice_device,
        run_mice_device_delta,
    )
    num, cat, num_null, cat_null = iris_mcar
    full = run_mice_device(_make_table(iris_mcar), iters=2, gd_iters=300)
    delta = run_mice_device_delta(_make_table(iris_mcar), iters=2,
                                  gd_iters=300)
    # full-vs-delta differ by f32 cancellation in the sigma algebra,
    # amplified through the GD solve — compare imputation QUALITY
    for j in (0, 3):
        mask = num_null[:, j]
        rmse_f = np.sqrt(np.mean(
            (np.asarray(full.num_data)[j, mask] - num[mask, j]) ** 2))
        rmse_d = np.sqrt(np.mean(
            (np.asarray(delta.num_data)[j, mask] - num[mask, j]) ** 2))
        assert rmse_d < rmse_f * 1.15 + 0.02, (j, rmse_d, rmse_f)
    # untouched cells identical
    obs = ~num_null[:, 0]
    np.testing.assert_array_equal(np.asarray(delta.num_data)[0, obs],
                                  np.asarray(full.num_data)[0, obs])
    agree = (np.asarray(delta.cat_codes)
             == np.asarray(full.cat_codes)).mean()
    assert agree > 0.95, agree


def test_mice_device_solve_vs_gd_trainer(iris_mcar):
    """trainer='solve' (one lstsq on the normal equations — the production
    device trainer) lands on the same model as trainer='gd' (the
    reference's iterated GD, regression.cpp:157-238): imputations agree to
    GD's own convergence tolerance."""
    from duckdb_imputation_tpu.mice.device_round import run_mice_device
    num, cat, num_null, cat_null = iris_mcar
    solve = run_mice_device(_make_table(iris_mcar), iters=2,
                            trainer="solve")
    gd = run_mice_device(_make_table(iris_mcar), iters=2, gd_iters=500,
                         trainer="gd")
    for j in (0, 3):
        mask = num_null[:, j]
        np.testing.assert_allclose(np.asarray(solve.num_data)[j, mask],
                                   np.asarray(gd.num_data)[j, mask],
                                   atol=1e-1)
    mask = cat_null[:, 0]
    agree = (np.asarray(solve.cat_codes)[0, mask]
             == np.asarray(gd.cat_codes)[0, mask]).mean()
    assert agree > 0.95, agree
