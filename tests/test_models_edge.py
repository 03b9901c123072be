"""Model edge cases beyond the reference's own test coverage: categorical
QDA (the drop_first path), non-contiguous label values, normalize with
categorical features."""
import numpy as np
import pytest
from sklearn.datasets import load_iris
from sklearn.discriminant_analysis import QuadraticDiscriminantAnalysis
from sklearn.metrics import accuracy_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import KBinsDiscretizer

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.ring import (
    sum_to_nb_agg_grouped,
    sum_to_triple_grouped,
)
from duckdb_imputation_tpu.models import (
    nb_predict,
    nb_train,
    qda_predict,
    qda_train,
)


@pytest.fixture(scope="module")
def iris_cat():
    x, y = load_iris(return_X_y=True)
    est = KBinsDiscretizer(n_bins=4, encode="ordinal", strategy="uniform",
                           subsample=None)
    binned = est.fit_transform(x[:, :2]).astype(np.int64)
    num = x[:, 2:].astype(np.float32)
    return train_test_split(num, binned, y.astype(np.int64), test_size=0.33,
                            random_state=42)


def test_qda_categorical_drop_first(iris_cat):
    """QDA with one-hot features needs drop_first to keep the covariance
    invertible (qda.cpp:47, n_cols_1hot_expansion drop path,
    ML/utils.cpp:565-572). Compare against sklearn QDA on drop-first
    dummies."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    schema = FeatureSchema.infer(xtr_n, xtr_c)
    codes = schema.encode(xtr_c).T
    triples = sum_to_triple_grouped(xtr_n.T, codes, ytr, schema=schema,
                                    num_groups=3)
    params = qda_train(triples, schema, labels=[0, 1, 2])
    drop_schema = schema.drop_first()
    pred = np.asarray(qda_predict(params, xte_n.T,
                                  drop_schema.encode(xte_c).T))
    acc = accuracy_score(yte, pred)
    # sklearn QDA refuses this data outright (per-class one-hot covariance
    # is rank-deficient: "covariance matrix of class 0 is not full rank") —
    # the reference's SVD pseudo-inverse with the 1e-9 cutoff is exactly
    # what makes in-DB categorical QDA work at all (qda.cpp:205-242).
    assert acc > 0.85, acc


def test_nb_noncontiguous_labels(iris_cat):
    """Label VALUES need not be 0..k-1 — NB returns the actual value
    (naive_bayes.cpp:253)."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    labels = np.array([10, 40, 70])
    schema = FeatureSchema.infer(xtr_n, None)
    aggs = sum_to_nb_agg_grouped(xtr_n.T, None, ytr, schema=schema,
                                 num_groups=3)
    params = nb_train(aggs, schema, labels=labels)
    pred = np.asarray(nb_predict(params, xte_n.T))
    assert set(np.unique(pred)) <= set(labels.tolist())
    acc = accuracy_score(labels[yte], pred)
    assert acc > 0.9, acc


def test_qda_labels_are_values(iris_cat):
    """QDA returns label values, not indices (qda.cpp:483-486)."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    labels = np.array([-5, 3, 99])
    schema = FeatureSchema.infer(xtr_n, None)
    triples = sum_to_triple_grouped(xtr_n.T, None, ytr, schema=schema,
                                    num_groups=3)
    params = qda_train(triples, schema, labels=labels)
    pred = np.asarray(qda_predict(params, xte_n.T))
    assert set(np.unique(pred)) <= set(labels.tolist())
    assert accuracy_score(labels[yte], pred) > 0.9


def test_nb_unseen_category_zeroes(iris_cat):
    """A category unseen at train time zeroes the probability for every
    class — the row falls back to class 0 (nb_impute:236-243 + the
    max_prob-init-0 rule)."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    schema = FeatureSchema.infer(xtr_n, xtr_c)
    aggs = sum_to_nb_agg_grouped(xtr_n.T, schema.encode(xtr_c).T, ytr,
                                 schema=schema, num_groups=3)
    params = nb_train(aggs, schema, labels=[0, 1, 2])
    bad = xte_c.copy()
    bad[:, 0] = 999           # never seen
    pred = np.asarray(nb_predict(params, xte_n.T, schema.encode(bad).T))
    assert (pred == 0).all()


def test_lda_1num_4cat_normalize():
    """The reference's sum_to_triple_1_4 LDA configuration
    (test_LDA.py:102-150): 1 numeric + 4 categorical (binned) columns,
    shrinkage 0.01, with and without normalize."""
    from sklearn.datasets import load_iris
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
    from sklearn.model_selection import train_test_split
    from duckdb_imputation_tpu.ring import sum_to_triple
    from duckdb_imputation_tpu.models import lda_train, lda_predict
    from duckdb_imputation_tpu.models.sigma import select_vocab

    x, y = load_iris(return_X_y=True)
    est = KBinsDiscretizer(n_bins=4, encode="ordinal", strategy="uniform",
                           subsample=None)
    binned = est.fit_transform(x[:, [0, 1, 2]]).astype(np.int64)
    num = x[:, [3]].astype(np.float32)          # p_width only
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = train_test_split(
        num, binned, y.astype(np.int64), test_size=0.33, random_state=42)
    cat_tr = np.concatenate([xtr_c, ytr[:, None]], axis=1)
    schema = FeatureSchema.infer(xtr_n, cat_tr)
    t = sum_to_triple(xtr_n.T, schema.encode(cat_tr).T, schema=schema)
    sel = select_vocab(schema, exclude_cat=3)
    for normalize in (False, True):
        params = lda_train(t, schema, label=3, shrinkage=0.01,
                           normalize=normalize)
        from duckdb_imputation_tpu.models import lda_predict as lp
        pred = np.asarray(lp(params, xte_n.T, sel.schema.encode(xte_c).T,
                             normalize=normalize))
        acc = accuracy_score(yte, pred)
        assert acc > 0.85, (normalize, acc)


def test_api_zero_numeric_grid(ring_test_table):
    """sum_to_triple_0_3: categorical-only aggregation through the grid."""
    from duckdb_imputation_tpu import api
    gb, num, cat = ring_test_table
    res = api.sum_to_triple_0_3(cat[:, 0], cat[:, 1], cat[:, 2])
    d = res.to_dict()
    assert d["N"] == 5 and d["lin_agg"] == [] and d["quad_agg"] == []
    assert d["lin_cat"][0] == [{"key": 4, "value": 3.0},
                               {"key": 8, "value": 2.0}]


def test_api_zero_categorical_grid(ring_test_table):
    """sum_to_triple_3_0: numeric-only."""
    from duckdb_imputation_tpu import api
    gb, num, cat = ring_test_table
    res = api.sum_to_triple_3_0(num[:, 0], num[:, 1], num[:, 2])
    d = res.to_dict()
    assert d["N"] == 5
    assert d["lin_agg"] == [15.0, 17.0, 22.0]
    assert d["quad_cat"] == []


def test_qda_categorical_normalize(iris_cat):
    """normalize=True with categorical features exercises the full
    triple-loop sigma standardization (qda.cpp:148-168) including the
    one-hot block — previously only the numeric normalize path was
    covered."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    schema = FeatureSchema.infer(xtr_n, xtr_c)
    codes = schema.encode(xtr_c).T
    triples = sum_to_triple_grouped(xtr_n.T, codes, ytr, schema=schema,
                                    num_groups=3)
    drop_schema = schema.drop_first()
    params = qda_train(triples, schema, labels=[0, 1, 2], normalize=True)
    pred = np.asarray(qda_predict(params, xte_n.T,
                                  drop_schema.encode(xte_c).T,
                                  normalize=True))
    acc = accuracy_score(yte, pred)
    base = np.asarray(qda_predict(
        qda_train(triples, schema, labels=[0, 1, 2]),
        xte_n.T, drop_schema.encode(xte_c).T))
    acc_base = accuracy_score(yte, base)
    assert acc > 0.85, acc
    # standardization must not change the model family's quality class
    assert abs(acc - acc_base) < 0.1, (acc, acc_base)


# ---------------------------------------------------------------------------
# zero-count classes: a mask can remove a schema class entirely
# ---------------------------------------------------------------------------

def _three_class_data(empty_class=2, n=400, seed=5):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 3, n).astype(np.int64)
    x = (y[:, None] * 1.5 + rng.normal(size=(n, 2))).astype(np.float32)
    w = (y != empty_class).astype(np.float32)  # mask removes class 2
    return x, y, w


def test_lda_train_empty_class_no_nan():
    """A class absent under the observed-mask must not poison the solve
    with NaN (the reference never sees such a class — its class list comes
    from the triple, lda.cpp:58-144); it must simply never be predicted."""
    from duckdb_imputation_tpu.models import lda_predict, lda_train
    from duckdb_imputation_tpu.ring import sum_to_triple

    x, y, w = _three_class_data()
    schema = FeatureSchema.infer(x, y[:, None])
    t = sum_to_triple(x.T, schema.encode(y[:, None]).T, w, schema=schema)
    params = lda_train(t, schema, label=0, shrinkage=0.001)
    coef = params[~np.isinf(params)]
    assert np.isfinite(coef).all()
    pred = np.asarray(lda_predict(params, x.T))
    assert np.isfinite(pred).all()
    assert not (pred == 2).any(), "empty class must never be predicted"
    assert (pred[y == 0] == 0).mean() > 0.8


def test_qda_nb_train_empty_class_no_nan():
    from duckdb_imputation_tpu.models import (nb_predict, nb_train,
                                              qda_predict, qda_train)
    from duckdb_imputation_tpu.ring import (sum_to_nb_agg_grouped,
                                            sum_to_triple_grouped)

    x, y, w = _three_class_data()
    schema = FeatureSchema.infer(x, None)
    triples = sum_to_triple_grouped(x.T, None, y, schema=schema,
                                    num_groups=3, weights=w)
    params = qda_train(triples, schema, labels=[0, 1, 2])
    assert not np.isnan(params).any()
    pred = np.asarray(qda_predict(params, x.T))
    assert not (pred == 2).any()

    aggs = sum_to_nb_agg_grouped(x.T, None, y, schema=schema, num_groups=3,
                                 weights=w)
    nbp = nb_train(aggs, schema, labels=[0, 1, 2])
    assert not np.isnan(nbp).any()
    prednb = np.asarray(nb_predict(nbp, x.T))
    assert not (prednb == 2).any()


def test_mice_device_empty_class_no_nan():
    """Fused device MICE where the null-mask removes one label class from
    the observed rows: the round must stay NaN-free (device_round.py
    _lda_device zero-count guard)."""
    from duckdb_imputation_tpu.mice.device_round import run_mice_device
    from duckdb_imputation_tpu.table import from_numpy

    rng = np.random.default_rng(7)
    n = 500
    y = rng.integers(0, 3, n).astype(np.int64)
    x = (y[:, None] * 2.0 + rng.normal(size=(n, 2))).astype(np.float32)
    cat_null = np.zeros((n, 1), bool)
    cat_null[y == 2] = True          # every class-2 row is null -> class 2
    cat_null[rng.choice(np.where(y != 2)[0], 40, replace=False)] = True
    t = from_numpy(x, y[:, None], np.zeros((n, 2), bool), cat_null)
    out = run_mice_device(t, iters=2, gd_iters=100)
    assert np.isfinite(np.asarray(out.num_data)).all()
    codes = np.asarray(out.cat_codes)
    assert ((codes >= 0) & (codes < 3)).all()
    # imputed codes can only be observed classes (0/1)
    assert not (codes[0, cat_null[:, 0]] == 2).any()
