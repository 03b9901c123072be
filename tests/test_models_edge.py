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
