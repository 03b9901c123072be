"""sklearn-parity tests for the model layer, mirroring the reference's
test_LDA.py / test_regression.py / test_QDA.py / test_NB.py: iris,
train_test_split(test_size=0.33, random_state=42), accuracy/R² rounded to 3
decimals must match sklearn."""
import numpy as np
import pytest
from sklearn.datasets import load_iris
from sklearn.discriminant_analysis import (
    LinearDiscriminantAnalysis,
    QuadraticDiscriminantAnalysis,
)
from sklearn.linear_model import LinearRegression
from sklearn.metrics import accuracy_score, r2_score
from sklearn.model_selection import train_test_split
from sklearn.naive_bayes import GaussianNB
from sklearn.preprocessing import KBinsDiscretizer

from duckdb_imputation_tpu import FeatureSchema
from duckdb_imputation_tpu.ring import (
    sum_to_nb_agg_grouped,
    sum_to_triple,
    sum_to_triple_grouped,
)
from duckdb_imputation_tpu.models import (
    lda_predict,
    lda_train,
    linreg_predict,
    linreg_train,
    nb_predict,
    nb_train,
    qda_predict,
    qda_train,
)


@pytest.fixture(scope="module")
def iris():
    x, y = load_iris(return_X_y=True)
    x = x.astype(np.float32)
    xtr, xte, ytr, yte = train_test_split(x, y, test_size=0.33,
                                          random_state=42)
    return xtr, xte, ytr.astype(np.int64), yte.astype(np.int64)


@pytest.fixture(scope="module")
def iris_cat():
    """KBinsDiscretizer(4, ordinal, uniform) on the first two columns
    (test_regression.py:60-64 / test_LDA.py:58-66)."""
    x, y = load_iris(return_X_y=True)
    est = KBinsDiscretizer(n_bins=4, encode="ordinal", strategy="uniform",
                           subsample=None)
    binned = est.fit_transform(x[:, :2]).astype(np.int64)
    num = x[:, 2:].astype(np.float32)     # p_length, p_width
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = train_test_split(
        num, binned, y, test_size=0.33, random_state=42)
    return xtr_n, xte_n, xtr_c, xte_c, ytr.astype(np.int64), yte.astype(np.int64)


def _onehot_np(codes, sizes):
    cols = []
    for j, s in enumerate(sizes):
        oh = np.zeros((len(codes), s))
        oh[np.arange(len(codes)), codes[:, j]] = 1
        cols.append(oh)
    return np.concatenate(cols, axis=1)


def test_linreg_numeric_parity(iris):
    """test_regression.py:121-141 (no normalize) — predict s_length from the
    rest + one-hot target; R² must match sklearn to 3 decimals."""
    xtr, xte, ytr, yte = iris
    cat_tr = ytr[:, None]
    schema = FeatureSchema.infer(xtr, cat_tr)
    t = sum_to_triple(xtr.T, schema.encode(cat_tr).T, schema=schema)
    for normalize in (False, True):
        params = linreg_train(t, schema, label=0, step_size=0.001, lam=0.0,
                              max_iters=10000, normalize=normalize)
        pred = np.asarray(linreg_predict(
            params, xte[:, 1:].T, schema.encode(yte[:, None]).T,
            normalize=normalize))
        r2 = r2_score(xte[:, 0], pred)

        enc_tr = np.concatenate(
            [xtr[:, 1:], _onehot_np(ytr[:, None], [3])], axis=1)
        enc_te = np.concatenate(
            [xte[:, 1:], _onehot_np(yte[:, None], [3])], axis=1)
        reg = LinearRegression().fit(enc_tr, xtr[:, 0])
        r2_sk = reg.score(enc_te, xte[:, 0])
        assert round(r2, 3) == round(r2_sk, 3), (normalize, r2, r2_sk)


def test_linreg_categorical_close(iris_cat):
    """test_regression.py:93-119 — mixed features; R² within 0.2 of sklearn."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    cat_tr = np.concatenate([xtr_c, ytr[:, None]], axis=1)
    cat_te = np.concatenate([xte_c, yte[:, None]], axis=1)
    # predict p_length (num col 1) from p_width + cats
    num_tr = xtr_n[:, [1, 0]]  # label first ordering: [p_width, p_length]?
    # keep natural order: num cols = [p_length, p_width], label = 0
    schema = FeatureSchema.infer(xtr_n, cat_tr)
    t = sum_to_triple(xtr_n.T, schema.encode(cat_tr).T, schema=schema)
    params = linreg_train(t, schema, label=0, max_iters=10000)
    pred = np.asarray(linreg_predict(params, xte_n[:, 1:].T,
                                     schema.encode(cat_te).T))
    r2 = r2_score(xte_n[:, 0], pred)

    sizes = [len(k) for k in schema.cat_keys]
    enc_tr = np.concatenate([xtr_n[:, 1:], _onehot_np(cat_tr, sizes)], axis=1)
    enc_te = np.concatenate([xte_n[:, 1:], _onehot_np(cat_te, sizes)], axis=1)
    reg = LinearRegression().fit(enc_tr, xtr_n[:, 0])
    r2_sk = reg.score(enc_te, xte_n[:, 0])
    assert abs(round(r2, 2) - round(r2_sk, 2)) <= 0.2


def test_lda_numeric_parity(iris):
    """test_LDA.py:152-197 — 4 numeric features, target label; accuracy must
    match LinearDiscriminantAnalysis(solver='lsqr') to 3 decimals."""
    xtr, xte, ytr, yte = iris
    cat_tr = ytr[:, None]
    schema = FeatureSchema.infer(xtr, cat_tr)
    t = sum_to_triple(xtr.T, schema.encode(cat_tr).T, schema=schema)
    for normalize in (False, True):
        params = lda_train(t, schema, label=0, shrinkage=0.0,
                           normalize=normalize)
        pred = np.asarray(lda_predict(params, xte.T, normalize=normalize))
        # lda_predict returns the class INDEX; iris classes are 0,1,2 sorted
        acc = accuracy_score(yte, pred)
        clf = LinearDiscriminantAnalysis(solver="lsqr").fit(xtr, ytr)
        acc_sk = clf.score(xte, yte)
        assert round(acc, 3) == round(acc_sk, 3), (normalize, acc, acc_sk)


def test_lda_categorical_parity(iris_cat):
    """test_LDA.py:94-150 analogue — 2 numeric + 2 binned categorical
    features, shrinkage 0.01."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    cat_tr = np.concatenate([xtr_c, ytr[:, None]], axis=1)
    schema = FeatureSchema.infer(xtr_n, cat_tr)
    t = sum_to_triple(xtr_n.T, schema.encode(cat_tr).T, schema=schema)
    label = 2  # target is the 3rd categorical column
    params = lda_train(t, schema, label=label, shrinkage=0.01)
    from duckdb_imputation_tpu.models.sigma import select_vocab
    sel = select_vocab(schema, exclude_cat=label)
    pred = np.asarray(lda_predict(params, xte_n.T,
                                  sel.schema.encode(xte_c).T))
    acc = accuracy_score(yte, pred)

    sizes = [len(k) for k in schema.cat_keys[:2]]
    enc_tr = np.concatenate([xtr_n, _onehot_np(xtr_c, sizes)], axis=1)
    enc_te = np.concatenate([xte_n, _onehot_np(xte_c, sizes)], axis=1)
    clf = LinearDiscriminantAnalysis(solver="lsqr", shrinkage=0.01).fit(
        enc_tr, ytr)
    acc_sk = clf.score(enc_te, yte)
    assert round(acc, 3) == round(acc_sk, 3), (acc, acc_sk)


def test_qda_numeric_parity(iris):
    """test_QDA.py:44-69 — per-class triples, accuracy vs sklearn QDA."""
    xtr, xte, ytr, yte = iris
    schema = FeatureSchema.infer(xtr, None)
    triples = sum_to_triple_grouped(xtr.T, None, ytr, schema=schema,
                                    num_groups=3)
    for normalize in (False, True):
        params = qda_train(triples, schema, labels=[0, 1, 2],
                           normalize=normalize)
        pred = np.asarray(qda_predict(params, xte.T, normalize=normalize))
        acc = accuracy_score(yte, pred)
        clf = QuadraticDiscriminantAnalysis().fit(xtr, ytr)
        acc_sk = clf.score(xte, yte)
        assert round(acc, 3) == round(acc_sk, 3), (normalize, acc, acc_sk)


def test_nb_numeric_parity(iris):
    """test_NB.py:47-72 — grouped NB aggregates, accuracy vs GaussianNB."""
    xtr, xte, ytr, yte = iris
    schema = FeatureSchema.infer(xtr, None)
    aggs = sum_to_nb_agg_grouped(xtr.T, None, ytr, schema=schema,
                                 num_groups=3)
    params = nb_train(aggs, schema, labels=[0, 1, 2])
    pred = np.asarray(nb_predict(params, xte.T))
    acc = accuracy_score(yte, pred)
    clf = GaussianNB().fit(xtr, ytr)
    acc_sk = clf.score(xte, yte)
    assert round(acc, 3) == round(acc_sk, 3), (acc, acc_sk)


def test_nb_mixed_self_consistent(iris_cat):
    """Mixed gaussian+categorical NB (no reference test exists — the repo's
    own train/predict disagree on the freq offset, see naive_bayes.py
    docstring). Check against a direct numpy implementation."""
    xtr_n, xte_n, xtr_c, xte_c, ytr, yte = iris_cat
    schema = FeatureSchema.infer(xtr_n, xtr_c)
    codes_tr = schema.encode(xtr_c)
    aggs = sum_to_nb_agg_grouped(xtr_n.T, codes_tr.T, ytr, schema=schema,
                                 num_groups=3)
    params = nb_train(aggs, schema, labels=[0, 1, 2])
    pred = np.asarray(nb_predict(params, xte_n.T, schema.encode(xte_c).T))

    # direct numpy NB with the same estimator definitions
    probs = np.zeros((len(xte_n), 3))
    for c in range(3):
        sel = ytr == c
        prior = sel.mean()
        mu = xtr_n[sel].mean(0)
        var = ((xtr_n[sel] ** 2).mean(0) - mu ** 2) + 1e-9
        p = prior * np.prod(
            np.exp(-(xte_n - mu) ** 2 / (2 * var)) / np.sqrt(2 * np.pi * var),
            axis=1)
        for j in range(xtr_c.shape[1]):
            keys = np.asarray(schema.cat_keys[j])
            freq = np.array([
                (xtr_c[sel, j] == k).sum() / sel.sum() for k in keys])
            idx = schema.encode(xte_c)[:, j]
            f = np.where(idx < len(keys), freq[np.minimum(idx, len(keys) - 1)], 0.0)
            p = p * f
        probs[:, c] = p
    expected = probs.argmax(1)
    np.testing.assert_array_equal(pred, expected)


def test_linreg_noise_distribution(iris):
    """Stochastic regression: noise std equals the stored sqrt(variance)
    (regression.cpp:239-263,350-353)."""
    import jax
    xtr, xte, ytr, yte = iris
    cat_tr = ytr[:, None]
    schema = FeatureSchema.infer(xtr, cat_tr)
    t = sum_to_triple(xtr.T, schema.encode(cat_tr).T, schema=schema)
    params = linreg_train(t, schema, label=0, compute_variance=True)
    std = float(params[-1])
    assert std > 0
    base = np.asarray(linreg_predict(params, xte[:, 1:].T,
                                     schema.encode(yte[:, None]).T))
    noisy = np.asarray(linreg_predict(
        params, xte[:, 1:].T, schema.encode(yte[:, None]).T, add_noise=True,
        key=jax.random.PRNGKey(7)))
    resid = noisy - base
    assert abs(resid.std() - std) / std < 0.5
