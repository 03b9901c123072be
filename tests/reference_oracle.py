"""Pure-numpy (float64) transliteration of the reference MICE pipeline —
the buildable stand-in for the un-buildable DuckDB binary (zero egress).

Every function here is written directly from the reference C++ sources and
follows their exact loop structure, update order, and stopping rules:

  * sigma assembly from the NESTED TRIPLE DICT with a per-call rebuilt
    category dictionary — n_cols_1hot_expansion + build_sigma_matrix
    (/root/reference/duckdb_extension/src/ML/utils.cpp:520-576, 176-310);
  * LDA train — build_sum_vector + pooled covariance + shrinkage + dgelsd
    least-squares + intercepts (ML/lda.cpp:58-144, 154-416);
  * GD ridge regression — compute_gradient / compute_error / backtracking
    line search / Barzilai-Borwein step / the two stopping conditions
    (ML/regression.cpp:29-105, 108-354);
  * the MICE baseline loop — init_baseline mean/mode fill, categorical
    columns first, WHERE <col>_IS_NULL IS FALSE masked aggregation, CASE
    WHEN write-back, and the writes-CLASS-INDEX quirk of lda_predict
    (imputation/algorithms/imputation_base.cpp:6-146, partition.cpp:671-719;
    lda.cpp:575).

This module deliberately imports NOTHING from duckdb_imputation_tpu (except
in type comments): it is an independent oracle that tests/test_reference_
oracle.py runs against the package to pin exact model-parameter parity and
the end-to-end MICE trajectory.
"""
from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# triple-dict helpers (the reference's nested serialization format)
# ---------------------------------------------------------------------------

def vocab_from_dict(tri: dict) -> tuple[list[np.ndarray], np.ndarray]:
    """n_cols_1hot_expansion (utils.cpp:520-576): per-cat-col sorted array
    of the category keys PRESENT in the aggregate, plus the begin/end index
    vector cat_vars_idxs."""
    cat_arrays = []
    for col_entries in tri["lin_cat"]:
        keys = sorted(e["key"] for e in col_entries)
        cat_arrays.append(np.asarray(keys, np.int64))
    idxs = np.zeros(len(cat_arrays) + 1, np.int64)
    for j, a in enumerate(cat_arrays):
        idxs[j + 1] = idxs[j] + len(a)
    return cat_arrays, idxs


def _find(arr: np.ndarray, key: int) -> int:
    """find_in_array (utils.cpp:152-162): linear scan, -1 on miss."""
    hit = np.nonzero(arr == key)[0]
    return int(hit[0]) if len(hit) else -1


def build_sigma_from_dict(tri: dict, exclude_cat: int | None = None
                          ) -> tuple[np.ndarray, list[np.ndarray]]:
    """build_sigma_matrix, keyed-dictionary overload (utils.cpp:176-310):
    scatter the nested triple dict into the dense (1+d+V')² double matrix,
    optionally excluding one categorical column (label_categorical_sigma).
    Returns (sigma, kept per-col category dictionaries)."""
    lin = np.asarray(tri.get("lin_agg", tri.get("lin_num")), np.float64)
    d = len(lin)
    n = float(tri["N"])
    quad_packed = np.asarray(tri.get("quad_agg", tri.get("quad_num")),
                             np.float64)
    cat_arrays, _ = vocab_from_dict(tri)
    n_cat = len(cat_arrays)
    kept_cols = [j for j in range(n_cat) if j != exclude_cat]
    kept = [cat_arrays[j] for j in kept_cols]
    # vocab slot offset of kept col j within the sigma's categorical block
    offs = {}
    pos = 0
    for j in kept_cols:
        offs[j] = pos
        pos += len(cat_arrays[j])
    v = pos
    p = 1 + d + v
    sigma = np.zeros((p, p), np.float64)
    sigma[0, 0] = n
    sigma[0, 1:1 + d] = lin
    sigma[1:1 + d, 0] = lin
    # packed upper triangle: quad[row*d - row(row+1)/2 + col] (utils.cpp:192-199)
    for r in range(d):
        for c in range(r, d):
            val = quad_packed[r * d - r * (r + 1) // 2 + c]
            sigma[1 + r, 1 + c] = val
            sigma[1 + c, 1 + r] = val
    for j in kept_cols:
        base = 1 + d + offs[j]
        for e in tri["lin_cat"][j]:
            slot = base + _find(cat_arrays[j], e["key"])
            sigma[0, slot] = e["value"]
            sigma[slot, 0] = e["value"]
    # quad_num_cat: num-major list of (num i, cat j) sections
    for i in range(d):
        for j in kept_cols:
            sec = tri["quad_num_cat"][i * n_cat + j]
            base = 1 + d + offs[j]
            for e in sec:
                slot = base + _find(cat_arrays[j], e["key"])
                sigma[1 + i, slot] = e["value"]
                sigma[slot, 1 + i] = e["value"]
    # quad_cat: pairs i<=j
    sec_idx = 0
    for i in range(n_cat):
        for j in range(i, n_cat):
            sec = tri["quad_cat"][sec_idx]
            sec_idx += 1
            if i not in offs or j not in offs:
                continue
            bi, bj = 1 + d + offs[i], 1 + d + offs[j]
            for e in sec:
                si = bi + _find(cat_arrays[i], e["key1"])
                sj = bj + _find(cat_arrays[j], e["key2"])
                sigma[si, sj] = e["value"]
                sigma[sj, si] = e["value"]
    return sigma, kept


def build_sum_vector_from_dict(tri: dict, label: int) -> np.ndarray:
    """build_sum_vector (lda.cpp:58-144): per label-category sums
    [count, Σ num cols, Σ onehot(other cats)] pulled from the triple's own
    categorical sections. Returns f64[C, 1+d+V']."""
    lin = tri.get("lin_agg", tri.get("lin_num"))
    d = len(lin)
    cat_arrays, _ = vocab_from_dict(tri)
    n_cat = len(cat_arrays)
    labels = cat_arrays[label]
    kept_cols = [j for j in range(n_cat) if j != label]
    offs = {}
    pos = 0
    for j in kept_cols:
        offs[j] = pos
        pos += len(cat_arrays[j])
    out = np.zeros((len(labels), 1 + d + pos), np.float64)
    for e in tri["lin_cat"][label]:
        out[_find(labels, e["key"]), 0] = e["value"]
    for i in range(d):
        sec = tri["quad_num_cat"][i * n_cat + label]
        for e in sec:
            out[_find(labels, e["key"]), 1 + i] = e["value"]
    sec_idx = 0
    for i in range(n_cat):
        for j in range(i, n_cat):
            sec = tri["quad_cat"][sec_idx]
            sec_idx += 1
            if i == label and j in offs:
                for e in sec:
                    c = _find(labels, e["key1"])
                    out[c, 1 + d + offs[j] + _find(cat_arrays[j], e["key2"])] \
                        = e["value"]
            elif j == label and i in offs:
                for e in sec:
                    c = _find(labels, e["key2"])
                    out[c, 1 + d + offs[i] + _find(cat_arrays[i], e["key1"])] \
                        = e["value"]
    return out


# ---------------------------------------------------------------------------
# trainers (exact reference semantics, f64)
# ---------------------------------------------------------------------------

def oracle_linreg_gd(sigma: np.ndarray, label: int, step_size: float,
                     lam: float, max_iters: int) -> np.ndarray:
    """ridge_linear_regression's GD loop (regression.cpp:157-238),
    do-while structure and update order preserved. `label` is the sigma
    index (numeric col l -> l+1)."""
    num_params = sigma.shape[0]
    count = sigma[0, 0]

    def compute_gradient(params):
        # regression.cpp:29-46
        if count == 0.0:
            return np.zeros(num_params)
        grad = sigma @ params / count
        grad[label] = 0.0
        return grad

    def compute_error(params):
        # regression.cpp:48-77
        if count == 0.0:
            return 0.0
        err = params @ sigma @ params / count
        pnorm = float(params[1:] @ params[1:]) - 1.0
        return (err + lam * pnorm) / 2.0

    learned = np.zeros(num_params)
    prev_learned = np.zeros(num_params)
    learned[label] = -1.0
    prev_learned[label] = -1.0
    grad = compute_gradient(learned)
    prev_grad = grad.copy()

    gradient_norm = grad[0] * grad[0]
    for i in range(1, num_params):
        upd = grad[i] + lam * learned[i]
        gradient_norm += upd * upd
    gradient_norm -= lam * lam
    first_gradient_norm = math.sqrt(gradient_norm)
    prev_error = compute_error(learned)

    num_iterations = 1
    while True:                                    # do { ... } while
        update = grad + lam * learned
        update[0] = grad[0]
        prev_learned = learned.copy()
        prev_grad = grad.copy()
        learned = learned - step_size * update
        learned[label] = -1.0
        gradient_norm = float(update @ update) - lam * lam
        dparam_norm = step_size * math.sqrt(float(update @ update))

        error = compute_error(learned)
        backtracking_steps = 0
        while (error > prev_error - (step_size / 2) * gradient_norm
               and backtracking_steps < 500):       # regression.cpp:205-223
            step_size /= 2
            newp = prev_learned - step_size * update
            dparam_norm = math.sqrt(float((learned - newp) @ (learned - newp)))
            learned = newp
            learned[label] = -1.0
            error = compute_error(learned)
            backtracking_steps += 1

        gradient_norm = math.sqrt(gradient_norm)
        if (dparam_norm < 1e-20
                or gradient_norm / (first_gradient_norm + 0.001) < 1e-8):
            break
        grad = compute_gradient(learned)

        # compute_step_size (regression.cpp:79-105)
        pd = learned - prev_learned
        gd = grad - prev_grad
        dss = float(pd @ pd)
        gss = float(gd @ gd)
        dgs = float(pd @ gd)
        if dgs != 0.0 and gss != 0.0:
            ts = dss / dgs
            tm = dgs / gss
            if not (tm < 0.0 or ts < 0.0):
                step_size = tm if tm / ts > 0.5 else ts - 0.5 * tm
        prev_error = error
        num_iterations += 1
        if num_iterations >= max_iters:
            break
    return learned


def oracle_linreg_train(tri: dict, label: int, step_size: float = 0.001,
                        lam: float = 0.0, max_iters: int = 10000,
                        compute_variance: bool = True):
    """linreg_train from the triple dict. Returns (coeff over the full
    sigma index space with coeff[label+1] = -1, std or None)."""
    sigma, _ = build_sigma_from_dict(tri)
    coeff = oracle_linreg_gd(sigma, label + 1, step_size, lam, max_iters)
    std = None
    if compute_variance:
        theta = coeff.copy()
        theta[label + 1] = -1.0
        variance = float(theta @ sigma @ theta) / float(tri["N"])
        std = math.sqrt(max(variance, 0.0))
    return coeff, std


def oracle_lda_train(tri: dict, label: int, shrinkage: float):
    """lda_train (lda.cpp:154-416). Returns (W f64[m, C], intercept f64[C],
    label category values, kept per-col dictionaries)."""
    sigma, kept = build_sigma_from_dict(tri, exclude_cat=label)
    sums = build_sum_vector_from_dict(tri, label)
    cat_arrays, _ = vocab_from_dict(tri)
    labels = cat_arrays[label]
    n_total = float(tri["N"])
    num_params = sigma.shape[0] - 1
    cov = sigma[1:, 1:].copy()
    n_classes = sums.shape[0]
    coef = np.zeros((n_classes, num_params))
    for i in range(n_classes):                      # lda.cpp:242-251
        for jj in range(num_params):
            for k in range(num_params):
                cov[jj, k] -= sums[i, jj + 1] * sums[i, k + 1] / sums[i, 0]
            coef[i, jj] = sums[i, jj + 1] / sums[i, 0]
    mu = np.trace(cov) / num_params                 # lda.cpp:259-273
    cov *= (1.0 - shrinkage)
    cov[np.diag_indices(num_params)] += shrinkage * mu
    cov /= n_total                                  # lda.cpp:275-279
    w, *_ = np.linalg.lstsq(cov, coef.T, rcond=-1)  # dgelsd, lda.cpp:284-297
    res = coef @ w                                  # dgemm, lda.cpp:316-320
    intercept = np.array([res[j, j] * (-0.5)
                          + math.log(sums[j, 0] / n_total)
                          for j in range(n_classes)])
    return w, intercept, labels, kept


# ---------------------------------------------------------------------------
# the end-to-end MICE baseline oracle (all f64, raw category values)
# ---------------------------------------------------------------------------

def _exact_triple_dict(num: np.ndarray, cat: np.ndarray, w: np.ndarray
                       ) -> dict:
    """The fused aggregate sum_to_triple_x_y over rows with w != 0, as the
    nested dict (exact f64 sums; map entries exist iff touched — the
    SumState semantics, sum_no_lift.cpp:53-216)."""
    sel = w != 0
    x = np.asarray(num, np.float64)[sel]
    c = np.asarray(cat, np.int64)[sel]
    n, d = x.shape
    n_cat = c.shape[1]
    tri = {"N": int(n), "lin_agg": x.sum(0).tolist()}
    quad = []
    for r in range(d):
        for cc in range(r, d):
            quad.append(float((x[:, r] * x[:, cc]).sum()))
    tri["quad_agg"] = quad
    lin_cat = []
    for j in range(n_cat):
        keys, counts = np.unique(c[:, j], return_counts=True)
        lin_cat.append([{"key": int(k), "value": float(v)}
                        for k, v in zip(keys, counts)])
    tri["lin_cat"] = lin_cat
    qnc = []
    for i in range(d):
        for j in range(n_cat):
            keys = np.unique(c[:, j])
            qnc.append([{"key": int(k),
                         "value": float(x[c[:, j] == k, i].sum())}
                        for k in keys])
    tri["quad_num_cat"] = qnc
    qcc = []
    for i in range(n_cat):
        for j in range(i, n_cat):
            pairs, counts = np.unique(np.stack([c[:, i], c[:, j]], 1),
                                      axis=0, return_counts=True)
            qcc.append([{"key1": int(a), "key2": int(b), "value": float(v)}
                        for (a, b), v in zip(pairs, counts)])
    tri["quad_cat"] = qcc
    return tri


def oracle_mice_baseline(num: np.ndarray, cat: np.ndarray,
                         num_null: np.ndarray, cat_null: np.ndarray,
                         iters: int, *, lda_shrinkage: float = 0.001,
                         linreg_step: float = 0.001,
                         linreg_lambda: float = 0.0,
                         linreg_iters: int = 10000,
                         param_log: list | None = None,
                         triple_fn=None):
    """run_MICE_baseline (imputation_base.cpp:6-146) in f64 numpy.

    num [n, d] f64, cat [n, c] RAW int category values; *_null [n, ·] bool.
    Writes lda_predict's 0-based CLASS INDEX into imputed categorical cells
    (the reference quirk, lda.cpp:575 + imputation_base.cpp:75-79).
    Returns (num, cat) imputed; appends (kind, col, params) tuples to
    param_log per train call when given. triple_fn(num, cat, w) -> dict may
    replace the exact-f64 aggregation (e.g. with the package's own f32
    triple) to isolate trainer/driver semantics from accumulation
    precision."""
    num = np.asarray(num, np.float64).copy()
    cat = np.asarray(cat, np.int64).copy()
    n, d = num.shape
    n_cat = cat.shape[1]

    # init_baseline (partition.cpp:671-719): AVG / MODE fill
    for j in range(d):
        obs = num[~num_null[:, j], j]
        num[num_null[:, j], j] = obs.mean() if len(obs) else 0.0
    for j in range(n_cat):
        obs = cat[~cat_null[:, j], j]
        if len(obs):
            vals, counts = np.unique(obs, return_counts=True)
            mode = int(vals[counts.argmax()])
        else:
            mode = 0
        cat[cat_null[:, j], j] = mode

    num_null_cols = [j for j in range(d) if num_null[:, j].any()]
    cat_null_cols = [j for j in range(n_cat) if cat_null[:, j].any()]
    if triple_fn is None:
        triple_fn = _exact_triple_dict

    for _ in range(iters):
        # categorical columns first (imputation_base.cpp:18-87)
        for col in cat_null_cols:
            w = (~cat_null[:, col]).astype(np.float64)
            tri = triple_fn(num, cat, w)
            wmat, intercept, labels, kept = oracle_lda_train(
                tri, col, lda_shrinkage)
            if param_log is not None:
                param_log.append(("lda", col, wmat.copy(), intercept.copy()))
            # batched lda_predict over features [num ‖ onehot(other cats)]
            feats = [num]
            cat_arrays, _ = vocab_from_dict(tri)
            ki = 0
            for j in range(n_cat):
                if j == col:
                    continue
                arr = kept[ki]
                ki += 1
                oh = (cat[:, j][:, None] == arr[None, :]).astype(np.float64)
                feats.append(oh)
            f = np.concatenate(feats, 1)                       # [n, m]
            scores = f @ wmat + intercept[None, :]
            pred_idx = scores.argmax(1)                        # CLASS INDEX
            cat[cat_null[:, col], col] = pred_idx[cat_null[:, col]]

        # continuous columns (imputation_base.cpp:89-143)
        for col in num_null_cols:
            w = (~num_null[:, col]).astype(np.float64)
            tri = triple_fn(num, cat, w)
            coeff, std = oracle_linreg_train(
                tri, col, linreg_step, linreg_lambda, linreg_iters,
                compute_variance=False)
            if param_log is not None:
                param_log.append(("linreg", col, coeff.copy()))
            # predict: intercept + Σ other-num coefs + cat coefs (dense)
            cat_arrays, _ = vocab_from_dict(tri)
            pred = np.full(n, coeff[0])
            for j in range(d):
                if j != col:
                    pred += coeff[1 + j] * num[:, j]
            base = 1 + d
            for j in range(n_cat):
                arr = cat_arrays[j]
                oh = (cat[:, j][:, None] == arr[None, :]).astype(np.float64)
                pred += oh @ coeff[base:base + len(arr)]
                base += len(arr)
            num[num_null[:, col], col] = pred[num_null[:, col]]
    return num, cat
