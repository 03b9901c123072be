"""MICE baseline driver — full-rescan retraining every column, every round.

Mirrors `run_MICE_baseline` (/root/reference/imputation/algorithms/
imputation_base.cpp:6-146): per round, categorical null-columns first (LDA,
shrinkage 0.001, :46), then continuous (stochastic linear regression:
lr=0.001, λ=0, 10000 iters, variance + noise on predict, :116,133). Each
column's cofactor is aggregated over the rows where that column is observed
(the WHERE … IS FALSE filter → fused mask), trained, and predictions replace
only the originally-missing cells (CASE WHEN … write-back → jnp.where column
swap).

Deliberate deviation: the reference imputes categorical columns with LDA's
0-based CLASS INDEX (lda_predict returns the index, lda.cpp:575, written
straight into the column at imputation_base.cpp:75-79) — correct only when
the categories happen to be 0..k-1. We map the index back to the actual
category value; semantics agree on the reference's own demo data (iris
target ∈ {0,1,2}).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..models import lda_predict, lda_train, linreg_predict, linreg_train
from ..models.sigma import select_vocab
from ..ring.sum import sum_to_triple
from ..table.table import Table
from .partition import init_fill, observed_weights
from ..utils.profiling import PhaseTimer


def _num_feature_split(t: Table, label: int):
    """Feature columns for a numeric target: all num cols except label, then
    all cats (imputation_base.cpp:121-128 column order)."""
    keep = jnp.asarray([j for j in range(t.schema.num_cols) if j != label])
    return t.num_data[keep], t.cat_codes


def run_mice_baseline(t: Table, num_null_cols=None, cat_null_cols=None,
                      iters: int = 5, *, lda_shrinkage: float = 0.001,
                      linreg_step: float = 0.001, linreg_lambda: float = 0.0,
                      linreg_iters: int = 10000, noise: bool = True,
                      seed: int = 0, timer: PhaseTimer | None = None,
                  on_iteration=None, start_iter: int = 0,
                      aggregate=sum_to_triple) -> Table:
    """Run MICE and return the imputed table.

    num_null_cols / cat_null_cols: indices of columns to impute (default:
    every column that has any nulls). `aggregate` may be swapped for the
    sharded multi-chip implementation (parallel.sharded.sum_to_triple_sharded).
    """
    timer = timer or PhaseTimer()
    with timer.phase("prepare"):
        t = init_fill(t)
        schema = t.schema
        if num_null_cols is None:
            num_null_cols = [j for j in range(schema.num_cols)
                             if bool(np.asarray(t.num_null[j]).any())]
        if cat_null_cols is None:
            cat_null_cols = [j for j in range(schema.cat_cols)
                             if bool(np.asarray(t.cat_null[j]).any())]
    key = jax.random.PRNGKey(seed)

    for it in range(start_iter, iters):
        # categorical columns first (imputation_base.cpp:18-87)
        for col in cat_null_cols:
            with timer.phase("cofactor"):
                w = observed_weights(t, "cat", col)
                triple = aggregate(t.num_data, t.cat_codes, w, schema=schema)
            with timer.phase("train"):
                params = lda_train(triple, schema, label=col,
                                   shrinkage=lda_shrinkage)
            with timer.phase("impute"):
                other = [j for j in range(schema.cat_cols) if j != col]
                codes = t.cat_codes[jnp.asarray(other)] if other else None
                pred_idx = lda_predict(params, t.num_data, codes)
                t = t.with_cat_col(col, pred_idx.astype(jnp.int32))

        # continuous columns (imputation_base.cpp:89-143)
        for col in num_null_cols:
            with timer.phase("cofactor"):
                w = observed_weights(t, "num", col)
                triple = aggregate(t.num_data, t.cat_codes, w, schema=schema)
            with timer.phase("train"):
                params = linreg_train(triple, schema, label=col,
                                      step_size=linreg_step,
                                      lam=linreg_lambda,
                                      max_iters=linreg_iters,
                                      compute_variance=noise)
            with timer.phase("impute"):
                x_num, codes = _num_feature_split(t, col)
                key, sub = jax.random.split(key)
                pred = linreg_predict(params, x_num,
                                      codes if schema.cat_cols else None,
                                      add_noise=noise, key=sub)
                t = t.with_num_col(col, pred)
        if on_iteration is not None:
            on_iteration(t, it)
    return t
