"""MICE high-missing driver — static + delta retraining.

Mirrors `run_MICE_high` (/root/reference/imputation/algorithms/
imputation_high.cpp:8-319): when most rows contain nulls, maintain one STATIC
triple over the all-observed partition only (:20-35); per column the train
aggregate is

    train = static + delta(rows where col is observed AND the row is dirty)

(:70) — a SUM, not a subtract: the dirty-but-col-observed set is small in the
high-missing regime, so the per-column scan is O(that set). Imputation then
rewrites the column's dirty rows.

Algebraic invariant (tested): train == triple over ALL rows where the column
is observed — the same training set as baseline/low, reached by a cheaper
scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import lda_predict, lda_train, linreg_predict, linreg_train
from ..ring.sum import sum_to_triple
from ..ring.triple import Triple, triple_add
from ..table.table import Table
from .partition import build_partitions, init_fill
from ..utils.profiling import PhaseTimer


def _subset_triple(t: Table, idx: np.ndarray, aggregate):
    if len(idx) == 0:
        return Triple.zeros(t.schema)
    # pow2 bucketing of the gather (see low._delta): bounded compile count
    size = len(idx)
    bucket = 1 << (size - 1).bit_length()
    jdx = jnp.asarray(np.pad(idx, (0, bucket - size)))
    w = jnp.asarray((np.arange(bucket) < size).astype(np.float32))
    return aggregate(t.num_data[:, jdx], t.cat_codes[:, jdx], w,
                     schema=t.schema)


def run_mice_high(t: Table, num_null_cols=None, cat_null_cols=None,
                  iters: int = 5, *, lda_shrinkage: float = 0.001,
                  linreg_step: float = 0.001, linreg_lambda: float = 0.0,
                  linreg_iters: int = 10000, noise: bool = True,
                  seed: int = 0, timer: PhaseTimer | None = None,
                  on_iteration=None, start_iter: int = 0,
                  aggregate=sum_to_triple) -> Table:
    timer = timer or PhaseTimer()
    with timer.phase("prepare"):
        t = init_fill(t)
        parts = build_partitions(t)
        schema = t.schema
        nmask = np.asarray(t.num_null)
        cmask = np.asarray(t.cat_null)
        dirty_rows = parts.null_counts > 0
        if num_null_cols is None:
            num_null_cols = [j for j in range(schema.num_cols)
                             if len(parts.num_dirty_idx[j])]
        if cat_null_cols is None:
            cat_null_cols = [j for j in range(schema.cat_cols)
                             if len(parts.cat_dirty_idx[j])]
        # rows that are dirty overall but observed in column j
        num_obs_dirty = tuple(
            np.nonzero(dirty_rows & ~nmask[j])[0]
            for j in range(schema.num_cols))
        cat_obs_dirty = tuple(
            np.nonzero(dirty_rows & ~cmask[j])[0]
            for j in range(schema.cat_cols))
    with timer.phase("cofactor_static"):
        static = _subset_triple(t, parts.complete_idx, aggregate)
    key = jax.random.PRNGKey(seed)

    for it in range(start_iter, iters):
        for col in cat_null_cols:
            with timer.phase("cofactor_delta"):
                delta = _subset_triple(t, cat_obs_dirty[col], aggregate)
                train = triple_add(static, delta)
            with timer.phase("train"):
                params = lda_train(train, schema, label=col,
                                   shrinkage=lda_shrinkage)
            with timer.phase("impute"):
                idx = parts.cat_dirty_idx[col]
                other = [j for j in range(schema.cat_cols) if j != col]
                jdx = jnp.asarray(idx)
                codes = (t.cat_codes[jnp.asarray(other)][:, jdx]
                         if other else None)
                pred_idx = lda_predict(params, t.num_data[:, jdx], codes)
                t = t.with_cat_col(
                    col, t.cat_codes[col].at[jdx].set(
                        pred_idx.astype(jnp.int32)), only_null=False)

        for col in num_null_cols:
            with timer.phase("cofactor_delta"):
                delta = _subset_triple(t, num_obs_dirty[col], aggregate)
                train = triple_add(static, delta)
            with timer.phase("train"):
                params = linreg_train(train, schema, label=col,
                                      step_size=linreg_step,
                                      lam=linreg_lambda,
                                      max_iters=linreg_iters,
                                      compute_variance=noise)
            with timer.phase("impute"):
                idx = parts.num_dirty_idx[col]
                keep = jnp.asarray(
                    [j for j in range(schema.num_cols) if j != col])
                jdx = jnp.asarray(idx)
                key, sub = jax.random.split(key)
                pred = linreg_predict(
                    params, t.num_data[keep][:, jdx],
                    t.cat_codes[:, jdx] if schema.cat_cols else None,
                    add_noise=noise, key=sub)
                t = t.with_num_col(
                    col, t.num_data[col].at[jdx].set(pred),
                    only_null=False)
        if on_iteration is not None:
            on_iteration(t, it)
    return t
