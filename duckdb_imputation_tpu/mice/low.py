"""MICE low-missing driver — delta-aggregate retraining.

Mirrors `run_MICE_low` (/root/reference/imputation/algorithms/
imputation_low.cpp:9-306): one FULL triple over the whole (filled) table up
front (:42-73); then per column
    delta  = triple over the rows where the column is null      (:85-110)
    train  = full − delta          (client-side subtract_triple)
    …train, impute the dirty rows…
    delta' = triple over the same rows with the updated values
    full   = train + delta'                                      (:188-194)
so each retrain pays O(dirty rows) instead of O(n). The dirty-row sets are
static (null positions never move), so they are gathered once on the host
(partition.build_partitions) and each delta aggregates only that subset.

Algebraic invariant (tested): train == the baseline driver's full rescan over
the observed rows, up to f32 accumulation order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import lda_predict, lda_train, linreg_predict, linreg_train
from ..ring.sum import sum_to_triple
from ..ring.triple import triple_add, triple_sub
from ..table.table import Table
from .partition import build_partitions, init_fill
from ..utils.profiling import PhaseTimer


def _delta(t: Table, idx: np.ndarray, aggregate):
    """Triple over a dirty-row subset; the gather is padded to the next
    power of two with zero-weight rows so compile count stays O(log n)
    instead of one per distinct dirty-set size."""
    if len(idx) == 0:
        from ..ring.triple import Triple
        return Triple.zeros(t.schema)
    size = len(idx)
    bucket = 1 << (size - 1).bit_length()
    jdx = jnp.asarray(np.pad(idx, (0, bucket - size)))
    w = jnp.asarray((np.arange(bucket) < size).astype(np.float32))
    return aggregate(t.num_data[:, jdx], t.cat_codes[:, jdx], w,
                     schema=t.schema)


def run_mice_low(t: Table, num_null_cols=None, cat_null_cols=None,
                 iters: int = 5, *, lda_shrinkage: float = 0.001,
                 linreg_step: float = 0.001, linreg_lambda: float = 0.0,
                 linreg_iters: int = 10000, noise: bool = True, seed: int = 0,
                 timer: PhaseTimer | None = None,
                 on_iteration=None, start_iter: int = 0,
                 aggregate=sum_to_triple) -> Table:
    timer = timer or PhaseTimer()
    with timer.phase("prepare"):
        t = init_fill(t)
        parts = build_partitions(t)
    with timer.phase("cofactor_full"):
        full = aggregate(t.num_data, t.cat_codes, None, schema=t.schema)
    t, _ = run_delta_rounds(
        t, full, parts, num_null_cols, cat_null_cols, iters,
        lda_shrinkage=lda_shrinkage, linreg_step=linreg_step,
        linreg_lambda=linreg_lambda, linreg_iters=linreg_iters,
        noise=noise, seed=seed, timer=timer, on_iteration=on_iteration,
        start_iter=start_iter, aggregate=aggregate)
    return t


def run_delta_rounds(t: Table, full, parts, num_null_cols=None,
                     cat_null_cols=None, iters: int = 5, *,
                     lda_shrinkage: float = 0.001,
                     linreg_step: float = 0.001, linreg_lambda: float = 0.0,
                     linreg_iters: int = 10000, noise: bool = True,
                     seed: int = 0, timer: PhaseTimer | None = None,
                     on_iteration=None, start_iter: int = 0,
                     aggregate=sum_to_triple):
    """The delta-round body of `run_MICE_low` (imputation_low.cpp:85-194),
    factored out so the out-of-core streaming driver (mice/streaming.py) can
    run the SAME rounds where `t` holds only the dirty-row cache and `full`
    came from one streaming pass: the algebra never references clean rows
    except through `full`. Returns (t, full) after the rounds."""
    timer = timer or PhaseTimer()
    schema = t.schema
    if num_null_cols is None:
        num_null_cols = [j for j in range(schema.num_cols)
                         if len(parts.num_dirty_idx[j])]
    if cat_null_cols is None:
        cat_null_cols = [j for j in range(schema.cat_cols)
                         if len(parts.cat_dirty_idx[j])]
    # noise keys fold the GLOBAL (round, column): a checkpointed run
    # resumed at start_iter>0 draws the identical stream as an
    # uninterrupted one (a sequential split would replay from the start)
    key0 = jax.random.PRNGKey(seed)

    for it in range(start_iter, iters):
        for col in cat_null_cols:
            idx = parts.cat_dirty_idx[col]
            with timer.phase("cofactor_delta"):
                delta = _delta(t, idx, aggregate)
                train = triple_sub(full, delta)
            with timer.phase("train"):
                params = lda_train(train, schema, label=col,
                                   shrinkage=lda_shrinkage)
            with timer.phase("impute"):
                other = [j for j in range(schema.cat_cols) if j != col]
                jdx = jnp.asarray(idx)
                codes = (t.cat_codes[jnp.asarray(other)][:, jdx]
                         if other else None)
                pred_idx = lda_predict(params, t.num_data[:, jdx], codes)
                t = t.with_cat_col(
                    col,
                    t.cat_codes[col].at[jdx].set(
                        pred_idx.astype(jnp.int32)), only_null=False)
            with timer.phase("cofactor_readd"):
                full = triple_add(train, _delta(t, idx, aggregate))

        for col in num_null_cols:
            idx = parts.num_dirty_idx[col]
            with timer.phase("cofactor_delta"):
                delta = _delta(t, idx, aggregate)
                train = triple_sub(full, delta)
            with timer.phase("train"):
                params = linreg_train(train, schema, label=col,
                                      step_size=linreg_step,
                                      lam=linreg_lambda,
                                      max_iters=linreg_iters,
                                      compute_variance=noise)
            with timer.phase("impute"):
                keep = jnp.asarray(
                    [j for j in range(schema.num_cols) if j != col])
                jdx = jnp.asarray(idx)
                sub = jax.random.fold_in(key0, it * 1009 + col)
                pred = linreg_predict(
                    params, t.num_data[keep][:, jdx],
                    t.cat_codes[:, jdx] if schema.cat_cols else None,
                    add_noise=noise, key=sub)
                t = t.with_num_col(
                    col, t.num_data[col].at[jdx].set(pred),
                    only_null=False)
            with timer.phase("cofactor_readd"):
                full = triple_add(train, _delta(t, idx, aggregate))
        if on_iteration is not None:
            on_iteration(t, it)
    return t, full
