"""Fully on-device MICE rounds — one jit per round (or per run).

The host-driven drivers (baseline/low/high) mirror the reference's
client↔engine round trips (imputation_base.cpp: one SQL query per phase).
On TPU every dispatch costs host latency, so the production path fuses the
ENTIRE round — for every null column: masked cofactor aggregation → train →
batched predict → masked write-back — into one compiled program
(`mice_round_device`), and `run_mice_device` runs all rounds inside a single
lax.fori_loop: the whole MICE loop is ONE dispatch.

Training inside jit:
  * continuous columns: the reference's GD loop as lax.while_loop
    (models/device.linreg_train_device);
  * categorical columns: device LDA — label-excluded sigma gathers (static
    index sets), class sums pulled from the triple's own categorical
    sections, pooled covariance + shrinkage, lstsq solve (SVD-backed,
    jittable), argmax predict. f32 on-device (the host f64 trainers remain
    the parity reference).

Noise for stochastic regression uses a per-(round, column) fold of the
PRNG key.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import FeatureSchema
from ..ring.sum import _zt_block, masked_sigma
from ..models.device import linreg_solve_device, linreg_train_device
from ..table.table import Table


# Rows per predict/write-back chunk: bounds the transient Z block to
# [P, chunk] so a 100M-row table never materializes a [P, n] feature
# matrix (SURVEY.md §7 hard part 6 — write-back without 2× memory).
PREDICT_ROW_CHUNK = 1 << 21


def _row_noise(key, gidx):
    """Standard normals keyed by GLOBAL row index — counter-based: each
    row's draw is a pure function of (key, global index), so stochastic
    MICE results are identical for any device count, shard layout, or
    predict chunking. TPU-native replacement for the reference's
    /dev/urandom-seeded Box-Muller stream (regression.cpp:377-395,493-504),
    which is not reproducible at all."""
    return jax.vmap(
        lambda j: jax.random.normal(jax.random.fold_in(key, j)))(gidx)


def _chunked_writeback(x_num, codes, null_row, col, compute_pred,
                       target: str):
    """Stream predict + masked column write-back over row chunks.

    compute_pred(x_chunk, codes_chunk, start) -> pred [chunk] (start = the
    chunk's local row offset, for global-index noise keying). The written
    column never feeds its own prediction (label coefficient zeroed / label
    one-hot excluded), so the overlapping tail chunk is idempotent."""
    n = x_num.shape[-1]
    rc = min(PREDICT_ROW_CHUNK, n)
    nc = -(-n // rc)

    def body(i, carry):
        x, c = carry
        start = jnp.minimum(i * rc, n - rc)
        xs = jax.lax.dynamic_slice(x, (0, start), (x.shape[0], rc)) \
            if x.shape[0] else x[:, :rc]
        cs = jax.lax.dynamic_slice(c, (0, start), (c.shape[0], rc)) \
            if c.shape[0] else c[:, :rc]
        pred = compute_pred(xs, cs, start)
        nulls = jax.lax.dynamic_slice(null_row, (start,), (rc,))
        if target == "num":
            old = jax.lax.dynamic_slice(x, (col, start), (1, rc))[0]
            new = jnp.where(nulls, pred, old)
            x = jax.lax.dynamic_update_slice(x, new[None, :], (col, start))
        else:
            old = jax.lax.dynamic_slice(c, (col, start), (1, rc))[0]
            new = jnp.where(nulls, pred.astype(c.dtype), old)
            c = jax.lax.dynamic_update_slice(c, new[None, :], (col, start))
        return x, c

    if nc == 1:
        return body(0, (x_num, codes))
    return jax.lax.fori_loop(0, nc, body, (x_num, codes))


def _lda_device(sigma: jax.Array, schema: FeatureSchema, label: int,
                shrinkage: float):
    """Device LDA from the full sigma: returns (W [m, C], intercept [C],
    keep_idx) where features = [num cols ‖ non-label one-hot]."""
    d = schema.num_cols
    offs = schema.offsets
    lab_lo = 1 + d + offs[label]
    lab_hi = 1 + d + offs[label + 1]
    n_classes = offs[label + 1] - offs[label]
    keep = np.asarray(
        [i for i in range(schema.sigma_size)
         if not (lab_lo <= i < lab_hi)], np.int32)
    sig = sigma[jnp.ix_(jnp.asarray(keep), jnp.asarray(keep))]
    n_total = sigma[0, 0]

    # class sums from the label block rows (the factorized GROUP BY label)
    sums = sigma[lab_lo:lab_hi][:, jnp.asarray(keep)]       # [C, P']
    counts = sums[:, 0]                                      # [C]
    # zero-count class guard: clamp the divisor (zero mean / no scatter
    # contribution) and keep log(0) = -inf so argmax never predicts the
    # class — matches host lda_train (see models/lda.py)
    cnt = jnp.maximum(counts, 1.0)

    m = len(keep) - 1
    cov = sig[1:, 1:]
    mean_c = sums[:, 1:] / cnt[:, None]                      # [C, m]
    cov = cov - jnp.einsum("ci,cj->ij", sums[:, 1:] / jnp.sqrt(cnt)[:, None],
                           sums[:, 1:] / jnp.sqrt(cnt)[:, None])
    mu = jnp.trace(cov) / m
    cov = cov * (1.0 - shrinkage) + shrinkage * mu * jnp.eye(m)
    cov = cov / n_total
    w = jnp.linalg.lstsq(cov, mean_c.T)[0]                   # [m, C]
    intercept = (-0.5 * jnp.einsum("cm,mc->c", mean_c, w)
                 + jnp.log(counts / n_total))
    return w, intercept, keep


def _round_columns(x_num, codes, num_null, cat_null, *,
                   schema: FeatureSchema,
                   num_cols_to_impute: tuple[int, ...],
                   cat_cols_to_impute: tuple[int, ...],
                   agg, gd_iters: int, lda_shrinkage: float,
                   noise_key_for, trainer: str = "solve", row_offset=0):
    """One MICE round's per-column body, shared by the single-device and
    sharded loops. `agg(x, c, null_row) -> sigma` abstracts how the
    aggregate is produced (device-local kernel vs psum-combined shard_map);
    `noise_key_for(col) -> key | None` abstracts the noise keying (None ⇒
    deterministic prediction); `row_offset` is this shard's global row
    offset so noise draws are keyed by GLOBAL row index (mesh-shape
    invariant). Categorical columns first — the reference's ordering
    (imputation_base.cpp:18-87).

    trainer: 'solve' (default) — ONE lstsq on the P×P sigma per column;
    'gd' — the reference's sequential GD (regression.cpp:157-238) as a
    lax.while_loop, kept for iteration-parity studies. On TPU the GD path
    is pure dispatch latency (hundreds of dependent tiny matvecs), so the
    direct solve is the production trainer."""
    for col in cat_cols_to_impute:
        sigma = agg(x_num, codes, cat_null[col])
        w, intercept, keep = _lda_device(sigma, schema, col, lda_shrinkage)
        keep_feats = jnp.asarray(keep[1:])

        def lda_pred(xs, cs, i, w=w, intercept=intercept,
                     keep_feats=keep_feats):
            zt = _zt_block(xs, cs, schema)
            scores = w.T @ zt[keep_feats] + intercept[:, None]  # [C, rc]
            return jnp.argmax(scores, axis=0)

        x_num, codes = _chunked_writeback(
            x_num, codes, cat_null[col], col, lda_pred, "cat")

    for col in num_cols_to_impute:
        sigma = agg(x_num, codes, num_null[col])
        if trainer == "solve":
            coeff = linreg_solve_device(sigma, label=col + 1)
        else:
            coeff = linreg_train_device(sigma, label=col + 1,
                                        max_iters=gd_iters)
        theta = coeff * (1.0 - jax.nn.one_hot(col + 1, coeff.shape[0],
                                              dtype=coeff.dtype))
        nkey = noise_key_for(col)
        if nkey is not None:
            theta_full = coeff.at[col + 1].set(-1.0)
            var = (theta_full @ sigma @ theta_full
                   / jnp.maximum(sigma[0, 0], 1.0))
            std = jnp.sqrt(jnp.maximum(var, 0.0))
        else:
            std = None

        def lin_pred(xs, cs, start, theta=theta, std=std, nkey=nkey):
            pred = theta @ _zt_block(xs, cs, schema)
            if std is not None:
                gidx = row_offset + start + jnp.arange(pred.shape[0])
                pred = pred + std * _row_noise(nkey, gidx)
            return pred

        x_num, codes = _chunked_writeback(
            x_num, codes, num_null[col], col, lin_pred, "num")

    return x_num, codes


def _make_agg(kernel: str, schema: FeatureSchema):
    """null-row mask → masked sigma via the chosen kernel."""
    if kernel == "pallas_fast":
        from ..ring.kernels.sigma_pallas import sigma_pallas_fast_padded
        base = functools.partial(sigma_pallas_fast_padded, schema=schema)
    else:
        base = functools.partial(masked_sigma, schema=schema)

    def agg(x, c, null_row):
        return base(x, c, 1.0 - null_row.astype(jnp.float32))
    return agg


@functools.partial(
    jax.jit,
    static_argnames=("schema", "num_cols_to_impute", "cat_cols_to_impute",
                     "gd_iters", "lda_shrinkage", "noise", "kernel", "trainer"))
def mice_round_device(x_num, codes, num_null, cat_null, key, *,
                      schema: FeatureSchema,
                      num_cols_to_impute: tuple[int, ...],
                      cat_cols_to_impute: tuple[int, ...],
                      gd_iters: int = 500, lda_shrinkage: float = 0.001,
                      noise: bool = False, kernel: str = "xla",
                      trainer: str = "solve"):
    """One MICE round, entirely on device. Arrays are features-first.
    Returns (x_num, codes, key). kernel='pallas_fast' uses the
    split-precision MXU kernel (TPU; masks here are binary)."""
    noise_key_for = ((lambda col: jax.random.fold_in(key, col)) if noise
                     else (lambda col: None))
    x_num, codes = _round_columns(
        x_num, codes, num_null, cat_null, schema=schema,
        num_cols_to_impute=num_cols_to_impute,
        cat_cols_to_impute=cat_cols_to_impute,
        agg=_make_agg(kernel, schema), gd_iters=gd_iters,
        lda_shrinkage=lda_shrinkage, noise_key_for=noise_key_for,
        trainer=trainer)
    return x_num, codes, jax.random.fold_in(key, 2 ** 20)


@functools.partial(
    jax.jit,
    static_argnames=("schema", "num_cols_to_impute", "cat_cols_to_impute",
                     "gd_iters", "lda_shrinkage", "noise", "kernel", "trainer"),
    donate_argnames=("x_num", "codes"))
def mice_loop_device(x_num, codes, num_null, cat_null, key, *,
                     schema: FeatureSchema,
                     num_cols_to_impute: tuple[int, ...],
                     cat_cols_to_impute: tuple[int, ...],
                     iters, gd_iters: int = 500,
                     lda_shrinkage: float = 0.001, noise: bool = False,
                     kernel: str = "xla", trainer: str = "solve"):
    """The WHOLE MICE loop in one dispatch: lax.fori_loop over rounds.
    `iters` may be a traced scalar — one compile serves any round count."""
    def body(_, carry):
        x, c, k = carry
        return mice_round_device(
            x, c, num_null, cat_null, k, schema=schema,
            num_cols_to_impute=num_cols_to_impute,
            cat_cols_to_impute=cat_cols_to_impute,
            gd_iters=gd_iters, lda_shrinkage=lda_shrinkage, noise=noise,
            kernel=kernel, trainer=trainer)
    return jax.lax.fori_loop(0, iters, body, (x_num, codes, key))


def run_mice_device(t: Table, num_null_cols=None, cat_null_cols=None,
                    iters: int = 5, *, gd_iters: int = 500,
                    lda_shrinkage: float = 0.001, noise: bool = False,
                    seed: int = 0, kernel: str = "auto",
                    trainer: str = "solve") -> Table:
    """Host wrapper: mean/mode init, then the single-dispatch device loop."""
    import dataclasses

    from .partition import init_fill

    t = init_fill(t)
    schema = t.schema
    if num_null_cols is None:
        num_null_cols = tuple(
            j for j in range(schema.num_cols)
            if bool(np.asarray(t.num_null[j]).any()))
    if cat_null_cols is None:
        cat_null_cols = tuple(
            j for j in range(schema.cat_cols)
            if bool(np.asarray(t.cat_null[j]).any()))
    if kernel == "auto":
        kernel = ("pallas_fast"
                  if (jax.default_backend() not in ("cpu",)
                      and t.n_rows >= (1 << 20)) else "xla")
    x, c, _ = mice_loop_device(
        t.num_data, t.cat_codes, t.num_null, t.cat_null,
        jax.random.PRNGKey(seed), schema=schema,
        num_cols_to_impute=tuple(num_null_cols),
        cat_cols_to_impute=tuple(cat_null_cols), iters=iters,
        gd_iters=gd_iters, lda_shrinkage=lda_shrinkage, noise=noise,
        kernel=kernel, trainer=trainer)
    return dataclasses.replace(t, num_data=x, cat_codes=c)



def _make_delta_agg(kernel: str, schema: FeatureSchema):
    if kernel == "pallas_fast":
        from ..ring.kernels.sigma_pallas import sigma_pallas_fast_padded
        return functools.partial(sigma_pallas_fast_padded, schema=schema)
    return functools.partial(masked_sigma, schema=schema)


def _delta_round_columns(x, c, k, full, num_dirty_idx, cat_dirty_idx, *,
                         schema: FeatureSchema,
                         num_cols_to_impute: tuple[int, ...],
                         cat_cols_to_impute: tuple[int, ...],
                         agg, combine, gd_iters: int, lda_shrinkage: float,
                         noise: bool, trainer: str, row_offset=0):
    """One delta-MICE round (imputation_low.cpp:42-110 algebra), shared by
    the single-device and sharded loops. `agg` produces a LOCAL sigma from
    gathered rows; `combine` merges partials across devices (identity
    single-device, lax.psum in the shard_map loop). `full`/`train` are
    replicated under combine=psum; gathers and write-backs stay
    shard-local. `k` must already be folded per round; noise draws are
    keyed by (k, col, GLOBAL row index = row_offset + local idx) so
    stochastic results are identical for any mesh shape or dirty-row
    padding."""
    def delta_sigma(xx, cc, idx, valid):
        return combine(agg(xx[:, idx], cc[:, idx], valid))

    for ci, col in enumerate(cat_cols_to_impute):
        idx, valid = cat_dirty_idx[ci]
        delta = delta_sigma(x, c, idx, valid)
        train = full - delta
        w, intercept, keep = _lda_device(train, schema, col,
                                         lda_shrinkage)
        zt = _zt_block(x[:, idx], c[:, idx], schema)
        feats = zt[jnp.asarray(keep[1:])]
        scores = w.T @ feats + intercept[:, None]
        pred_code = jnp.argmax(scores, axis=0).astype(c.dtype)
        old = c[col, idx]
        # scatter-ADD form: zero-padded gather indices all alias row 0
        # and contribute exactly 0, so a real dirty row 0 can never race
        # the pad writes (duplicate-index scatter order is undefined)
        c = c.at[col, idx].add(
            (valid > 0).astype(c.dtype) * (pred_code - old))
        full = train + delta_sigma(x, c, idx, valid)

    for ci, col in enumerate(num_cols_to_impute):
        idx, valid = num_dirty_idx[ci]
        delta = delta_sigma(x, c, idx, valid)
        train = full - delta
        if trainer == "solve":
            coeff = linreg_solve_device(train, label=col + 1)
        else:
            coeff = linreg_train_device(train, label=col + 1,
                                        max_iters=gd_iters)
        zt = _zt_block(x[:, idx], c[:, idx], schema)
        theta = coeff * (1.0 - jax.nn.one_hot(
            col + 1, coeff.shape[0], dtype=coeff.dtype))
        pred = theta @ zt
        if noise:
            nkey = jax.random.fold_in(k, col)
            theta_full = coeff.at[col + 1].set(-1.0)
            var = (theta_full @ train @ theta_full
                   / jnp.maximum(train[0, 0], 1.0))
            pred = pred + jnp.sqrt(jnp.maximum(var, 0.0)) \
                * _row_noise(nkey, row_offset + idx)
        old = x[col, idx]
        x = x.at[col, idx].add(valid * (pred - old))   # see cat note
        full = train + delta_sigma(x, c, idx, valid)
    return x, c, k, full


@functools.partial(
    jax.jit,
    static_argnames=("schema", "num_cols_to_impute", "cat_cols_to_impute",
                     "gd_iters", "lda_shrinkage", "noise", "kernel", "trainer"),
    donate_argnames=("x_num", "codes"))
def mice_loop_device_delta(x_num, codes, num_null, cat_null, key,
                           num_dirty_idx, cat_dirty_idx, *,
                           schema: FeatureSchema,
                           num_cols_to_impute: tuple[int, ...],
                           cat_cols_to_impute: tuple[int, ...],
                           iters, gd_iters: int = 500,
                           lda_shrinkage: float = 0.001,
                           noise: bool = False, kernel: str = "xla",
                           trainer: str = "solve"):
    """The low-missing delta strategy (imputation_low.cpp) fused on-device:
    ONE full aggregation up front, then per column per round only the
    column's dirty rows are re-aggregated:

        delta  = sigma(dirty rows, current values)
        train  = full − delta          → train / impute dirty rows
        full   = train + sigma(dirty rows, imputed values)

    num_dirty_idx / cat_dirty_idx: per imputed column, (idx i32[k_pad],
    valid f32[k_pad]) — the dirty-row gathers, zero-padded (static shapes).
    Work per round: O(Σ dirty) instead of O(C·n)."""
    agg = _make_delta_agg(kernel, schema)
    n = x_num.shape[-1]
    full0 = agg(x_num, codes, jnp.ones((n,), jnp.float32))

    def body(r, carry):
        x, c, k, full = carry
        x, c, _, full = _delta_round_columns(
            x, c, jax.random.fold_in(k, r), full, num_dirty_idx,
            cat_dirty_idx, schema=schema,
            num_cols_to_impute=num_cols_to_impute,
            cat_cols_to_impute=cat_cols_to_impute, agg=agg,
            combine=lambda s: s, gd_iters=gd_iters,
            lda_shrinkage=lda_shrinkage, noise=noise, trainer=trainer)
        return x, c, k, full

    x, c, k, _ = jax.lax.fori_loop(0, iters, body,
                                   (x_num, codes, key, full0))
    return x, c, k


def run_mice_device_delta(t: Table, num_null_cols=None, cat_null_cols=None,
                          iters: int = 5, *, gd_iters: int = 500,
                          lda_shrinkage: float = 0.001, noise: bool = False,
                          seed: int = 0, kernel: str = "auto",
                          trainer: str = "solve") -> Table:
    """Host wrapper for the fused delta loop: builds the static dirty-row
    gathers (pow2-padded) once, then a single dispatch runs every round."""
    import dataclasses

    from .partition import build_partitions, init_fill

    t = init_fill(t)
    parts = build_partitions(t)
    schema = t.schema
    if num_null_cols is None:
        num_null_cols = tuple(j for j in range(schema.num_cols)
                              if len(parts.num_dirty_idx[j]))
    if cat_null_cols is None:
        cat_null_cols = tuple(j for j in range(schema.cat_cols)
                              if len(parts.cat_dirty_idx[j]))
    if kernel == "auto":
        kernel = ("pallas_fast"
                  if (jax.default_backend() not in ("cpu",)
                      and t.n_rows >= (1 << 20)) else "xla")

    def gather(idx):
        size = max(len(idx), 1)
        bucket = 1 << (size - 1).bit_length()
        pad_idx = np.pad(np.asarray(idx, np.int64), (0, bucket - len(idx)))
        valid = (np.arange(bucket) < len(idx)).astype(np.float32)
        return jnp.asarray(pad_idx), jnp.asarray(valid)

    num_gathers = tuple(gather(parts.num_dirty_idx[j])
                        for j in num_null_cols)
    cat_gathers = tuple(gather(parts.cat_dirty_idx[j])
                        for j in cat_null_cols)

    x, c, _ = mice_loop_device_delta(
        t.num_data, t.cat_codes, t.num_null, t.cat_null,
        jax.random.PRNGKey(seed), num_gathers, cat_gathers,
        schema=schema, num_cols_to_impute=tuple(num_null_cols),
        cat_cols_to_impute=tuple(cat_null_cols), iters=iters,
        gd_iters=gd_iters, lda_shrinkage=lda_shrinkage, noise=noise,
        kernel=kernel, trainer=trainer)
    return dataclasses.replace(t, num_data=x, cat_codes=c)
