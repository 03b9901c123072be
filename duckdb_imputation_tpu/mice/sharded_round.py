"""Sharded MICE — the full loop under one shard_map over the data axis.

BASELINE config 5 is the full MICE loop over a 100M-row mixed table,
multi-host. The single-chip fused loop (device_round.py) covers one chip;
this module scales it over a `jax.sharding.Mesh`:

  * rows are sharded over the 'data' axis (hosts × chips — on a pod slice
    the collective rides ICI within a slice, DCN across slices);
  * each round, per null column: every device aggregates the masked sigma
    of ITS row shard and one `psum` combines them — the same
    update/combine contract as the reference's per-thread SumStates merged
    by SumStateCombine (sum_state.cpp:10-114), with the all-reduce as the
    combine;
  * the train solve consumes the (replicated) psum'd sigma identically on
    every device — params never need broadcasting, they are born
    replicated (the standard DP pattern for tiny models);
  * predict + write-back are shard-local (chunk-streamed, so no [P, n]
    block materializes on any device);
  * the per-round sequential dependency means the loop is latency-bound at
    scale (SURVEY §7 hard part 5) — everything stays inside ONE dispatch
    (lax.fori_loop over rounds), so the only host sync is the final fetch.

Scaling efficiency: per round the compute is O(n/D) per device and the
communication is D-independent (one P×P psum per column) — efficiency
approaches 1 as n grows; the ≥80%-at-N-hosts target is met whenever the
per-shard aggregation time dominates the ~µs sigma all-reduce.

Stochastic-regression noise is keyed per (device shard, round, column) so
shards draw independent gaussians.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.device import linreg_train_device
from ..ring.sum import masked_sigma
from ..schema import FeatureSchema
from ..table.table import Table
from .device_round import _chunked_writeback, _lda_device


@functools.partial(
    jax.jit,
    static_argnames=("schema", "mesh", "num_cols_to_impute",
                     "cat_cols_to_impute", "gd_iters", "lda_shrinkage",
                     "noise", "axis"))
def mice_loop_sharded(x_num, codes, num_null, cat_null, valid, key, *,
                      schema: FeatureSchema, mesh,
                      num_cols_to_impute: tuple[int, ...],
                      cat_cols_to_impute: tuple[int, ...],
                      iters, gd_iters: int = 500,
                      lda_shrinkage: float = 0.001, noise: bool = False,
                      axis: str = "data"):
    """The whole sharded MICE loop in one dispatch. Arrays features-first,
    row axis sharded over `axis`; `valid` is f32[n] 1/0 (zero-weight row
    padding). `iters` may be traced."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis), P(axis), P()),
        out_specs=(P(None, axis), P(None, axis)),
    )
    def local(x, c, nn, cn, val, k):
        def one_round(r, carry):
            x, c = carry
            for col in cat_cols_to_impute:
                w_mask = val * (1.0 - cn[col].astype(jnp.float32))
                sigma = jax.lax.psum(
                    masked_sigma(x, c, w_mask, schema=schema), axis)
                w, intercept, keep = _lda_device(sigma, schema, col,
                                                 lda_shrinkage)
                keep_feats = jnp.asarray(keep[1:])

                def lda_pred(xs, cs, i, w=w, intercept=intercept,
                             keep_feats=keep_feats):
                    from ..ring.sum import _zt_block
                    zt = _zt_block(xs, cs, schema)
                    scores = w.T @ zt[keep_feats] + intercept[:, None]
                    return jnp.argmax(scores, axis=0)

                x, c = _chunked_writeback(x, c, cn[col], col, lda_pred,
                                          "cat")

            for col in num_cols_to_impute:
                w_mask = val * (1.0 - nn[col].astype(jnp.float32))
                sigma = jax.lax.psum(
                    masked_sigma(x, c, w_mask, schema=schema), axis)
                coeff = linreg_train_device(sigma, label=col + 1,
                                            max_iters=gd_iters)
                theta = coeff * (1.0 - jax.nn.one_hot(
                    col + 1, coeff.shape[0], dtype=coeff.dtype))
                if noise:
                    theta_full = coeff.at[col + 1].set(-1.0)
                    var = (theta_full @ sigma @ theta_full
                           / jnp.maximum(sigma[0, 0], 1.0))
                    std = jnp.sqrt(jnp.maximum(var, 0.0))
                    nkey = jax.random.fold_in(
                        jax.random.fold_in(k, r * 131 + col),
                        jax.lax.axis_index(axis))
                else:
                    std, nkey = None, None

                def lin_pred(xs, cs, i, theta=theta, std=std, nkey=nkey):
                    from ..ring.sum import _zt_block
                    pred = theta @ _zt_block(xs, cs, schema)
                    if std is not None:
                        pred = pred + std * jax.random.normal(
                            jax.random.fold_in(nkey, i), pred.shape)
                    return pred

                x, c = _chunked_writeback(x, c, nn[col], col, lin_pred,
                                          "num")
            return x, c

        x_out, c_out = jax.lax.fori_loop(0, iters, one_round, (x, c))
        return x_out, c_out

    return local(x_num, codes, num_null, cat_null, valid, key)


def run_mice_sharded(t: Table, num_null_cols=None, cat_null_cols=None,
                     iters: int = 5, *, mesh=None, gd_iters: int = 500,
                     lda_shrinkage: float = 0.001, noise: bool = False,
                     seed: int = 0, axis: str = "data") -> Table:
    """Host wrapper: mean/mode init, zero-weight row padding to the mesh
    size, sharded placement, one dispatch, unpad."""
    from ..parallel.mesh import make_mesh
    from .partition import init_fill

    t = init_fill(t)
    schema = t.schema
    mesh = mesh or make_mesh()
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n = t.n_rows
    pad = (-n) % ndev

    def padded(a, fill=0):
        if pad == 0 or a is None:
            return np.asarray(a) if a is not None else None
        a = np.asarray(a)
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return np.pad(a, widths, constant_values=fill)

    if num_null_cols is None:
        num_null_cols = tuple(j for j in range(schema.num_cols)
                              if bool(np.asarray(t.num_null[j]).any()))
    if cat_null_cols is None:
        cat_null_cols = tuple(j for j in range(schema.cat_cols)
                              if bool(np.asarray(t.cat_null[j]).any()))

    col_sh = NamedSharding(mesh, P(None, axis))
    row_sh = NamedSharding(mesh, P(axis))
    x = jax.device_put(padded(t.num_data), col_sh)
    c = jax.device_put(padded(t.cat_codes), col_sh)
    nn = jax.device_put(padded(t.num_null), col_sh)
    cn = jax.device_put(padded(t.cat_null), col_sh)
    valid = jax.device_put(
        np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)]),
        row_sh)

    x_out, c_out = mice_loop_sharded(
        x, c, nn, cn, valid, jax.random.PRNGKey(seed), schema=schema,
        mesh=mesh, num_cols_to_impute=tuple(num_null_cols),
        cat_cols_to_impute=tuple(cat_null_cols), iters=iters,
        gd_iters=gd_iters, lda_shrinkage=lda_shrinkage, noise=noise,
        axis=axis)
    x_out = np.asarray(x_out)[:, :n]
    c_out = np.asarray(c_out)[:, :n]
    return dataclasses.replace(t, num_data=jnp.asarray(x_out),
                               cat_codes=jnp.asarray(c_out))
