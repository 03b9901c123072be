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

from ..ring.sum import masked_sigma
from ..schema import FeatureSchema
from ..table.table import Table
from .device_round import _round_columns


@functools.partial(
    jax.jit,
    static_argnames=("schema", "mesh", "num_cols_to_impute",
                     "cat_cols_to_impute", "gd_iters", "lda_shrinkage",
                     "noise", "axis", "trainer"))
def mice_loop_sharded(x_num, codes, num_null, cat_null, valid, key, *,
                      schema: FeatureSchema, mesh,
                      num_cols_to_impute: tuple[int, ...],
                      cat_cols_to_impute: tuple[int, ...],
                      iters, gd_iters: int = 500,
                      lda_shrinkage: float = 0.001, noise: bool = False,
                      axis: str = "data", trainer: str = "solve"):
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
        def agg(xx, cc, null_row):
            w_mask = val * (1.0 - null_row.astype(jnp.float32))
            return jax.lax.psum(
                masked_sigma(xx, cc, w_mask, schema=schema), axis)

        def one_round(r, carry):
            x, c = carry
            if noise:
                shard = jax.lax.axis_index(axis)
                noise_key_for = (
                    lambda col: jax.random.fold_in(
                        jax.random.fold_in(k, r * 131 + col), shard))
            else:
                noise_key_for = lambda col: None
            return _round_columns(
                x, c, nn, cn, schema=schema,
                num_cols_to_impute=num_cols_to_impute,
                cat_cols_to_impute=cat_cols_to_impute, agg=agg,
                gd_iters=gd_iters, lda_shrinkage=lda_shrinkage,
                noise_key_for=noise_key_for, trainer=trainer)

        x_out, c_out = jax.lax.fori_loop(0, iters, one_round, (x, c))
        return x_out, c_out

    return local(x_num, codes, num_null, cat_null, valid, key)


def run_mice_sharded(t: Table, num_null_cols=None, cat_null_cols=None,
                     iters: int = 5, *, mesh=None, gd_iters: int = 500,
                     lda_shrinkage: float = 0.001, noise: bool = False,
                     seed: int = 0, axis: str = "data",
                     trainer: str = "solve") -> Table:
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
        axis=axis, trainer=trainer)
    # drop the pad rows ON DEVICE — no host round trip of the full table
    if pad:
        x_out = x_out[:, :n]
        c_out = c_out[:, :n]
    return dataclasses.replace(t, num_data=x_out, cat_codes=c_out)
