"""Fused lift+sum cofactor aggregation — the hot path.

Reference: the fused aggregate `sum_to_triple_x_y` (Triple::SumNoLift,
/root/reference/duckdb_extension/src/triple/sum/sum_no_lift.cpp:53-216) runs an
O(d²·rows) scalar FMA loop plus per-row hash-map upserts for the categorical
sections, merged across threads by SumStateCombine (sum_state.cpp:10-114).

TPU design: with the dense vocab layout the WHOLE triple is one masked Gram
matrix. Let

    Z = [1 | X_num | onehot(X_cat)]  ∈ f32[n, P],  P = 1 + d + V
    S = Zᵀ · diag(w) · Z             (w = row mask / weights)

Then S contains every section: N = S[0,0], lin = S[0,1:1+d],
quad = S[1:1+d,1:1+d], lin_cat = S[0,1+d:], num_cat = S[1:1+d,1+d:],
cat_cat = S[1+d:,1+d:] — a single MXU matmul replaces the scalar loop, the
hash maps, and (because the mask is fused in) every `WHERE col_IS_NULL IS
FALSE` scan of the MICE driver (imputation_base.cpp:29,100).

Rows are processed in static-size chunks via lax.scan so Z is never
materialized at full length in HBM; padding rows carry mask 0 and therefore
contribute nothing. Accumulation is f32 with `precision=HIGHEST` so the MXU
does not drop to bf16 inputs (parity with the reference's f32 accumulation).

Grouped aggregation (GROUP BY g — per-class triples for QDA/NB,
qda.cpp:27, sum_to_nb_agg.cpp:39) masks the weight vector per group and is
vmapped over the group axis: skewed groups cost nothing extra because every
group does the same dense work.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import FeatureSchema
from .triple import NBAgg, Triple, triple_from_sigma

# Rows per scan chunk for the streaming Gram accumulation.
DEFAULT_ROW_CHUNK = 1 << 16


def _as_f32(x):
    return jnp.asarray(x, jnp.float32)


def onehot_block(codes: jax.Array, schema: FeatureSchema) -> jax.Array:
    """B = concatenated per-column one-hots, f32[n, V].

    `codes` are LOCAL per-column codes in [0, size_j); code == size_j (vocab
    miss, the find_in_array miss convention) yields an all-zero row for that
    column."""
    parts = []
    for j, size in enumerate(schema.cat_sizes):
        parts.append(jax.nn.one_hot(codes[..., j], size, dtype=jnp.float32))
    if not parts:
        return jnp.zeros(codes.shape[:-1] + (0,), jnp.float32)
    return jnp.concatenate(parts, axis=-1)


def _z_block(x_num, codes, schema: FeatureSchema) -> jax.Array:
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    cols = [jnp.ones((n, 1), jnp.float32)]
    if schema.num_cols:
        cols.append(_as_f32(x_num))
    if schema.cat_cols:
        cols.append(onehot_block(codes, schema))
    return jnp.concatenate(cols, axis=-1)


def _pad_rows(arr, mult):
    n = arr.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths)


@functools.partial(jax.jit, static_argnames=("schema", "row_chunk"))
def masked_sigma(x_num, codes, weights, *, schema: FeatureSchema,
                 row_chunk: int = DEFAULT_ROW_CHUNK) -> jax.Array:
    """S = Zᵀ diag(w) Z, f32[P, P], streaming over row chunks."""
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    if x_num is None:
        x_num = jnp.zeros((n, 0), jnp.float32)
    if codes is None:
        codes = jnp.zeros((n, 0), jnp.int32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    weights = _as_f32(weights)

    p = schema.sigma_size

    if n <= row_chunk:
        z = _z_block(x_num, codes, schema)
        zw = z * weights[:, None]
        return jnp.dot(z.T, zw, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    x_num = _pad_rows(_as_f32(x_num), row_chunk)
    codes = _pad_rows(codes, row_chunk)
    weights = _pad_rows(weights, row_chunk)
    nc = x_num.shape[0] // row_chunk
    xs = (x_num.reshape(nc, row_chunk, -1),
          codes.reshape(nc, row_chunk, -1),
          weights.reshape(nc, row_chunk))

    def body(acc, chunk):
        xn, cd, w = chunk
        z = _z_block(xn, cd, schema)
        zw = z * w[:, None]
        acc = acc + jnp.dot(z.T, zw, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((p, p), jnp.float32)
    sigma, _ = jax.lax.scan(body, acc0, xs)
    return sigma


def sum_to_triple(x_num=None, codes=None, weights=None, *,
                  schema: FeatureSchema,
                  row_chunk: int = DEFAULT_ROW_CHUNK) -> Triple:
    """Fused lift+sum: the TPU-native `sum_to_triple_x_y(cols…)` aggregate
    (Triple::SumNoLift, sum_no_lift.cpp:53-216).

    Args:
      x_num: f32[n, d] numeric columns (d may be 0 / None).
      codes: i32[n, c] LOCAL per-column category codes (see FeatureSchema.encode).
      weights: f32[n] row weights; 0 = filtered out (fuses WHERE masks);
        None = all ones.
    """
    sigma = masked_sigma(x_num, codes, weights, schema=schema,
                         row_chunk=row_chunk)
    return triple_from_sigma(sigma, schema.num_cols)


@functools.partial(jax.jit, static_argnames=("schema", "num_groups", "row_chunk"))
def _grouped_sigma(x_num, codes, weights, group_ids, *, schema: FeatureSchema,
                   num_groups: int, row_chunk: int) -> jax.Array:
    def one_group(g):
        w = weights * (group_ids == g).astype(jnp.float32)
        return masked_sigma(x_num, codes, w, schema=schema, row_chunk=row_chunk)
    return jax.vmap(one_group)(jnp.arange(num_groups))


def sum_to_triple_grouped(x_num, codes, group_ids, *, schema: FeatureSchema,
                          num_groups: int, weights=None,
                          row_chunk: int = DEFAULT_ROW_CHUNK) -> Triple:
    """GROUP BY aggregation: one triple per group id in [0, num_groups).

    Replaces the reference's per-group hash-aggregation (DuckDB GROUP BY over
    SumState); per-class triples for QDA/LDA/NB come out of one data pass.
    Rows with group_ids outside [0, num_groups) are dropped."""
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    if x_num is None:
        x_num = jnp.zeros((n, 0), jnp.float32)
    if codes is None:
        codes = jnp.zeros((n, 0), jnp.int32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    sigma = _grouped_sigma(_as_f32(x_num), codes, _as_f32(weights),
                           jnp.asarray(group_ids), schema=schema,
                           num_groups=num_groups, row_chunk=row_chunk)
    return triple_from_sigma(sigma, schema.num_cols)


# ---------------------------------------------------------------------------
# Lift (to_cofactor): per-row degree-1 triples
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("schema",))
def lift(x_num=None, codes=None, *, schema: FeatureSchema) -> Triple:
    """`to_cofactor(cols…)` (Triple::CustomLift, lift.cpp:15-243): each row
    becomes a degree-1 triple (N=1, lin=x, quad=x xᵀ, singleton cat maps).
    Returns a batched Triple with leading axis n."""
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    if x_num is None:
        x_num = jnp.zeros((n, 0), jnp.float32)
    if codes is None:
        codes = jnp.zeros((n, 0), jnp.int32)
    x = _as_f32(x_num)
    b = onehot_block(codes, schema)
    return Triple(
        n=jnp.ones((n,), jnp.float32),
        lin=x,
        quad=jnp.einsum("ni,nj->nij", x, x),
        lin_cat=b,
        num_cat=jnp.einsum("ni,nv->niv", x, b),
        cat_cat=jnp.einsum("nu,nv->nuv", b, b),
    )


def sum_triples(t: Triple, axis: int = 0) -> Triple:
    """`sum_triple(triple)` over pre-lifted triples (Triple::Sum,
    sum.cpp:57-261): reduce a batched triple along `axis`."""
    return jax.tree.map(lambda x: jnp.sum(x, axis=axis), t)


# ---------------------------------------------------------------------------
# Naive-Bayes aggregate variants
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("schema", "row_chunk"))
def sum_to_nb_agg(x_num=None, codes=None, weights=None, *,
                  schema: FeatureSchema,
                  row_chunk: int = DEFAULT_ROW_CHUNK) -> NBAgg:
    """Fused NB aggregate `sum_to_nb_agg_x_y(cols…)` (Triple::sum_to_nb_agg,
    sum/sum_to_nb_agg.cpp:39-146): lin + diagonal quad + category counts."""
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    if x_num is None:
        x_num = jnp.zeros((n, 0), jnp.float32)
    if codes is None:
        codes = jnp.zeros((n, 0), jnp.int32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    x = _as_f32(x_num)
    w = _as_f32(weights)
    b = onehot_block(codes, schema)
    return NBAgg(
        n=jnp.sum(w),
        lin=jnp.dot(w, x, precision=jax.lax.Precision.HIGHEST),
        quad_diag=jnp.dot(w, x * x, precision=jax.lax.Precision.HIGHEST),
        lin_cat=jnp.dot(w, b, precision=jax.lax.Precision.HIGHEST),
    )


@functools.partial(jax.jit, static_argnames=("schema", "num_groups"))
def sum_to_nb_agg_grouped(x_num, codes, group_ids, *, schema: FeatureSchema,
                          num_groups: int, weights=None) -> NBAgg:
    """Grouped NB aggregate — one NBAgg per group (GROUP BY label)."""
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)

    def one_group(g):
        w = _as_f32(weights) * (jnp.asarray(group_ids) == g).astype(jnp.float32)
        return sum_to_nb_agg(x_num, codes, w, schema=schema)
    return jax.vmap(one_group)(jnp.arange(num_groups))


@functools.partial(jax.jit, static_argnames=("schema",))
def nb_lift(x_num=None, codes=None, *, schema: FeatureSchema) -> NBAgg:
    """`to_nb_agg(cols…)` (Triple::to_nb_lift, lift_to_nb_agg.cpp:13-136)."""
    n = x_num.shape[0] if x_num is not None else codes.shape[0]
    if x_num is None:
        x_num = jnp.zeros((n, 0), jnp.float32)
    if codes is None:
        codes = jnp.zeros((n, 0), jnp.int32)
    x = _as_f32(x_num)
    b = onehot_block(codes, schema)
    return NBAgg(n=jnp.ones((n,), jnp.float32), lin=x, quad_diag=x * x,
                 lin_cat=b)


def sum_nb_aggs(t: NBAgg, axis: int = 0) -> NBAgg:
    """`sum_nb_agg(agg)` (Triple::sum_nb_agg, sum/sum_nb_agg.cpp:45-175)."""
    return jax.tree.map(lambda x: jnp.sum(x, axis=axis), t)
